"""Embedder registry: name → constructor."""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_embedder(name: str):
    def wrap(ctor):
        _REGISTRY[name] = ctor
        return ctor

    return wrap


def get_embedder(name: str, **kwargs):
    """Instantiate a registered embedder ('stub', 'efficientnet', 'blip')."""
    # Import lazily so heavy models only load when requested.
    if name not in _REGISTRY:
        if name == "stub":
            import pixelbox_tpu.models.stub  # noqa: F401
        elif name == "efficientnet":
            import pixelbox_tpu.models.efficientnet  # noqa: F401
        elif name == "blip":
            import pixelbox_tpu.models.blip  # noqa: F401
        elif name == "onnx":
            import pixelbox_tpu.models.onnx_embedder  # noqa: F401
        elif name == "nomic":
            import pixelbox_tpu.models.nomic  # noqa: F401
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown embedder {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**kwargs)
