"""Embedding models (Flax) + registry.

The reference runs a single-image ONNX EfficientNet forward per file on CPU
(src/image_hashes/efficientnet.rs:31-42) and stages-but-never-wires BLIP
assets (models/blip-config.json).  Here embedders are batched Flax modules
jitted for the MXU, discovered through :func:`get_embedder`.
"""

from pixelbox_tpu.models.base import Embedder
from pixelbox_tpu.models.registry import get_embedder, register_embedder

__all__ = ["Embedder", "get_embedder", "register_embedder"]
