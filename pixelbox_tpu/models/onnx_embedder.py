"""`embedder="onnx"`: run a user-supplied ONNX model as the similarity
embedder — the reference's "user-moddable" contract, for ANY architecture.

The reference loads whatever graph sits at ``models/image_similarity.onnx``
and runs it with tract (/root/reference/README.md:51-59,
src/image_hashes/efficientnet.rs:10-14).  Here:

1. If the file is B0-shaped, its initializers map onto the native Flax
   EfficientNet (fast path — XLA-optimized module, same weights);
2. otherwise the graph itself executes through the JAX ONNX interpreter
   (models/onnx_graph.py) — a 3-conv toy net, a custom backbone, or a
   quantized export all embed images end-to-end.

Input contract mirrors the reference (efficientnet.rs:19-29): the engine
hands f32 [B, S, S, 3] HWC frames in [0, 1]; ONNX image models take NCHW,
so the embedder transposes.  Output must be [B, latent] (a trailing
flatten is applied if the graph leaves [B, latent, 1, 1]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pixelbox_tpu.models.base import Embedder
from pixelbox_tpu.models.registry import register_embedder


@register_embedder("onnx")
class OnnxEmbedder(Embedder):
    def __init__(
        self,
        model: str,
        dim: int | None = None,
        input_size: int = 224,
        prefer_native: bool = True,
    ):
        self.input_size = int(input_size)
        self.model_path = model
        self._native = None
        self._graph = None
        if prefer_native:
            try:
                from pixelbox_tpu.models.efficientnet import (
                    HEAD_CHANNELS,
                    EfficientNetEmbedder,
                )
                from pixelbox_tpu.models.onnx_io import read_onnx

                native_dim = dim
                if native_dim is None:
                    for arr in read_onnx(model)["initializers"].values():
                        if arr.ndim == 2 and arr.shape[1] == HEAD_CHANNELS:
                            native_dim = int(arr.shape[0])
                            break
                self._native = EfficientNetEmbedder(
                    dim=native_dim, input_size=input_size,
                    checkpoint_path=model,
                )
                self.dim = self._native.dim
                return
            except Exception:
                self._native = None  # not B0-shaped — interpret the graph
        from pixelbox_tpu.models.onnx_graph import OnnxGraphModel

        self._graph = OnnxGraphModel(model)
        inferred = self._graph.latent_dim
        if dim is not None and inferred is not None and inferred != dim:
            raise ValueError(
                f"{model}: model output width {inferred} != requested dim {dim}"
            )
        if dim is None and inferred is None:
            raise ValueError(
                f"{model}: cannot infer latent width; pass dim= explicitly"
            )
        self.dim = int(dim if dim is not None else inferred)
        self._jitted = jax.jit(self._run)

    @property
    def backend(self) -> str:
        return "flax-b0" if self._native is not None else "jax-interpreter"

    def _run(self, batch_hwc):
        x = jnp.transpose(batch_hwc, (0, 3, 1, 2))  # NHWC → NCHW
        out = self._graph(x)
        if isinstance(out, tuple):
            out = out[0]
        if out.ndim > 2:
            out = out.reshape(out.shape[0], -1)
        return out

    def embed_preprocessed(self, batch: jnp.ndarray) -> jnp.ndarray:
        if self._native is not None:
            return self._native.embed_preprocessed(batch)
        return self._jitted(jnp.asarray(batch, jnp.float32))
