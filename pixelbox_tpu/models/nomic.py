"""Alternative ViT embedder — the reference's staged-but-unused "nomic" path.

The reference compiles a second ``mlhash`` implementation against
``nomic_embed_vision_v1_5_int8.onnx`` (a 224×224 ViT emitting a 197×768
token grid ≈ 151k-d latent) but does not re-export it
(src/image_hashes/nomic.rs; src/image_hashes/mod.rs:4 declares it, mod.rs:7
exports efficientnet's).  This mirrors that component: a ViT tower with the
same input geometry whose pooled latent follows the same
quantize-contract, registered as ``nomic`` in the embedder registry but
not the default anywhere.

Rather than the reference's unwieldy raw 197×768 token dump (151k bytes per
image!), the latent is mean-pooled over tokens and tanh-bounded to a
configurable width — the sane TPU-native variant of the same tower.
Weights are random-init unless provided — OR pass
``checkpoint_path="nomic_embed_vision_v1_5_int8.onnx"`` to run the user's
actual nomic export through the JAX ONNX interpreter
(models/onnx_graph.py), exactly as the reference feeds the file to tract
(nomic.rs:7-19): the weights carry over because the GRAPH carries over.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from pixelbox_tpu.models.base import Embedder
from pixelbox_tpu.models.blip import BlipVisionConfig, BlipVisionTower
from pixelbox_tpu.models.registry import register_embedder
import flax.linen as nn


class NomicVisionModule(nn.Module):
    """ViT-B/16-ish tower (hidden 768, 12 layers) + pooled tanh head."""

    latent_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = BlipVisionConfig(
            hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072, image_size=224, patch_size=16,
        )
        h = BlipVisionTower(cfg, self.dtype, name="vit")(x)  # CLS token
        h = h.astype(jnp.float32)
        z = nn.Dense(self.latent_dim, dtype=jnp.float32, name="head")(h)
        return jnp.tanh(z)


@register_embedder("nomic")
class NomicEmbedder(Embedder):
    def __init__(
        self,
        dim: int = 128,
        input_size: int = 224,  # nomic.rs:8-9
        params: Optional[dict] = None,
        seed: int = 0,
        dtype: Any = jnp.float32,
        checkpoint_path: Optional[str] = None,
    ):
        self.dim = int(dim)
        self.input_size = int(input_size)
        self._onnx = None
        if checkpoint_path is not None:
            # The user's actual nomic .onnx runs via the graph interpreter
            # (tract-equivalent execution, nomic.rs:10-19).  The graph is
            # driven directly (not via OnnxEmbedder, whose [B, latent]
            # contract flattens a [B, T, H] token grid to [B, T·H] — the
            # reference's unwieldy raw dump): tokens mean-pool to the
            # model's own hidden width, discovered by tracing the graph
            # shape (works for ANY hidden size, not just nomic's 768),
            # then project to the configured hash width through a
            # deterministic seeded random projection so the width
            # contract holds without extra trained weights.
            from pixelbox_tpu.models.onnx_graph import OnnxGraphModel

            self._onnx = OnnxGraphModel(checkpoint_path)

            def _pooled(batch_hwc):
                out = self._onnx(jnp.transpose(batch_hwc, (0, 3, 1, 2)))
                if isinstance(out, tuple):
                    out = out[0]
                out = jnp.asarray(out, jnp.float32)
                if out.ndim > 2:  # token grid [B, T, H] → mean over tokens
                    out = jnp.mean(out, axis=tuple(range(1, out.ndim - 1)))
                return out

            probe = jax.eval_shape(
                _pooled,
                jax.ShapeDtypeStruct(
                    (1, self.input_size, self.input_size, 3), jnp.float32
                ),
            )
            out_dim = int(probe.shape[-1])
            key = jax.random.PRNGKey(seed)
            proj = jax.random.normal(
                key, (out_dim, self.dim), jnp.float32
            ) / jnp.sqrt(jnp.float32(out_dim))
            self._fwd_onnx = jax.jit(
                lambda x: jnp.tanh(_pooled(x) @ proj)
            )
            return
        self.module = NomicVisionModule(latent_dim=self.dim, dtype=dtype)
        if params is None:
            dummy = jnp.zeros((1, self.input_size, self.input_size, 3), jnp.float32)
            params = self.module.init(jax.random.PRNGKey(seed), dummy)
        self.variables = params
        self._fwd = jax.jit(lambda v, x: self.module.apply(v, x))

    def embed_preprocessed(self, batch: jnp.ndarray) -> jnp.ndarray:
        if self._onnx is not None:
            return self._fwd_onnx(jnp.asarray(batch, jnp.float32))
        return self._fwd(self.variables, batch)
