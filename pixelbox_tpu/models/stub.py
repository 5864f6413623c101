"""Deterministic random-projection stub embedder.

The end-to-end slice's embedder (SURVEY.md §7 step 3): a fixed random
linear projection of downsampled pixels through tanh.  Deterministic by
seed, so indexes are reproducible; useful for tests, benchmarks of the
scan path, and as a fallback when no trained weights exist (the reference
ships no ONNX weights either — .gitignore:6).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from pixelbox_tpu.models.base import Embedder
from pixelbox_tpu.models.registry import register_embedder


@register_embedder("stub")
class StubEmbedder(Embedder):
    POOL = 8  # average-pool 224→28 before projecting

    def __init__(self, dim: int = 128, input_size: int = 224, seed: int = 0):
        self.dim = int(dim)
        self.input_size = int(input_size)
        pooled = self.input_size // self.POOL
        feat = pooled * pooled * 3
        key = jax.random.PRNGKey(seed)
        self._w = (
            jax.random.normal(key, (feat, self.dim), dtype=jnp.float32)
            / jnp.sqrt(jnp.float32(feat))
        )
        self._fwd = jax.jit(self._forward)

    def _forward(self, batch: jnp.ndarray) -> jnp.ndarray:
        b, s, _, _ = batch.shape
        p = self.POOL
        pooled = batch.reshape(b, s // p, p, s // p, p, 3).mean(axis=(2, 4))
        flat = pooled.reshape(b, -1) * 2.0 - 1.0  # center [0,1] → [-1,1]
        return jnp.tanh(flat @ self._w * 4.0)

    def embed_preprocessed(self, batch: jnp.ndarray) -> jnp.ndarray:
        return self._fwd(batch)
