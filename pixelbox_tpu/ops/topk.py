"""Streaming top-k primitives for blockwise index scans.

The reference's query is ``WHERE dist < max ORDER BY dist ASC LIMIT k``
(src/engine.rs:375-383) evaluated by SQLite streaming over rows.  On TPU the
index is scanned in row blocks; each block produces a candidate set that is
merged into a running per-query top-k.  Ties prefer the earlier (smaller) row
index via stable sorting, matching SQLite's rowid scan order for equal
distances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def block_topk(dist: jnp.ndarray, idx: jnp.ndarray, k: int):
    """Top-k smallest distances within one block.

    dist, idx: [..., B] → ([..., k], [..., k]).  If B < k, pads with +inf/-1.
    """
    b = dist.shape[-1]
    if b < k:
        pad = [(0, 0)] * (dist.ndim - 1) + [(0, k - b)]
        dist = jnp.pad(dist, pad, constant_values=jnp.inf)
        idx = jnp.pad(idx, pad, constant_values=-1)
    neg_d, sel = lax.top_k(-dist, k)
    return -neg_d, jnp.take_along_axis(idx, sel, axis=-1)


def merge_topk(dist_a, idx_a, dist_b, idx_b, k: int):
    """Merge two candidate lists into the k smallest, stable on ties.

    ``a`` entries sort before ``b`` entries at equal distance (pass the
    running carry as ``a`` so earlier rows win ties).
    """
    d = jnp.concatenate([dist_a, dist_b], axis=-1)
    i = jnp.concatenate([idx_a, idx_b], axis=-1)
    d_s, i_s = lax.sort((d, i), num_keys=1, dimension=-1, is_stable=True)
    return d_s[..., :k], i_s[..., :k]


def empty_topk(batch_shape, k: int):
    """An empty carry: all +inf distances, -1 indices."""
    d = jnp.full(tuple(batch_shape) + (k,), jnp.inf, dtype=jnp.float32)
    i = jnp.full(tuple(batch_shape) + (k,), -1, dtype=jnp.int32)
    return d, i


def finalize_topk(dist: jnp.ndarray, idx: jnp.ndarray):
    """Replace +inf sentinel entries (below-threshold / padding) with idx=-1."""
    keep = jnp.isfinite(dist)
    return jnp.where(keep, dist, jnp.inf), jnp.where(keep, idx, -1)
