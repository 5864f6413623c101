"""Packed device-resident index representation.

The reference stores one hash blob per SQLite row (``semantic_hashes`` /
``phashes`` tables, src/engine.rs:48, 106-109) and scans them row-by-row
through a scalar UDF.  The TPU-native layout packs all vectors into one
HBM-resident matrix so a whole scan is a single int8 MXU GEMM:

- ``data``: for semantic hashes, int8 ``[N_pad, D]`` storing ``q - 128``
  (centered so int8×int8→int32 matmuls run on the MXU at full rate);
  for phashes, uint8 ``[N_pad, H]`` raw bytes (xor/popcount scan).
- ``row_sum`` int32 ``[N_pad]``: sum of the centered int8 row — the affine
  correction recovering the exact u8 dot product from the int8 GEMM.
- ``row_mag2`` int32 ``[N_pad]``: exact squared magnitude of the centered
  (2q-255) row — the per-row cosine normalizer, precomputed at append time
  instead of per-query like the reference (engine.rs:578-581).
- ``valid`` bool ``[N_pad]``: live-row mask (padding and deleted rows are
  False and can never appear in results).

Rows are padded to a block multiple; the padded tail is masked out.  The
row index into these arrays is the stable join key back into the host-side
catalog (the analog of the reference's ``image_id`` join, engine.rs:377).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PackedSemanticIndex(NamedTuple):
    """Device arrays for the semantic (embedding) index."""

    data: jnp.ndarray      # int8 [N_pad, D], centered q-128
    row_sum: jnp.ndarray   # int32 [N_pad]
    row_mag2: jnp.ndarray  # int32 [N_pad]
    valid: jnp.ndarray     # bool [N_pad]

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def dim(self) -> int:
        return self.data.shape[1]


class PackedHammingIndex(NamedTuple):
    """Device arrays for the perceptual-hash (Hamming) index."""

    data: jnp.ndarray   # uint8 [N_pad, H]
    valid: jnp.ndarray  # bool [N_pad]

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def dim(self) -> int:
        return self.data.shape[1]


def semantic_rows_from_u8(q_u8: np.ndarray):
    """Host-side precompute for appending u8 embedding rows.

    q_u8: uint8 [n, D] → (data_i8 [n, D], row_sum [n], row_mag2 [n]).
    """
    q = np.asarray(q_u8, dtype=np.int32)
    data = (q - 128).astype(np.int8)
    row_sum = np.sum(q - 128, axis=-1, dtype=np.int32)
    centered = 2 * q - 255
    row_mag2 = np.sum(centered * centered, axis=-1, dtype=np.int32)
    return data, row_sum, row_mag2


def query_moments_from_u8(q_u8: jnp.ndarray):
    """Device-side query precompute: u8 [Q, D] → (q_i8, q_sum, q_mag2)."""
    q = q_u8.astype(jnp.int32)
    q_i8 = (q - 128).astype(jnp.int8)
    q_sum = jnp.sum(q - 128, axis=-1).astype(jnp.int32)
    centered = 2 * q - 255
    q_mag2 = jnp.sum(centered * centered, axis=-1).astype(jnp.int32)
    return q_i8, q_sum, q_mag2
