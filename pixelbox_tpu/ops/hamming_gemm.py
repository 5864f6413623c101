"""Hamming scan as an int8 MXU GEMM (bit-unpacked ±1 vectors).

The xor-popcount Hamming scan (ops.scan.hamming_scan_topk) is VPU-bound:
~6 vector ops per 4 hash bytes.  Unpacking each hash bit to a ±1 int8
turns Hamming distance into a dot product —

    dot(±1_a, ±1_b) = (#agreeing bits) - (#differing bits) = B - 2*hamming
    ⇒ differing_bits = (B - dot) / 2          (exact, integer)

— which runs on the MXU at memory roofline, the same shape as the cosine
scan.  The unpacked index costs 8× the packed bytes (a 32-byte phash → a
256-lane i8 row, MXU-aligned), a fine trade for a ~10× faster scan; the
packed u8 store remains the durable format, and this representation is
derived on demand.

Exactness: distances are exact integers scaled by the canonical
multiply-by-reciprocal; selection supports the same exact/fast modes as
the cosine scan.  The reference's u8 accumulator overflow is available via
``wrap_u8`` (bits mod 256 before scaling).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pixelbox_tpu.ops import topk as topk_ops
from pixelbox_tpu.ops.packed import PackedHammingIndex
from pixelbox_tpu.ops.scan import DEFAULT_BLOCK_ROWS, _block_iota


class PackedHammingGemmIndex(NamedTuple):
    """Bit-unpacked ±1 representation for MXU hamming scans."""

    data: jnp.ndarray   # int8 [N_pad, 8*H], +1 for bit set, -1 for clear
    valid: jnp.ndarray  # bool [N_pad]

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def bits(self) -> int:
        return self.data.shape[1]


def unpack_pm1(rows_u8: np.ndarray) -> np.ndarray:
    """u8 [..., H] → int8 [..., 8H] of ±1 (LSB-first bit order per byte,
    matching the phash packing, ops.phash.pack_bits_lsb_first)."""
    rows = np.asarray(rows_u8, dtype=np.uint8)
    bits = np.unpackbits(rows, axis=-1, bitorder="little")
    return (bits.astype(np.int8) * 2 - 1).astype(np.int8)


def build_hamming_gemm_index(index: PackedHammingIndex) -> PackedHammingGemmIndex:
    """Derive the ±1 representation from a packed u8 hamming index."""
    data = unpack_pm1(np.asarray(index.data))
    return PackedHammingGemmIndex(jnp.asarray(data), index.valid)


class HammingScanSample(NamedTuple):
    """Strided subsample of a ±1 hamming index (θ estimation)."""

    data: jnp.ndarray   # int8 [S, bits]
    valid: jnp.ndarray  # bool [S]


def build_hamming_scan_sample(
    index: PackedHammingGemmIndex, sample_rows: int = 65536
) -> HammingScanSample:
    cap = index.capacity
    stride = 1
    while stride * 2 <= max(1, cap // sample_rows) and cap % (stride * 2) == 0:
        stride *= 2
    return HammingScanSample(index.data[::stride], index.valid[::stride])


def hamming_gemm_scan_topk_auto(
    query_u8,
    index: PackedHammingGemmIndex,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    wrap_u8: bool = False,
    sample: HammingScanSample | None = None,
    meta: jnp.ndarray | None = None,
    prefer_pallas: bool | None = None,
):
    """Guaranteed-exact hamming scan at threshold-selection speed.

    Hamming twin of ``ops.scan.cosine_scan_topk_auto``: on TPU the main
    pass is the fused Pallas threshold kernel over the ±1 index;
    elsewhere (or on small indexes) the direct exact GEMM scan runs.
    Unproven queries are re-scanned exactly and spliced back — results
    always equal mode="exact".
    """
    from pixelbox_tpu.ops.scan import _default_backend_is_tpu

    q = jnp.asarray(query_u8)
    squeeze = q.ndim == 1
    if squeeze:
        q = q[None, :]
    use_pallas = (
        prefer_pallas if prefer_pallas is not None else _default_backend_is_tpu()
    ) and index.capacity % 2048 == 0 and index.bits % 128 == 0
    if index.capacity <= 4 * block_rows or not use_pallas:
        best_d, best_i = hamming_gemm_scan_topk(
            q, index, k=k, max_distance=max_distance, block_rows=block_rows,
            wrap_u8=wrap_u8, mode="exact",
        )
        if squeeze:
            return best_d[0], best_i[0]
        return best_d, best_i

    from pixelbox_tpu.ops.pallas_scan import (
        build_hamming_meta,
        pallas_hamming_threshold_scan_topk,
        pallas_hamming_threshold_scan_topk_v2,
    )

    if sample is None:
        sample = build_hamming_scan_sample(index)
    if meta is None:
        meta = build_hamming_meta(index)
    from pixelbox_tpu.ops.scan import _pick_tile_rows

    kernel = (
        pallas_hamming_threshold_scan_topk_v2 if q.shape[0] <= 512
        else pallas_hamming_threshold_scan_topk
    )
    best_d, best_i, exact = kernel(
        q, index, meta, sample.data, sample.valid, k=k,
        max_distance=max_distance, wrap_u8=wrap_u8,
        tile_rows=_pick_tile_rows(max(q.shape[0], 32), index.capacity),
    )
    from pixelbox_tpu.ops.scan import repair_unproven

    best_d, best_i = repair_unproven(
        q, best_d, best_i, exact,
        lambda rq: hamming_gemm_scan_topk(
            rq, index, k=k, max_distance=max_distance,
            block_rows=block_rows, wrap_u8=wrap_u8, mode="exact",
        ),
    )
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


@partial(jax.jit, static_argnames=("k", "block_rows", "wrap_u8", "mode", "recall_target"))
def hamming_gemm_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedHammingGemmIndex,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    wrap_u8: bool = False,
    mode: str = "exact",
    recall_target: float = 0.99,
):
    """Top-k smallest normalized Hamming distances via MXU GEMM.

    Same result semantics as ``ops.scan.hamming_scan_topk`` (strict
    ``dist < max_distance``, idx -1 fill, ascending-id tie-break in exact
    mode).
    """
    assert mode in ("exact", "fast"), mode
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, h = query_u8.shape
    bits_total = 8 * h
    assert index.bits == bits_total, (index.bits, bits_total)
    n_pad = index.capacity
    block_rows = min(block_rows, n_pad)
    assert n_pad % block_rows == 0, (n_pad, block_rows)
    nb = n_pad // block_rows

    # Unpack the queries on device (tiny).
    qbits = jnp.unpackbits(query_u8, axis=-1, bitorder="little")
    q_pm = (qbits.astype(jnp.int8) * 2 - 1).astype(jnp.int8)

    max_distance = jnp.asarray(max_distance, dtype=jnp.float32)
    xs = (
        index.data.reshape(nb, block_rows, bits_total),
        index.valid.reshape(nb, block_rows),
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    )
    scale = np.float32(1.0 / (8.0 * h))

    def body(carry, x):
        best_d, best_i = carry
        blk, blk_valid, base = x
        dot = lax.dot_general(
            q_pm,
            blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        diff_bits = (jnp.int32(bits_total) - dot) >> 1
        if wrap_u8:
            diff_bits = diff_bits % 256
        dist = diff_bits.astype(jnp.float32) * scale
        keep = blk_valid[None, :] & (dist < max_distance)
        dist = jnp.where(keep, dist, jnp.inf)
        idx = _block_iota(base, block_rows, qn)
        if mode == "fast":
            cand_d, sel = lax.approx_min_k(dist, k, recall_target=recall_target)
            cand_i = jnp.take_along_axis(idx, sel, axis=-1)
            cand_i = jnp.where(jnp.isfinite(cand_d), cand_i, -1)
        else:
            cand_d, cand_i = topk_ops.block_topk(dist, idx, k)
        return topk_ops.merge_sorted_topk(best_d, best_i, cand_d, cand_i, k), None

    init = topk_ops.empty_topk((qn,), k)
    (best_d, best_i), _ = lax.scan(body, init, xs)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i
