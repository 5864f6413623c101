"""Pallas TPU kernel: fused int8-GEMM cosine scan with in-kernel exact top-k.

The XLA path (``ops.scan``) computes per-block distances with the MXU and
merges top-k with XLA's TopK custom call per block.  This kernel fuses the
entire scan — int8 GEMM, exact-integer epilogue, threshold filter, and the
running top-k — into ONE pass over the index: distances never leave VMEM,
and the only HBM traffic is the int8 index itself (+ row metadata).

TopK/sort primitives don't exist in Mosaic, so the kernel maintains the
running top-K as a SORTED [Q, K] vector in VMEM and merges candidates by
**threshold-filtered extract-min + vectorized sorted insertion**:

  per row tile:
    dist[Q, T] = reciprocal-cosine epilogue(int8 GEMM)      (MXU + VPU)
    while any(min(dist) < current kth-best):
      m      = per-query min                                 (VPU reduce)
      insert m into the sorted carry with roll+select        (3 VPU ops)
      mask m out of dist
  final tile → carry written to the output refs

The expected number of insertions over a whole scan is K + k·ln(N/T)
(≈ a few hundred for N=1M), so almost every tile costs exactly one
compare+reduce beyond its GEMM.  The loop is synchronized across the Q
queries in the batch, which makes this kernel ideal for SMALL query
batches (the interactive drag-drop path, reference src/ui/search.rs:28-31)
— for large batches the XLA path's per-block TopK amortizes better; the
engine picks per batch size.

Exactness: same integer moments and f32 epilogue spec as ``ops.distances``
(oracle-identical up to TPU sqrt/div ulps), ties broken by ascending row
id exactly like the oracle (extract-min picks the smallest column;
insertion goes after equal values; tiles ascend).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelbox_tpu.ops import topk as topk_ops
from pixelbox_tpu.ops.packed import PackedSemanticIndex

# numpy scalars (NOT jnp arrays — pallas kernels may not close over
# traced constants).
_INF = np.float32(np.inf)
_COSINE_FLOOR = np.float32(1e-6)
_MAG_EPS = np.float32(1e-6)
_RECIP_65025 = np.float32(1.0 / (255.0 * 255.0))


def build_row_meta(index: PackedSemanticIndex) -> jnp.ndarray:
    """[2, N] int32: row 0 = centered row sums; row 1 = row mag2, with 0
    marking invalid rows (real rows always have mag2 >= D > 0)."""
    mag2 = jnp.where(index.valid, index.row_mag2, 0)
    return jnp.stack([index.row_sum, mag2], axis=0).astype(jnp.int32)


def _fused_scan_kernel(
    md_ref,       # SMEM [1, 1] f32: max_distance
    q_ref,        # VMEM [Q, D] int8 (u8-128 codes)
    data_ref,     # VMEM [T, D] int8 (current tile)
    meta_ref,     # VMEM [2, T] int32 (current tile)
    best_d_ref,   # VMEM [Q, K] f32 out (sorted ascending)
    best_i_ref,   # VMEM [Q, K] i32 out
    *,
    tile_rows: int,
    k_lanes: int,
    dim: int,
):
    t = pl.program_id(0)
    qn = q_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        best_d_ref[:] = jnp.full((qn, k_lanes), _INF, jnp.float32)
        best_i_ref[:] = jnp.full((qn, k_lanes), -1, jnp.int32)

    q_i8 = q_ref[:]
    md = md_ref[0, 0]
    dot8 = lax.dot_general(
        q_i8,
        data_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                              # [Q,T]
    q_i32 = q_i8.astype(jnp.int32)
    q_sum = jnp.sum(q_i32, axis=1, keepdims=True)                  # [Q,1]
    qc = 2 * q_i32 + 1                                             # 2q-255
    q_mag2 = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
    row_sum = meta_ref[0, :][None, :]
    row_mag2 = meta_ref[1, :][None, :]
    dot_c = 4 * dot8 + 2 * (q_sum + row_sum) + jnp.int32(dim)
    mag2_b = row_mag2.astype(jnp.float32)
    sp = jnp.sqrt(q_mag2 * mag2_b)                                 # [Q,T]
    mag = sp * _RECIP_65025
    cos = dot_c.astype(jnp.float32) / sp
    dist = np.float32(1.0) / jnp.maximum(cos, _COSINE_FLOOR) - np.float32(1.0)
    dist = jnp.where(mag < _MAG_EPS, np.float32(0.0), dist)
    # Validity + strict threshold (engine.rs:375-383 WHERE dist < ?).
    dist = jnp.where((row_mag2 > 0) & (dist < md), dist, _INF)

    base = t * tile_rows
    col = lax.broadcasted_iota(jnp.int32, (qn, tile_rows), 1)
    lane = lax.broadcasted_iota(jnp.int32, (qn, k_lanes), 1)
    big_col = jnp.int32(2 ** 30)

    def insert_round(state):
        # The carried m is the per-query min of the carried dist (one
        # fresh [Q, T] reduce per round — the post-mask min below doubles
        # as the next round's extract-min).
        dist, m, _ = state
        theta = best_d_ref[:, k_lanes - 1 : k_lanes]               # [Q,1]
        ins = m < theta                                            # [Q,1]
        midx = jnp.min(
            jnp.where(dist == m, col, big_col), axis=1, keepdims=True
        )                                                          # [Q,1]
        gidx = (base + midx).astype(jnp.int32)
        cur_d = best_d_ref[:]
        cur_i = best_i_ref[:]
        # Insert after equal values → ascending-row-id tie-break.
        pos = jnp.sum((cur_d <= m).astype(jnp.int32), axis=1, keepdims=True)
        sh_d = pltpu.roll(cur_d, shift=1, axis=1)
        sh_i = pltpu.roll(cur_i, shift=1, axis=1)
        new_d = jnp.where(lane < pos, cur_d, jnp.where(lane == pos, m, sh_d))
        new_i = jnp.where(lane < pos, cur_i, jnp.where(lane == pos, gidx, sh_i))
        best_d_ref[:] = jnp.where(ins, new_d, cur_d)
        best_i_ref[:] = jnp.where(ins, new_i, cur_i)
        # Mask the extracted minima (for every row: guarantees progress).
        dist = jnp.where(col == midx, _INF, dist)
        m = jnp.min(dist, axis=1, keepdims=True)                   # [Q,1]
        more = jnp.any(m < best_d_ref[:, k_lanes - 1 : k_lanes])
        return dist, m, more

    m0 = jnp.min(dist, axis=1, keepdims=True)
    init_more = jnp.any(m0 < best_d_ref[:, k_lanes - 1 : k_lanes])
    lax.while_loop(lambda s: s[2], insert_round, (dist, m0, init_more))


def _xla_kind_dist(kind, q_p, data, meta2, md, dim, wrap_u8):
    """[Qp, S] distances in XLA with the same f32 epilogue spec as the
    kernels (mini-subsample helper for the two-stage θ)."""
    if kind == "cosine4":
        p32 = data.astype(jnp.int32)
        blk = jnp.concatenate([p32 & 15, (p32 >> 4) & 15], axis=-1).astype(
            jnp.int8
        )
    else:
        blk = data
    dot = lax.dot_general(
        q_p, blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if kind == "hamming":
        row_valid = meta2[0, :][None, :]
        diff_bits = (jnp.int32(dim) - dot) >> 1
        if wrap_u8:
            diff_bits = diff_bits % 256
        dist = diff_bits.astype(jnp.float32) * np.float32(1.0 / dim)
        return jnp.where((row_valid > 0) & (dist < md), dist, jnp.inf)
    q_i32 = q_p.astype(jnp.int32)
    q_sum = jnp.sum(q_i32, axis=1, keepdims=True)
    if kind == "cosine":
        qc = 2 * q_i32 + 1
        dot_c = 4 * dot + 2 * (q_sum + meta2[0, :][None, :]) + jnp.int32(dim)
    else:  # cosine4
        qc = 34 * q_i32 - 255
        dot_c = (
            1156 * dot
            - 8670 * (q_sum + meta2[0, :][None, :])
            + jnp.int32(65025 * dim)
        )
    q_mag2 = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
    row_mag2 = meta2[1, :][None, :]
    sp = jnp.sqrt(q_mag2 * row_mag2.astype(jnp.float32))
    mag = sp * _RECIP_65025
    cos = dot_c.astype(jnp.float32) / sp
    dist = np.float32(1.0) / jnp.maximum(cos, _COSINE_FLOOR) - np.float32(1.0)
    dist = jnp.where(mag < _MAG_EPS, np.float32(0.0), dist)
    return jnp.where((row_mag2 > 0) & (dist < md), dist, jnp.inf)


def _pallas_sample_theta(
    kind: str,
    q_p: jnp.ndarray,        # padded queries [Qp, D] int8 (±1 / 4-bit codes)
    sample_data: jnp.ndarray,  # [S, D] (packed [S, D/2] for cosine4)
    meta2: jnp.ndarray,      # [2, S] int32 (same layout as the main meta)
    md: jnp.ndarray,         # f32 scalar max_distance
    j: int,
    *,
    dim: int,
    tile_rows: int,
    wrap_u8: bool = False,
):
    """Per-query j-th smallest sample distance — the θ estimate for the
    threshold wrappers — in two stages:

    1. θ0 from a 1/16 mini-subsample via plain XLA, sized to hold ~4j
       sample rows (the [Qp, S0] intermediates are tiny);
    2. the θ0-filtered insert kernel over the FULL sample extracts the
       exact top-j of {sample dist < θ0} — its only HBM traffic is the
       sample itself.

    The single-stage XLA formulation materializes the [Q, S] int32 GEMM
    output + f32 epilogue + TopK traffic (~3.7 ms at Q=256, S=64k — a
    third of the whole scan); an unfiltered fused sample top-j kernel is
    no better (~4.2 ms: its extract loop runs with no θ gate).

    If θ0 comes up short (fewer than j sample rows under it, or a tie
    flood poisons the kernel's round bound), the returned value falls
    back to θ0 itself — a TIGHTER threshold than the true sample θ_j
    (θ_j ≥ θ0 in that case), so affected queries lean on the main
    pass's kth-finite proof and may take the exact-repair path;
    soundness is unaffected (θ accuracy only shapes work).  Returns
    [Qp, 1]; value == md ⟺ the caller should treat θ as unbound."""
    qn = q_p.shape[0]
    s = sample_data.shape[0]
    assert s % tile_rows == 0, (s, tile_rows)

    # ---- stage 1: θ0 (XLA, mini-subsample)
    stride = 16
    while stride > 1 and (s // stride < 1024 or s % stride != 0):
        stride //= 2
    mini = sample_data[::stride]
    mmeta = meta2[:, ::stride]
    s0 = mini.shape[0]
    j0 = min(s0, max(1, -(-4 * j * s0 // s)))
    dist0 = _xla_kind_dist(kind, q_p, mini, mmeta, md, dim, wrap_u8)
    t0, _ = topk_ops.block_topk(dist0, jnp.zeros(dist0.shape, jnp.int32), j0)
    theta0 = jnp.minimum(t0[:, j0 - 1 : j0], md)   # [Qp, 1]; INF → md

    # ---- stage 2: exact top-j of {dist < θ0} over the full sample.
    # Round bound scaled to the expected per-tile θ0-passing rows (≈4j
    # spread over s/tile_rows tiles — tiny at production shapes, but a
    # small index with few tiles concentrates them).
    max_rounds = max(96, 4 * j * tile_rows // s + 64)
    k_lanes = max(128, -(-j // 128) * 128)
    kernel = partial(
        _threshold_insert_kernel,
        tile_rows=tile_rows, k_lanes=k_lanes, dim=dim, max_rounds=max_rounds,
        kind=kind, wrap_u8=wrap_u8,
    )
    best_d, _, counts = pl.pallas_call(
        kernel,
        grid=(s // tile_rows,),
        in_specs=[
            pl.BlockSpec((qn, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (qn, q_p.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_rows, sample_data.shape[1]), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qn, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, k_lanes), jnp.float32),
            jax.ShapeDtypeStruct((qn, k_lanes), jnp.int32),
            jax.ShapeDtypeStruct((qn, 128), jnp.int32),
        ),
    )(theta0, q_p, sample_data, meta2)
    jth = best_d[:, j - 1 : j]
    ok = jnp.isfinite(jth) & (counts[:, 0:1] >= 0)
    return jnp.where(ok, jth, theta0)


def _threshold_extract_kernel(
    theta_ref,    # VMEM [Qp, 1] f32: per-query strict threshold
    q_ref,        # VMEM [Qp, D] int8
    data_ref,     # VMEM [T, D] int8 (current tile)
    meta_ref,     # VMEM [2, T] int32 (current tile)
    cand_d_ref,   # VMEM [Qp, CAP] f32 out (append buffer)
    cand_i_ref,   # VMEM [Qp, CAP] i32 out
    counts_ref,   # VMEM [Qp, 128] i32 out: lane 0 = exact passing count,
                  #                         lane 1 = collected count
    *,
    tile_rows: int,
    cap: int,
    dim: int,
    max_rounds: int,
    kind: str = "cosine",
    wrap_u8: bool = False,
):
    """Batched-Q threshold extraction: one HBM pass of the int8 index,
    appending every row with dist < θ[q] into a per-query VMEM buffer.

    ``kind="cosine"``: reciprocal-cosine epilogue over centered u8 rows
    (meta = [row_sum; row_mag2], mag2 0 marking invalid rows).
    ``kind="hamming"``: normalized Hamming over ±1 bit-unpacked rows
    (dot(±1,±1) = bits − 2·hamming, ops/hamming_gemm.py; meta row 0 =
    validity, row 1 unused); ``wrap_u8`` replicates the reference's u8
    popcount-accumulator overflow (engine.rs:603).

    Selection here is just a gated extract-min loop per tile — expected
    rounds per tile ≈ max over queries of per-tile passing rows (≈6 at
    θ sized for ~400/1M hits), each round a handful of VPU reduces on
    the VMEM-resident tile.  Unlike the XLA threshold scan, the masked
    distance matrix never exists in HBM.

    Exactness accounting: lane 0 counts ALL passing rows (a pure reduce,
    independent of extraction); lane 1 counts collected ones.  The
    wrapper proves a query exact iff collected == count (nothing missed:
    buffer never filled, round bound never hit) plus the usual
    count ≥ k / θ-unbound condition.  Extraction order is (dist, id)-
    ascending among equal distances (extract-min takes the smallest
    column first; tiles ascend), so the wrapper's stable TopK reproduces
    the oracle tie-break.
    """
    t = pl.program_id(0)
    qn = q_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        cand_d_ref[:] = jnp.full((qn, cap), _INF, jnp.float32)
        cand_i_ref[:] = jnp.full((qn, cap), -1, jnp.int32)
        counts_ref[:] = jnp.zeros((qn, 128), jnp.int32)

    q_i8 = q_ref[:]
    dot8 = lax.dot_general(
        q_i8,
        data_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                              # [Q,T]
    theta = theta_ref[:]                                           # [Q,1]
    if kind == "cosine":
        q_i32 = q_i8.astype(jnp.int32)
        q_sum = jnp.sum(q_i32, axis=1, keepdims=True)              # [Q,1]
        qc = 2 * q_i32 + 1                                         # 2q-255
        q_mag2 = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
        row_sum = meta_ref[0, :][None, :]
        row_mag2 = meta_ref[1, :][None, :]
        dot_c = 4 * dot8 + 2 * (q_sum + row_sum) + jnp.int32(dim)
        mag2_b = row_mag2.astype(jnp.float32)
        sp = jnp.sqrt(q_mag2 * mag2_b)
        mag = sp * _RECIP_65025
        cos = dot_c.astype(jnp.float32) / sp
        dist = np.float32(1.0) / jnp.maximum(cos, _COSINE_FLOOR) - np.float32(1.0)
        dist = jnp.where(mag < _MAG_EPS, np.float32(0.0), dist)
        dist = jnp.where((row_mag2 > 0) & (dist < theta), dist, _INF)
    else:  # hamming over ±1 rows (dim = total bits)
        row_valid = meta_ref[0, :][None, :]
        diff_bits = (jnp.int32(dim) - dot8) >> 1
        if wrap_u8:
            diff_bits = diff_bits % 256
        dist = diff_bits.astype(jnp.float32) * np.float32(1.0 / dim)
        dist = jnp.where((row_valid > 0) & (dist < theta), dist, _INF)

    lane128 = lax.broadcasted_iota(jnp.int32, (qn, 128), 1)
    c = jnp.sum(jnp.isfinite(dist), axis=1, keepdims=True).astype(jnp.int32)
    counts_ref[:] = counts_ref[:] + jnp.where(lane128 == 0, c, 0)

    base = t * tile_rows
    col = lax.broadcasted_iota(jnp.int32, (qn, tile_rows), 1)
    lane_cap = lax.broadcasted_iota(jnp.int32, (qn, cap), 1)
    big_col = jnp.int32(2 ** 30)

    def extract_round(state):
        # Carried m = per-query min of the carried dist — one fresh
        # [Q, T] reduce per round (the post-mask min feeds the next
        # round and the pending check).
        dist, m, rounds, _ = state
        cursor = counts_ref[:, 1:2]                                # [Q,1]
        can = jnp.isfinite(m) & (cursor < cap)
        midx = jnp.min(
            jnp.where(dist == m, col, big_col), axis=1, keepdims=True
        )
        gidx = (base + midx).astype(jnp.int32)
        write = (lane_cap == cursor) & can
        cand_d_ref[:] = jnp.where(write, m, cand_d_ref[:])
        cand_i_ref[:] = jnp.where(write, gidx, cand_i_ref[:])
        counts_ref[:] = counts_ref[:] + jnp.where(
            (lane128 == 1) & can, 1, 0
        )
        # Mask the extracted minima only where actually collected.
        dist = jnp.where((col == midx) & can, _INF, dist)
        m = jnp.min(dist, axis=1, keepdims=True)
        pending = jnp.any(jnp.isfinite(m) & (counts_ref[:, 1:2] < cap))
        return dist, m, rounds + 1, pending

    m0 = jnp.min(dist, axis=1, keepdims=True)
    pending0 = jnp.any(jnp.isfinite(m0) & (counts_ref[:, 1:2] < cap))
    lax.while_loop(
        lambda s: s[3] & (s[2] < max_rounds),
        extract_round,
        (dist, m0, jnp.int32(0), pending0),
    )
    # Rows left uncollected (buffer full / round bound) stay visible as
    # collected < count — the wrapper's exactness proof catches them.


@partial(
    jax.jit,
    static_argnames=("k", "cap", "tile_rows", "target_count", "max_rounds"),
)
def pallas_threshold_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    row_meta: jnp.ndarray,
    sample,                       # ops.scan.ScanSample
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    cap: int = 1024,
    tile_rows: int = 2048,
    target_count: int | None = None,
    max_rounds: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched guaranteed-verifiable threshold scan, fully fused.

    Returns (dist [Q,k], idx [Q,k], exact [Q]) with the same semantics as
    ``ops.scan.cosine_scan_topk_threshold`` — the sampled θ estimate runs
    in XLA, the full pass (GEMM + epilogue + θ-filter + candidate
    extraction + exact counting) is ONE Pallas kernel whose only HBM
    traffic is the int8 index, and the final top-k runs on the tiny
    candidate buffer.  Use via ``ops.scan.cosine_scan_topk_auto`` for
    repair of unproven queries.
    """
    from pixelbox_tpu.ops.packed import query_moments_from_u8
    from pixelbox_tpu.ops.scan import _cosine_block_dist
    from pixelbox_tpu.ops import topk as topk_ops

    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    assert n_pad % tile_rows == 0, (n_pad, tile_rows)
    n_tiles = n_pad // tile_rows

    md = jnp.asarray(max_distance, dtype=jnp.float32)
    q_i8, q_sum, q_mag2 = query_moments_from_u8(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]
    # Pad queries to the int8 sublane minimum; padded θ = -inf (no hits).
    q_pad = max(32, -(-qn // 32) * 32)
    q_i8_p = (
        jnp.pad(q_i8, ((0, q_pad - qn), (0, 0))) if q_pad != qn else q_i8
    )

    # θ from the strided sample (fused kernel when tile-divisible).
    s = sample.data.shape[0]
    tc = target_count if target_count is not None else max(4 * k, 256)
    j = min(s, max(1, -(-tc * s // n_pad)))
    if s % tile_rows == 0:
        meta2 = jnp.stack(
            [sample.row_sum, jnp.where(sample.valid, sample.row_mag2, 0)]
        ).astype(jnp.int32)
        theta_j = _pallas_sample_theta(
            "cosine", q_i8_p, sample.data, meta2, md, j,
            dim=d, tile_rows=tile_rows,
        )[:qn]
    else:
        s_dist = _cosine_block_dist(
            q_i8, q_sum, q_mag2_f, sample.data, sample.row_sum,
            sample.row_mag2, sample.valid, md, d,
        )
        s_top, _ = topk_ops.block_topk(
            s_dist, jnp.zeros(s_dist.shape, jnp.int32), j
        )
        theta_j = s_top[:, j - 1 : j]
    theta = jnp.minimum(theta_j, md)
    unbound = ~(theta_j < md)[:, 0]
    theta_p = (
        jnp.pad(theta, ((0, q_pad - qn), (0, 0)), constant_values=-jnp.inf)
        if q_pad != qn
        else theta
    )

    kernel = partial(
        _threshold_extract_kernel,
        tile_rows=tile_rows, cap=cap, dim=d, max_rounds=max_rounds,
    )
    cand_d, cand_i, counts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, cap), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, cap), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, 128), jnp.int32),
        ),
    )(theta_p, q_i8_p, index.data, row_meta)

    cand_d = cand_d[:qn]
    cand_i = cand_i[:qn]
    count = counts[:qn, 0]
    collected = counts[:qn, 1]

    best_d, best_i = topk_ops.block_topk(cand_d, cand_i, k)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    exact = (collected == count) & ((count >= k) | unbound)
    if squeeze:
        return best_d[0], best_i[0], exact[0]
    return best_d, best_i, exact


def _threshold_insert_kernel(
    theta_ref,    # VMEM [Qp, 1] f32
    q_ref,        # VMEM [Qp, D] int8
    data_ref,     # VMEM [T, D] int8 (current tile)
    meta_ref,     # VMEM [2, T] int32 (current tile)
    best_d_ref,   # VMEM [Qp, K] f32 out (sorted ascending)
    best_i_ref,   # VMEM [Qp, K] i32 out
    counts_ref,   # VMEM [Qp, 128] i32 out: lane 0 = exact passing count
    *,
    tile_rows: int,
    k_lanes: int,
    dim: int,
    max_rounds: int,
    kind: str = "cosine",
    wrap_u8: bool = False,
):
    """Threshold scan v2: running SORTED top-k instead of a candidate
    buffer.  θ pre-filtering makes sorted insertion cheap (insertions ≈
    per-tile hits beating the current k-th, ≈6 per 2048-row tile at θ
    sized for ~400/1M hits), each a roll+select on the [Q, K] carry —
    ~8× less VMEM traffic than v1's [Q, 1024] buffer writes, and no
    final TopK: the output is already the exact top-k of {dist < θ}.

    Exactness proof: only θ-passing rows are ever inserted and the
    insertion loop never drops a row that beats the running k-th, so
    ``best_d[k-1]`` finite ⟺ ≥ k rows passed θ ⟺ the carry IS the true
    top-k of {dist < θ} (the wrapper also accepts θ == max_distance
    with fewer hits).  That makes a separate per-tile passing-row count
    (a full [Q, T] reduce per tile in the first version of this kernel)
    redundant — ``counts_ref`` lane 0 only carries the poison flag.

    A max_rounds bound per tile guards pathological tie floods;
    hitting it can only LOSE candidates, which would show up as
    best_d[k-1] > some uninserted row... so instead of risking a silent
    miss, hitting the bound poisons the query's flag (set very negative)
    — unproven → exact repair.

    The per-round loop carries the running per-query min: each round
    costs ONE fresh [Q, T] reduce (the post-mask min doubles as the
    next round's extract-min) instead of two.
    """
    t = pl.program_id(0)
    qn = q_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        best_d_ref[:] = jnp.full((qn, k_lanes), _INF, jnp.float32)
        best_i_ref[:] = jnp.full((qn, k_lanes), -1, jnp.int32)
        counts_ref[:] = jnp.zeros((qn, 128), jnp.int32)

    q_i8 = q_ref[:]
    theta = theta_ref[:]                                           # [Q,1]
    if kind == "cosine4":
        # Packed int4 tile [T, D/2]: two codes per byte, column-blocked.
        # Unpack in int32 — Mosaic has no 8-bit shift lowering.
        p32 = data_ref[:].astype(jnp.int32)
        blk = jnp.concatenate(
            [p32 & 15, (p32 >> 4) & 15], axis=-1
        ).astype(jnp.int8)
    else:
        blk = data_ref[:]
    dot8 = lax.dot_general(
        q_i8,
        blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                              # [Q,T]

    def _cosine_dist(dot_c, row_mag2, q_mag2):
        mag2_b = row_mag2.astype(jnp.float32)
        sp = jnp.sqrt(q_mag2 * mag2_b)
        mag = sp * _RECIP_65025
        cos = dot_c.astype(jnp.float32) / sp
        dist = np.float32(1.0) / jnp.maximum(cos, _COSINE_FLOOR) - np.float32(1.0)
        dist = jnp.where(mag < _MAG_EPS, np.float32(0.0), dist)
        return jnp.where((row_mag2 > 0) & (dist < theta), dist, _INF)

    if kind == "cosine":
        q_i32 = q_i8.astype(jnp.int32)
        q_sum = jnp.sum(q_i32, axis=1, keepdims=True)
        qc = 2 * q_i32 + 1
        q_mag2 = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
        dot_c = 4 * dot8 + 2 * (q_sum + meta_ref[0, :][None, :]) + jnp.int32(dim)
        dist = _cosine_dist(dot_c, meta_ref[1, :][None, :], q_mag2)
    elif kind == "cosine4":
        # q_ref carries the 4-bit codes (0..15) as int8.
        q_i32 = q_i8.astype(jnp.int32)
        q_sum = jnp.sum(q_i32, axis=1, keepdims=True)
        qc = 34 * q_i32 - 255
        q_mag2 = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
        dot_c = (
            1156 * dot8
            - 8670 * (q_sum + meta_ref[0, :][None, :])
            + jnp.int32(65025 * dim)
        )
        dist = _cosine_dist(dot_c, meta_ref[1, :][None, :], q_mag2)
    else:  # hamming
        row_valid = meta_ref[0, :][None, :]
        diff_bits = (jnp.int32(dim) - dot8) >> 1
        if wrap_u8:
            diff_bits = diff_bits % 256
        dist = diff_bits.astype(jnp.float32) * np.float32(1.0 / dim)
        dist = jnp.where((row_valid > 0) & (dist < theta), dist, _INF)

    lane128 = lax.broadcasted_iota(jnp.int32, (qn, 128), 1)
    base = t * tile_rows
    col = lax.broadcasted_iota(jnp.int32, (qn, tile_rows), 1)
    lane = lax.broadcasted_iota(jnp.int32, (qn, k_lanes), 1)
    big_col = jnp.int32(2 ** 30)

    # NOTE: splitting extraction into column segments (cheaper per-round
    # reduces, statically unrolled sub-loops) measured ~20% SLOWER at
    # Q=256 — Mosaic while_loop invocation overhead exceeds the reduce
    # savings.  Keep the single full-tile loop.
    def insert_round(state):
        dist, m, rounds, _ = state
        kth = best_d_ref[:, k_lanes - 1 : k_lanes]
        ins = m < kth
        midx = jnp.min(
            jnp.where(dist == m, col, big_col), axis=1, keepdims=True
        )
        gidx = (base + midx).astype(jnp.int32)
        cur_d = best_d_ref[:]
        cur_i = best_i_ref[:]
        # Insert after equal values → ascending-row-id tie-break.
        pos = jnp.sum((cur_d <= m).astype(jnp.int32), axis=1, keepdims=True)
        sh_d = pltpu.roll(cur_d, shift=1, axis=1)
        sh_i = pltpu.roll(cur_i, shift=1, axis=1)
        new_d = jnp.where(lane < pos, cur_d, jnp.where(lane == pos, m, sh_d))
        new_i = jnp.where(lane < pos, cur_i, jnp.where(lane == pos, gidx, sh_i))
        best_d_ref[:] = jnp.where(ins, new_d, cur_d)
        best_i_ref[:] = jnp.where(ins, new_i, cur_i)
        dist = jnp.where(col == midx, _INF, dist)
        m = jnp.min(dist, axis=1, keepdims=True)                   # [Q,1]
        more = jnp.any(m < best_d_ref[:, k_lanes - 1 : k_lanes])
        return dist, m, rounds + 1, more

    m0 = jnp.min(dist, axis=1, keepdims=True)
    init_more = jnp.any(m0 < best_d_ref[:, k_lanes - 1 : k_lanes])
    dist, m_last, rounds, more = lax.while_loop(
        lambda s: s[3] & (s[2] < max_rounds),
        insert_round,
        (dist, m0, jnp.int32(0), init_more),
    )

    @pl.when(more)
    def _poison():
        # Round bound hit with insertions pending: results for queries
        # with pending rows may be incomplete — poison their flag so
        # the wrapper proves them unexact and repairs.
        pending = m_last < best_d_ref[:, k_lanes - 1 : k_lanes]
        counts_ref[:] = jnp.where(
            pending & (lane128 == 0), jnp.int32(-(2 ** 30)), counts_ref[:]
        )


@partial(
    jax.jit,
    static_argnames=("k", "tile_rows", "target_count", "max_rounds"),
)
def pallas_threshold_scan_topk_v2(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    row_meta: jnp.ndarray,
    sample,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    tile_rows: int = 2048,
    target_count: int | None = None,
    max_rounds: int = 96,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """v2 of :func:`pallas_threshold_scan_topk`: in-kernel running sorted
    top-k (no candidate buffer, no final TopK)."""
    from pixelbox_tpu.ops.packed import query_moments_from_u8
    from pixelbox_tpu.ops.scan import _cosine_block_dist
    from pixelbox_tpu.ops import topk as topk_ops

    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    assert n_pad % tile_rows == 0, (n_pad, tile_rows)
    n_tiles = n_pad // tile_rows
    k_lanes = max(128, -(-k // 128) * 128)

    md = jnp.asarray(max_distance, dtype=jnp.float32)
    q_i8, q_sum, q_mag2 = query_moments_from_u8(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]
    q_pad = max(32, -(-qn // 32) * 32)
    q_i8_p = (
        jnp.pad(q_i8, ((0, q_pad - qn), (0, 0))) if q_pad != qn else q_i8
    )

    s = sample.data.shape[0]
    tc = target_count if target_count is not None else max(16 * k // 5, 256)  # ~3.2k: proof stays 1.0, fewer rounds
    j = min(s, max(1, -(-tc * s // n_pad)))
    if s % tile_rows == 0:
        # Fused θ estimate (only HBM traffic = the sample; the XLA
        # formulation below materializes [Q, S] intermediates).
        meta2 = jnp.stack(
            [sample.row_sum, jnp.where(sample.valid, sample.row_mag2, 0)]
        ).astype(jnp.int32)
        theta_j = _pallas_sample_theta(
            "cosine", q_i8_p, sample.data, meta2, md, j,
            dim=d, tile_rows=tile_rows,
        )[:qn]
    else:
        s_dist = _cosine_block_dist(
            q_i8, q_sum, q_mag2_f, sample.data, sample.row_sum,
            sample.row_mag2, sample.valid, md, d,
        )
        s_top, _ = topk_ops.block_topk(
            s_dist, jnp.zeros(s_dist.shape, jnp.int32), j
        )
        theta_j = s_top[:, j - 1 : j]
    theta = jnp.minimum(theta_j, md)
    unbound = ~(theta_j < md)[:, 0]
    theta_p = (
        jnp.pad(theta, ((0, q_pad - qn), (0, 0)), constant_values=-jnp.inf)
        if q_pad != qn
        else theta
    )

    kernel = partial(
        _threshold_insert_kernel,
        tile_rows=tile_rows, k_lanes=k_lanes, dim=d, max_rounds=max_rounds,
        kind="cosine",
    )
    best_d, best_i, counts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k_lanes), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_lanes), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, 128), jnp.int32),
        ),
    )(theta_p, q_i8_p, index.data, row_meta)

    best_d = best_d[:qn, :k]
    best_i = best_i[:qn, :k]
    flag = counts[:qn, 0]  # 0 = clean, very negative = poisoned
    keep = jnp.isfinite(best_d)
    best_i = jnp.where(keep, best_i, -1)
    # kth finite ⟺ ≥ k rows passed θ (see _threshold_insert_kernel).
    exact = (jnp.isfinite(best_d[:, k - 1]) | unbound) & (flag >= 0)
    if squeeze:
        return best_d[0], best_i[0], exact[0]
    return best_d, best_i, exact


def _hamming_sample_theta(
    q_pm, q_pm_p, sample_data, sample_valid, md, j, *,
    bits, tile_rows, wrap_u8, qn,
):
    """θ_j for the hamming wrappers: fused kernel when the sample is
    tile-divisible, XLA GEMM + block TopK otherwise."""
    s = sample_data.shape[0]
    if s % tile_rows == 0:
        meta2 = jnp.stack(
            [sample_valid.astype(jnp.int32), jnp.zeros(s, jnp.int32)]
        )
        return _pallas_sample_theta(
            "hamming", q_pm_p, sample_data, meta2, md, j,
            dim=bits, tile_rows=tile_rows, wrap_u8=wrap_u8,
        )[:qn]
    s_dot = lax.dot_general(
        q_pm, sample_data,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s_bits = (jnp.int32(bits) - s_dot) >> 1
    if wrap_u8:
        s_bits = s_bits % 256
    s_dist = s_bits.astype(jnp.float32) * jnp.float32(1.0 / bits)
    s_dist = jnp.where(sample_valid[None, :] & (s_dist < md), s_dist, jnp.inf)
    s_top, _ = topk_ops.block_topk(
        s_dist, jnp.zeros(s_dist.shape, jnp.int32), j
    )
    return s_top[:, j - 1 : j]


def build_hamming_meta(gemm_index) -> jnp.ndarray:
    """[2, N] int32 meta for the hamming threshold kernel: row 0 =
    validity, row 1 unused (same block shape as the cosine meta)."""
    valid = gemm_index.valid.astype(jnp.int32)
    return jnp.stack([valid, jnp.zeros_like(valid)], axis=0)


@partial(
    jax.jit,
    static_argnames=(
        "k", "cap", "tile_rows", "target_count", "max_rounds", "wrap_u8",
    ),
)
def pallas_hamming_threshold_scan_topk(
    query_u8: jnp.ndarray,
    gemm_index,                   # ops.hamming_gemm.PackedHammingGemmIndex
    meta: jnp.ndarray,            # build_hamming_meta
    sample_data: jnp.ndarray,     # int8 [S, bits] strided ±1 subsample
    sample_valid: jnp.ndarray,    # bool [S]
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    cap: int = 1024,
    tile_rows: int = 2048,
    target_count: int | None = None,
    max_rounds: int = 64,
    wrap_u8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hamming twin of :func:`pallas_threshold_scan_topk` over the ±1
    bit-unpacked index (ops/hamming_gemm.py).  Returns (dist, idx, exact)
    with ``ops.scan.hamming_scan_topk`` result semantics."""
    from pixelbox_tpu.ops import topk as topk_ops

    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, h = query_u8.shape
    bits = 8 * h
    assert gemm_index.bits == bits, (gemm_index.bits, bits)
    n_pad = gemm_index.capacity
    assert n_pad % tile_rows == 0, (n_pad, tile_rows)
    n_tiles = n_pad // tile_rows

    qb = jnp.unpackbits(query_u8, axis=-1, bitorder="little")
    q_pm = (qb.astype(jnp.int8) * 2 - 1).astype(jnp.int8)
    md = jnp.asarray(max_distance, dtype=jnp.float32)
    q_pad = max(32, -(-qn // 32) * 32)
    q_pm_p = (
        jnp.pad(q_pm, ((0, q_pad - qn), (0, 0))) if q_pad != qn else q_pm
    )

    # θ from the sample (fused kernel when tile-divisible).
    s = sample_data.shape[0]
    tc = target_count if target_count is not None else max(4 * k, 256)
    j = min(s, max(1, -(-tc * s // n_pad)))
    theta_j = _hamming_sample_theta(
        q_pm, q_pm_p, sample_data, sample_valid, md, j,
        bits=bits, tile_rows=tile_rows, wrap_u8=wrap_u8, qn=qn,
    )
    theta = jnp.minimum(theta_j, md)
    unbound = ~(theta_j < md)[:, 0]
    theta_p = (
        jnp.pad(theta, ((0, q_pad - qn), (0, 0)), constant_values=-jnp.inf)
        if q_pad != qn
        else theta
    )

    kernel = partial(
        _threshold_extract_kernel,
        tile_rows=tile_rows, cap=cap, dim=bits, max_rounds=max_rounds,
        kind="hamming", wrap_u8=wrap_u8,
    )
    cand_d, cand_i, counts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, bits), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, bits), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, cap), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, cap), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, 128), jnp.int32),
        ),
    )(theta_p, q_pm_p, gemm_index.data, meta)

    cand_d = cand_d[:qn]
    cand_i = cand_i[:qn]
    count = counts[:qn, 0]
    collected = counts[:qn, 1]
    best_d, best_i = topk_ops.block_topk(cand_d, cand_i, k)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    exact = (collected == count) & ((count >= k) | unbound)
    if squeeze:
        return best_d[0], best_i[0], exact[0]
    return best_d, best_i, exact


@partial(
    jax.jit,
    static_argnames=(
        "k", "tile_rows", "target_count", "max_rounds", "wrap_u8",
    ),
)
def pallas_hamming_threshold_scan_topk_v2(
    query_u8: jnp.ndarray,
    gemm_index,
    meta: jnp.ndarray,
    sample_data: jnp.ndarray,
    sample_valid: jnp.ndarray,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    tile_rows: int = 2048,
    target_count: int | None = None,
    max_rounds: int = 96,
    wrap_u8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hamming twin of :func:`pallas_threshold_scan_topk_v2` (in-kernel
    running sorted top-k over the ±1 bit-unpacked index)."""
    from pixelbox_tpu.ops import topk as topk_ops

    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, h = query_u8.shape
    bits = 8 * h
    assert gemm_index.bits == bits, (gemm_index.bits, bits)
    n_pad = gemm_index.capacity
    assert n_pad % tile_rows == 0, (n_pad, tile_rows)
    n_tiles = n_pad // tile_rows
    k_lanes = max(128, -(-k // 128) * 128)

    qb = jnp.unpackbits(query_u8, axis=-1, bitorder="little")
    q_pm = (qb.astype(jnp.int8) * 2 - 1).astype(jnp.int8)
    md = jnp.asarray(max_distance, dtype=jnp.float32)
    q_pad = max(32, -(-qn // 32) * 32)
    q_pm_p = (
        jnp.pad(q_pm, ((0, q_pad - qn), (0, 0))) if q_pad != qn else q_pm
    )

    s = sample_data.shape[0]
    tc = target_count if target_count is not None else max(16 * k // 5, 256)  # ~3.2k: proof stays 1.0, fewer rounds
    j = min(s, max(1, -(-tc * s // n_pad)))
    theta_j = _hamming_sample_theta(
        q_pm, q_pm_p, sample_data, sample_valid, md, j,
        bits=bits, tile_rows=tile_rows, wrap_u8=wrap_u8, qn=qn,
    )
    theta = jnp.minimum(theta_j, md)
    unbound = ~(theta_j < md)[:, 0]
    theta_p = (
        jnp.pad(theta, ((0, q_pad - qn), (0, 0)), constant_values=-jnp.inf)
        if q_pad != qn
        else theta
    )

    kernel = partial(
        _threshold_insert_kernel,
        tile_rows=tile_rows, k_lanes=k_lanes, dim=bits, max_rounds=max_rounds,
        kind="hamming", wrap_u8=wrap_u8,
    )
    best_d, best_i, counts = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, bits), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, bits), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k_lanes), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_lanes), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, 128), jnp.int32),
        ),
    )(theta_p, q_pm_p, gemm_index.data, meta)

    best_d = best_d[:qn, :k]
    best_i = best_i[:qn, :k]
    flag = counts[:qn, 0]  # 0 = clean, very negative = poisoned
    keep = jnp.isfinite(best_d)
    best_i = jnp.where(keep, best_i, -1)
    # kth finite ⟺ ≥ k rows passed θ (see _threshold_insert_kernel).
    exact = (jnp.isfinite(best_d[:, k - 1]) | unbound) & (flag >= 0)
    if squeeze:
        return best_d[0], best_i[0], exact[0]
    return best_d, best_i, exact


@partial(jax.jit, static_argnames=("k", "tile_rows"))
def pallas_cosine_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    row_meta: jnp.ndarray,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    tile_rows: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-scan top-k.  Returns (dist [Q, k] f32, idx [Q, k] i32), same
    result semantics as ``ops.scan.cosine_scan_topk``.

    ``row_meta`` comes from :func:`build_row_meta` (cache it alongside the
    index).  Best for small Q (interactive queries); the carry holds
    ceil(k/128)*128 lanes, so k up to a few hundred is fine.
    """
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    assert n_pad % tile_rows == 0, (n_pad, tile_rows)
    n_tiles = n_pad // tile_rows
    k_lanes = max(128, -(-k // 128) * 128)

    # Pad queries to the f32 sublane minimum.
    q_pad = max(8, -(-qn // 8) * 8)
    if q_pad != qn:
        query_u8 = jnp.pad(query_u8, ((0, q_pad - qn), (0, 0)))
    q_i8 = (query_u8.astype(jnp.int32) - 128).astype(jnp.int8)

    md = jnp.asarray(max_distance, jnp.float32).reshape(1, 1)

    kernel = partial(
        _fused_scan_kernel, tile_rows=tile_rows, k_lanes=k_lanes, dim=d
    )
    best_d, best_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k_lanes), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_lanes), jnp.int32),
        ),
    )(md, q_i8, index.data, row_meta)

    best_d = best_d[:qn, :k]
    best_i = best_i[:qn, :k]
    keep = jnp.isfinite(best_d)
    best_i = jnp.where(keep, best_i, -1)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i
