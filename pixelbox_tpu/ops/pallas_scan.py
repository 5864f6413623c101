"""Pallas TPU kernels: fused threshold scans with guaranteed-exact top-k.

The XLA path (``ops.scan``) computes per-block distances with the MXU and
selects with XLA TopK per block.  The kernels here fuse the entire scan —
int8 GEMM, distance epilogue, threshold filter, and selection — into ONE
pass over the index: distances never leave VMEM, and the only HBM traffic
is the packed index plus 16 meta bytes per row.

ONE kernel body (`_threshold_kernel`) serves every distance kind and both
selection modes:

  kind = "cosine"   u8 codes, reciprocal-cosine epilogue (engine.rs:572-588)
  kind = "cosine4"  packed int4 codes, same metric on the 17·v4 grid
  kind = "hamming"  ±1 bit-unpacked rows, dot(±1,±1) = bits − 2·hamming

  select = "carry"  in-kernel running SORTED top-k (Q ≤ ~512: the [Q, tile]
                    loop carry must fit VMEM) — no final TopK needed
  select = "buffer" per-query append buffer + exact passing counts (large
                    Q), final top-k on the tiny candidate list

Epilogue (canonical spec v2, ops/distances.py): per-row ``rsqrt_spec(mag2)``
is PRECOMPUTED into the cached row meta, so the per-element work is two
multiplies plus the single ``1/max(cos, 1e-6)`` divide that defines the
distance's tie plateaus — no sqrt in the hot loop.

Selection: TopK/sort primitives don't exist in Mosaic, so passing rows are
merged by threshold-gated extract-min + vectorized sorted insertion.  A
per-query filter bound of ``min(θ, current k-th best)`` (carry mode) keeps
the expected extraction rounds per tile near the number of rows that can
still enter the top-k — a handful per 2048-row tile at production shapes.
Dropping rows ≥ the running k-th is exact: the k-th only decreases, and
at equal distance the dropped row's id is larger than every kept tie
(insertion order is ascending (tile, column), i.e. ascending row id), so
it loses the oracle tie-break anyway.

Exactness is PROVEN per query, not assumed (see each wrapper's docstring);
unproven queries are re-scanned exactly by the auto wrappers
(ops/scan.py:repair_unproven).  Result semantics replicate
``WHERE dist < max_distance ORDER BY dist ASC LIMIT k`` with ties by
ascending row id (reference src/engine.rs:375-383).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelbox_tpu.ops import topk as topk_ops
from pixelbox_tpu.ops.distances import rsqrt_spec
from pixelbox_tpu.ops.packed import PackedSemanticIndex

# numpy scalars (NOT jnp arrays — pallas kernels may not close over
# traced constants).
_INF = np.float32(np.inf)
_COSINE_FLOOR = np.float32(1e-6)

#: Carry-select extraction loop implementation: "lanemin" (per-lane-class
#: summary rounds — no full-tile passes per round) or "scan" (legacy
#: masked full-tile extract-min).  Env override for A/B measurement.
_LOOP_IMPL = os.environ.get("PIXELBOX_SCAN_LOOP", "lanemin")

#: Carry-select hot-tile epilogue: "dist" (default: full in-tile spec
#: epilogue) or "cos" (select on the -cos key; exact spec distance
#: recomputed on the candidate list).  NEGATIVE RESULT, measured on
#: v5e at Q=256/1M×128/k=100: with a FIXED tight θ the cos key cuts the
#: raw kernel 3.77 → 3.08 ms (the divide/pin/plateau epilogue is ~0.9 ms
#: of tile time), but at the production sampled θ (target ~320 rows per
#: query) interleaved A/B shows parity (4.4–4.5 ms both) — extraction
#: rounds dominate and the epilogue saving vanishes into round-loop
#: overhead.  Kept behind the env knob: it is proof-safe (plateau
#: membership check) and wins when thresholds are tight.
_EPILOGUE = os.environ.get("PIXELBOX_SCAN_EPILOGUE", "dist")


# --------------------------------------------------------------------- #
# Row meta: [4, N] int32 = [row_sum, mag2 (0 = invalid), bitcast f32
# rsqrt_spec(mag2), pad].  One array so engines cache a single object and
# sharded scans shard a single axis; the f32 row rides as bits.


def _rsqrt_bits(mag2: jnp.ndarray) -> jnp.ndarray:
    rr = rsqrt_spec(mag2.astype(jnp.float32))  # inf at mag2==0 (filtered)
    return lax.bitcast_convert_type(rr, jnp.int32)


def build_row_meta(index) -> jnp.ndarray:
    """[4, N] int32 kernel meta for a semantic index (u8 or int4 layout):
    row 0 = centered row sums; row 1 = row mag2 with 0 marking invalid
    rows (real rows always have mag2 >= D > 0); row 2 = per-row
    ``rsqrt_spec(mag2)`` f32 bits (canonical spec v2 — precomputing it is
    what removes sqrt/div from the kernel epilogue); row 3 = padding."""
    mag2 = jnp.where(index.valid, index.row_mag2, 0)
    z = jnp.zeros_like(mag2)
    return jnp.stack(
        [index.row_sum, mag2, _rsqrt_bits(mag2), z], axis=0
    ).astype(jnp.int32)


def build_hamming_meta(gemm_index) -> jnp.ndarray:
    """[4, N] int32 meta for the hamming threshold kernel: row 0 =
    validity; rows 1-3 unused (same block shape as the cosine meta)."""
    valid = gemm_index.valid.astype(jnp.int32)
    z = jnp.zeros_like(valid)
    return jnp.stack([valid, z, z, z], axis=0)


# --------------------------------------------------------------------- #
# The kernel


def _kind_dist_tile(kind, q_i8, dot8, meta_ref, qmeta_ref, dim, wrap_u8,
                    epilogue="dist"):
    """Distance of one [Q, T] tile from the GEMM output + meta, canonical
    spec v2, plus the per-row validity mask.

    ``epilogue="cos"`` (cosine kinds): return the selection KEY ``-cos``
    instead of the distance.  dist is monotone non-increasing in cos, so
    ascending-key order is ascending-dist order with every tie plateau
    contiguous — top-k by key selects the same row SET as top-k by dist
    (membership at a plateau boundary is the one exception, proven away
    by the wrapper's plateau check).  This drops the per-element divide,
    the tie-plateau fix-ups, and the identical-vector pin from the hot
    tile (~2.5x fewer VPU ops/element); the wrapper recomputes the exact
    spec distance on the tiny [Q, k_lanes] candidate list.
    """
    if kind == "hamming":
        row_valid = meta_ref[0, :][None, :] > 0
        diff_bits = (jnp.int32(dim) - dot8) >> 1
        if wrap_u8:
            diff_bits = diff_bits % 256
        dist = diff_bits.astype(jnp.float32) * np.float32(1.0 / dim)
        return dist, row_valid
    q_i32 = q_i8.astype(jnp.int32)
    q_sum = jnp.sum(q_i32, axis=1, keepdims=True)              # [Q,1]
    row_sum = meta_ref[0, :][None, :]
    if kind == "cosine":
        dot_c = 4 * dot8 + 2 * (q_sum + row_sum) + jnp.int32(dim)
        qc = 2 * q_i32 + 1                                     # 2u − 255
    elif kind == "cosine4a":
        # ASYMMETRIC int4: unquantized u8 query (codes q−128, centered
        # values 2q−255) against int4 rows (34·v4 − 255):
        #   Σ(2q−255)(34v−255) = 68·dot8 + 34·row_sum4 − 510·q_sum' − 255·D
        # Same index + meta as the symmetric kind — only the affine fix
        # and the query moments differ; retrieval quality vs the u8
        # ground truth is far better (bench recall_at_10 rows).
        dot_c = (
            68 * dot8 + 34 * row_sum - 510 * q_sum - jnp.int32(255 * dim)
        )
        qc = 2 * q_i32 + 1
    else:  # cosine4 (symmetric): centered values 34·v4 − 255 both sides
        dot_c = (
            1156 * dot8
            - 8670 * (q_sum + row_sum)
            + jnp.int32(65025 * dim)
        )
        qc = 34 * q_i32 - 255
    row_mag2 = meta_ref[1, :][None, :]
    rr = pltpu.bitcast(meta_ref[2:3, :], jnp.float32)          # [1, T]
    qr = qmeta_ref[:, 1:2]                                     # [Q, 1]
    inv = qr * rr                                              # [Q, T]
    dot_f = dot_c.astype(jnp.float32)
    cos = dot_f * inv
    if epilogue == "cos":
        # Invalid rows: rr = +inf makes cos = ±inf/NaN; the validity mask
        # removes them (and NaN fails every `key < bound`).
        return -cos, row_mag2 > 0
    q_mag2_f = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
    # fl(1/g) − 1: the −1 is exact for any fl(1/g) ≥ 1, so selection on
    # dist has exactly the oracle's tie plateaus.  Invalid rows (rr=inf)
    # produce ±inf/NaN here; the caller's validity mask removes them
    # (NaN also fails every `dist < bound`).  Spec rounding guards (see
    # ops/distances.py): clamp negative rounding noise to 0, pin
    # identical vectors (C-S equality on the f32 moment copies) to
    # exactly 0.  The zero-magnitude guard is dead here: valid rows and
    # u8/int4 queries always have mag2 ≥ D > 0 (centered values are odd).
    dist = np.float32(1.0) / jnp.maximum(cos, _COSINE_FLOOR) - np.float32(1.0)
    dist = jnp.maximum(dist, np.float32(0.0))
    row_mag2_f = row_mag2.astype(jnp.float32)
    ident = (dot_f == q_mag2_f) & (q_mag2_f == row_mag2_f)
    dist = jnp.where(ident, np.float32(0.0), dist)
    return dist, row_mag2 > 0


def _threshold_kernel(
    qmeta_ref,    # VMEM [Qp, 2] f32: lane 0 = per-query strict threshold θ
                  #                  (-inf for padded queries), lane 1 = qr
    q_ref,        # VMEM [Qp, D] int8 codes (centered u8 / int4 / ±1 bits)
    data_ref,     # VMEM [T, D] int8 tile ([T, D/2] packed for cosine4)
    meta_ref,     # VMEM [4, T] int32 (build_row_meta / build_hamming_meta)
    out_d_ref,    # VMEM [Qp, K] f32: carry = sorted top-K; buffer = cands
    out_i_ref,    # VMEM [Qp, K] i32
    counts_ref,   # VMEM [Qp, 128] i32: carry → lane 0 = poison flag;
                  #   buffer → lane 0 = exact θ-passing count, lane 1 =
                  #   collected count
    *,
    tile_rows: int,
    k_lanes: int,
    dim: int,
    max_rounds: int,
    kind: str = "cosine",
    wrap_u8: bool = False,
    select: str = "carry",
    gate_lanes: int | None = None,
    epilogue: str = "dist",
):
    """The one threshold-scan kernel body (see module docstring).

    carry:  running sorted top-k_lanes with per-query filter bound
            min(θ, current k-th) — output IS the exact top-k of
            {dist < θ} when the k-th lane is finite and the round-bound
            poison flag is clean.
    buffer: append every row with dist < θ (no k-th prefilter: the
            ``collected == count`` proof needs the full θ-passing set),
            counting passing and collected rows separately.

    Tie-break correctness: extraction is (dist, column)-ascending among
    equal distances (extract-min takes the smallest column; tiles
    ascend), carry insertion goes after equal values, and the buffer
    flattens in extraction order — so equal-distance results keep
    ascending row ids exactly like the oracle.

    A max_rounds bound per tile guards pathological tie floods; hitting
    it with work pending can only LOSE candidates, so it poisons the
    affected queries (carry: flag very negative; buffer: collected <
    count) — unproven → exact repair, never silently wrong.
    """
    t = pl.program_id(0)
    qn = q_ref.shape[0]
    gl = k_lanes if gate_lanes is None else gate_lanes
    lane128 = lax.broadcasted_iota(jnp.int32, (qn, 128), 1)

    @pl.when(t == 0)
    def _init():
        out_d_ref[:] = jnp.full((qn, k_lanes), _INF, jnp.float32)
        out_i_ref[:] = jnp.full((qn, k_lanes), -1, jnp.int32)
        counts_ref[:] = jnp.zeros((qn, 128), jnp.int32)

    q_i8 = q_ref[:]
    if kind in ("cosine4", "cosine4a"):
        # Packed int4 tile [T, D/2]: two codes per byte, column-blocked.
        # Unpack in int32 — Mosaic has no 8-bit shift lowering.
        # Round-5 negative result (VERDICT r4 #9): splitting this into
        # two half-K dots (lo vs q[:, :D/2], hi vs q[:, D/2:]) avoids
        # the concat relayout and measured 2.41 → 2.16 ms per 1M-row
        # tile pass in isolation — but in the REAL kernel each dot needs
        # its own [Q, T] int32 accumulator, which blew the 16 MB scoped
        # VMEM budget by 268 KB at the production tile (compile-time
        # OOM on v5e).  The u8 rate is int4's ceiling regardless — the
        # scan is MXU-bound, not HBM-bound (PERF.md "int4").
        p32 = data_ref[:].astype(jnp.int32)
        blk = jnp.concatenate([p32 & 15, (p32 >> 4) & 15], axis=-1).astype(
            jnp.int8
        )
    else:
        blk = data_ref[:]
    dot8 = lax.dot_general(
        q_i8,
        blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                              # [Q,T]
    dist, row_valid = _kind_dist_tile(
        kind, q_i8, dot8, meta_ref, qmeta_ref, dim, wrap_u8,
        epilogue=epilogue,
    )

    theta = qmeta_ref[:, 0:1]                                      # [Q,1]
    if select == "carry":
        # Exact prefilter: rows ≥ the current k-th can never enter the
        # final top-k (k-th only decreases; equal-distance drops lose the
        # ascending-id tie-break to every kept tie, which was inserted
        # earlier).  Cuts extraction rounds to the rows that still matter.
        bound = jnp.minimum(theta, out_d_ref[:, gl - 1 : gl])
    else:
        bound = theta
    dist = jnp.where(row_valid & (dist < bound), dist, _INF)

    base = t * tile_rows
    col = lax.broadcasted_iota(jnp.int32, (qn, tile_rows), 1)
    lane = lax.broadcasted_iota(jnp.int32, (qn, k_lanes), 1)
    big_col = jnp.int32(2 ** 30)

    # NOTE(negative results, measured at Q=256 on 1M×128): three
    # structural alternatives to this masked extract-min loop were
    # implemented and benchmarked SLOWER on this chip:
    #   - column-segmented sub-loops (cheaper per-round reduces): +20%
    #     (Mosaic while_loop invocation overhead);
    #   - 4× unrolled multi-extract rounds: +16% (idle sub-extracts
    #     waste full-tile passes);
    #   - read-only dist with a carried lexicographic (m, col) cursor
    #     (no 2 MB masked-array update per round): +8% — the two extra
    #     eligibility compares per round cost more than the masked-write
    #     traffic they save.  The loop is VPU-op-bound, not carry-bound.
    if select == "buffer":
        # Exact passing count (lane 0) BEFORE extraction — independent of
        # buffer capacity / round bound.
        c = jnp.sum(jnp.isfinite(dist), axis=1, keepdims=True).astype(
            jnp.int32
        )
        counts_ref[:] = counts_ref[:] + jnp.where(lane128 == 0, c, 0)

        def extract_round(state):
            # Carried m = per-query min of the carried dist — one fresh
            # [Q, T] reduce per round (the post-mask min feeds the next
            # round and the pending check).
            dist, m, rounds, _ = state
            cursor = counts_ref[:, 1:2]                            # [Q,1]
            can = jnp.isfinite(m) & (cursor < k_lanes)
            midx = jnp.min(
                jnp.where(dist == m, col, big_col), axis=1, keepdims=True
            )
            gidx = (base + midx).astype(jnp.int32)
            write = (lane == cursor) & can
            out_d_ref[:] = jnp.where(write, m, out_d_ref[:])
            out_i_ref[:] = jnp.where(write, gidx, out_i_ref[:])
            counts_ref[:] = counts_ref[:] + jnp.where(
                (lane128 == 1) & can, 1, 0
            )
            # Mask the extracted minima only where actually collected.
            dist = jnp.where((col == midx) & can, _INF, dist)
            m = jnp.min(dist, axis=1, keepdims=True)
            pending = jnp.any(
                jnp.isfinite(m) & (counts_ref[:, 1:2] < k_lanes)
            )
            return dist, m, rounds + 1, pending

        m0 = jnp.min(dist, axis=1, keepdims=True)
        pending0 = jnp.any(jnp.isfinite(m0) & (counts_ref[:, 1:2] < k_lanes))
        lax.while_loop(
            lambda s: s[3] & (s[2] < max_rounds),
            extract_round,
            (dist, m0, jnp.int32(0), pending0),
        )
        # Rows left uncollected (buffer full / round bound) stay visible
        # as collected < count — the wrapper's exactness proof catches
        # them.
        return

    # select == "carry"
    def _sorted_insert(m, gidx, ins):
        cur_d = out_d_ref[:]
        cur_i = out_i_ref[:]
        # Insert after equal values → ascending-row-id tie-break.
        pos = jnp.sum((cur_d <= m).astype(jnp.int32), axis=1, keepdims=True)
        sh_d = pltpu.roll(cur_d, shift=1, axis=1)
        sh_i = pltpu.roll(cur_i, shift=1, axis=1)
        new_d = jnp.where(lane < pos, cur_d, jnp.where(lane == pos, m, sh_d))
        new_i = jnp.where(lane < pos, cur_i, jnp.where(lane == pos, gidx, sh_i))
        out_d_ref[:] = jnp.where(ins, new_d, cur_d)
        out_i_ref[:] = jnp.where(ins, new_i, cur_i)

    if _LOOP_IMPL == "lanemin" and tile_rows % 128 == 0:
        # Lane-class extraction: columns partition into 128 classes by
        # col % 128 (class c = lanes c of the tile's column registers).
        # A fused chain reduces the tile ONCE to per-class minima
        # (lmin/lreg/lcnt, each [Q, 128]); extraction rounds then run on
        # the 16×-smaller summary with NO full-tile passes at all.  A
        # consumed class surfaces its next element lazily via a
        # lexicographic (value, col) cursor — the current round's (m,
        # midx) — recomputed over that class only when the class held ≥2
        # passing rows (rare at production shapes).  Extraction order
        # stays exactly (dist, col)-ascending: the round minimum ties
        # break on the smallest class representative column, and within
        # a class the cursor walks (value, col) upward.
        # Depth-2 chain: per class track the TWO smallest elements (value
        # + reg each) plus the passing count.  Consumption promotes the
        # second; only a THIRD same-class element needs the cursor-refill
        # recompute — P(class holds ≥3 θ-passing rows) is tiny, so the
        # expensive per-consumption refill chain that dominated the
        # depth-1 variant (triggered whenever a consumed class held ≥2)
        # almost never fires.  Tie order stays (value, col)-ascending:
        # regs are chained in ascending order with strict compares, so
        # within a class the earlier column wins each slot.
        n_regs = tile_rows // 128
        lmin = jnp.full((qn, 128), _INF, jnp.float32)
        lreg = jnp.zeros((qn, 128), jnp.int32)
        l2min = jnp.full((qn, 128), _INF, jnp.float32)
        l2reg = jnp.zeros((qn, 128), jnp.int32)
        lcnt = jnp.zeros((qn, 128), jnp.int32)
        for r in range(n_regs):
            v = dist[:, r * 128 : (r + 1) * 128]
            lcnt = lcnt + (v < _INF).astype(jnp.int32)
            upd1 = v < lmin
            d_val = jnp.where(upd1, lmin, v)   # displaced min OR v itself
            d_reg = jnp.where(upd1, lreg, r)
            lmin = jnp.where(upd1, v, lmin)
            lreg = jnp.where(upd1, r, lreg)
            upd2 = d_val < l2min
            l2min = jnp.where(upd2, d_val, l2min)
            l2reg = jnp.where(upd2, d_reg, l2reg)

        def insert_round(state):
            lmin, lreg, l2min, l2reg, lcnt, m, rounds, _ = state
            kth = out_d_ref[:, gl - 1 : gl]
            ins = m < kth
            colv = jnp.where(
                lmin == m, lreg * 128 + lane128, big_col
            )                                                  # [Q,128]
            midx = jnp.min(colv, axis=1, keepdims=True)        # [Q,1]
            gidx = (base + midx).astype(jnp.int32)
            _sorted_insert(m, gidx, ins)
            used = (colv == midx) & ins                        # one lane
            lcnt = lcnt - used.astype(jnp.int32)
            # ≥2 remaining after this consumption ⟹ a third element
            # exists beyond the promoted second — recompute the slot.
            need = used & (lcnt >= 2)
            # The promoted element's (value, col) = the refill cursor.
            pval = jnp.sum(jnp.where(used, l2min, 0.0), axis=1, keepdims=True)
            pcol = jnp.sum(
                jnp.where(used, l2reg * 128 + lane128, 0), axis=1,
                keepdims=True,
            )
            lmin = jnp.where(used, l2min, lmin)
            lreg = jnp.where(used, l2reg, lreg)
            l2min = jnp.where(used, _INF, l2min)

            def with_refill(ops):
                l2min_, l2reg_ = ops
                nmin = jnp.full((qn, 128), _INF, jnp.float32)
                nreg = jnp.zeros((qn, 128), jnp.int32)
                for r in range(n_regs):
                    v = dist[:, r * 128 : (r + 1) * 128]
                    colr = r * 128 + lane128
                    after = (v > pval) | ((v == pval) & (colr > pcol))
                    v2 = jnp.where(after, v, _INF)
                    upd = v2 < nmin
                    nmin = jnp.where(upd, v2, nmin)
                    nreg = jnp.where(upd, r, nreg)
                return (
                    jnp.where(need, nmin, l2min_),
                    jnp.where(need, nreg, l2reg_),
                )

            l2min, l2reg = lax.cond(
                jnp.any(need), with_refill, lambda ops: ops, (l2min, l2reg)
            )
            m2 = jnp.min(lmin, axis=1, keepdims=True)
            more = jnp.any(m2 < out_d_ref[:, gl - 1 : gl])
            return lmin, lreg, l2min, l2reg, lcnt, m2, rounds + 1, more

        m0 = jnp.min(lmin, axis=1, keepdims=True)
        init_more = jnp.any(m0 < out_d_ref[:, gl - 1 : gl])
        _, _, _, _, _, m_last, rounds, more = lax.while_loop(
            lambda s: s[7] & (s[6] < max_rounds),
            lambda s: insert_round(s),
            (lmin, lreg, l2min, l2reg, lcnt, m0, jnp.int32(0), init_more),
        )
    else:
        def insert_round(state):
            dist, m, rounds, _ = state
            kth = out_d_ref[:, gl - 1 : gl]
            ins = m < kth
            midx = jnp.min(
                jnp.where(dist == m, col, big_col), axis=1, keepdims=True
            )
            gidx = (base + midx).astype(jnp.int32)
            _sorted_insert(m, gidx, ins)
            dist = jnp.where(col == midx, _INF, dist)
            m = jnp.min(dist, axis=1, keepdims=True)               # [Q,1]
            more = jnp.any(m < out_d_ref[:, gl - 1 : gl])
            return dist, m, rounds + 1, more

        m0 = jnp.min(dist, axis=1, keepdims=True)
        init_more = jnp.any(m0 < out_d_ref[:, gl - 1 : gl])
        dist, m_last, rounds, more = lax.while_loop(
            lambda s: s[3] & (s[2] < max_rounds),
            insert_round,
            (dist, m0, jnp.int32(0), init_more),
        )
    # Diagnostic: lane 2 accumulates total extraction rounds across tiles
    # (scripts/measure_breakdown.py reads it; one masked add per tile).
    counts_ref[:] = counts_ref[:] + jnp.where(lane128 == 2, rounds, 0)

    @pl.when(more)
    def _poison():
        # Round bound hit with insertions pending: results for queries
        # with pending rows may be incomplete — poison their flag so the
        # wrapper proves them unexact and repairs.
        pending = m_last < out_d_ref[:, gl - 1 : gl]
        counts_ref[:] = jnp.where(
            pending & (lane128 == 0), jnp.int32(-(2 ** 30)), counts_ref[:]
        )


def _call_threshold_kernel(
    qmeta, q_codes, data, meta, *, tile_rows, k_lanes, dim, max_rounds,
    kind, wrap_u8, select, gate_lanes=None, epilogue="dist",
):
    """pallas_call plumbing shared by every wrapper (padded shapes in)."""
    qn = q_codes.shape[0]
    n_tiles = data.shape[0] // tile_rows
    data_cols = data.shape[1]
    kernel = partial(
        _threshold_kernel,
        tile_rows=tile_rows, k_lanes=k_lanes, dim=dim,
        max_rounds=max_rounds, kind=kind, wrap_u8=wrap_u8, select=select,
        gate_lanes=gate_lanes, epilogue=epilogue,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((qn, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (qn, q_codes.shape[1]), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_rows, data_cols), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
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
    )(qmeta, q_codes, data, meta)


# --------------------------------------------------------------------- #
# θ estimation (two stages)


def _xla_kind_dist(kind, q_p, data, meta4, md, dim, wrap_u8):
    """[Qp, S] distances in XLA with the same canonical-spec epilogue as
    the kernels (mini-subsample helper for the two-stage θ)."""
    from pixelbox_tpu.ops.distances import _cosine_distance_from_moments

    if kind in ("cosine4", "cosine4a"):
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
        row_valid = meta4[0, :][None, :]
        diff_bits = (jnp.int32(dim) - dot) >> 1
        if wrap_u8:
            diff_bits = diff_bits % 256
        dist = diff_bits.astype(jnp.float32) * np.float32(1.0 / dim)
        return jnp.where((row_valid > 0) & (dist < md), dist, jnp.inf)
    q_i32 = q_p.astype(jnp.int32)
    q_sum = jnp.sum(q_i32, axis=1, keepdims=True)
    if kind == "cosine":
        qc = 2 * q_i32 + 1
        dot_c = 4 * dot + 2 * (q_sum + meta4[0, :][None, :]) + jnp.int32(dim)
    elif kind == "cosine4a":
        qc = 2 * q_i32 + 1
        dot_c = (
            68 * dot + 34 * meta4[0, :][None, :] - 510 * q_sum
            - jnp.int32(255 * dim)
        )
    else:  # cosine4
        qc = 34 * q_i32 - 255
        dot_c = (
            1156 * dot
            - 8670 * (q_sum + meta4[0, :][None, :])
            + jnp.int32(65025 * dim)
        )
    q_mag2 = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
    row_mag2 = meta4[1, :][None, :]
    dist = _cosine_distance_from_moments(
        dot_c.astype(jnp.float32), q_mag2, row_mag2.astype(jnp.float32)
    )
    return jnp.where((row_mag2 > 0) & (dist < md), dist, jnp.inf)


def _pallas_sample_theta(
    kind: str,
    q_p: jnp.ndarray,          # padded query codes [Qp, D] int8
    qr_p: jnp.ndarray,         # padded per-query rsqrt [Qp, 1] f32
    sample_data: jnp.ndarray,  # [S, D] ([S, D/2] packed for cosine4)
    meta4: jnp.ndarray,        # [4, S] int32 (same layout as the main meta)
    md: jnp.ndarray,           # f32 scalar max_distance
    j: int,
    *,
    dim: int,
    tile_rows: int,
    wrap_u8: bool = False,
):
    """Per-query j-th smallest sample distance — the θ estimate for the
    threshold wrappers — in two stages:

    1. θ0 from a 1/16 mini-subsample via plain XLA, sized to hold ~4j
       sample rows with an absolute floor of 8 mini rows (the [Qp, S0]
       intermediates are tiny; a smaller θ0 rank makes the fallback path
       measurably lossy — at rank 3 the fallback θ0's population count
       dips below k for ~1% of queries, measured proof rate 0.984);
    2. the θ0-filtered carry kernel over the FULL sample extracts the
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
    s = sample_data.shape[0]
    assert s % tile_rows == 0, (s, tile_rows)

    # ---- stage 1: θ0 (XLA, mini-subsample)
    stride = 16
    while stride > 1 and (s // stride < 1024 or s % stride != 0):
        stride //= 2
    mini = sample_data[::stride]
    mmeta = meta4[:, ::stride]
    s0 = mini.shape[0]
    j0 = min(s0, max(8, -(-4 * j * s0 // s)))
    dist0 = _xla_kind_dist(kind, q_p, mini, mmeta, md, dim, wrap_u8)
    t0, _ = topk_ops.block_topk(dist0, jnp.zeros(dist0.shape, jnp.int32), j0)
    theta0 = jnp.minimum(t0[:, j0 - 1 : j0], md)   # [Qp, 1]; INF → md

    # ---- stage 2: exact top-j of {dist < θ0} over the full sample.
    # Round bound scaled to the expected per-tile θ0-passing rows (≈4j
    # spread over s/tile_rows tiles — tiny at production shapes, but a
    # small index with few tiles concentrates them).
    max_rounds = max(96, 4 * j * tile_rows // s + 64)
    k_lanes = max(128, -(-j // 128) * 128)
    qmeta = jnp.concatenate([theta0, qr_p], axis=1)
    # Gate at lane j-1 (not the padded carry tail): rows ≥ the running
    # j-th can never be the sample j-th, so extraction rounds track the
    # top-j work, not top-k_lanes.
    best_d, _, counts = _call_threshold_kernel(
        qmeta, q_p, sample_data, meta4,
        tile_rows=tile_rows, k_lanes=k_lanes, dim=dim,
        max_rounds=max_rounds, kind=kind, wrap_u8=wrap_u8, select="carry",
        gate_lanes=j,
    )
    jth = best_d[:, j - 1 : j]
    ok = jnp.isfinite(jth) & (counts[:, 0:1] >= 0)
    return jnp.where(ok, jth, theta0)


# --------------------------------------------------------------------- #
# Per-kind query prep + the generic wrapper


def _prep_cosine(query_u8):
    from pixelbox_tpu.ops.packed import query_moments_from_u8

    q_i8, q_sum, q_mag2 = query_moments_from_u8(query_u8)
    qr = rsqrt_spec(q_mag2.astype(jnp.float32))[:, None]
    return q_i8, qr


def _prep_cosine4(query_u8):
    from pixelbox_tpu.ops.int4 import query4_moments_from_u8

    q_i8, q_sum, q_mag2 = query4_moments_from_u8(query_u8)
    qr = rsqrt_spec(q_mag2.astype(jnp.float32))[:, None]
    return q_i8, qr


def _prep_hamming(query_u8):
    qb = jnp.unpackbits(query_u8, axis=-1, bitorder="little")
    q_pm = (qb.astype(jnp.int8) * 2 - 1).astype(jnp.int8)
    return q_pm, jnp.zeros((q_pm.shape[0], 1), jnp.float32)


def _pad_rows(x, qn, q_pad, value=0.0):
    if q_pad == qn:
        return x
    return jnp.pad(x, ((0, q_pad - qn), (0, 0)), constant_values=value)


#: Distance value every cos ≤ _COSINE_FLOOR saturates to (spec v2): for
#: θ at/above it the cos-key threshold must admit EVERY valid row.
_DIST_SATURATION = np.float32(1.0) / _COSINE_FLOOR - np.float32(1.0)


def _cos_key_threshold(theta: jnp.ndarray) -> jnp.ndarray:
    """Map a strict distance threshold θ to a conservative key threshold
    for the ``epilogue="cos"`` kernel (key = -cos).

    dist < θ  ⟺  cos > 1/(1+θ) up to a few ulps of spec rounding; the
    1e-5 relative margin makes the key filter STRICTLY wider (false
    positives only — the wrapper's exact post-pass re-applies the true
    θ), so no θ-passing row is ever dropped.  θ at/above the cos-floor
    saturation admits every valid row (their spec dist is the saturated
    value, which IS < θ)."""
    c = (np.float32(1.0) / (np.float32(1.0) + theta)) * np.float32(1 - 1e-5)
    return jnp.where(theta >= _DIST_SATURATION, jnp.inf, -c)


def _exact_dist_gathered(kind, q_codes, q_sum, q_mag2, qr, rows_i8,
                         row_sum, row_mag2, rr, dim):
    """Canonical spec-v2 distance for gathered candidate rows — the XLA
    twin of :func:`_kind_dist_tile`'s dist epilogue, op for op, so the
    recomputed values are bit-identical to the dist-domain kernel (and
    the oracle): affine integer dot fix, rsqrt product, divide with the
    cos floor, negative clamp, identical-vector pin.

    Shapes: q_codes [Q, D] int8, rows_i8 [Q, G, D] int8 (unpacked codes),
    q_sum/q_mag2 [Q] int32, qr [Q, 1] f32, row_* [Q, G] int32/f32.
    """
    dot8 = jnp.einsum(
        "qd,qgd->qg", q_codes.astype(jnp.int32), rows_i8.astype(jnp.int32)
    )
    qs = q_sum[:, None]
    if kind == "cosine":
        dot_c = 4 * dot8 + 2 * (qs + row_sum) + jnp.int32(dim)
    elif kind == "cosine4a":
        dot_c = 68 * dot8 + 34 * row_sum - 510 * qs - jnp.int32(255 * dim)
    else:  # cosine4
        dot_c = (
            1156 * dot8 - 8670 * (qs + row_sum) + jnp.int32(65025 * dim)
        )
    inv = qr * rr                                               # [Q, G]
    dot_f = dot_c.astype(jnp.float32)
    cos = dot_f * inv
    dist = np.float32(1.0) / jnp.maximum(cos, _COSINE_FLOOR) - np.float32(1.0)
    dist = jnp.maximum(dist, np.float32(0.0))
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]
    row_mag2_f = row_mag2.astype(jnp.float32)
    ident = (dot_f == q_mag2_f) & (q_mag2_f == row_mag2_f)
    return jnp.where(ident, np.float32(0.0), dist)


def _coskey_candidate_postpass(
    kind, query_u8, q_codes, qr, out_i, theta, data, meta, k, dim,
):
    """Exact finish for a carry scan that selected by cos key: gather the
    [Q, G] candidates' codes + meta, recompute the spec distance, apply
    the strict θ, and sort by (dist, row id) — the oracle order.  Returns
    (dist [Q,k], idx [Q,k], plateau_ok [Q]).

    ``plateau_ok`` is the membership proof the key-domain selection
    needs: top-G-by-key and top-G-by-dist are the same row SET except
    when a tie plateau straddles the G-th lane (keys within a plateau
    order by cos, not row id).  If the k-th and G-th exact distances
    differ (or the carry never filled), every plateau through the k-th
    is fully collected and the sorted prefix is exactly the oracle's
    top-k; otherwise the query is unproven and repairs."""
    qn, gl = out_i.shape
    from pixelbox_tpu.ops.int4 import query4_moments_from_u8
    from pixelbox_tpu.ops.packed import query_moments_from_u8

    if kind == "cosine4":
        _, q_sum, q_mag2 = query4_moments_from_u8(query_u8)
    else:
        _, q_sum, q_mag2 = query_moments_from_u8(query_u8)

    safe = jnp.maximum(out_i, 0)
    rows = data[safe]                                    # [Q, G, cols] i8
    if kind in ("cosine4", "cosine4a"):
        p32 = rows.astype(jnp.int32)
        rows = jnp.concatenate(
            [p32 & 15, (p32 >> 4) & 15], axis=-1
        ).astype(jnp.int8)
    row_sum = meta[0][safe]                              # [Q, G] i32
    row_mag2 = meta[1][safe]
    rr = lax.bitcast_convert_type(meta[2], jnp.float32)[safe]
    dist = _exact_dist_gathered(
        kind, q_codes[:qn], q_sum, q_mag2, qr[:qn], rows, row_sum,
        row_mag2, rr, dim,
    )
    keep = (out_i >= 0) & (dist < theta)                 # strict θ
    dist = jnp.where(keep, dist, _INF)
    ids = jnp.where(keep, out_i, jnp.int32(2 ** 30))
    dist, ids = lax.sort((dist, ids), num_keys=2)
    plateau_ok = ~jnp.isfinite(dist[:, gl - 1]) | (
        dist[:, k - 1] < dist[:, gl - 1]
    )
    best_d = dist[:, :k]
    best_i = jnp.where(jnp.isfinite(best_d), ids[:, :k], -1)
    return best_d, best_i, plateau_ok


def _generic_threshold_scan(
    kind: str,
    select: str,
    query_u8: jnp.ndarray,
    data: jnp.ndarray,         # packed index data [N_pad, cols]
    meta: jnp.ndarray,         # [4, N_pad]
    sample_data: jnp.ndarray,  # [S, cols]
    sample_meta: jnp.ndarray,  # [4, S]
    n_pad: int,
    dim: int,
    k: int,
    max_distance,
    tile_rows: int,
    target_count,
    max_rounds: int,
    cap: int,
    wrap_u8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared guaranteed-verifiable threshold scan (all kinds/selects).

    Returns (dist [Q,k], idx [Q,k], exact [Q]).  ``exact[q]`` True ⟺ the
    result provably equals the exact scan:

      carry : the k-th carry lane is finite (⟺ ≥ k rows passed θ, and
              only θ-passing rows that beat the running k-th are ever
              dropped — exactly the rows the oracle also excludes) OR θ
              never bound below max_distance (the carry IS the full
              WHERE-clause result); round-bound poison flag clean.
      buffer: collected == exact passing count (nothing missed: buffer
              never filled, round bound never hit) AND count ≥ k or θ
              unbound.
    """
    prep = {
        "cosine": _prep_cosine,
        "cosine4": _prep_cosine4,
        "cosine4a": _prep_cosine,  # asymmetric: u8 query codes/moments
        "hamming": _prep_hamming,
    }[kind]
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn = query_u8.shape[0]
    assert n_pad % tile_rows == 0, (n_pad, tile_rows)

    md = jnp.asarray(max_distance, dtype=jnp.float32)
    q_codes, qr = prep(query_u8)
    q_pad = max(32, -(-qn // 32) * 32)
    q_codes_p = _pad_rows(q_codes, qn, q_pad)
    qr_p = _pad_rows(qr, qn, q_pad)

    # θ from the strided sample (fused kernel when tile-divisible).
    s = sample_data.shape[0]
    if target_count is None:
        # ~3.2k passing rows: proof stays 1.0 on measured data, fewer
        # extraction rounds than the original 4k sizing.
        target_count = max(16 * k // 5, 256)
    j = min(s, max(1, -(-target_count * s // n_pad)))
    if s % tile_rows == 0:
        theta_j = _pallas_sample_theta(
            kind, q_codes_p, qr_p, sample_data, sample_meta, md, j,
            dim=dim, tile_rows=tile_rows, wrap_u8=wrap_u8,
        )[:qn]
    else:
        s_dist = _xla_kind_dist(
            kind, q_codes, sample_data, sample_meta, md, dim, wrap_u8
        )
        s_top, _ = topk_ops.block_topk(
            s_dist, jnp.zeros(s_dist.shape, jnp.int32), j
        )
        theta_j = s_top[:, j - 1 : j]
    theta = jnp.minimum(theta_j, md)
    unbound = ~(theta_j < md)[:, 0]
    # cos-key epilogue (carry + cosine kinds): selection runs on -cos
    # (monotone in dist, plateaus contiguous) so the hot tile skips the
    # divide/pin/plateau epilogue entirely; the exact spec distance is
    # recomputed on the [Q, k_lanes] candidates below.  A/B via
    # PIXELBOX_SCAN_EPILOGUE=dist.
    cos_key = (
        select == "carry" and kind != "hamming" and _EPILOGUE == "cos"
    )
    if cos_key:
        theta_p = _pad_rows(
            _cos_key_threshold(theta), qn, q_pad, value=-jnp.inf
        )
    else:
        theta_p = _pad_rows(theta, qn, q_pad, value=-jnp.inf)
    qmeta = jnp.concatenate([theta_p, qr_p], axis=1)

    k_lanes = (
        max(128, -(-k // 128) * 128) if select == "carry" else cap
    )
    if cos_key and k == k_lanes:
        # The plateau membership proof needs ≥1 slack lane past k.
        k_lanes += 128
    out_d, out_i, counts = _call_threshold_kernel(
        qmeta, q_codes_p, data, meta,
        tile_rows=tile_rows, k_lanes=k_lanes, dim=dim,
        max_rounds=max_rounds, kind=kind, wrap_u8=wrap_u8, select=select,
        epilogue="cos" if cos_key else "dist",
    )

    if select == "carry" and cos_key:
        flag = counts[:qn, 0]
        kth_key_finite = jnp.isfinite(out_d[:qn, k_lanes - 1])
        best_d, best_i, plateau_ok = _coskey_candidate_postpass(
            kind, query_u8, q_codes, qr, out_i[:qn], theta, data, meta,
            k, dim,
        )
        # Proof: ≥ k survivors of the exact θ (or θ unbound with every
        # passing row collected — kth key lane infinite), round bound
        # clean, and no plateau straddling the candidate boundary.
        exact = (
            (jnp.isfinite(best_d[:, k - 1]) | unbound)
            & (flag >= 0)
            & (plateau_ok | ~kth_key_finite)
        )
    elif select == "carry":
        best_d = out_d[:qn, :k]
        best_i = out_i[:qn, :k]
        flag = counts[:qn, 0]  # 0 = clean, very negative = poisoned
        keep = jnp.isfinite(best_d)
        best_i = jnp.where(keep, best_i, -1)
        exact = (jnp.isfinite(best_d[:, k - 1]) | unbound) & (flag >= 0)
    else:
        cand_d = out_d[:qn]
        cand_i = out_i[:qn]
        count = counts[:qn, 0]
        collected = counts[:qn, 1]
        best_d, best_i = topk_ops.block_topk(cand_d, cand_i, k)
        best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
        exact = (collected == count) & ((count >= k) | unbound)
    if squeeze:
        return best_d[0], best_i[0], exact[0]
    return best_d, best_i, exact


def _sample_meta4(sample) -> jnp.ndarray:
    """ScanSample → [4, S] kernel meta (same layout as build_row_meta)."""
    mag2 = jnp.where(sample.valid, sample.row_mag2, 0)
    z = jnp.zeros_like(mag2)
    return jnp.stack(
        [sample.row_sum, mag2, _rsqrt_bits(mag2), z], axis=0
    ).astype(jnp.int32)


# --------------------------------------------------------------------- #
# Public wrappers (signatures stable across the engine / sharded / bench
# call sites; all delegate to the one kernel)


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
    """Batched guaranteed-verifiable u8 cosine threshold scan, buffer
    select (large query batches; the [Q, cap] append buffer replaces the
    [Q, tile] carry that outgrows VMEM past Q≈512).  Returns
    (dist [Q,k], idx [Q,k], exact [Q]); use via
    ``ops.scan.cosine_scan_topk_auto`` for repair of unproven queries."""
    return _generic_threshold_scan(
        "cosine", "buffer", query_u8, index.data, row_meta,
        sample.data, _sample_meta4(sample), index.capacity, index.dim,
        k, max_distance, tile_rows, target_count, max_rounds, cap,
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
    """Batched guaranteed-verifiable u8 cosine threshold scan, carry
    select (in-kernel running sorted top-k, no final TopK — the fast path
    for Q ≤ ~512)."""
    return _generic_threshold_scan(
        "cosine", "carry", query_u8, index.data, row_meta,
        sample.data, _sample_meta4(sample), index.capacity, index.dim,
        k, max_distance, tile_rows, target_count, max_rounds, 0,
    )


def _hamming_sample_meta(sample_valid) -> jnp.ndarray:
    v = sample_valid.astype(jnp.int32)
    z = jnp.zeros_like(v)
    return jnp.stack([v, z, z, z], axis=0)


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
    """Hamming threshold scan over the ±1 bit-unpacked index
    (ops/hamming_gemm.py), buffer select.  ``wrap_u8`` replicates the
    reference's u8 popcount-accumulator overflow (engine.rs:603)."""
    qn_h = query_u8.shape[-1]
    bits = 8 * qn_h
    assert gemm_index.bits == bits, (gemm_index.bits, bits)
    return _generic_threshold_scan(
        "hamming", "buffer", query_u8, gemm_index.data, meta,
        sample_data, _hamming_sample_meta(sample_valid),
        gemm_index.capacity, bits,
        k, max_distance, tile_rows, target_count, max_rounds, cap,
        wrap_u8=wrap_u8,
    )


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
    """Hamming threshold scan, carry select (the engine's auto tier)."""
    qn_h = query_u8.shape[-1]
    bits = 8 * qn_h
    assert gemm_index.bits == bits, (gemm_index.bits, bits)
    return _generic_threshold_scan(
        "hamming", "carry", query_u8, gemm_index.data, meta,
        sample_data, _hamming_sample_meta(sample_valid),
        gemm_index.capacity, bits,
        k, max_distance, tile_rows, target_count, max_rounds, 0,
        wrap_u8=wrap_u8,
    )


@partial(jax.jit, static_argnames=("k", "tile_rows"))
def pallas_cosine_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    row_meta: jnp.ndarray,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    tile_rows: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample-free fused scan (interactive path): the carry kernel with
    θ = max_distance for every query.  No proof machinery needed — the
    round bound is tile_rows, which extraction can never exceed (every
    round retires at least one column), so the result is unconditionally
    the exact top-k of ``WHERE dist < max_distance``.

    ``row_meta`` comes from :func:`build_row_meta` (cache it alongside
    the index).  Best for small Q; the carry holds ceil(k/128)*128
    lanes, so k up to a few hundred is fine.
    """
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    assert n_pad % tile_rows == 0, (n_pad, tile_rows)
    k_lanes = max(128, -(-k // 128) * 128)

    md = jnp.asarray(max_distance, jnp.float32)
    q_codes, qr = _prep_cosine(query_u8)
    q_pad = max(32, -(-qn // 32) * 32)
    q_codes_p = _pad_rows(q_codes, qn, q_pad)
    qr_p = _pad_rows(qr, qn, q_pad)
    theta_p = _pad_rows(
        jnp.broadcast_to(md, (qn, 1)), qn, q_pad, value=-jnp.inf
    )
    qmeta = jnp.concatenate([theta_p, qr_p], axis=1)

    best_d, best_i, _ = _call_threshold_kernel(
        qmeta, q_codes_p, index.data, row_meta,
        tile_rows=tile_rows, k_lanes=k_lanes, dim=d,
        max_rounds=tile_rows, kind="cosine", wrap_u8=False, select="carry",
    )
    best_d = best_d[:qn, :k]
    best_i = best_i[:qn, :k]
    keep = jnp.isfinite(best_d)
    best_i = jnp.where(keep, best_i, -1)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i
