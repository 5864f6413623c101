"""Blockwise brute-force similarity scans with streaming top-k (XLA path).

This replaces the reference's hot loop — a SQLite full-table scan calling a
Rust scalar UDF once per row (src/engine.rs:375-383, 608-622) — with a
blocked matrix scan:

    for each row block B of the packed index:
        int8 GEMM   dot8[Q, B] = q_i8 @ block_i8^T          (MXU)
        affine fix  dot_c = 4*dot8 + 2*(q_sum + row_sum) + D  (exact int32)
        epilogue    dist = 1/max(cos, 1e-6) - 1               (f32, VPU)
        merge       running top-k over blocks                 (streaming)

implemented as a ``lax.scan`` over row blocks so the distance matrix is
never materialized (N can exceed what [Q, N] f32 would allow).  XLA fuses
the epilogue into the GEMM output; the Pallas kernel in ``pallas_scan.py``
additionally fuses the top-k merge.

Result semantics replicate ``WHERE dist < max_distance ORDER BY dist ASC
LIMIT k`` (engine.rs:375-383): entries with dist >= max_distance are
excluded; missing entries have idx == -1 and dist == +inf.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pixelbox_tpu.ops.distances import (
    _cosine_distance_from_moments,
    pack_u8_words,
    popcount_u8,
    xor_popcount_bits,
)
from pixelbox_tpu.ops.packed import (
    PackedHammingIndex,
    PackedSemanticIndex,
    query_moments_from_u8,
)
from pixelbox_tpu.ops import topk as topk_ops

DEFAULT_BLOCK_ROWS = 32768


def _block_iota(base: jnp.ndarray, b: int, q: int) -> jnp.ndarray:
    """Row indices [Q, B] for a block starting at ``base``."""
    return base + jax.lax.broadcasted_iota(jnp.int32, (q, b), dimension=1)


def _cosine_block_dist(
    q_i8, q_sum, q_mag2_f, blk, blk_sum, blk_mag2, blk_valid, max_distance, d
):
    """Distances of one row block: int8 GEMM + exact epilogue + filtering.

    Returns [Q, B] f32 with +inf marking invalid/over-threshold rows.
    """
    dot8 = lax.dot_general(
        q_i8,
        blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dot_c = 4 * dot8 + 2 * (q_sum[:, None] + blk_sum[None, :]) + jnp.int32(d)
    dist = _cosine_distance_from_moments(
        dot_c.astype(jnp.float32),
        q_mag2_f,
        blk_mag2.astype(jnp.float32)[None, :],
    )
    keep = blk_valid[None, :] & (dist < max_distance)
    return jnp.where(keep, dist, jnp.inf)


@partial(
    jax.jit,
    static_argnames=("k", "block_rows", "mode", "recall_target", "gate"),
)
def cosine_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    mode: str = "exact",
    recall_target: float = 0.99,
    gate: bool = True,
):
    """Top-k smallest reciprocal-cosine distances of queries against the index.

    query_u8: uint8 [Q, D] (or [D], auto-promoted).
    Returns (dist [Q, k] f32, idx [Q, k] int32); idx == -1 marks entries
    excluded by ``dist < max_distance`` or an index smaller than k.

    mode:
      - "exact" (default): bit-exact reference parity; per-block selection
        uses XLA TopK (O(k·elems) on TPU — the scan's dominant cost for
        large query batches).
      - "fast": per-block selection via the TPU-native PartialReduce
        (``lax.approx_min_k``) at ``recall_target`` expected recall —
        near-HBM-roofline throughput for batched queries, recall@k
        typically ≥0.99 (measure with bench.py).  Distances of returned
        rows are still exact; only the candidate SELECTION is approximate.
    """
    assert mode in ("exact", "fast"), mode
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    block_rows = min(block_rows, n_pad)
    assert n_pad % block_rows == 0, (n_pad, block_rows)
    nb = n_pad // block_rows

    q_i8, q_sum, q_mag2 = query_moments_from_u8(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]
    max_distance = jnp.asarray(max_distance, dtype=jnp.float32)

    xs = (
        index.data.reshape(nb, block_rows, d),
        index.row_sum.reshape(nb, block_rows),
        index.row_mag2.reshape(nb, block_rows),
        index.valid.reshape(nb, block_rows),
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    )

    def body(carry, x):
        best_d, best_i = carry
        blk, blk_sum, blk_mag2, blk_valid, base = x
        dist = _cosine_block_dist(
            q_i8, q_sum, q_mag2_f, blk, blk_sum, blk_mag2, blk_valid,
            max_distance, d,
        )

        if mode == "fast":
            # TPU PartialReduce: O(elems) approximate selection; merged
            # candidates keep their exact distances.
            cand_d, sel = lax.approx_min_k(
                dist, k, recall_target=recall_target
            )
            idx = _block_iota(base, block_rows, qn)
            cand_i = jnp.take_along_axis(idx, sel, axis=-1)
            cand_i = jnp.where(jnp.isfinite(cand_d), cand_i, -1)
            return (
                topk_ops.merge_sorted_topk(best_d, best_i, cand_d, cand_i, k),
                None,
            )

        # Threshold gate (small batches only): XLA's TopK dominates the
        # scan cost, so skip the block selection when no distance beats
        # the current k-th best (exact: a tie at theta keeps the earlier
        # row, matching the ascending-row-id tie-break).  The gate is a
        # trace-time choice: with many concurrent queries SOME query
        # always triggers the merge, so the cond only buys compile time —
        # large batches take the straight-line path (or mode="fast").
        if gate and qn <= 32:
            theta = best_d[:, -1:]
            need = jnp.any(jnp.min(dist, axis=1, keepdims=True) < theta)

            def do_merge(c):
                bd, bi = c
                idx = _block_iota(base, block_rows, qn)
                cand_d, cand_i = topk_ops.block_topk(dist, idx, k)
                return topk_ops.merge_sorted_topk(bd, bi, cand_d, cand_i, k)

            return lax.cond(need, do_merge, lambda c: c, (best_d, best_i)), None

        idx = _block_iota(base, block_rows, qn)
        cand_d, cand_i = topk_ops.block_topk(dist, idx, k)
        return topk_ops.merge_sorted_topk(best_d, best_i, cand_d, cand_i, k), None

    init = topk_ops.empty_topk((qn,), k)
    (best_d, best_i), _ = lax.scan(body, init, xs)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


@partial(jax.jit, static_argnames=("k", "block_rows", "recall_target"))
def _fast_scan_with_verification(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    k: int,
    max_distance,
    block_rows: int,
    recall_target: float = 0.99,
):
    """Fast-mode scan + an exact verification pass.

    Returns (dist, idx, exact_per_query).  ``exact[q]`` is True iff the
    fast candidates for query q provably equal the exact top-k: a second
    (pure GEMM+epilogue, roofline-speed) pass counts every element with
    dist <= theta-hat (the worst kept candidate); if the global count
    matches the candidate count, nothing was missed at or below the
    boundary, so selection AND tie-break are exact.
    """
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    block_rows = min(block_rows, n_pad)
    nb = n_pad // block_rows
    md = jnp.asarray(max_distance, dtype=jnp.float32)

    best_d, best_i = cosine_scan_topk(
        query_u8, index, k=k, max_distance=md, block_rows=block_rows,
        mode="fast", recall_target=recall_target,
    )

    q_i8, q_sum, q_mag2 = query_moments_from_u8(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]
    # theta-hat: worst kept candidate (+inf when fewer than k survived —
    # then the count check verifies NO passing element was missed at all).
    theta = jnp.where(
        jnp.isfinite(best_d[:, -1]), best_d[:, -1], jnp.inf
    )[:, None]
    # Distances are quantized (integer dot moments), so exact-equal values
    # at the theta boundary are common; the check is tie-aware:
    #   exact ⟺ every element with d < theta is a candidate, AND every
    #   element with d == theta and id <= (largest tied candidate id) is a
    #   candidate — i.e. the kept tied rows are exactly the smallest-id ones.
    tied_cand = jnp.isfinite(best_d) & (best_d == theta)
    boundary_id = jnp.max(
        jnp.where(tied_cand, best_i, -1), axis=1, keepdims=True
    )  # [-1 when theta == inf]

    xs = (
        index.data.reshape(nb, block_rows, d),
        index.row_sum.reshape(nb, block_rows),
        index.row_mag2.reshape(nb, block_rows),
        index.valid.reshape(nb, block_rows),
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    )

    def body(carry, x):
        c_lt, c_eq = carry
        blk, blk_sum, blk_mag2, blk_valid, base = x
        dist = _cosine_block_dist(
            q_i8, q_sum, q_mag2_f, blk, blk_sum, blk_mag2, blk_valid, md, d
        )
        ids = _block_iota(base, block_rows, qn)
        finite = jnp.isfinite(dist)
        c_lt = c_lt + jnp.sum((dist < theta) & finite, axis=1).astype(jnp.int32)
        c_eq = c_eq + jnp.sum(
            (dist == theta) & finite & (ids <= boundary_id), axis=1
        ).astype(jnp.int32)
        return (c_lt, c_eq), None

    zeros = jnp.zeros((qn,), jnp.int32)
    (lt_all, eq_all), _ = lax.scan(body, (zeros, zeros), xs)
    lt_cand = jnp.sum(
        jnp.isfinite(best_d) & (best_d < theta), axis=1
    ).astype(jnp.int32)
    eq_cand = jnp.sum(tied_cand, axis=1).astype(jnp.int32)
    exact = (lt_all == lt_cand) & (eq_all == eq_cand)
    if squeeze:
        return best_d[0], best_i[0], exact[0]
    return best_d, best_i, exact


# --------------------------------------------------------------------- #
# Sampled-threshold selection: the guaranteed-exact fast path.
#
# The scan's cost floor is one GEMM+epilogue pass over the index (HBM
# roofline); everything above that is SELECTION.  XLA TopK is O(k·elems)
# and approx_min_k costs several roofline-multiples and degrades with
# batch size.  Threshold selection gets selection nearly for free:
#
#   1. sample pass: exact top-j over a strided row subsample gives each
#      query a threshold θ ≈ the distance quantile holding ~target_count
#      rows of the full index (j = target_count·S/N);
#   2. main pass (the one full GEMM): per block, COUNT rows with
#      dist < θ (a fused reduce) and extract the passing rows with
#      ``budget`` rounds of per-chunk extract-min — each 128-lane chunk
#      yields its `budget` smallest via masked min/argmin reduces (pure
#      VPU work that fuses into the GEMM epilogue; measured: XLA's TopK
#      custom call costs milliseconds per block even at small k, so it is
#      used on nothing bigger than the final candidate list);
#   3. the nb·(block/chunk)·budget candidates (≈32k for 1M rows) merge
#      with ONE small TopK.
#
# Exactness is PROVEN per query, not assumed: if no chunk held more than
# ``budget`` passing rows, the candidate set is exactly {rows: dist < θ};
# if additionally total_count ≥ k (so the true k-th smallest is < θ) —
# or θ == the caller's max_distance (the candidate set IS the full
# WHERE-clause result) — the merged top-k equals the exact scan's.
# Queries failing either check (sampling got unlucky, tie floods,
# adversarial clustering: with θ sized for ~400 hits/1M, a >budget chunk
# needs ≥5 hits in 128 rows, P≈3e-9 per chunk at random) are re-scanned
# exactly and spliced back by the auto wrapper.  Strictly-below θ avoids
# boundary-tie bookkeeping entirely: ties at θ only matter when the k-th
# smallest == θ, which the count check already classifies as not-proven.
#
# Tie-break correctness of the merge: extract-min picks the smallest
# column among equal distances, rounds within a chunk are (dist, id)-
# ascending, chunks flatten in id order, and blocks ascend — so the
# flattened candidate array is (dist, id)-sorted among equal distances
# and the final stable TopK reproduces the oracle's ascending-row-id
# tie-break.


def _extract_topr_per_chunk(dist, base, chunk: int, r: int, method: str = "topk"):
    """[Q, B] (+inf = masked) → candidate (dist [Q, nc·r], idx [Q, nc·r],
    counts [Q, nc]): the ≤r smallest entries of every `chunk`-lane chunk.

    method="topk": one small-k TopK per chunk batch (O(r·elems), r ≪ k);
    method="rounds": r masked extract-min reduction rounds (no TopK call;
    measured slower on TPU — XLA re-materializes the masked array per
    round — kept for comparison/sweeps).
    """
    qn, b = dist.shape
    nc = b // chunk
    d3 = dist.reshape(qn, nc, chunk)
    counts = jnp.sum(jnp.isfinite(d3), axis=2).astype(jnp.int32)
    chunk_base = base + jnp.arange(nc, dtype=jnp.int32)[None, :] * chunk

    if method == "topk":
        neg_d, sel = lax.top_k(-d3, r)                              # [Q,nc,r]
        cand_d = -neg_d
        ok = jnp.isfinite(cand_d)
        cand_i = jnp.where(ok, chunk_base[:, :, None] + sel, -1)
        # Chunk-major flatten: (dist, id)-ascending among equal dists
        # (top_k is stable within a chunk; chunks/blocks ascend by id).
        return cand_d.reshape(qn, nc * r), cand_i.reshape(qn, nc * r), counts

    lane = lax.broadcasted_iota(jnp.int32, (qn, nc, chunk), 2)
    big = jnp.int32(2 ** 30)
    cand_d, cand_i = [], []
    cur = d3
    for _ in range(r):
        m = jnp.min(cur, axis=2)                                   # [Q, nc]
        pos = jnp.min(
            jnp.where(cur == m[:, :, None], lane, big), axis=2
        )                                                          # [Q, nc]
        ok = jnp.isfinite(m)
        cand_d.append(m)
        cand_i.append(jnp.where(ok, chunk_base + pos, -1))
        cur = jnp.where(lane == pos[:, :, None], jnp.inf, cur)
    # [Q, nc, r] flattened chunk-major: ascending id among equal dists.
    out_d = jnp.stack(cand_d, axis=-1).reshape(qn, nc * r)
    out_i = jnp.stack(cand_i, axis=-1).reshape(qn, nc * r)
    return out_d, out_i, counts


class ScanSample(NamedTuple):
    """Strided row subsample of a PackedSemanticIndex (θ estimation)."""

    data: jnp.ndarray      # int8 [S, D]
    row_sum: jnp.ndarray   # int32 [S]
    row_mag2: jnp.ndarray  # int32 [S]
    valid: jnp.ndarray     # bool [S]


def build_scan_sample(
    index: PackedSemanticIndex, sample_rows: int | None = None
) -> ScanSample:
    """Derive the strided sample (cache it alongside the index; engines
    key it on the store's mutation counter).

    ``sample_rows`` defaults to 65536 (PIXELBOX_SCAN_SAMPLE_ROWS
    overrides — an A/B knob for the θ-estimate stage: a smaller sample
    cuts the estimate's GEMM+epilogue cost but loosens θ, trading
    extraction rounds / proof rate; exactness is unaffected either way
    because θ only gates candidate selection, never the proof).
    """
    if sample_rows is None:
        import os

        sample_rows = int(
            os.environ.get("PIXELBOX_SCAN_SAMPLE_ROWS", "65536")
        )
    cap = index.capacity
    stride = 1
    while stride * 2 <= max(1, cap // sample_rows) and cap % (stride * 2) == 0:
        stride *= 2
    return ScanSample(
        index.data[::stride],
        index.row_sum[::stride],
        index.row_mag2[::stride],
        index.valid[::stride],
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "block_rows", "budget", "target_count", "chunk", "method",
        "precision",
    ),
)
def cosine_scan_topk_threshold(
    query_u8: jnp.ndarray,
    index,
    sample: ScanSample,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    budget: int = 4,
    target_count: int | None = None,
    chunk: int = 128,
    method: str = "topk",
    precision: str = "int8",
):
    """Sampled-threshold scan.  Returns (dist [Q,k], idx [Q,k], exact [Q]).

    ``exact[q]`` is True iff the result provably equals mode="exact"
    (see the module comment above); the auto wrapper repairs the rest.
    ``budget`` = candidates kept per `chunk`-lane chunk (extract-min
    rounds); overflowing chunks mark the query unproven.
    ``precision="int4"`` scans a PackedSemantic4Index with the int4
    distance spec (ops/int4.py) through the same machinery.
    """
    if precision == "int4":
        from pixelbox_tpu.ops.int4 import (
            _cosine4_block_dist as block_dist,
            query4_moments_from_u8 as moments,
        )
    elif precision == "int4a":
        # Asymmetric: u8 query moments against the packed int4 rows.
        from pixelbox_tpu.ops.int4 import _cosine4a_block_dist as block_dist

        moments = query_moments_from_u8
    else:
        block_dist = _cosine_block_dist
        moments = query_moments_from_u8
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, d = query_u8.shape
    n_pad = index.capacity
    block_rows = min(block_rows, n_pad)
    assert n_pad % block_rows == 0, (n_pad, block_rows)
    nb = n_pad // block_rows
    chunk = min(chunk, block_rows)
    assert block_rows % chunk == 0, (block_rows, chunk)
    s = sample.data.shape[0]
    tc = target_count if target_count is not None else max(4 * k, 256)
    j = min(s, max(1, -(-tc * s // n_pad)))
    # Expected passing rows per chunk; the per-chunk budget must clear it
    # with slack or overflow (→ repair) becomes the common case on small/
    # dense indexes.  λ ≪ 1 on big indexes leaves `budget` as passed.
    lam = tc * chunk / n_pad
    budget = min(chunk, max(budget, int(3 * lam + 4)))

    md = jnp.asarray(max_distance, dtype=jnp.float32)
    q_i8, q_sum, q_mag2 = moments(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None]

    # Sample pass: θ = j-th smallest sample distance, capped at md.
    s_dist = block_dist(
        q_i8, q_sum, q_mag2_f, sample.data, sample.row_sum, sample.row_mag2,
        sample.valid, md, d,
    )
    s_top, _ = topk_ops.block_topk(
        s_dist, jnp.zeros(s_dist.shape, jnp.int32), j
    )
    theta_j = s_top[:, j - 1 : j]                       # [Q, 1]
    theta = jnp.minimum(theta_j, md)
    # θ didn't bind below md ⇒ the candidate mask IS the WHERE clause.
    unbound = ~(theta_j < md)[:, 0]                     # [Q]

    xs = (
        index.data.reshape(nb, block_rows, index.data.shape[1]),
        index.row_sum.reshape(nb, block_rows),
        index.row_mag2.reshape(nb, block_rows),
        index.valid.reshape(nb, block_rows),
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    )

    def body(carry, x):
        count, overflow = carry
        blk, blk_sum, blk_mag2, blk_valid, base = x
        dist = block_dist(
            q_i8, q_sum, q_mag2_f, blk, blk_sum, blk_mag2, blk_valid,
            theta, d,                                   # strict dist < θ
        )
        cand_d, cand_i, counts = _extract_topr_per_chunk(
            dist, base, chunk, budget, method
        )
        count = count + jnp.sum(counts, axis=1)
        overflow = overflow | jnp.any(counts > budget, axis=1)
        return (count, overflow), (cand_d, cand_i)

    zeros = jnp.zeros((qn,), jnp.int32)
    (count, overflow), (ys_d, ys_i) = lax.scan(
        body, (zeros, jnp.zeros((qn,), bool)), xs
    )
    per_block = (block_rows // chunk) * budget
    all_d = jnp.moveaxis(ys_d, 0, 1).reshape(qn, nb * per_block)
    all_i = jnp.moveaxis(ys_i, 0, 1).reshape(qn, nb * per_block)
    best_d, best_i = topk_ops.block_topk(all_d, all_i, k)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    exact = ~overflow & ((count >= k) | unbound)
    if squeeze:
        return best_d[0], best_i[0], exact[0]
    return best_d, best_i, exact


def repair_unproven(q, best_d, best_i, exact, exact_scan):
    """Splice exact re-scans over queries whose threshold results weren't
    proven (the shared host-side repair protocol of every auto scan).

    ``exact_scan(q_bucket) -> (d, i)`` runs the exact path on a zero-
    padded query bucket (bucket sizes 8·4^n bound compile-cache churn).
    """
    import numpy as np

    ok = np.asarray(exact)
    if ok.all():
        return best_d, best_i
    best_d = np.asarray(best_d).copy()
    best_i = np.asarray(best_i).copy()
    bad = np.nonzero(~ok)[0]
    bucket = 8
    while bucket < len(bad):
        bucket *= 4
    q_np = np.asarray(q)
    repair = np.zeros((bucket, q_np.shape[1]), dtype=np.uint8)
    repair[: len(bad)] = q_np[bad]
    rd, ri = exact_scan(jnp.asarray(repair))
    best_d[bad] = np.asarray(rd)[: len(bad)]
    best_i[bad] = np.asarray(ri)[: len(bad)]
    return jnp.asarray(best_d), jnp.asarray(best_i)


def _default_backend_is_tpu() -> bool:
    """True only on an actual TPU backend (the Mosaic kernels don't lower
    on CPU/GPU — those take the XLA threshold path)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


PALLAS_TILE_ROWS = 2048


def _pick_tile_rows(qn: int, capacity: int, max_tile: int = 8192) -> int:
    """Largest measured-good tile whose [Q, tile] f32 working set fits
    VMEM and divides the capacity.  Bigger tiles cut total extraction
    rounds (the round work is [Q, 128]-scale under the lanemin loop, so
    fewer tiles ⇒ fewer max-over-queries round taxes).  With the
    depth-2 class chain, tile 8192 at Q=256 measured 56.9 Gdots/s vs
    51.0 at 4096 and 42.5 at 2048 (the depth-1 chain regressed at 8192
    on eager refill chains over 64-deep classes)."""
    for tile in (8192, 4096, 2048, 1024):
        if tile <= max_tile and qn * tile <= 2 ** 21 and capacity % tile == 0:
            return tile
    return PALLAS_TILE_ROWS


def cosine_scan_topk_auto(
    query_u8,
    index: PackedSemanticIndex,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    sample: ScanSample | None = None,
    budget: int = 4,
    row_meta: jnp.ndarray | None = None,
    prefer_pallas: bool | None = None,
):
    """Guaranteed-exact scan at near-roofline speed (host-level repair).

    Runs the sampled-threshold scan; queries whose results aren't PROVEN
    exact (rare — unlucky sampling, tie floods) are re-scanned exactly in
    a small padded bucket and spliced back.  Not jittable (host branch);
    the engine's eager query path uses this.  Results are always
    identical to mode="exact".

    On TPU the main pass runs the fused Pallas kernel
    (ops.pallas_scan.pallas_threshold_scan_topk — 19.6 Gdots/s at Q=256
    on 1M×128 vs 8.8 for the XLA lowering, measured); elsewhere (or with
    ``prefer_pallas=False``) the XLA threshold scan runs.  Pass a cached
    ``sample`` (build_scan_sample) and ``row_meta``
    (ops.pallas_scan.build_row_meta) to skip re-deriving them.
    """
    import numpy as np

    q = jnp.asarray(query_u8)
    squeeze = q.ndim == 1
    if squeeze:
        q = q[None, :]
    if index.capacity <= 4 * block_rows:
        # Small index: selection costs are negligible; scan directly.
        best_d, best_i = cosine_scan_topk(
            q, index, k=k, max_distance=max_distance, block_rows=block_rows,
            mode="exact",
        )
        if squeeze:
            return best_d[0], best_i[0]
        return best_d, best_i
    if sample is None:
        sample = build_scan_sample(index)
    use_pallas = (
        prefer_pallas
        if prefer_pallas is not None
        else _default_backend_is_tpu()
    ) and index.capacity % PALLAS_TILE_ROWS == 0 and index.dim % 128 == 0
    if use_pallas:
        from pixelbox_tpu.ops.pallas_scan import (
            build_row_meta,
            pallas_threshold_scan_topk,
            pallas_threshold_scan_topk_v2,
        )

        if row_meta is None:
            row_meta = build_row_meta(index)
        # v2 (in-kernel running top-k) wins everywhere it fits VMEM:
        # 24.8 Gdots/s @Q=256 t2048, 23.3 @Q=1024 t1024 (the [Q, tile]
        # loop carry caps Q·tile at ~2^21 f32); v1's candidate buffer
        # covers larger batches.  Chunking big batches through 512-query
        # v2 passes measured worse (PERF.md) — don't.
        qn_now = q.shape[0]
        if qn_now <= 1024:
            best_d, best_i, exact = pallas_threshold_scan_topk_v2(
                q, index, row_meta, sample, k=k, max_distance=max_distance,
                tile_rows=_pick_tile_rows(max(qn_now, 32), index.capacity),
            )
        else:
            best_d, best_i, exact = pallas_threshold_scan_topk(
                q, index, row_meta, sample, k=k, max_distance=max_distance,
                tile_rows=PALLAS_TILE_ROWS,
            )
    else:
        best_d, best_i, exact = cosine_scan_topk_threshold(
            q, index, sample, k=k, max_distance=max_distance,
            block_rows=block_rows, budget=budget,
        )
    if use_pallas:
        # Repair with the sample-free fused kernel (θ = max_distance):
        # unconditionally exact (its round bound is tile_rows, which
        # extraction cannot exceed) and ~5× cheaper than the XLA exact
        # scan at repair-bucket sizes — the amortized repair term in the
        # guaranteed-throughput bound shrinks with it.
        from pixelbox_tpu.ops.pallas_scan import pallas_cosine_scan_topk

        def exact_rescan(rq):
            return pallas_cosine_scan_topk(
                rq, index, row_meta, k=k, max_distance=max_distance,
                tile_rows=PALLAS_TILE_ROWS,
            )
    else:
        def exact_rescan(rq):
            return cosine_scan_topk(
                rq, index, k=k, max_distance=max_distance,
                block_rows=block_rows, mode="exact", gate=False,
            )

    best_d, best_i = repair_unproven(q, best_d, best_i, exact, exact_rescan)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


@partial(
    jax.jit,
    static_argnames=("k", "block_rows", "wrap_u8", "gate", "byte_limit"),
)
def hamming_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedHammingIndex,
    k: int = 100,
    max_distance: jnp.ndarray | float = 1e3,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    wrap_u8: bool = False,
    gate: bool = True,
    byte_limit: int | None = None,
):
    """Top-k smallest normalized Hamming distances (phash search).

    Same result semantics as :func:`cosine_scan_topk`.  ``wrap_u8``
    replicates the reference's u8 popcount-accumulator overflow
    (engine.rs:603) — see ``ops.distances.hamming_distance``.

    ``byte_limit`` compares only the first ``byte_limit`` bytes and
    normalizes by 8×byte_limit — the device half of the reference's
    zip-truncate semantics for unequal-width hashes (engine.rs:594-604):
    the engine groups rows by min(query_width, row_width) and scans each
    group with that limit (see Engine.query_by_phash).
    """
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    qn, h = query_u8.shape
    n_pad = index.capacity
    block_rows = min(block_rows, n_pad)
    assert n_pad % block_rows == 0, (n_pad, block_rows)
    nb = n_pad // block_rows

    eff = h if byte_limit is None else int(byte_limit)
    assert 0 < eff <= h, (eff, h)
    query_u8 = query_u8[:, :eff]

    max_distance = jnp.asarray(max_distance, dtype=jnp.float32)
    xs = (
        index.data.reshape(nb, block_rows, h),
        index.valid.reshape(nb, block_rows),
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    )

    # Word-packed SWAR popcount processes 4 hash bytes per VPU op.
    words = eff % 4 == 0
    q_packed = pack_u8_words(query_u8) if words else query_u8

    def body(carry, x):
        best_d, best_i = carry
        blk, blk_valid, base = x
        blk = blk[:, :eff]
        if words:
            bits = xor_popcount_bits(
                q_packed[:, None, :], pack_u8_words(blk)[None, :, :]
            )
        else:
            bits = jnp.sum(
                popcount_u8(
                    jnp.bitwise_xor(query_u8[:, None, :], blk[None, :, :])
                ),
                axis=-1,
            )
        if wrap_u8:
            bits = bits % 256
        # Multiply-by-reciprocal: canonical constant-scale spec (distances.py).
        dist = bits.astype(jnp.float32) * jnp.float32(1.0 / (8.0 * eff))
        keep = blk_valid[None, :] & (dist < max_distance)
        dist = jnp.where(keep, dist, jnp.inf)

        # Threshold-gated selection for small batches (see cosine body).
        if gate and qn <= 32:
            theta = best_d[:, -1:]
            need = jnp.any(jnp.min(dist, axis=1, keepdims=True) < theta)

            def do_merge(c):
                bd, bi = c
                idx = _block_iota(base, block_rows, qn)
                cand_d, cand_i = topk_ops.block_topk(dist, idx, k)
                return topk_ops.merge_sorted_topk(bd, bi, cand_d, cand_i, k)

            return lax.cond(need, do_merge, lambda c: c, (best_d, best_i)), None

        idx = _block_iota(base, block_rows, qn)
        cand_d, cand_i = topk_ops.block_topk(dist, idx, k)
        return topk_ops.merge_sorted_topk(best_d, best_i, cand_d, cand_i, k), None

    init = topk_ops.empty_topk((qn,), k)
    (best_d, best_i), _ = lax.scan(body, init, xs)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i
