"""IVF (inverted-file) clustered index — opt-in ANN over the u8 store.

The reference scans every row per query (src/engine.rs:375-383); the flat
TPU scans here keep that exact semantics at 60+ Gdots/s.  This module adds
the standard next rung for >10M-row libraries and interactive single-query
latency: spherical k-means clusters the index, queries probe only the
``nprobe`` nearest clusters, and candidate distances are computed with the
SAME exact integer spec as the flat scan (ops/scan.py `_cosine_block_dist`
math), so returned distances are true u8 reciprocal-cosine values — only
the candidate *selection* is approximate, exactly like the engine's
``fast`` mode and the int4 rerank flow.

TPU-first design notes:
- k-means assignment is one int-free f32 GEMM per block ([B, D] x [D, C])
  — MXU work, streamed over the index with ``lax.scan`` (static shapes).
- centroid updates are a second GEMM (one-hot^T @ unit_rows), not a
  scatter: segment-sum via matmul keeps the step entirely on the MXU.
- buckets are FIXED-CAPACITY (static shapes; XLA-friendly gather).  Rows
  beyond a cluster's capacity spill into a dense side index that every
  query scans exactly — recall degrades gracefully instead of rows
  silently vanishing, and `nprobe == n_clusters` remains provably
  equivalent to the exact flat scan (tested).
- reciprocal-cosine (engine.rs:587) is monotone-decreasing in cosine, so
  "nearest clusters by centroid cosine" is the correct probe order.

Multi-chip: parallel/sharded_ivf rides this exact index shape over a
``jax.sharding.Mesh`` — shared centroids, per-shard buckets with global
row ids, per-chip probe + local exact spill, k·n_chips candidates merged
over ICI.  The engine picks it automatically under ``serve_on_mesh``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pixelbox_tpu.ops import topk as topk_ops
from pixelbox_tpu.ops.distances import _cosine_distance_from_moments
from pixelbox_tpu.ops.packed import (
    PackedSemanticIndex,
    query_moments_from_u8,
    semantic_rows_from_u8,
)


class IVFIndex(NamedTuple):
    """Device arrays for a clustered index.

    ``bucket_rows`` maps bucket slots back to store row ids (-1 = pad).
    ``spill``/``spill_rows`` hold overflow rows scanned exactly by every
    query (empty spill ⇒ capacity 0 arrays, still static).

    Two packings share this shape (``precision`` at build time):
    - "u8": bucket_data int8 [C, cap, D] centered codes (u8 − 128),
      distances are the exact u8 reciprocal-cosine spec;
    - "int4": bucket_data uint8 [C, cap, D/2] packed nibbles (HALF the
      bucket HBM — the >10M-row capacity mode), distances are the exact
      ASYMMETRIC int4 spec (ops/int4 ``cosine4a``: full-u8 query against
      int4 rows), and callers rerank candidates with the exact u8 metric
      exactly like the flat int4 flow.  The packing is recovered from
      the dtype (int8 = centered u8, uint8 = packed nibbles).
    """

    centroids: jnp.ndarray     # f32 [C, D] unit vectors (spec scale)
    bucket_data: jnp.ndarray   # int8 [C, cap, D] | uint8 [C, cap, D/2]
    bucket_sum: jnp.ndarray    # int32 [C, cap] (Σ centered u8 | Σ v4)
    bucket_mag2: jnp.ndarray   # int32 [C, cap] (spec magnitudes)
    bucket_rows: jnp.ndarray   # int32 [C, cap]
    bucket_valid: jnp.ndarray  # bool [C, cap]
    spill: "PackedSemanticIndex"  # or ops.int4.PackedSemantic4Index
    spill_rows: jnp.ndarray    # int32 [S_pad]

    @property
    def n_clusters(self) -> int:
        return self.bucket_data.shape[0]

    @property
    def bucket_cap(self) -> int:
        return self.bucket_data.shape[1]

    @property
    def dim(self) -> int:
        # True embedding width — bucket_data's last axis is D/2 when the
        # buckets pack int4 nibbles.
        return self.centroids.shape[1]

    @property
    def kind(self) -> str:
        """Distance kind implied by the bucket packing (trace-time
        constant: depends on dtype only)."""
        return (
            "cosine4a" if self.bucket_data.dtype == jnp.uint8 else "cosine"
        )

    @property
    def spill_count(self) -> int:
        return int(self.spill.capacity)


def _unit_rows_f32(rows_u8: np.ndarray) -> np.ndarray:
    """Centered (2q-255) rows, unit-normalized, f32 (host)."""
    x = (2.0 * rows_u8.astype(np.float32)) - 255.0
    norm = np.sqrt(np.sum(x * x, axis=-1, keepdims=True))
    return x / np.maximum(norm, 1e-6)


@partial(jax.jit, static_argnames=("block_rows",))
def _kmeans_step(centroids, rows_u8, valid, block_rows: int):
    """One Lloyd iteration, fully on device.

    rows_u8: uint8 [N_pad, D] (N_pad % block_rows == 0); valid [N_pad].
    Returns (new_centroids [C, D] f32 unit, objective scalar).
    """
    c, d = centroids.shape
    nb = rows_u8.shape[0] // block_rows
    xs = (
        rows_u8.reshape(nb, block_rows, d),
        valid.reshape(nb, block_rows),
    )

    def body(carry, x):
        sums, counts, obj = carry
        blk_u8, blk_valid = x
        xb = 2.0 * blk_u8.astype(jnp.float32) - 255.0
        inv = lax.rsqrt(jnp.maximum(jnp.sum(xb * xb, axis=-1, keepdims=True),
                                    1e-12))
        xu = xb * inv  # unit rows [B, D]
        scores = lax.dot_general(
            xu, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
        )  # [B, C]
        a = jnp.argmax(scores, axis=-1)
        best = jnp.max(scores, axis=-1)
        onehot = (
            (a[:, None] == lax.broadcasted_iota(jnp.int32, (block_rows, c), 1))
            & blk_valid[:, None]
        ).astype(jnp.float32)
        # Segment-sum as a GEMM: [C, B] x [B, D] on the MXU.
        sums = sums + lax.dot_general(
            onehot, xu, dimension_numbers=(((0,), (0,)), ((), ())),
        )
        counts = counts + jnp.sum(onehot, axis=0)
        obj = obj + jnp.sum(jnp.where(blk_valid, best, 0.0))
        return (sums, counts, obj), None

    init = (
        jnp.zeros((c, d), jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.float32(0.0),
    )
    (sums, counts, obj), _ = lax.scan(body, init, xs)
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    norm = jnp.sqrt(jnp.sum(mean * mean, axis=-1, keepdims=True))
    ok = (counts[:, None] > 0) & (norm > 1e-6)
    new_c = jnp.where(ok, mean / jnp.maximum(norm, 1e-6), centroids)
    return new_c, obj


@partial(jax.jit, static_argnames=("block_rows",))
def _assign_rows(centroids, rows_u8, valid, block_rows: int):
    """Nearest-centroid id per row (by cosine), [N_pad] int32."""
    c, d = centroids.shape
    nb = rows_u8.shape[0] // block_rows
    xs = rows_u8.reshape(nb, block_rows, d)

    def body(_, blk_u8):
        xb = 2.0 * blk_u8.astype(jnp.float32) - 255.0
        # argmax over unit centroids is row-norm-invariant: skip rsqrt.
        scores = lax.dot_general(
            xb, centroids, dimension_numbers=(((1,), (1,)), ((), ())),
        )
        return None, jnp.argmax(scores, axis=-1).astype(jnp.int32)

    _, a = lax.scan(body, None, xs)
    return a.reshape(-1)


def spherical_kmeans(
    rows_u8: np.ndarray,
    valid: np.ndarray,
    n_clusters: int,
    iters: int = 15,
    seed: int = 0,
    block_rows: int = 65536,
) -> np.ndarray:
    """Train unit centroids over the valid u8 rows.  Returns f32 [C, D]."""
    rows_u8 = np.asarray(rows_u8, dtype=np.uint8)
    valid = np.asarray(valid, dtype=bool)
    live = np.flatnonzero(valid)
    n_clusters = int(max(1, min(n_clusters, live.size)))
    rng = np.random.default_rng(seed)
    pick = rng.choice(live, size=n_clusters, replace=False)
    centroids = jnp.asarray(_unit_rows_f32(rows_u8[pick]))

    n = rows_u8.shape[0]
    block_rows = int(min(block_rows, max(8, n)))
    n_pad = -(-n // block_rows) * block_rows
    if n_pad != n:
        pad = np.zeros((n_pad - n, rows_u8.shape[1]), dtype=np.uint8)
        rows_u8 = np.concatenate([rows_u8, pad], axis=0)
        valid = np.concatenate([valid, np.zeros(n_pad - n, dtype=bool)])
    rows_dev = jnp.asarray(rows_u8)
    valid_dev = jnp.asarray(valid)
    for _ in range(int(iters)):
        centroids, _ = _kmeans_step(centroids, rows_dev, valid_dev,
                                    block_rows=block_rows)
    return np.asarray(centroids)


def assign_rows_u8(
    rows_u8: np.ndarray, centroids: np.ndarray, block_rows: int = 65536
) -> np.ndarray:
    """Host wrapper: nearest-centroid assignment for u8 rows [n] int32."""
    rows_u8 = np.asarray(rows_u8, dtype=np.uint8)
    n, d = rows_u8.shape
    if n == 0:
        return np.zeros((0,), dtype=np.int32)
    block_rows = int(min(block_rows, max(8, n)))
    n_pad = -(-n // block_rows) * block_rows
    if n_pad != n:
        rows_u8 = np.concatenate(
            [rows_u8, np.zeros((n_pad - n, d), dtype=np.uint8)], axis=0
        )
    a = _assign_rows(jnp.asarray(centroids), jnp.asarray(rows_u8),
                     None, block_rows=block_rows)
    return np.asarray(a)[:n]


def default_n_clusters(n_live: int) -> int:
    """~4·sqrt(N) clusters (IVF folklore sweet spot): 1M rows → 4000
    clusters → mean 250 rows/bucket; the recall-governed default
    nprobe (:func:`default_nprobe`) then probes ~4% of the rows."""
    n_live = int(max(1, n_live))
    return max(1, min(n_live, int(round(4.0 * n_live ** 0.5))))


def default_nprobe(n_clusters: int) -> int:
    """Recall-governed default probe count: 2% of the clusters, floor 8.

    A FIXED nprobe cannot scale: 8 probes is 0.9% of an 894-cluster 50k
    index (recall@10 measured 1.0) but only 0.2% of the 4,000-cluster 1M
    index, where recall@10 measured 0.972 on TPU (BENCH_DETAIL r4).
    Probing a fixed cluster FRACTION keeps the probed-row fraction
    roughly constant as the index grows (cap is 2x the mean cluster
    size, so 2% of clusters ~ 4% of rows), which holds recall@10 >= 0.99
    on the clustered benches while the probe stays sub-ms — tested at a
    production-shaped 100k/auto-cluster build (tests/test_ivf_device.py)
    and measured at 1M/10M in the bench.  ``--nprobe`` overrides.
    """
    n_clusters = int(max(1, n_clusters))
    return max(1, min(n_clusters, max(8, -(-2 * n_clusters // 100))))


def default_bucket_cap(n_live: int, n_clusters: int) -> int:
    """2x the mean cluster size, rounded up to a lane-friendly multiple."""
    mean = max(1, -(-n_live // max(1, n_clusters)))
    return -(-2 * mean // 8) * 8


def _spill_rows_fn(precision: str):
    """(row-moments fn, index type) for a spill packing."""
    if precision == "int4":
        from pixelbox_tpu.ops.int4 import (
            PackedSemantic4Index,
            semantic4_rows_from_u8,
        )

        return semantic4_rows_from_u8, PackedSemantic4Index
    return semantic_rows_from_u8, PackedSemanticIndex


def spill_pad(n: int) -> int:
    """Spill capacity for ``n`` live rows: 8·next_pow2(ceil(n/8)).

    Power-of-two capacities bound the spill scan's compile count to
    O(log n) across incremental appends (a multiple-of-8 pad would
    re-compile every ~8 appended rows, putting cold XLA compiles on the
    query hot path the incremental extend exists to protect)."""
    if n == 0:
        return 0
    units = -(-n // 8)
    p = 1
    while p < units:
        p *= 2
    return 8 * p


def _pack_spill(rows_u8: np.ndarray, row_ids: np.ndarray, d: int,
                precision: str = "u8"):
    """Pack spill rows (host, already in ascending-row-id order) into a
    pow2-padded packed index (u8 or int4 layout) + its row-id map."""
    rows_fn, index_cls = _spill_rows_fn(precision)
    n = len(rows_u8)
    if n == 0:
        return _empty_spill(d, precision), jnp.zeros((0,), dtype=jnp.int32)
    s_pad = spill_pad(n)
    s_mat = np.zeros((s_pad, d), dtype=np.uint8)
    s_mat[:n] = rows_u8
    s_valid = np.zeros(s_pad, dtype=bool)
    s_valid[:n] = True
    s_ids = np.full(s_pad, -1, dtype=np.int32)
    s_ids[:n] = row_ids
    sd, ss, sm = rows_fn(s_mat)
    spill = index_cls(
        jnp.asarray(sd), jnp.asarray(ss), jnp.asarray(sm),
        jnp.asarray(s_valid),
    )
    return spill, jnp.asarray(s_ids)


def live_spill_ids(ivf: IVFIndex) -> np.ndarray:
    """Store row ids currently held in the spill (host, ascending)."""
    ids = np.asarray(ivf.spill_rows)
    return ids[ids >= 0]


def rebuild_spill(
    ivf: IVFIndex, rows_u8: np.ndarray, spill_ids: np.ndarray
) -> IVFIndex:
    """New index sharing ``ivf``'s buckets/centroids but with the spill
    rebuilt from ``rows_u8[spill_ids]``.

    The incremental-append path: rows appended to the store since the
    last full pack join the exact-scanned spill (O(spill+delta) host work
    and transfer) instead of repacking all N rows; callers full-repack
    once the spill grows past their threshold.  ``spill_ids`` must be
    ascending (append ids exceed every packed id, so concatenation keeps
    order) to preserve the scan's row-id tie contract.
    """
    spill_ids = np.asarray(spill_ids, dtype=np.int64)
    precision = "int4" if ivf.kind == "cosine4a" else "u8"
    spill, spill_rows = _pack_spill(
        rows_u8[spill_ids], spill_ids.astype(np.int32), ivf.dim,
        precision=precision,
    )
    return ivf._replace(spill=spill, spill_rows=spill_rows)


def _empty_spill(d: int, precision: str = "u8"):
    rows_fn, index_cls = _spill_rows_fn(precision)
    z = np.zeros((0, d), dtype=np.uint8)
    data, s, m = rows_fn(z)
    return index_cls(
        jnp.asarray(data), jnp.asarray(s), jnp.asarray(m),
        jnp.zeros((0,), dtype=bool),
    )


def pack_buckets(
    rows_u8: np.ndarray,
    valid: np.ndarray,
    centroids: np.ndarray,
    bucket_cap: int,
    row_ids: np.ndarray,
    precision: str = "u8",
):
    """Size-dispatched bucket pack (same contract as
    :func:`pack_buckets_host`): large shards pack on device — the host
    packer's numpy quantize/moments are the wall past ~100k rows (see
    ``build_ivf``'s routing note)."""
    device_min = int(os.environ.get("PIXELBOX_IVF_DEVICE_PACK_MIN",
                                    str(128 * 1024)))
    if (len(rows_u8) >= device_min
            and os.environ.get("PIXELBOX_IVF_HOST_PACK") != "1"):
        from pixelbox_tpu.ops.ivf_build import pack_buckets_device_np

        return pack_buckets_device_np(
            rows_u8, valid, centroids, bucket_cap, row_ids,
            precision=precision,
        )
    return pack_buckets_host(
        rows_u8, valid, centroids, bucket_cap, row_ids,
        precision=precision,
    )


def pack_buckets_host(
    rows_u8: np.ndarray,
    valid: np.ndarray,
    centroids: np.ndarray,
    bucket_cap: int,
    row_ids: np.ndarray,
    precision: str = "u8",
):
    """Host-side bucket packing shared by the single-chip and sharded
    builders.  Returns numpy (bucket_data [C,cap,D] int8 | [C,cap,D/2]
    uint8 for int4, bucket_sum, bucket_mag2, bucket_rows, bucket_valid,
    spill_pos) — ``spill_pos`` are positions into ``rows_u8``,
    ascending.  Assignment always runs on the full-u8 rows (centroids
    live in u8 space); only the stored codes quantize."""
    rows_u8 = np.asarray(rows_u8, dtype=np.uint8)
    valid = np.asarray(valid, dtype=bool)
    n, d = rows_u8.shape
    live = np.flatnonzero(valid)
    c = centroids.shape[0]
    assign = np.full(n, -1, dtype=np.int32)
    if live.size:
        assign[live] = assign_rows_u8(rows_u8[live], centroids)

    bdata = np.zeros((c, bucket_cap, d), dtype=np.uint8)
    brows = np.full((c, bucket_cap), -1, dtype=np.int32)
    bvalid = np.zeros((c, bucket_cap), dtype=bool)
    # Vectorized packing: stable-sort rows by cluster, rank within the
    # cluster = position minus the cluster's start; rank >= cap spills.
    live_assign = assign[live]
    order = np.argsort(live_assign, kind="stable")
    sl = live[order]
    sa = live_assign[order]
    counts = np.bincount(sa, minlength=c)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(sl), dtype=np.int64) - starts[sa]
    in_bucket = rank < bucket_cap
    bp, bc, br = sl[in_bucket], sa[in_bucket], rank[in_bucket]
    bdata[bc, br] = rows_u8[bp]
    brows[bc, br] = row_ids[bp]
    bvalid[bc, br] = True
    # Ascending row order keeps the spill scan's tie-break (stable
    # positional top_k) and its merge into the probe candidates on the
    # (dist, row_id) contract; cluster order would break both on ties.
    spill_pos = np.sort(sl[~in_bucket])

    flat = bdata.reshape(c * bucket_cap, d)
    rows_fn, _ = _spill_rows_fn(precision)
    data, bsum, bmag2 = rows_fn(flat)
    return (
        data.reshape(c, bucket_cap, -1),
        bsum.reshape(c, bucket_cap),
        bmag2.reshape(c, bucket_cap),
        brows,
        bvalid & (brows >= 0),
        spill_pos,
    )


def build_ivf(
    rows_u8: np.ndarray,
    valid: np.ndarray,
    centroids: np.ndarray,
    bucket_cap: Optional[int] = None,
    row_ids: Optional[np.ndarray] = None,
    precision: str = "u8",
) -> IVFIndex:
    """Pack valid rows into fixed-capacity buckets (host), ship to device.

    ``row_ids`` default to positions in ``rows_u8`` (the store's row ids).
    Overflow past ``bucket_cap`` goes to the exact-scanned spill index.
    ``precision="int4"`` packs nibble buckets at half the HBM (asymmetric
    cosine4a distances — see IVFIndex).
    """
    rows_u8 = np.asarray(rows_u8, dtype=np.uint8)
    valid = np.asarray(valid, dtype=bool)
    n, d = rows_u8.shape
    if row_ids is None:
        row_ids = np.arange(n, dtype=np.int32)
    # Large builds pack on DEVICE (ops/ivf_build.py): the host packer's
    # numpy quantize/moments measured 96 s at 1M x 128 int4 on the 1-core
    # bench VM vs seconds on device; below the threshold the host pack
    # avoids a fresh XLA compile per (N_pad, C, cap, spill) shape during
    # interleaved indexing.
    device_min = int(os.environ.get("PIXELBOX_IVF_DEVICE_PACK_MIN",
                                    str(128 * 1024)))
    if n >= device_min and os.environ.get("PIXELBOX_IVF_HOST_PACK") != "1":
        from pixelbox_tpu.ops.ivf_build import build_ivf_device

        return build_ivf_device(
            rows_u8, valid, centroids, bucket_cap=bucket_cap,
            row_ids=row_ids, precision=precision,
        )
    if bucket_cap is None:
        bucket_cap = default_bucket_cap(int(valid.sum()), centroids.shape[0])
    bucket_cap = int(max(8, bucket_cap))
    bdata, bsum, bmag2, brows, bvalid, spill_pos = pack_buckets_host(
        rows_u8, valid, centroids, bucket_cap, row_ids, precision=precision
    )
    spill, spill_rows = _pack_spill(
        rows_u8[spill_pos], row_ids[spill_pos], d, precision=precision
    )

    return IVFIndex(
        centroids=jnp.asarray(centroids, dtype=jnp.float32),
        bucket_data=jnp.asarray(bdata),
        bucket_sum=jnp.asarray(bsum),
        bucket_mag2=jnp.asarray(bmag2),
        bucket_rows=jnp.asarray(brows),
        bucket_valid=jnp.asarray(bvalid),
        spill=spill,
        spill_rows=spill_rows,
    )


@partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_probe_topk(query_u8, ivf: IVFIndex, k: int, nprobe: int,
                    max_distance):
    """Probe ``nprobe`` buckets per query; exact distances within them
    (u8 reciprocal-cosine, or asymmetric cosine4a for int4 buckets —
    the branch is trace-time static on the bucket dtype)."""
    qn, d = query_u8.shape
    q_i8, q_sum, q_mag2 = query_moments_from_u8(query_u8)
    q_mag2_f = q_mag2.astype(jnp.float32)[:, None, None]

    # Probe order: centroid cosine, descending (reciprocal distance is
    # monotone-decreasing in cosine).  Row norm is probe-invariant, and
    # centroids live in full-u8 space for BOTH bucket packings.
    xq = 2.0 * query_u8.astype(jnp.float32) - 255.0
    scores = lax.dot_general(
        xq, ivf.centroids, dimension_numbers=(((1,), (1,)), ((), ())),
    )  # [Q, C]
    _, bids = lax.top_k(scores, nprobe)  # [Q, P]

    data = ivf.bucket_data[bids]      # [Q,P,cap,D] i8 | [Q,P,cap,D/2] u8
    bsum = ivf.bucket_sum[bids]       # [Q, P, cap]
    bmag2 = ivf.bucket_mag2[bids]
    brows = ivf.bucket_rows[bids]
    bval = ivf.bucket_valid[bids]

    if ivf.kind == "cosine4a":
        # Unpack nibbles and apply the asymmetric affine fix (same exact
        # integer spec as ops.int4._cosine4a_block_dist): centered query
        # 2q−255 against centered rows 34·v4 − 255.
        from pixelbox_tpu.ops.int4 import _unpack_u4

        codes = _unpack_u4(data)
        dot8 = jnp.einsum(
            "qpcd,qd->qpc", codes, q_i8, preferred_element_type=jnp.int32
        )
        dot_c = (
            68 * dot8 + 34 * bsum - 510 * q_sum[:, None, None]
            - jnp.int32(255 * d)
        )
    else:
        dot8 = jnp.einsum(
            "qpcd,qd->qpc", data, q_i8, preferred_element_type=jnp.int32
        )
        dot_c = 4 * dot8 + 2 * (q_sum[:, None, None] + bsum) + jnp.int32(d)
    dist = _cosine_distance_from_moments(
        dot_c.astype(jnp.float32), q_mag2_f, bmag2.astype(jnp.float32)
    )
    keep = bval & (dist < max_distance)
    dist = jnp.where(keep, dist, jnp.inf)

    # Selection in two tie-correct stages (measured 2.26 → 1.85 ms on
    # the 10M probe's 253×1584 pool):
    # 1. per-BUCKET top-k via positionally-stable lax.top_k — bucket
    #    slots fill in ascending row-id order (the pack contract), so
    #    positional ties ARE row-id ties within a bucket;
    # 2. a vectorized bitonic tree merge across the probed buckets with
    #    the (dist, idx) lexicographic predicate — ties resolve by
    #    ascending row id exactly like the flat scan / SQLite rowid
    #    order (engine.rs:375-383), and the output satisfies
    #    merge_sorted_topk's sorted precondition.
    # Excluded entries (empty slot / dist >= max) get the uniform
    # sentinel id BEFORE the positional top-k, exactly as lex_topk does
    # internally: a mix of real ids and -1 within an inf tie group would
    # break the (dist, idx)-sorted precondition the merges rely on.
    safe_i = jnp.where(jnp.isfinite(dist), brows, jnp.int32(2 ** 31 - 1))
    bd, bi = topk_ops.block_topk(dist, safe_i, k)   # [Q, P, k]
    return topk_ops.tree_merge_sorted(bd, bi, k)


def ivf_local_topk(query_u8, ivf: IVFIndex, k: int, nprobe: int, md):
    """Probe + exact spill scan + merge: [Q, k] sorted ascending by
    (dist, row_id), +inf/2^31-1 sentinels (no finalize — the sharded
    scan merges shards first).  Traceable inside shard_map."""
    best_d, best_i = _ivf_probe_topk(query_u8, ivf, k, nprobe, md)

    if ivf.spill_count:
        # Block the spill scan like every other scan: one monolithic
        # block at the engine's spill-growth threshold (up to N/16 rows)
        # would materialize a [Q, spill] distance tensor in one piece.
        # Pow2 spill capacities (spill_pad) make 32768 always divide.
        spill_block = min(ivf.spill.capacity, 32768)
        if ivf.kind == "cosine4a":
            from pixelbox_tpu.ops.int4 import cosine4a_scan_topk

            sd, si = cosine4a_scan_topk(
                query_u8, ivf.spill, k=k, max_distance=md,
                block_rows=spill_block,
            )
        else:
            from pixelbox_tpu.ops.scan import cosine_scan_topk

            sd, si = cosine_scan_topk(
                query_u8, ivf.spill, k=k, max_distance=md,
                block_rows=spill_block, mode="exact", gate=False,
            )
        si = jnp.where(si >= 0, ivf.spill_rows[jnp.maximum(si, 0)], -1)
        sd = jnp.where(si >= 0, sd, jnp.inf)
        best_d, best_i = topk_ops.merge_sorted_topk(best_d, best_i, sd, si, k)
    return best_d, best_i


def ivf_scan_topk(
    query_u8,
    ivf: IVFIndex,
    k: int = 100,
    nprobe: Optional[int] = None,
    max_distance: float = 1e3,
):
    """Top-k by the index's exact distance spec over the probed
    candidate set (u8 reciprocal-cosine, or asymmetric cosine4a when the
    buckets pack int4 — callers rerank those with the exact u8 metric
    like the flat int4 flow).  ``nprobe=None`` = the recall-governed
    default (:func:`default_nprobe`: 2% of clusters, floor 8).

    Same return contract as ``cosine_scan_topk``: (dist [Q, k] f32,
    row_ids [Q, k] int32, -1 where excluded).  With ``nprobe ==
    n_clusters`` the probed set covers every bucket, and together with
    the always-exact spill scan the result equals the flat exact scan
    in the same metric.
    """
    query_u8 = jnp.asarray(query_u8, dtype=jnp.uint8)
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    if nprobe is None:
        nprobe = default_nprobe(ivf.n_clusters)
    nprobe = int(max(1, min(nprobe, ivf.n_clusters)))
    md = jnp.asarray(max_distance, dtype=jnp.float32)

    best_d, best_i = ivf_local_topk(query_u8, ivf, k, nprobe, md)

    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i
