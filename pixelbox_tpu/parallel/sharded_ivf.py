"""Mesh-sharded IVF: clustered ANN serving that scales with the chips.

Single-chip IVF (ops/ivf.py) probes the ``nprobe`` nearest k-means
clusters and scans their fixed-capacity buckets with exact u8
reciprocal-cosine distances (the reference's metric, src/engine.rs:572-588
— only candidate SELECTION is approximate).  This module rides the same
index shape over a ``jax.sharding.Mesh``:

- centroids are trained ONCE on the full corpus and replicated;
- rows shard by contiguous store ranges (the same layout as the flat
  sharded scan, parallel/sharded_scan.py); each shard packs ITS rows into
  per-shard buckets keyed by the SHARED centroids, with GLOBAL row ids;
- a query probes the same ``nprobe`` clusters on every chip (the probe
  ranking depends only on the replicated centroids), scans its local
  buckets + its local exact spill, and the k·n_chips candidates — not the
  index — cross ICI in one ``all_gather`` before a lexicographic
  (dist, row_id) merge.

Because every shard probes the same clusters, the union of probed rows is
EXACTLY the single-chip probe set for the same centroids (plus any rows
that spill differently under per-shard caps — spills are scanned exactly,
so extra spill only improves recall).  With ``nprobe == n_clusters`` the
result provably equals the flat exact scan, ties included (tested on the
8-device CPU mesh).

Per-query device work drops to ~1/n_chips of the single-chip IVF scan:
N chips ≈ N× the ANN query throughput at the same recall.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pixelbox_tpu.ops import topk as topk_ops
from pixelbox_tpu.ops import ivf as ivf_ops
from pixelbox_tpu.ops.packed import PackedSemanticIndex
from pixelbox_tpu.parallel.sharded_scan import _merge_gathered


class ShardedIVFIndex(NamedTuple):
    """Per-shard IVF blocks stacked on the leading axis and laid out
    row-sharded over the mesh (shard s owns block ``[s*C:(s+1)*C]`` of
    the bucket arrays and ``[s*S:(s+1)*S]`` of the spill arrays).

    ``bucket_rows``/``spill_rows`` carry GLOBAL store row ids, so no
    offset bookkeeping is needed at merge time.
    """

    centroids: jnp.ndarray    # f32 [C, D], replicated
    bucket_data: jnp.ndarray  # int8 [n_shards*C, cap, D]
    bucket_sum: jnp.ndarray   # int32 [n_shards*C, cap]
    bucket_mag2: jnp.ndarray  # int32 [n_shards*C, cap]
    bucket_rows: jnp.ndarray  # int32 [n_shards*C, cap]
    bucket_valid: jnp.ndarray  # bool [n_shards*C, cap]
    spill_data: jnp.ndarray   # int8 [n_shards*S, D]
    spill_sum: jnp.ndarray    # int32 [n_shards*S]
    spill_mag2: jnp.ndarray   # int32 [n_shards*S]
    spill_valid: jnp.ndarray  # bool [n_shards*S]
    spill_rows: jnp.ndarray   # int32 [n_shards*S]

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        # True embedding width (bucket_data's last axis is D/2 when the
        # buckets pack int4 nibbles).
        return self.centroids.shape[1]

    @property
    def n_shards(self) -> int:
        return self.bucket_data.shape[0] // self.centroids.shape[0]

    @property
    def spill_cap_per_shard(self) -> int:
        return self.spill_data.shape[0] // self.n_shards


def _stack_spills(
    rows_u8: np.ndarray, ids_per_shard: List[np.ndarray], d: int,
    precision: str = "u8",
):
    """Pack per-shard spill id lists (each ascending, global ids) into
    equal-capacity stacked arrays (numpy; u8 or int4 row layout)."""
    rows_fn, _ = ivf_ops._spill_rows_fn(precision)
    n_shards = len(ids_per_shard)
    s_cap = ivf_ops.spill_pad(
        max((len(i) for i in ids_per_shard), default=0)
    )
    data = np.zeros((n_shards * s_cap, d), dtype=np.uint8)
    valid = np.zeros(n_shards * s_cap, dtype=bool)
    rid = np.full(n_shards * s_cap, -1, dtype=np.int32)
    for s, ids in enumerate(ids_per_shard):
        ids = np.asarray(ids, dtype=np.int64)
        base = s * s_cap
        data[base : base + len(ids)] = rows_u8[ids]
        valid[base : base + len(ids)] = True
        rid[base : base + len(ids)] = ids.astype(np.int32)
    sd, ss, sm = rows_fn(data)
    return sd, ss, sm, valid, rid


def _put_sharded(sivf_np: ShardedIVFIndex, mesh: Mesh, axis: str):
    r1 = NamedSharding(mesh, P(axis))
    r2 = NamedSharding(mesh, P(axis, None))
    r3 = NamedSharding(mesh, P(axis, None, None))
    rep = NamedSharding(mesh, P())
    return ShardedIVFIndex(
        centroids=jax.device_put(sivf_np.centroids, rep),
        bucket_data=jax.device_put(sivf_np.bucket_data, r3),
        bucket_sum=jax.device_put(sivf_np.bucket_sum, r2),
        bucket_mag2=jax.device_put(sivf_np.bucket_mag2, r2),
        bucket_rows=jax.device_put(sivf_np.bucket_rows, r2),
        bucket_valid=jax.device_put(sivf_np.bucket_valid, r2),
        spill_data=jax.device_put(sivf_np.spill_data, r2),
        spill_sum=jax.device_put(sivf_np.spill_sum, r1),
        spill_mag2=jax.device_put(sivf_np.spill_mag2, r1),
        spill_valid=jax.device_put(sivf_np.spill_valid, r1),
        spill_rows=jax.device_put(sivf_np.spill_rows, r1),
    )


def build_sharded_ivf(
    rows_u8: np.ndarray,
    valid: np.ndarray,
    centroids: np.ndarray,
    mesh: Mesh,
    axis: str = "data",
    bucket_cap: Optional[int] = None,
    precision: str = "u8",
) -> Tuple[ShardedIVFIndex, List[np.ndarray]]:
    """Pack each shard's row range into buckets under the shared
    centroids and lay the stacked index out over the mesh.

    Returns ``(index, spill_ids_per_shard)`` — the per-shard spill id
    lists let callers extend spills incrementally on appends
    (:func:`rebuild_sharded_spill`) without re-deriving them from device
    arrays.  ``len(rows_u8)`` must divide evenly by the mesh axis size
    (stores pad capacity in block multiples).  ``precision="int4"``
    packs nibble buckets/spills at half the per-chip HBM (asymmetric
    cosine4a distances — ops/ivf.IVFIndex).
    """
    rows_u8 = np.asarray(rows_u8, dtype=np.uint8)
    valid = np.asarray(valid, dtype=bool)
    n, d = rows_u8.shape
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    local_rows = n // n_shards
    c = centroids.shape[0]
    if bucket_cap is None:
        per_shard_live = max(
            int(valid[s * local_rows : (s + 1) * local_rows].sum())
            for s in range(n_shards)
        )
        bucket_cap = ivf_ops.default_bucket_cap(per_shard_live, c)
    bucket_cap = int(max(8, bucket_cap))

    bdatas, bsums, bmags, brows_l, bvalids = [], [], [], [], []
    spill_ids_per_shard: List[np.ndarray] = []
    for s in range(n_shards):
        lo, hi = s * local_rows, (s + 1) * local_rows
        bd, bs, bm, br, bv, spill_pos = ivf_ops.pack_buckets(
            rows_u8[lo:hi], valid[lo:hi], centroids, bucket_cap,
            row_ids=np.arange(lo, hi, dtype=np.int32),
            precision=precision,
        )
        bdatas.append(bd)
        bsums.append(bs)
        bmags.append(bm)
        brows_l.append(br)
        bvalids.append(bv)
        spill_ids_per_shard.append(spill_pos.astype(np.int64) + lo)

    sd, ss, sm, sv, srid = _stack_spills(
        rows_u8, spill_ids_per_shard, d, precision=precision
    )
    sivf_np = ShardedIVFIndex(
        centroids=np.asarray(centroids, dtype=np.float32),
        bucket_data=np.concatenate(bdatas, axis=0),
        bucket_sum=np.concatenate(bsums, axis=0),
        bucket_mag2=np.concatenate(bmags, axis=0),
        bucket_rows=np.concatenate(brows_l, axis=0),
        bucket_valid=np.concatenate(bvalids, axis=0),
        spill_data=sd,
        spill_sum=ss,
        spill_mag2=sm,
        spill_valid=sv,
        spill_rows=srid,
    )
    return _put_sharded(sivf_np, mesh, axis), spill_ids_per_shard


def rebuild_sharded_spill(
    sivf: ShardedIVFIndex,
    rows_u8: np.ndarray,
    ids_per_shard: List[np.ndarray],
    mesh: Mesh,
    axis: str = "data",
) -> ShardedIVFIndex:
    """New index sharing ``sivf``'s buckets/centroids with the stacked
    spill rebuilt from per-shard id lists (each ascending, global) —
    the append path: O(spill+delta) host work and transfer, no bucket
    repack.  Spill capacity pads to powers of two, so repeated appends
    re-compile the scan O(log n) times."""
    precision = "int4" if sivf.bucket_data.dtype == jnp.uint8 else "u8"
    sd, ss, sm, sv, srid = _stack_spills(
        np.asarray(rows_u8, dtype=np.uint8), ids_per_shard, sivf.dim,
        precision=precision,
    )
    r1 = NamedSharding(mesh, P(axis))
    r2 = NamedSharding(mesh, P(axis, None))
    return sivf._replace(
        spill_data=jax.device_put(sd, r2),
        spill_sum=jax.device_put(ss, r1),
        spill_mag2=jax.device_put(sm, r1),
        spill_valid=jax.device_put(sv, r1),
        spill_rows=jax.device_put(srid, r1),
    )


def sharded_ivf_scan_topk(
    query_u8,
    sivf: ShardedIVFIndex,
    mesh: Mesh,
    k: int = 100,
    nprobe: Optional[int] = None,
    max_distance: float = 1e3,
    axis: str = "data",
):
    """Distributed IVF top-k (replicated result on every chip).

    Same contract as ``ivf_scan_topk``: approximate selection over the
    probed clusters (every shard probes the same ``nprobe``; ``None`` =
    the recall-governed default, ops.ivf.default_nprobe), exact u8
    reciprocal-cosine distances, ties by ascending global row id; with
    ``nprobe == n_clusters`` equals the flat exact scan.
    """
    query_u8 = jnp.asarray(query_u8, dtype=jnp.uint8)
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    if nprobe is None:
        nprobe = ivf_ops.default_nprobe(sivf.n_clusters)
    nprobe = int(max(1, min(nprobe, sivf.n_clusters)))
    md = jnp.asarray(max_distance, dtype=jnp.float32)

    specs = ShardedIVFIndex(
        centroids=P(),
        bucket_data=P(axis, None, None),
        bucket_sum=P(axis, None),
        bucket_mag2=P(axis, None),
        bucket_rows=P(axis, None),
        bucket_valid=P(axis, None),
        spill_data=P(axis, None),
        spill_sum=P(axis),
        spill_mag2=P(axis),
        spill_valid=P(axis),
        spill_rows=P(axis),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def scan_shard(q, s):
        if s.bucket_data.dtype == jnp.uint8:  # int4 nibble packing
            from pixelbox_tpu.ops.int4 import PackedSemantic4Index

            spill = PackedSemantic4Index(
                s.spill_data, s.spill_sum, s.spill_mag2, s.spill_valid
            )
        else:
            spill = PackedSemanticIndex(
                s.spill_data, s.spill_sum, s.spill_mag2, s.spill_valid
            )
        local = ivf_ops.IVFIndex(
            centroids=s.centroids,
            bucket_data=s.bucket_data,
            bucket_sum=s.bucket_sum,
            bucket_mag2=s.bucket_mag2,
            bucket_rows=s.bucket_rows,
            bucket_valid=s.bucket_valid,
            spill=spill,
            spill_rows=s.spill_rows,
        )
        local_d, local_i = ivf_ops.ivf_local_topk(q, local, k, nprobe, md)
        # k·n_shards candidates cross ICI — not the buckets.
        g_d = lax.all_gather(local_d, axis)
        g_i = lax.all_gather(local_i, axis)
        return _merge_gathered(g_d, g_i, k)

    best_d, best_i = scan_shard(query_u8, sivf)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i
