"""Row-sharded distributed scan: per-chip top-k + ICI all-gather merge.

The TPU-native replacement for "scan the whole table" when the index
outgrows one chip's HBM (the reference's analog is simply SQLite streaming
rows, src/engine.rs:375-383).  Rows shard over the mesh's ``data`` axis;
every chip scans its resident shard with the same blocked MXU kernel used
single-chip, keeps its local top-k, and the k·n_chips candidates —
kilobytes, not the index — cross ICI in one ``all_gather``, then every
chip deterministically merges (so the result is replicated and identical
everywhere).

The merge preserves the single-chip tie-break (ascending global row id
within equal distances), so sharded and unsharded scans return identical
results — tested against the oracle on a CPU-simulated 8-device mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from pixelbox_tpu.ops import topk as topk_ops
from pixelbox_tpu.ops.packed import (
    PackedSemanticIndex,
    PackedHammingIndex,
    semantic_rows_from_u8,
)
from pixelbox_tpu.ops.scan import (
    ScanSample,
    cosine_scan_topk,
    cosine_scan_topk_threshold,
    hamming_scan_topk,
)


def shard_semantic_index(
    index: PackedSemanticIndex, mesh: Mesh, axis: str = "data"
):
    """Lay the packed index out row-sharded across the mesh.

    Capacity must divide evenly by the axis size (stores pad in block
    multiples; choose block_rows ≥ a multiple of the mesh size).
    Works for both the u8 (PackedSemanticIndex) and int4
    (PackedSemantic4Index) layouts — same four fields.
    """
    n = index.capacity
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    row_sharding = NamedSharding(mesh, P(axis))
    mat_sharding = NamedSharding(mesh, P(axis, None))
    return type(index)(
        jax.device_put(index.data, mat_sharding),
        jax.device_put(index.row_sum, row_sharding),
        jax.device_put(index.row_mag2, row_sharding),
        jax.device_put(index.valid, row_sharding),
    )


def shard_hamming_index(
    index: PackedHammingIndex, mesh: Mesh, axis: str = "data"
) -> PackedHammingIndex:
    n = index.capacity
    assert n % mesh.shape[axis] == 0, (n, mesh.shape[axis])
    return PackedHammingIndex(
        jax.device_put(index.data, NamedSharding(mesh, P(axis, None))),
        jax.device_put(index.valid, NamedSharding(mesh, P(axis))),
    )


def _merge_gathered(g_dist, g_idx, k: int):
    """[n_shards, Q, k] gathered candidates → replicated [Q, k] merge."""
    nd, qn, _ = g_dist.shape
    flat_d = jnp.moveaxis(g_dist, 0, 1).reshape(qn, nd * k)
    flat_i = jnp.moveaxis(g_idx, 0, 1).reshape(qn, nd * k)
    # Sort by (dist, idx): stable sort with idx as second operand would
    # keep shard order, but shards are already ascending-id, so sorting by
    # distance with num_keys=2 (dist then idx) gives the global tie-break.
    d_s, i_s = lax.sort((flat_d, flat_i), num_keys=2, dimension=-1)
    return d_s[:, :k], i_s[:, :k]


def sharded_cosine_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    mesh: Mesh,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: Optional[int] = None,
    axis: str = "data",
    mode: str = "exact",
):
    """Distributed top-k cosine scan (replicated result on every chip).

    ``index`` should be laid out with :func:`shard_semantic_index`.
    ``mode`` passes through to the per-shard scan ("exact" or "fast" —
    see ops.scan.cosine_scan_topk); the cross-chip merge is exact either
    way.
    """
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    n_shards = mesh.shape[axis]
    local_rows = index.capacity // n_shards
    if block_rows is None:
        block_rows = min(32768, local_rows)
    md = jnp.float32(max_distance)

    index_specs = PackedSemanticIndex(P(axis, None), P(axis), P(axis), P(axis))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), index_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def scan_shard(q, local_index):
        local_d, local_i = cosine_scan_topk(
            q, local_index, k=k, max_distance=md, block_rows=block_rows,
            mode=mode,
        )
        shard_id = lax.axis_index(axis)
        offset = shard_id.astype(jnp.int32) * jnp.int32(local_rows)
        global_i = jnp.where(local_i >= 0, local_i + offset, -1)
        # k·n_shards candidates cross ICI — not the index.
        g_d = lax.all_gather(local_d, axis)
        g_i = lax.all_gather(global_i, axis)
        return _merge_gathered(g_d, g_i, k)

    best_d, best_i = scan_shard(query_u8, index)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


def sharded_cosine4_scan_topk(
    query_u8: jnp.ndarray,
    index,                         # sharded PackedSemantic4Index
    mesh: Mesh,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: Optional[int] = None,
    axis: str = "data",
    query_mode: str = "asym",
):
    """Distributed exact top-k over a row-sharded int4 index
    (ops/int4.py): per-chip blocked scan + ICI candidate merge, same
    result semantics as :func:`sharded_cosine_scan_topk`.
    ``query_mode="asym"`` (default) keeps queries at u8 precision."""
    from pixelbox_tpu.ops.int4 import (
        PackedSemantic4Index,
        cosine4_scan_topk,
        cosine4a_scan_topk,
    )

    scan_fn = cosine4a_scan_topk if query_mode == "asym" else cosine4_scan_topk

    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    n_shards = mesh.shape[axis]
    local_rows = index.capacity // n_shards
    if block_rows is None:
        block_rows = min(32768, local_rows)
    md = jnp.float32(max_distance)
    index_specs = PackedSemantic4Index(P(axis, None), P(axis), P(axis), P(axis))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), index_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def scan_shard(q, local_index):
        local_d, local_i = scan_fn(
            q, local_index, k=k, max_distance=md, block_rows=block_rows
        )
        offset = lax.axis_index(axis).astype(jnp.int32) * jnp.int32(local_rows)
        global_i = jnp.where(local_i >= 0, local_i + offset, -1)
        g_d = lax.all_gather(local_d, axis)
        g_i = lax.all_gather(global_i, axis)
        return _merge_gathered(g_d, g_i, k)

    best_d, best_i = scan_shard(query_u8, index)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


def sharded_cosine4_scan_topk_auto(
    query_u8: jnp.ndarray,
    index,
    mesh: Mesh,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: Optional[int] = None,
    axis: str = "data",
    query_mode: str = "asym",
):
    """Guaranteed-exact distributed int4 scan: per-shard sampled-threshold
    pass (XLA; the int4 distance spec), local-proof flags ANDed over ICI,
    unproven queries repaired with the exact sharded scan."""
    from pixelbox_tpu.ops.int4 import PackedSemantic4Index
    from pixelbox_tpu.ops.scan import repair_unproven

    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    n_shards = mesh.shape[axis]
    local_rows = index.capacity // n_shards
    if block_rows is None:
        block_rows = min(32768, local_rows)
    if local_rows <= 4 * block_rows:
        best_d, best_i = sharded_cosine4_scan_topk(
            query_u8, index, mesh, k=k, max_distance=max_distance,
            block_rows=block_rows, axis=axis, query_mode=query_mode,
        )
        if squeeze:
            return best_d[0], best_i[0]
        return best_d, best_i

    stride = 1
    while (
        stride * 2 <= max(1, local_rows // 65536)
        and local_rows % (stride * 2) == 0
    ):
        stride *= 2
    md = jnp.float32(max_distance)
    index_specs = PackedSemantic4Index(P(axis, None), P(axis), P(axis), P(axis))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), index_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def scan_shard(q, local_index):
        sample = ScanSample(
            local_index.data[::stride],
            local_index.row_sum[::stride],
            local_index.row_mag2[::stride],
            local_index.valid[::stride],
        )
        local_d, local_i, exact = cosine_scan_topk_threshold(
            q, local_index, sample, k=k, max_distance=md,
            block_rows=block_rows,
            precision="int4a" if query_mode == "asym" else "int4",
        )
        offset = lax.axis_index(axis).astype(jnp.int32) * jnp.int32(local_rows)
        global_i = jnp.where(local_i >= 0, local_i + offset, -1)
        g_d = lax.all_gather(local_d, axis)
        g_i = lax.all_gather(global_i, axis)
        merged_d, merged_i = _merge_gathered(g_d, g_i, k)
        exact_all = jnp.all(lax.all_gather(exact, axis), axis=0)
        return merged_d, merged_i, exact_all

    best_d, best_i, exact = scan_shard(query_u8, index)
    best_d, best_i = repair_unproven(
        query_u8, best_d, best_i, exact,
        lambda rq: sharded_cosine4_scan_topk(
            rq, index, mesh, k=k, max_distance=max_distance,
            block_rows=block_rows, axis=axis, query_mode=query_mode,
        ),
    )
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


def sharded_cosine_scan_topk_auto(
    query_u8: jnp.ndarray,
    index: PackedSemanticIndex,
    mesh: Mesh,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: Optional[int] = None,
    axis: str = "data",
    budget: int = 4,
):
    """Guaranteed-exact distributed scan at threshold-selection speed.

    Multi-chip version of ``ops.scan.cosine_scan_topk_auto``: every shard
    runs the sampled-threshold scan on its resident rows (local strided
    sample → per-query θ → bounded candidate extraction) and proves its
    LOCAL top-k exact; the k·n_chips candidates merge over ICI exactly as
    in :func:`sharded_cosine_scan_topk`.  A query's merged result is
    exact iff every shard proved its local result (the flags AND across
    the mesh — one ``all_gather`` of Q booleans); unproven queries are
    re-scanned with the exact sharded path and spliced back.  Results are
    always identical to mode="exact".
    """
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    n_shards = mesh.shape[axis]
    local_rows = index.capacity // n_shards
    if block_rows is None:
        block_rows = min(32768, local_rows)
    if local_rows <= 4 * block_rows:
        # Small shards: selection is cheap; the exact path is the fast path.
        best_d, best_i = sharded_cosine_scan_topk(
            query_u8, index, mesh, k=k, max_distance=max_distance,
            block_rows=block_rows, axis=axis, mode="exact",
        )
        if squeeze:
            return best_d[0], best_i[0]
        return best_d, best_i

    stride = 1
    while (
        stride * 2 <= max(1, local_rows // 65536)
        and local_rows % (stride * 2) == 0
    ):
        stride *= 2
    md = jnp.float32(max_distance)
    index_specs = PackedSemanticIndex(P(axis, None), P(axis), P(axis), P(axis))

    from pixelbox_tpu.ops.scan import _default_backend_is_tpu

    use_pallas = (
        _default_backend_is_tpu()
        and local_rows % 2048 == 0
        and index.data.shape[1] % 128 == 0
        and query_u8.shape[0] <= 512
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), index_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def scan_shard(q, local_index):
        sample = ScanSample(
            local_index.data[::stride],
            local_index.row_sum[::stride],
            local_index.row_mag2[::stride],
            local_index.valid[::stride],
        )
        if use_pallas:
            # Real TPU mesh: the fused threshold kernel runs per shard
            # (same kernel as single-chip auto); the CPU-simulated mesh
            # exercises the XLA path below.
            from pixelbox_tpu.ops.pallas_scan import (
                build_row_meta,
                pallas_threshold_scan_topk_v2,
            )

            meta = build_row_meta(local_index)
            local_d, local_i, exact = pallas_threshold_scan_topk_v2(
                q, local_index, meta, sample, k=k, max_distance=md
            )
        else:
            local_d, local_i, exact = cosine_scan_topk_threshold(
                q, local_index, sample, k=k, max_distance=md,
                block_rows=block_rows, budget=budget,
            )
        shard_id = lax.axis_index(axis)
        offset = shard_id.astype(jnp.int32) * jnp.int32(local_rows)
        global_i = jnp.where(local_i >= 0, local_i + offset, -1)
        g_d = lax.all_gather(local_d, axis)
        g_i = lax.all_gather(global_i, axis)
        merged_d, merged_i = _merge_gathered(g_d, g_i, k)
        # Merged result is exact iff EVERY shard proved its local top-k.
        exact_all = jnp.all(lax.all_gather(exact, axis), axis=0)
        return merged_d, merged_i, exact_all

    best_d, best_i, exact = scan_shard(query_u8, index)
    from pixelbox_tpu.ops.scan import repair_unproven

    best_d, best_i = repair_unproven(
        query_u8, best_d, best_i, exact,
        lambda rq: sharded_cosine_scan_topk(
            rq, index, mesh, k=k, max_distance=max_distance,
            block_rows=block_rows, axis=axis, mode="exact",
        ),
    )
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i


@partial(jax.jit, donate_argnums=(0,))
def _sharded_dus(index, data, row_sum, row_mag2, valid, start):
    """In-place row update of a (sharded) packed index; the SPMD
    partitioner lowers the dynamic-update-slice to writes on the owning
    shard(s) only.  Type-preserving: ``index`` may be a
    PackedSemanticIndex OR a PackedSemantic4Index (same four fields) —
    rebuilding as the wrong type would desync the pytree from the int4
    shard_map in_specs on the next sharded scan."""
    return index._replace(
        data=lax.dynamic_update_slice_in_dim(index.data, data, start, axis=0),
        row_sum=lax.dynamic_update_slice_in_dim(
            index.row_sum, row_sum, start, axis=0
        ),
        row_mag2=lax.dynamic_update_slice_in_dim(
            index.row_mag2, row_mag2, start, axis=0
        ),
        valid=lax.dynamic_update_slice_in_dim(index.valid, valid, start, axis=0),
    )


def append_to_sharded_index(
    sharded,
    rows_u8: np.ndarray,
    valid: np.ndarray,
    start: int,
    kind: str = "semantic",
):
    """Write freshly appended rows [start, start+m) into an existing
    sharded index WITHOUT re-transferring it (continuous ingest under
    serve_on_mesh).  ``rows_u8`` may include already-present rows before
    ``start`` — callers pad the delta back to a size bucket with rows the
    mirror already holds, bounding compile-cache churn to O(log n) shapes.
    ``valid`` carries the rows' CURRENT validity (padding may cover rows
    tombstoned before an earlier full reshard — writing True there would
    resurrect them).  Capacity changes / new deletes must be handled by
    the caller (full reshard).  ``kind`` matches the store's
    ("semantic" or "semantic4")."""
    if kind == "semantic4":
        from pixelbox_tpu.ops.int4 import semantic4_rows_from_u8

        data, row_sum, row_mag2 = semantic4_rows_from_u8(rows_u8)
    else:
        data, row_sum, row_mag2 = semantic_rows_from_u8(rows_u8)
    return _sharded_dus(
        sharded,
        jnp.asarray(data),
        jnp.asarray(row_sum),
        jnp.asarray(row_mag2),
        jnp.asarray(np.ascontiguousarray(valid, dtype=bool)),
        jnp.int32(start),
    )


def append_to_sharded_hamming_index(sharded, rows_u8, valid, start: int):
    """Hamming twin of :func:`append_to_sharded_index`: write freshly
    appended phash rows [start, start+m) into the existing sharded
    mirror without re-transferring it (continuous ingest under
    serve_on_mesh with phash queries).  Same caller contract: pad the
    delta to a size bucket with rows the mirror already holds, carry
    CURRENT validity, and full-reshard on any structural change
    (capacity growth, deletes, compaction, width growth)."""
    return sharded._replace(
        data=lax.dynamic_update_slice_in_dim(
            sharded.data,
            jnp.asarray(np.ascontiguousarray(rows_u8, dtype=np.uint8)),
            jnp.int32(start),
            axis=0,
        ),
        valid=lax.dynamic_update_slice_in_dim(
            sharded.valid,
            jnp.asarray(np.ascontiguousarray(valid, dtype=bool)),
            jnp.int32(start),
            axis=0,
        ),
    )


def sharded_hamming_scan_topk(
    query_u8: jnp.ndarray,
    index: PackedHammingIndex,
    mesh: Mesh,
    k: int = 100,
    max_distance: float = 1e3,
    block_rows: Optional[int] = None,
    axis: str = "data",
    wrap_u8: bool = False,
    byte_limit: Optional[int] = None,
    valid_mask: Optional[jnp.ndarray] = None,
):
    """Distributed Hamming scan.  ``byte_limit`` + ``valid_mask`` carry
    the zip-truncate group semantics (engine.rs:594-604) onto the mesh:
    the engine scans each min(query_width, row_width) group with that
    byte limit over the group's row mask — the mask shards with the rows
    and folds into each shard's validity, so mixed-width compat phash
    libraries serve from the mesh exactly like uniform ones."""
    squeeze = query_u8.ndim == 1
    if squeeze:
        query_u8 = query_u8[None, :]
    n_shards = mesh.shape[axis]
    local_rows = index.capacity // n_shards
    if block_rows is None:
        block_rows = min(32768, local_rows)
    md = jnp.float32(max_distance)

    index_specs = PackedHammingIndex(P(axis, None), P(axis))
    mask_spec = (P(axis),) if valid_mask is not None else ()
    mask_args = (
        (jnp.asarray(valid_mask, dtype=bool),) if valid_mask is not None else ()
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), index_specs) + mask_spec,
        out_specs=(P(), P()),
        check_vma=False,
    )
    def scan_shard(q, local_index, *local_mask):
        if local_mask:
            local_index = local_index._replace(
                valid=jnp.logical_and(local_index.valid, local_mask[0])
            )
        local_d, local_i = hamming_scan_topk(
            q, local_index, k=k, max_distance=md, block_rows=block_rows,
            wrap_u8=wrap_u8, byte_limit=byte_limit,
        )
        offset = lax.axis_index(axis).astype(jnp.int32) * jnp.int32(local_rows)
        global_i = jnp.where(local_i >= 0, local_i + offset, -1)
        g_d = lax.all_gather(local_d, axis)
        g_i = lax.all_gather(global_i, axis)
        return _merge_gathered(g_d, g_i, k)

    best_d, best_i = scan_shard(query_u8, index, *mask_args)
    best_d, best_i = topk_ops.finalize_topk(best_d, best_i)
    if squeeze:
        return best_d[0], best_i[0]
    return best_d, best_i
