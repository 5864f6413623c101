"""Streaming top-k primitives for blockwise index scans.

The reference's query is ``WHERE dist < max ORDER BY dist ASC LIMIT k``
(src/engine.rs:375-383) evaluated by SQLite streaming over rows.  On TPU the
index is scanned in row blocks; each block produces a candidate set that is
merged into a running per-query top-k.  Ties prefer the earlier (smaller) row
index via stable sorting, matching SQLite's rowid scan order for equal
distances.
"""

from __future__ import annotations

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


def lex_topk(dist: jnp.ndarray, idx: jnp.ndarray, k: int,
             segment: int = 16384):
    """Top-k smallest by lexicographic (dist, idx) over one candidate pool.

    Unlike :func:`block_topk` (which relies on ``lax.top_k``'s positional
    stability, i.e. candidate positions already ascending in row id), this
    sorts with the row id as a second key — use it when the pool's layout
    does NOT follow row-id order (e.g. IVF probe candidates, laid out in
    probe-rank order).  Non-finite entries get idx 2^31-1 so they sort
    last among themselves; callers run :func:`finalize_topk` to turn them
    into -1.  Output is fully sorted ascending by (dist, idx), satisfying
    :func:`merge_sorted_topk`'s input contract.

    Pools beyond ``segment`` candidates sort per-segment and tree-merge:
    TPU ``lax.sort`` cost grows superlinearly, and the 10M-row IVF
    probe's 400k-candidate pool measured 8.3 ms as ONE sort vs 2.3 ms
    segmented (the probe's dominant term).  Per-segment top-k + bitonic
    pair merges is exactly the global top-k (each segment contributes at
    most k survivors), same tie order.
    """
    b = dist.shape[-1]
    if b < k:
        pad = [(0, 0)] * (dist.ndim - 1) + [(0, k - b)]
        dist = jnp.pad(dist, pad, constant_values=jnp.inf)
        idx = jnp.pad(idx, pad, constant_values=jnp.int32(2 ** 31 - 1))
    idx = jnp.where(jnp.isfinite(dist), idx, jnp.int32(2 ** 31 - 1))
    # Segments must hold at least k survivors each — a k above the
    # default segment width (reachable via a huge max_search_results
    # through the IVF probe) widens the segment instead of truncating.
    segment = max(segment, k)
    if b > max(k, segment):
        nseg = -(-b // segment)
        pad_n = nseg * segment - b
        if pad_n:
            pad = [(0, 0)] * (dist.ndim - 1) + [(0, pad_n)]
            dist = jnp.pad(dist, pad, constant_values=jnp.inf)
            idx = jnp.pad(idx, pad,
                          constant_values=jnp.int32(2 ** 31 - 1))
        batch = dist.shape[:-1]
        d_s, i_s = lax.sort(
            (dist.reshape(*batch, nseg, segment),
             idx.reshape(*batch, nseg, segment)),
            num_keys=2, dimension=-1,
        )
        return tree_merge_sorted(d_s[..., :k], i_s[..., :k], k)
    d_s, i_s = lax.sort((dist, idx), num_keys=2, dimension=-1)
    return d_s[..., :k], i_s[..., :k]


def tree_merge_sorted(bd: jnp.ndarray, bi: jnp.ndarray, k: int):
    """Fold [..., S, k] per-segment (dist, idx)-ascending candidate
    lists into the global top-k with log2(S) VECTORIZED pairwise bitonic
    merges (all segment pairs merge at once per level).  Exactly the
    top-k of the union: each segment contributes at most k survivors."""
    batch = bd.shape[:-2]
    nseg = bd.shape[-2]
    while nseg > 1:
        if nseg % 2:
            pad = [(0, 0)] * (bd.ndim - 2) + [(0, 1), (0, 0)]
            bd = jnp.pad(bd, pad, constant_values=jnp.inf)
            bi = jnp.pad(bi, pad, constant_values=jnp.int32(2 ** 31 - 1))
            nseg += 1
        d2 = bd.reshape(*batch, nseg // 2, 2, k)
        i2 = bi.reshape(*batch, nseg // 2, 2, k)
        bd, bi = merge_sorted_topk(
            d2[..., 0, :], i2[..., 0, :], d2[..., 1, :], i2[..., 1, :], k,
        )
        nseg //= 2
    return bd.reshape(*batch, k), bi.reshape(*batch, k)


def merge_topk(dist_a, idx_a, dist_b, idx_b, k: int):
    """Merge two candidate lists into the k smallest, stable on ties.

    ``a`` entries sort before ``b`` entries at equal distance (pass the
    running carry as ``a`` so earlier rows win ties).

    General (unsorted inputs) but slow on TPU — lax.sort lowers to a long
    compare-exchange network.  The blocked scans use
    :func:`merge_sorted_topk` instead.
    """
    d = jnp.concatenate([dist_a, dist_b], axis=-1)
    i = jnp.concatenate([idx_a, idx_b], axis=-1)
    d_s, i_s = lax.sort((d, i), num_keys=1, dimension=-1, is_stable=True)
    return d_s[..., :k], i_s[..., :k]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def merge_sorted_topk(dist_a, idx_a, dist_b, idx_b, k: int):
    """Merge two ASCENDING-sorted candidate lists into the k smallest.

    O(log k) bitonic-merge stages of vectorized compare-exchanges — far
    cheaper on TPU than a general sort.  Ties order by ascending idx
    (lexicographic (dist, idx) exchange predicate), so results match the
    oracle's ascending-row-id tie-break exactly.

    Inputs [..., k] must each be sorted ascending by (dist, idx) — which
    ``lax.top_k``-produced candidates and previous merge outputs are.
    Output is fully sorted ascending.
    """
    kp = _next_pow2(k)
    pad = [(0, 0)] * (dist_a.ndim - 1) + [(0, kp - k)]
    if kp != k:
        dist_a = jnp.pad(dist_a, pad, constant_values=jnp.inf)
        dist_b = jnp.pad(dist_b, pad, constant_values=jnp.inf)
        idx_a = jnp.pad(idx_a, pad, constant_values=jnp.int32(2 ** 31 - 1))
        idx_b = jnp.pad(idx_b, pad, constant_values=jnp.int32(2 ** 31 - 1))
    # concat(A asc, reverse(B asc)) is bitonic; merging sorts it.
    d = jnp.concatenate([dist_a, jnp.flip(dist_b, axis=-1)], axis=-1)
    i = jnp.concatenate([idx_a, jnp.flip(idx_b, axis=-1)], axis=-1)
    n = 2 * kp
    batch = d.shape[:-1]
    stride = kp
    while stride >= 1:
        dr = d.reshape(*batch, n // (2 * stride), 2, stride)
        ir = i.reshape(*batch, n // (2 * stride), 2, stride)
        d_lo, d_hi = dr[..., 0, :], dr[..., 1, :]
        i_lo, i_hi = ir[..., 0, :], ir[..., 1, :]
        swap = (d_hi < d_lo) | ((d_hi == d_lo) & (i_hi < i_lo))
        new_lo_d = jnp.where(swap, d_hi, d_lo)
        new_hi_d = jnp.where(swap, d_lo, d_hi)
        new_lo_i = jnp.where(swap, i_hi, i_lo)
        new_hi_i = jnp.where(swap, i_lo, i_hi)
        d = jnp.stack([new_lo_d, new_hi_d], axis=-2).reshape(*batch, n)
        i = jnp.stack([new_lo_i, new_hi_i], axis=-2).reshape(*batch, n)
        stride //= 2
    return d[..., :k], i[..., :k]


def empty_topk(batch_shape, k: int):
    """An empty carry: all +inf distances, -1 indices."""
    d = jnp.full(tuple(batch_shape) + (k,), jnp.inf, dtype=jnp.float32)
    i = jnp.full(tuple(batch_shape) + (k,), -1, dtype=jnp.int32)
    return d, i


def finalize_topk(dist: jnp.ndarray, idx: jnp.ndarray):
    """Replace +inf sentinel entries (below-threshold / padding) with idx=-1."""
    keep = jnp.isfinite(dist)
    return jnp.where(keep, dist, jnp.inf), jnp.where(keep, idx, -1)
