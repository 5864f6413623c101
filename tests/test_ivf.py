"""IVF clustered index: k-means, bucket packing, probe scan, recall.

The IVF mode's contract: candidate SELECTION is approximate (probe the
nprobe nearest clusters), but distances of returned rows are the exact u8
reciprocal-cosine values (engine.rs:572-588 semantics) — and with
``nprobe == n_clusters`` the probe covers every bucket, so IVF + the
always-exact spill scan must equal the flat exact scan bit-for-bit.
"""

import numpy as np
import pytest

from pixelbox_tpu.ops import ivf as ivf_ops
from pixelbox_tpu.ops.packed import semantic_rows_from_u8
from pixelbox_tpu.ops.scan import cosine_scan_topk

import jax.numpy as jnp


def _clustered_rows(rng, n, d, n_blobs=8, spread=12.0):
    """Structured u8 embeddings: tanh-ish latents around blob centers."""
    centers = rng.normal(size=(n_blobs, d)) * 40.0
    which = rng.integers(0, n_blobs, size=n)
    x = centers[which] + rng.normal(size=(n, d)) * spread
    return np.clip(x + 128.0, 0, 255).astype(np.uint8), which


def _flat_index(rows):
    n, d = rows.shape
    n_pad = -(-n // 8) * 8
    mat = np.zeros((n_pad, d), dtype=np.uint8)
    mat[:n] = rows
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    data, s, m = semantic_rows_from_u8(mat)
    from pixelbox_tpu.ops.packed import PackedSemanticIndex

    return PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(s), jnp.asarray(m), jnp.asarray(valid)
    ), n_pad


def test_kmeans_separates_blobs(rng):
    rows, which = _clustered_rows(rng, 600, 32, n_blobs=4, spread=4.0)
    valid = np.ones(len(rows), dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 4, iters=10, seed=0)
    assign = ivf_ops.assign_rows_u8(rows, cents)
    # Every k-means cluster should be dominated by one blob (pure >= 90%).
    for c in np.unique(assign):
        members = which[assign == c]
        top = np.bincount(members).max()
        assert top / len(members) >= 0.9


def test_full_nprobe_equals_exact_scan(rng):
    rows, _ = _clustered_rows(rng, 500, 32)
    valid = np.ones(len(rows), dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 8, iters=5, seed=1)
    # Tiny cap forces spill: exactness must survive overflow.
    index = ivf_ops.build_ivf(rows, valid, cents, bucket_cap=32)
    assert index.spill_count > 0

    flat, _ = _flat_index(rows)
    q = rows[rng.integers(0, len(rows), size=5)]
    d_ivf, i_ivf = ivf_ops.ivf_scan_topk(q, index, k=10, nprobe=8)
    d_ex, i_ex = cosine_scan_topk(jnp.asarray(q), flat, k=10,
                                  block_rows=flat.capacity)
    np.testing.assert_array_equal(np.asarray(i_ivf), np.asarray(i_ex))
    np.testing.assert_allclose(np.asarray(d_ivf), np.asarray(d_ex),
                               rtol=0, atol=0)


def test_tie_break_across_clusters_matches_exact():
    """Two rows at EXACTLY equal u8 distance to the query (q[0]==q[1];
    row1 = row0 with those coords swapped), assigned to different
    clusters, with the higher-row-id row's cluster probed first.  The
    probe layout's rank order must not decide the tie — the flat scan's
    ascending-row-id contract (SQLite rowid order) must."""
    q = np.array([[100, 100, 10, 250, 40, 200, 30, 90]], dtype=np.uint8)
    row0 = np.array([30, 220, 60, 60, 10, 90, 170, 128], dtype=np.uint8)
    row1 = row0.copy()
    row1[[0, 1]] = row1[[1, 0]]
    rows = np.stack([row0, row1])
    valid = np.ones(2, dtype=bool)
    # Hand-placed centroids: cluster 0 attracts row1, cluster 1 row0.
    cents = np.concatenate([
        ivf_ops._unit_rows_f32(row1[None]),
        ivf_ops._unit_rows_f32(row0[None]),
    ])
    assign = ivf_ops.assign_rows_u8(rows, cents)
    assert assign[0] == 1 and assign[1] == 0

    index = ivf_ops.build_ivf(rows, valid, cents)
    flat, _ = _flat_index(rows)
    d, i = ivf_ops.ivf_scan_topk(q, index, k=1, nprobe=2)
    d_ex, i_ex = cosine_scan_topk(jnp.asarray(q), flat, k=1,
                                  block_rows=flat.capacity)
    assert np.isfinite(np.asarray(d_ex)[0, 0])  # tie is inside threshold
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ex))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ex))
    assert int(np.asarray(i)[0, 0]) == 0  # ascending row id wins the tie


def test_full_nprobe_equals_exact_under_heavy_ties(rng):
    """Low-cardinality rows make equal integer distances common; full-
    probe IVF (tiny caps forcing spill) must still match the exact scan
    bit-for-bit, ids included."""
    vals = np.array([0, 128, 255], dtype=np.uint8)
    rows = vals[rng.integers(0, 3, size=(300, 8))]
    valid = np.ones(len(rows), dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 6, iters=4, seed=7)
    index = ivf_ops.build_ivf(rows, valid, cents, bucket_cap=16)
    assert index.spill_count > 0
    flat, _ = _flat_index(rows)
    q = rows[rng.integers(0, len(rows), size=8)]
    d, i = ivf_ops.ivf_scan_topk(q, index, k=20, nprobe=index.n_clusters)
    d_ex, i_ex = cosine_scan_topk(jnp.asarray(q), flat, k=20,
                                  block_rows=flat.capacity)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ex))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ex))


def test_rebuild_spill_incremental_matches_exact(rng):
    """rebuild_spill shares the buckets and only repacks the spill; with
    full nprobe the extended index equals the exact scan over all rows."""
    rows, _ = _clustered_rows(rng, 240, 32)
    valid = np.ones(240, dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows[:200], valid[:200], 4, iters=4,
                                     seed=8)
    base = ivf_ops.build_ivf(rows[:200], valid[:200], cents, bucket_cap=32)
    spill_base = ivf_ops.live_spill_ids(base).astype(np.int64)
    ext = ivf_ops.rebuild_spill(
        base, rows,
        np.concatenate([spill_base, np.arange(200, 240, dtype=np.int64)]),
    )
    assert ext.bucket_data is base.bucket_data  # buckets shared, no repack
    assert (len(ivf_ops.live_spill_ids(ext))
            == len(ivf_ops.live_spill_ids(base)) + 40)
    # Pow2-padded spill capacity: repeated extends reuse compile shapes.
    assert ext.spill_count == ivf_ops.spill_pad(
        len(ivf_ops.live_spill_ids(ext)))

    flat, _ = _flat_index(rows)
    q = rows[rng.integers(0, 240, size=4)]
    d, i = ivf_ops.ivf_scan_topk(q, ext, k=10, nprobe=4)
    d_ex, i_ex = cosine_scan_topk(jnp.asarray(q), flat, k=10,
                                  block_rows=flat.capacity)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ex))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ex))


def test_int4_buckets_full_probe_equals_flat_int4_exact(rng):
    """precision='int4': nibble buckets at half the HBM; full-probe IVF
    (spill forced) equals the flat asymmetric int4 exact scan and its
    numpy oracle bit-for-bit."""
    from pixelbox_tpu.ops.int4 import (
        build_semantic4_index,
        cosine4a_scan_topk,
        cosine4a_scan_topk_np,
    )

    rows, _ = _clustered_rows(rng, 400, 32)
    valid = np.ones(len(rows), dtype=bool)
    valid[::9] = False
    cents = ivf_ops.spherical_kmeans(rows, valid, 6, iters=5, seed=11)
    index = ivf_ops.build_ivf(rows, valid, cents, bucket_cap=24,
                              precision="int4")
    assert index.kind == "cosine4a"
    assert index.spill_count > 0
    # Half the bucket bytes of the u8 packing.
    assert index.bucket_data.shape[2] == 16 and index.dim == 32

    q = rows[rng.integers(0, len(rows), size=5)]
    d_ivf, i_ivf = ivf_ops.ivf_scan_topk(q, index, k=12,
                                         nprobe=index.n_clusters)
    d_ivf, i_ivf = np.asarray(d_ivf), np.asarray(i_ivf)

    flat4 = build_semantic4_index(rows, block_rows=len(rows))
    flat4 = flat4._replace(valid=jnp.asarray(valid))
    d_fl, i_fl = cosine4a_scan_topk(jnp.asarray(q), flat4, k=12,
                                    block_rows=len(rows))
    np.testing.assert_array_equal(i_ivf, np.asarray(i_fl))
    np.testing.assert_array_equal(d_ivf, np.asarray(d_fl))

    # And the numpy oracle agrees (restricted to valid rows).
    d_np, i_np = cosine4a_scan_topk_np(q, rows[valid], k=12)
    live_map = np.flatnonzero(valid)
    i_np = np.where(np.asarray(i_np) >= 0, live_map[np.asarray(i_np)], -1)
    np.testing.assert_array_equal(i_ivf, i_np)


def test_int4_buckets_rebuild_spill_keeps_packing(rng):
    """rebuild_spill on an int4 index packs the new spill in the int4
    layout (the incremental-append path must not silently widen)."""
    rows, _ = _clustered_rows(rng, 200, 32)
    valid = np.ones(200, dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows[:160], valid[:160], 4, iters=4,
                                     seed=12)
    base = ivf_ops.build_ivf(rows[:160], valid[:160], cents,
                             precision="int4")
    spill_base = ivf_ops.live_spill_ids(base).astype(np.int64)
    ext = ivf_ops.rebuild_spill(
        base, rows,
        np.concatenate([spill_base, np.arange(160, 200, dtype=np.int64)]),
    )
    assert ext.bucket_data is base.bucket_data
    assert ext.spill.data.dtype == jnp.uint8  # packed nibbles
    assert ext.spill.data.shape[1] == 16      # D/2

    from pixelbox_tpu.ops.int4 import cosine4a_scan_topk_np

    q = rows[rng.integers(0, 200, size=3)]
    d, i = ivf_ops.ivf_scan_topk(q, ext, k=10, nprobe=4)
    d_np, i_np = cosine4a_scan_topk_np(q, rows, k=10)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_np))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_np),
                               rtol=0, atol=0)


def test_max_distance_filter_and_padding(rng):
    rows, _ = _clustered_rows(rng, 200, 32)
    valid = np.ones(len(rows), dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 4, iters=5, seed=2)
    index = ivf_ops.build_ivf(rows, valid, cents)
    q = rows[:1]
    d, i = ivf_ops.ivf_scan_topk(q, index, k=10, nprobe=4,
                                 max_distance=1e-9)
    d, i = np.asarray(d)[0], np.asarray(i)[0]
    # Only the self-match (dist exactly 0) survives a 1e-9 threshold.
    assert i[0] == 0 and d[0] == 0.0
    assert np.all(i[1:] == -1)


def test_recall_at_low_nprobe(rng):
    rows, _ = _clustered_rows(rng, 4000, 32, n_blobs=16)
    valid = np.ones(len(rows), dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 32, iters=8, seed=3)
    index = ivf_ops.build_ivf(rows, valid, cents)
    flat, _ = _flat_index(rows)

    # Perturbed-row queries (nearest-neighbor structure, not self-match).
    base = rows[rng.integers(0, len(rows), size=16)].astype(np.int32)
    q = np.clip(base + rng.integers(-6, 7, size=base.shape), 0, 255)
    q = q.astype(np.uint8)

    _, i_ivf = ivf_ops.ivf_scan_topk(q, index, k=10, nprobe=4)
    _, i_ex = cosine_scan_topk(jnp.asarray(q), flat, k=10,
                               block_rows=flat.capacity)
    i_ivf, i_ex = np.asarray(i_ivf), np.asarray(i_ex)
    hits = sum(
        len(set(i_ivf[r]) & set(i_ex[r][i_ex[r] >= 0]))
        for r in range(len(q))
    )
    total = int((i_ex >= 0).sum())
    assert hits / total >= 0.8, hits / total


def test_tombstoned_rows_never_returned(rng):
    rows, _ = _clustered_rows(rng, 300, 32)
    valid = np.ones(len(rows), dtype=bool)
    valid[::3] = False
    cents = ivf_ops.spherical_kmeans(rows, valid, 4, iters=5, seed=4)
    index = ivf_ops.build_ivf(rows, valid, cents)
    q = rows[rng.integers(0, len(rows), size=4)]
    _, i = ivf_ops.ivf_scan_topk(q, index, k=20, nprobe=4)
    i = np.asarray(i)
    returned = i[i >= 0]
    assert np.all(returned % 3 != 0)


def test_single_query_squeeze(rng):
    rows, _ = _clustered_rows(rng, 100, 32)
    valid = np.ones(len(rows), dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 2, iters=3, seed=5)
    index = ivf_ops.build_ivf(rows, valid, cents)
    d, i = ivf_ops.ivf_scan_topk(rows[7], index, k=5, nprobe=2)
    assert d.shape == (5,) and i.shape == (5,)
    assert int(np.asarray(i)[0]) == 7
    assert float(np.asarray(d)[0]) == 0.0


def test_fewer_rows_than_clusters(rng):
    rows, _ = _clustered_rows(rng, 6, 16)
    valid = np.ones(len(rows), dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 64, iters=3, seed=6)
    assert cents.shape[0] <= 6
    index = ivf_ops.build_ivf(rows, valid, cents)
    # Full-nprobe equivalence holds at any n-vs-C ratio (default
    # max_distance excludes near-orthogonal rows on BOTH sides).
    flat, _ = _flat_index(rows)
    d, i = ivf_ops.ivf_scan_topk(rows[:2], index, k=6,
                                 nprobe=cents.shape[0])
    d_ex, i_ex = cosine_scan_topk(jnp.asarray(rows[:2]), flat, k=6,
                                  block_rows=flat.capacity)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ex))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ex))


def _dup_db(r, n, d):
    """Random rows with a controlled duplicate rate (tie pressure)."""
    base = r.integers(0, 256, size=(max(8, n // 8), d), dtype=np.uint8)
    picks = r.integers(0, len(base), size=n)
    noise = r.integers(0, 256, size=(n, d), dtype=np.uint8)
    mask = r.uniform(size=(n, 1)) < r.uniform(0.2, 0.9)
    return np.where(mask, base[picks], noise).astype(np.uint8)


@pytest.mark.parametrize("trial", range(4))
def test_ivf_full_probe_randomized(trial):
    """Property: full-probe IVF equals the flat exact scan for RANDOM
    configurations — cluster counts, bucket caps (spill pressure),
    duplicate rates (tie pressure), tombstones, u8 and int4 packings."""
    r = np.random.default_rng(300 + trial)
    n = int(r.integers(500, 3000))
    d = int(r.choice([16, 32]))
    c = int(r.integers(2, 12))
    cap = int(r.choice([8, 16, 64]))
    k = int(r.integers(3, 40))
    md = float(r.choice([0.5, 1e3, 1e7]))
    precision = str(r.choice(["u8", "int4"]))
    db = _dup_db(r, n, d)
    valid = r.uniform(size=n) > 0.1
    if not valid.any():
        valid[0] = True
    q = np.concatenate([
        db[r.integers(0, n, size=3)],
        r.integers(0, 256, size=(2, d), dtype=np.uint8),
    ])

    cents = ivf_ops.spherical_kmeans(db, valid, c, iters=4, seed=trial)
    index = ivf_ops.build_ivf(db, valid, cents, bucket_cap=cap,
                              precision=precision)
    got_d, got_i = ivf_ops.ivf_scan_topk(q, index, k=k,
                                         nprobe=index.n_clusters,
                                         max_distance=md)
    got_d, got_i = np.asarray(got_d), np.asarray(got_i)

    if precision == "int4":
        from pixelbox_tpu.ops.int4 import cosine4a_scan_topk_np

        exp_d, exp_i = cosine4a_scan_topk_np(q, db[valid], k=k,
                                             max_distance=md)
    else:
        from pixelbox_tpu.ops import oracle

        exp_d, exp_i = oracle.cosine_scan_topk_np(q, db[valid], k=k,
                                                  max_distance=md)
    live_map = np.flatnonzero(valid)
    exp_i = np.where(np.asarray(exp_i) >= 0,
                     live_map[np.maximum(np.asarray(exp_i), 0)], -1)
    np.testing.assert_array_equal(got_i, exp_i)
    np.testing.assert_array_equal(got_d, np.asarray(exp_d))
