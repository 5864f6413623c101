"""Device-side IVF build (ops/ivf_build.py) parity vs the host packer.

The capacity-scale path (>=10M rows) builds the clustered index entirely
on device; these tests pin it to the host builder's exact output —
identical buckets, moments, spill layout, and probe results — so the two
builders stay interchangeable (ops.ivf.build_ivf routes by size).
Reference semantics anchor: src/engine.rs:375-383 (the exact scan IVF
relaxes; distances stay the exact integer spec either way).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pixelbox_tpu.ops import ivf as ivf_ops
from pixelbox_tpu.ops import ivf_build


def _clustered(rng, n, d, n_centers=13, noise=6):
    """Well-separated clusters so nearest-centroid assignment has no
    f32 ties (host and device GEMMs may round differently on ties)."""
    centers = rng.integers(0, 256, size=(n_centers, d), dtype=np.int16)
    assign = rng.integers(0, n_centers, size=n)
    rows = centers[assign] + rng.integers(-noise, noise + 1, size=(n, d),
                                          dtype=np.int16)
    return np.clip(rows, 0, 255).astype(np.uint8)


def _assert_index_equal(a: ivf_ops.IVFIndex, b: ivf_ops.IVFIndex):
    np.testing.assert_array_equal(np.asarray(a.centroids),
                                  np.asarray(b.centroids))
    np.testing.assert_array_equal(np.asarray(a.bucket_data),
                                  np.asarray(b.bucket_data))
    np.testing.assert_array_equal(np.asarray(a.bucket_sum),
                                  np.asarray(b.bucket_sum))
    np.testing.assert_array_equal(np.asarray(a.bucket_mag2),
                                  np.asarray(b.bucket_mag2))
    np.testing.assert_array_equal(np.asarray(a.bucket_rows),
                                  np.asarray(b.bucket_rows))
    np.testing.assert_array_equal(np.asarray(a.bucket_valid),
                                  np.asarray(b.bucket_valid))
    assert a.spill_count == b.spill_count
    np.testing.assert_array_equal(np.asarray(a.spill_rows),
                                  np.asarray(b.spill_rows))
    np.testing.assert_array_equal(np.asarray(a.spill.data),
                                  np.asarray(b.spill.data))
    np.testing.assert_array_equal(np.asarray(a.spill.row_sum),
                                  np.asarray(b.spill.row_sum))
    np.testing.assert_array_equal(np.asarray(a.spill.row_mag2),
                                  np.asarray(b.spill.row_mag2))
    np.testing.assert_array_equal(np.asarray(a.spill.valid),
                                  np.asarray(b.spill.valid))


def _host_build(rows, valid, cents, **kw):
    os.environ["PIXELBOX_IVF_HOST_PACK"] = "1"
    try:
        return ivf_ops.build_ivf(rows, valid, cents, **kw)
    finally:
        del os.environ["PIXELBOX_IVF_HOST_PACK"]


@pytest.mark.parametrize("precision", ["u8", "int4"])
def test_device_pack_matches_host(rng, precision):
    n, d = 3000, 16
    rows = _clustered(rng, n, d)
    valid = np.ones(n, dtype=bool)
    valid[rng.integers(0, n, size=40)] = False
    cents = ivf_ops.spherical_kmeans(rows, valid, 13, iters=5, seed=1)

    host = _host_build(rows, valid, cents, precision=precision)
    dev = ivf_build.build_ivf_device(rows, valid, cents,
                                     precision=precision)
    _assert_index_equal(host, dev)


@pytest.mark.parametrize("precision", ["u8", "int4"])
def test_device_pack_spill_and_row_ids(rng, precision):
    """A tiny bucket_cap forces heavy spill; explicit (ascending,
    offset) row ids must flow through buckets and spill unchanged."""
    n, d = 1500, 16
    rows = _clustered(rng, n, d, n_centers=5)
    valid = np.ones(n, dtype=bool)
    row_ids = (np.arange(n, dtype=np.int32) * 3) + 7
    cents = ivf_ops.spherical_kmeans(rows, valid, 5, iters=4, seed=2)

    host = _host_build(rows, valid, cents, bucket_cap=32,
                       row_ids=row_ids, precision=precision)
    dev = ivf_build.build_ivf_device(rows, valid, cents, bucket_cap=32,
                                     row_ids=row_ids, precision=precision)
    assert host.spill_count > 0  # the point of this case
    _assert_index_equal(host, dev)

    # Probe results are identical too (full-coverage nprobe == exact).
    q = _clustered(rng, 8, d, n_centers=5)
    hd, hi = ivf_ops.ivf_scan_topk(q, host, k=20, nprobe=5)
    dd, di = ivf_ops.ivf_scan_topk(q, dev, k=20, nprobe=5)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(di))
    np.testing.assert_array_equal(np.asarray(hd), np.asarray(dd))


def test_build_ivf_routes_large_to_device(rng, monkeypatch):
    """ops.ivf.build_ivf picks the device packer past the size threshold
    and produces the same index."""
    n, d = 512, 16
    rows = _clustered(rng, n, d, n_centers=4)
    valid = np.ones(n, dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 4, iters=3, seed=3)
    monkeypatch.setenv("PIXELBOX_IVF_DEVICE_PACK_MIN", "256")
    routed = ivf_ops.build_ivf(rows, valid, cents)
    host = _host_build(rows, valid, cents)
    _assert_index_equal(host, routed)


def test_kmeans_device_centroids_route_probes(rng):
    rows_np = _clustered(rng, 4000, 16, n_centers=8)
    rows = jnp.asarray(rows_np)
    cents = ivf_build.kmeans_device(rows, 8, iters=6, seed=0,
                                    train_sample=2000)
    c = np.asarray(cents)
    assert c.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, rtol=1e-4)

    # With well-separated clusters, a 1-probe scan finds the same top-10
    # as the exact flat scan for queries at cluster centers.
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    index = ivf_build.build_ivf_device(rows, None, cents)
    flat = ivf_build.flat_semantic_index_device(rows, block_rows=512)
    q = rows_np[:16]
    _, exact_i = cosine_scan_topk(jnp.asarray(q), flat, k=10,
                                  block_rows=512)
    _, got_i = ivf_ops.ivf_scan_topk(q, index, k=10, nprobe=1)
    hit = np.mean([
        len(set(np.asarray(got_i)[i]) & set(np.asarray(exact_i)[i])) / 10
        for i in range(16)
    ])
    assert hit >= 0.9, hit


def test_flat_semantic_index_device_matches_host(rng):
    from pixelbox_tpu.ops.packed import semantic_rows_from_u8

    rows = rng.integers(0, 256, size=(300, 16), dtype=np.uint8)
    dev = ivf_build.flat_semantic_index_device(rows, block_rows=64)
    data, s, m = semantic_rows_from_u8(
        np.concatenate([rows, np.zeros((20, 16), np.uint8)])
    )
    np.testing.assert_array_equal(np.asarray(dev.data), data)
    np.testing.assert_array_equal(np.asarray(dev.row_sum), s)
    np.testing.assert_array_equal(np.asarray(dev.row_mag2), m)
    assert int(np.asarray(dev.valid).sum()) == 300


def test_device_corpus_shape_and_clustering():
    rows, qs = ivf_build.device_clustered_corpus(
        7, 5000, 16, 8, n_centers=32, chunk=2048
    )
    rows_np, qs_np = np.asarray(rows), np.asarray(qs)
    assert rows_np.shape == (5000, 16) and rows_np.dtype == np.uint8
    assert qs_np.shape == (8, 16) and qs_np.dtype == np.uint8
    # Clustered: per-row nearest-center distance far below random pairs.
    from pixelbox_tpu.ops.oracle import cosine_distance_np

    d_near = cosine_distance_np(qs_np[:, None, :], rows_np[None, :512, :])
    assert float(d_near.min(axis=1).mean()) < 0.05


def test_default_nprobe_policy():
    """Recall-governed default: 2% of clusters, floor 8, capped at C.
    Pins the scaling behavior a fixed nprobe=8 lacked (recall@10 0.972
    at 1M/4000 clusters, BENCH_DETAIL r4)."""
    f = ivf_ops.default_nprobe
    assert f(1) == 1
    assert f(8) == 8
    assert f(100) == 8       # floor region
    assert f(400) == 8
    assert f(894) == 18      # the 50k auto count
    assert f(4000) == 80     # the 1M auto count
    assert f(12649) == 253   # the 10M auto count


def test_production_shape_recall_at_default_nprobe(rng):
    """>=100k rows, AUTO cluster count, DEFAULT nprobe: recall@10 vs the
    exact flat scan must hold >= 0.99 (VERDICT r4 ask #2 — the 1M TPU
    run measured 0.972 at the old fixed nprobe=8)."""
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    n, d, q = 100_000, 64, 64
    rows, queries = ivf_build.device_clustered_corpus(
        11, n, d, q, n_centers=1024
    )
    n_clusters = ivf_ops.default_n_clusters(n)
    cents = ivf_build.kmeans_device(rows, n_clusters, iters=6, seed=0,
                                    train_sample=50_000)
    index = ivf_build.build_ivf_device(rows, None, cents)
    flat = ivf_build.flat_semantic_index_device(rows, block_rows=2 ** 15)
    _, exp_i = cosine_scan_topk(queries, flat, k=10, block_rows=2 ** 15)
    _, got_i = ivf_ops.ivf_scan_topk(np.asarray(queries), index, k=10)
    exp_i, got_i = np.asarray(exp_i), np.asarray(got_i)
    recall = np.mean([
        len(set(got_i[i]) & set(exp_i[i])) / 10 for i in range(q)
    ])
    assert recall >= 0.99, (recall, n_clusters,
                            ivf_ops.default_nprobe(n_clusters))


def test_rerank_device_matches_host(rng):
    from pixelbox_tpu.ops.int4 import rerank_candidates_u8

    n, d, q, c = 400, 16, 6, 32
    rows = rng.integers(0, 256, size=(n, d), dtype=np.uint8)
    queries = rng.integers(0, 256, size=(q, d), dtype=np.uint8)
    cand = rng.integers(0, n, size=(q, c)).astype(np.int64)
    cand[:, -3:] = -1  # empty slots
    hd, hi = rerank_candidates_u8(queries, cand, rows, k=10,
                                  max_distance=0.5)
    dd, di = ivf_build.rerank_candidates_u8_device(
        queries, cand, jnp.asarray(rows), k=10, max_distance=0.5
    )
    np.testing.assert_array_equal(hi, np.asarray(di, dtype=np.int64))
    np.testing.assert_allclose(hd, np.asarray(dd), rtol=0, atol=0)


def test_pack_buckets_device_np_matches_host(rng, monkeypatch):
    """The mesh-sharded builder's per-shard pack (ops.ivf.pack_buckets)
    produces identical arrays through the device path — including the
    spill POSITION list the incremental-append path persists."""
    n, d = 1200, 16
    rows = _clustered(rng, n, d, n_centers=6)
    valid = np.ones(n, dtype=bool)
    valid[::97] = False
    row_ids = np.arange(500, 500 + n, dtype=np.int32)  # global-id offset
    cents = ivf_ops.spherical_kmeans(rows, valid, 6, iters=4, seed=5)

    host = ivf_ops.pack_buckets_host(rows, valid, cents, 64, row_ids,
                                     precision="int4")
    monkeypatch.setenv("PIXELBOX_IVF_DEVICE_PACK_MIN", "64")
    dev = ivf_ops.pack_buckets(rows, valid, cents, 64, row_ids,
                               precision="int4")
    for h, g, name in zip(host, dev, ("data", "sum", "mag2", "rows",
                                      "valid", "spill_pos")):
        np.testing.assert_array_equal(np.asarray(h), np.asarray(g),
                                      err_msg=name)


def test_sharded_build_device_pack_parity(rng, monkeypatch):
    """build_sharded_ivf through the device per-shard pack equals the
    host-pack build, probe results included."""
    import jax
    from jax.sharding import Mesh

    from pixelbox_tpu.parallel.sharded_ivf import (
        build_sharded_ivf,
        sharded_ivf_scan_topk,
    )

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    n, d = 1600, 16
    rows = _clustered(rng, n, d, n_centers=5)
    valid = np.ones(n, dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 5, iters=4, seed=6)
    q = _clustered(rng, 4, d, n_centers=5)

    monkeypatch.setenv("PIXELBOX_IVF_HOST_PACK", "1")
    sivf_h, spills_h = build_sharded_ivf(rows, valid, cents, mesh)
    dh, ih = sharded_ivf_scan_topk(q, sivf_h, mesh, k=10, nprobe=5)
    monkeypatch.delenv("PIXELBOX_IVF_HOST_PACK")
    monkeypatch.setenv("PIXELBOX_IVF_DEVICE_PACK_MIN", "64")
    sivf_d, spills_d = build_sharded_ivf(rows, valid, cents, mesh)
    dd, id_ = sharded_ivf_scan_topk(q, sivf_d, mesh, k=10, nprobe=5)

    for a, b in zip(spills_h, spills_d):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(sivf_h.bucket_rows),
                                  np.asarray(sivf_d.bucket_rows))
    np.testing.assert_array_equal(np.asarray(ih), np.asarray(id_))
    np.testing.assert_array_equal(np.asarray(dh), np.asarray(dd))


def test_tune_nprobe_meets_target(rng):
    """The opt-in measured tuner returns an nprobe whose held-out
    recall@10 vs the exact scan meets the target, and stops early when
    the floor already does."""
    n, d = 20_000, 32
    rows = _clustered(rng, n, d, n_centers=64, noise=10)
    cents = ivf_build.kmeans_device(jnp.asarray(rows),
                                    ivf_ops.default_n_clusters(n),
                                    iters=6, seed=0)
    index = ivf_build.build_ivf_device(rows, None, cents)
    nprobe, rec = ivf_build.tune_nprobe(index, rows, target_recall=0.95,
                                        q=32, seed=3)
    assert rec >= 0.95, (nprobe, rec)
    assert 1 <= nprobe <= index.n_clusters
    # An unreachable target caps at the max probed fraction and reports
    # the honest measured recall instead of looping forever.
    nprobe_hi, rec_hi = ivf_build.tune_nprobe(
        index, rows, target_recall=1.01, q=16, seed=3, max_rows_frac=0.05
    )
    assert rec_hi <= 1.0 and nprobe_hi <= index.n_clusters


def test_engine_ivf_target_recall(rng, tmp_path):
    """Engine-level opt-in: setting ivf_target_recall tunes nprobe at
    build, the tuned value drives queries, and explicit --nprobe still
    wins."""
    from PIL import Image

    from fixtures import textured_image
    from pixelbox_tpu.engine import Engine

    photos = tmp_path / "photos"
    photos.mkdir()
    for s in range(12):
        Image.fromarray(textured_image(seed=s, size=(40, 40))).save(
            photos / f"p{s}.png"
        )
    eng = Engine.new(str(tmp_path / "lib.db"), embedder="stub",
                     embedder_kwargs={"dim": 32})
    try:
        eng.add_tracked_folder(str(photos))
        eng.start_indexing(num_workers=2)
        eng.wait_for_indexing()
        eng.scan_mode = "ivf"
        eng.ivf_clusters = 3
        eng.ivf_target_recall = 0.9
        eng.query_by_image_hash_from_file(str(photos / "p3.png"))
        res = eng.get_query_results()
        assert res and res[0].path.endswith("p3.png")
        assert eng._ivf_tuned_nprobe is not None
        assert 1 <= eng._ivf_tuned_nprobe <= 3
        # Explicit knob beats the tuned value.
        eng.ivf_nprobe = 1
        eng.query_by_image_hash_from_file(str(photos / "p3.png"))
        assert eng.get_query_results()
    finally:
        eng.close()


def test_engine_target_recall_set_after_first_query(rng, tmp_path):
    """Setting ivf_target_recall AFTER an index is cached must rebuild
    and tune on the next query (the knob participates in the cache
    key), not silently no-op until an unrelated repack."""
    from PIL import Image

    from fixtures import textured_image
    from pixelbox_tpu.engine import Engine

    photos = tmp_path / "photos"
    photos.mkdir()
    for s in range(10):
        Image.fromarray(textured_image(seed=s, size=(40, 40))).save(
            photos / f"p{s}.png"
        )
    eng = Engine.new(str(tmp_path / "lib.db"), embedder="stub",
                     embedder_kwargs={"dim": 32})
    try:
        eng.add_tracked_folder(str(photos))
        eng.start_indexing(num_workers=2)
        eng.wait_for_indexing()
        eng.scan_mode = "ivf"
        eng.ivf_clusters = 2
        eng.query_by_image_hash_from_file(str(photos / "p1.png"))
        assert eng._ivf_tuned_nprobe is None  # no target yet
        eng.ivf_target_recall = 0.9
        eng.query_by_image_hash_from_file(str(photos / "p1.png"))
        assert eng._ivf_tuned_nprobe is not None
        res = eng.get_query_results()
        assert res and res[0].path.endswith("p1.png")
    finally:
        eng.close()


def test_engine_target_recall_sharded(rng, tmp_path):
    """ivf_target_recall tunes through the SHARDED scan path under
    serve_on_mesh (it was silently a no-op there once)."""
    import jax
    from PIL import Image

    from fixtures import textured_image
    from pixelbox_tpu.engine import Engine
    from pixelbox_tpu.parallel.mesh import make_mesh

    photos = tmp_path / "photos"
    photos.mkdir()
    for s in range(12):
        Image.fromarray(textured_image(seed=s, size=(40, 40))).save(
            photos / f"p{s}.png"
        )
    eng = Engine.new(str(tmp_path / "lib.db"), embedder="stub",
                     embedder_kwargs={"dim": 32})
    try:
        eng.add_tracked_folder(str(photos))
        eng.start_indexing(num_workers=2)
        eng.wait_for_indexing()
        eng.serve_on_mesh(make_mesh(len(jax.devices())))
        eng.scan_mode = "ivf"
        eng.ivf_clusters = 2
        eng.ivf_target_recall = 0.9
        eng.query_by_image_hash_from_file(str(photos / "p2.png"))
        assert eng._ivf_sharded is not None
        assert eng._ivf_tuned_nprobe is not None
        res = eng.get_query_results()
        assert res and res[0].path.endswith("p2.png")
    finally:
        eng.close()
