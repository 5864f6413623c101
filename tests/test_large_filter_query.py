"""Broad-filter text query takes the masked device scan path."""

import numpy as np
import pytest

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.records import IndexedImage
from pixelbox_tpu.ops import oracle


@pytest.fixture(scope="module")
def big_engine(tmp_path_factory):
    # Own seeded stream: the shared `rng` fixture is function-scoped
    # (seeded per test node), which a module-scoped fixture can't use.
    rng = np.random.default_rng(0xB16)
    db_path = tmp_path_factory.mktemp("db") / "big.db"
    eng = Engine.new(str(db_path), embedder="stub", embedder_kwargs={"dim": 16})
    n = 20000  # > the 16384 masked-scan threshold
    hashes = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    records = [
        IndexedImage(
            filename=f"img{i:05d}.png",
            path=f"/syn/img{i:05d}.png",
            resolution=(8, 8),
            visual_hash=hashes[i],
        )
        for i in range(n)
    ]
    for s in range(0, n, 2000):
        eng.insert_records_batch(records[s : s + 2000])
    return eng, hashes


def test_broad_filter_similar_matches_oracle(big_engine, rng):
    eng, hashes = big_engine
    probe = hashes[12345]
    eng._cached_image_search = IndexedImage(path="/probe", visual_hash=probe)
    eng.max_search_results = 25
    eng.query("img")  # matches every filename → broad filter, masked scan
    results = eng.get_query_results()
    assert len(results) == 25
    exp_d, exp_i = oracle.cosine_scan_topk_np(probe, hashes, k=25, max_distance=np.inf)
    got_names = [r.filename for r in results]
    exp_names = [f"img{int(i):05d}.png" for i in exp_i[0]]
    assert got_names == exp_names
    assert results[0].filename == "img12345.png"
    np.testing.assert_allclose(
        [r.distance_from_query for r in results], exp_d[0], rtol=1e-6, atol=0
    )


def test_narrow_filter_still_exact(big_engine):
    eng, hashes = big_engine
    probe = hashes[7]
    eng._cached_image_search = IndexedImage(path="/probe2", visual_hash=probe)
    eng.max_search_results = 5
    eng.query("img0000")  # matches img00000..img00009 → 10 rows, gather path
    results = eng.get_query_results()
    assert len(results) == 5
    assert results[0].filename == "img00007.png"
    assert results[0].distance_from_query < 1e-6


def test_broad_filter_similar_on_mesh_matches_single_chip(big_engine):
    """Broad-filtered similar: queries shard under serve_on_mesh (the
    filter mask folds into the sharded mirror's validity) and match the
    single-chip masked scan exactly."""
    from pixelbox_tpu.parallel.mesh import make_mesh

    eng, hashes = big_engine
    probe = hashes[4321]
    eng._cached_image_search = IndexedImage(path="/probe3", visual_hash=probe)
    eng.max_search_results = 20
    eng.query("img")
    single = [
        (r.filename, round(float(r.distance_from_query), 6))
        for r in eng.get_query_results()
    ]
    assert single[0][0] == "img04321.png"

    eng.serve_on_mesh(make_mesh(8))
    try:
        eng._cached_image_search = IndexedImage(
            path="/probe3b", visual_hash=probe
        )
        eng.query("img")
        got = [
            (r.filename, round(float(r.distance_from_query), 6))
            for r in eng.get_query_results()
        ]
        assert got == single
    finally:
        eng.scan_mesh = None


def test_broad_filter_int4_on_mesh(tmp_path, rng):
    """Same parity for an int4 library (sharded masked candidates +
    exact-u8 rerank)."""
    from pixelbox_tpu.parallel.mesh import make_mesh

    eng = Engine.new(
        str(tmp_path / "big4.db"), embedder="stub",
        embedder_kwargs={"dim": 16}, semantic_precision="int4",
    )
    try:
        n = 18000
        hashes = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
        records = [
            IndexedImage(
                filename=f"img{i:05d}.png",
                path=f"/syn4/img{i:05d}.png",
                resolution=(8, 8),
                visual_hash=hashes[i],
            )
            for i in range(n)
        ]
        for s in range(0, n, 2000):
            eng.insert_records_batch(records[s : s + 2000])
        probe = hashes[999]
        eng.max_search_results = 15
        eng._cached_image_search = IndexedImage(path="/p4", visual_hash=probe)
        eng.query("img")
        single = [
            (r.filename, round(float(r.distance_from_query), 6))
            for r in eng.get_query_results()
        ]
        assert single[0] == ("img00999.png", 0.0)  # exact-u8 rerank

        eng.serve_on_mesh(make_mesh(8))
        eng._cached_image_search = IndexedImage(path="/p4b", visual_hash=probe)
        eng.query("img")
        got = [
            (r.filename, round(float(r.distance_from_query), 6))
            for r in eng.get_query_results()
        ]
        assert got == single
    finally:
        eng.scan_mesh = None
        eng.close()
