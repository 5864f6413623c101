"""Broad-filter text query takes the masked device scan path."""

import numpy as np
import pytest

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.records import IndexedImage
from pixelbox_tpu.ops import oracle


@pytest.fixture(scope="module")
def big_engine(tmp_path_factory, rng):
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
