"""Filtered text queries under int4 rescore with the exact u8 metric.

The int4 rerank contract (engine.int4_rerank, default on) must hold on
EVERY query path: a given image pair scores the same u8 distance whether
the similar-image query is unfiltered (query_by_image_hash_from_image),
narrow-filtered (host gather over the matched subset), or broad-filtered
(masked device scan, >16384 matched rows).  Regression tests for the
round-3 review finding where the filtered paths still ranked in the raw
asymmetric int4 metric.
"""

import numpy as np
import pytest

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.records import IndexedImage
from pixelbox_tpu.ops import oracle


@pytest.fixture(scope="module")
def big_int4_engine(tmp_path_factory):
    rng = np.random.default_rng(0)
    db_path = tmp_path_factory.mktemp("db") / "big4.db"
    eng = Engine.new(str(db_path), embedder="stub",
                     embedder_kwargs={"dim": 16}, semantic_precision="int4")
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


def test_broad_filter_int4_reranks_to_u8(big_int4_engine):
    """>16384 matched rows → masked int4 candidate scan + exact-u8 rerank."""
    eng, hashes = big_int4_engine
    probe = hashes[12345]
    eng._cached_image_search = IndexedImage(path="/probe", visual_hash=probe)
    eng.max_search_results = 25
    eng.query("img")  # matches every filename → broad filter, masked scan
    results = eng.get_query_results()
    assert len(results) == 25
    # Self-match is EXACTLY 0 — only the u8 metric does that (the raw
    # asymmetric int4 metric carries quantization error ~0.004).
    assert results[0].filename == "img12345.png"
    assert results[0].distance_from_query == 0.0
    # Every returned distance is the true u8 distance for that row.
    got_rows = np.array(
        [int(r.filename[3:8]) for r in results], dtype=np.int64
    )
    true_d = oracle.cosine_distance_np(probe[None, :], hashes[got_rows])
    np.testing.assert_allclose(
        [r.distance_from_query for r in results], true_d, rtol=1e-6, atol=0
    )
    dists = [r.distance_from_query for r in results]
    assert dists == sorted(dists)


def test_narrow_filter_int4_matches_u8_oracle(big_int4_engine):
    """≤16384 matched rows → the subset IS the candidate set: results are
    bit-identical to the exact u8 oracle over the subset."""
    eng, hashes = big_int4_engine
    probe = hashes[7]
    eng._cached_image_search = IndexedImage(path="/probe2", visual_hash=probe)
    eng.max_search_results = 5
    eng.query("img0000")  # matches img00000..img00009 → 10 rows
    results = eng.get_query_results()
    assert len(results) == 5
    exp_d, exp_i = oracle.cosine_scan_topk_np(
        probe, hashes[:10], k=5, max_distance=np.inf
    )
    got = [(int(r.filename[3:8]), r.distance_from_query) for r in results]
    want = [(int(i), float(v)) for v, i in zip(exp_d[0], exp_i[0]) if i >= 0]
    assert [g[0] for g in got] == [w[0] for w in want]
    np.testing.assert_allclose(
        [g[1] for g in got], [w[1] for w in want], rtol=1e-6, atol=0
    )
    assert got[0] == (7, 0.0)  # exact u8 self-match


def test_filtered_and_unfiltered_distances_agree(big_int4_engine):
    """The same image pair scores the same distance with and without a
    filter (the round-3 review finding)."""
    eng, hashes = big_int4_engine
    probe_row = 4242
    rec = IndexedImage(path="/probe3", visual_hash=hashes[probe_row])
    eng.max_search_results = 10
    eng.max_distance_from_query = 1e7
    eng.query_by_image_hash_from_image(rec)
    unfiltered = {
        r.filename: r.distance_from_query for r in eng.get_query_results()
    }
    eng._cached_image_search = rec
    eng.query("img")  # filter matches everything
    filtered = {
        r.filename: r.distance_from_query for r in eng.get_query_results()
    }
    common = set(unfiltered) & set(filtered)
    assert common  # the top hits overlap
    for name in common:
        assert unfiltered[name] == filtered[name], name


def test_narrow_filter_without_rerank_uses_int4_metric(big_int4_engine):
    """int4_rerank=False restores the raw asymmetric metric on the
    filtered path (self-match near-0, not exactly 0)."""
    eng, hashes = big_int4_engine
    probe = hashes[3]
    eng._cached_image_search = IndexedImage(path="/probe4", visual_hash=probe)
    eng.max_search_results = 5
    eng.int4_rerank = False
    try:
        eng.query("img0000")
        results = eng.get_query_results()
    finally:
        eng.int4_rerank = True
    assert results[0].filename == "img00003.png"
    assert 0.0 < results[0].distance_from_query < 0.01
