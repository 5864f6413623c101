"""Exact u8 rerank of int4 candidates (ops/int4.rerank_candidates_u8).

The int4 index keeps 2× rows per HBM byte; queries retrieve top-C
candidates in the int4 metric and rescore them with the exact u8 metric
from the store's u8 host mirror.  These tests pin the op's oracle
semantics ((dist, row id) lex order, strict max_distance, −1/stale-id
handling), the recall recovery on structured embeddings, and the batched
serving path.
"""

import numpy as np
import pytest

from pixelbox_tpu.ops.int4 import (
    build_semantic4_index,
    cosine4a_scan_topk_np,
    default_rerank_candidates,
    rerank_candidates_u8,
)
from pixelbox_tpu.ops.oracle import cosine_scan_topk_np


def test_covering_candidates_equal_full_u8_oracle(rng):
    """When the candidate set covers every row, the rerank IS the exact
    u8 scan — distances and ids bit-identical, ties and all."""
    db = rng.integers(0, 256, size=(500, 32), dtype=np.uint8)
    db[100] = db[7]  # an exact duplicate → a distance tie
    q = db[rng.integers(0, 500, size=5)]
    cand = np.tile(np.arange(500, dtype=np.int64), (5, 1))
    # Shuffle candidate order per query: output order must not depend on it.
    for i in range(5):
        rng.shuffle(cand[i])
    got_d, got_i = rerank_candidates_u8(q, cand, db, k=10, max_distance=1e7)
    exp_d, exp_i = cosine_scan_topk_np(q, db, k=10, max_distance=1e7)
    np.testing.assert_array_equal(got_d, exp_d)
    np.testing.assert_array_equal(got_i, exp_i)


def test_strict_max_distance_and_padding(rng):
    db = rng.integers(0, 256, size=(200, 16), dtype=np.uint8)
    q = db[3:4]
    cand = np.arange(200, dtype=np.int64)[None, :]
    # Self-match is exactly 0; a strict bound of 0 excludes even it
    # (WHERE dist < max, engine.rs:375-383).
    d0, i0 = rerank_candidates_u8(q, cand, db, k=5, max_distance=0.0)
    assert (i0 == -1).all() and np.isinf(d0).all()
    d1, i1 = rerank_candidates_u8(q, cand, db, k=5, max_distance=1e-6)
    assert i1[0, 0] == 3 and d1[0, 0] == 0.0
    assert (i1[0, 1:] == -1).all()


def test_missing_and_stale_ids_ignored(rng):
    db = rng.integers(0, 256, size=(50, 16), dtype=np.uint8)
    q = db[0:1]
    cand = np.array([[0, -1, 7, 999, 3, -1]], dtype=np.int64)  # 999 stale
    d, i = rerank_candidates_u8(q, cand, db, k=6, max_distance=1e7)
    assert i[0, 0] == 0 and d[0, 0] == 0.0
    assert set(i[0][i[0] >= 0]) == {0, 3, 7}


def test_single_query_squeeze(rng):
    db = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)
    d, i = rerank_candidates_u8(
        db[5], np.arange(64, dtype=np.int64), db, k=3, max_distance=1e7
    )
    assert d.shape == (3,) and i.shape == (3,)
    assert i[0] == 5 and d[0] == 0.0


def test_default_candidate_sizing():
    assert default_rerank_candidates(10) == 400
    assert default_rerank_candidates(100) == 400
    assert default_rerank_candidates(200) == 800
    assert default_rerank_candidates(5000) == 5000 + 4096


def _structured_latents(rng, n, d, q):
    """Clustered anisotropic tanh latents + corruption-pair queries (the
    recall bench's geometry, bench.py:bench_int4_recall_vs_u8)."""
    from pixelbox_tpu.ops.oracle import quantize_embedding_np

    centers = rng.standard_normal((64, d)).astype(np.float32)
    spectrum = (1.0 / np.sqrt(1.0 + np.arange(d))).astype(np.float32)
    assign = rng.integers(0, 64, size=n)
    z = np.tanh(
        (centers[assign] + 0.35 * rng.standard_normal((n, d)).astype(np.float32))
        * spectrum[None, :]
    )
    pick = rng.integers(0, n, size=q)
    zq = np.tanh(
        (centers[assign[pick]]
         + 0.5 * rng.standard_normal((q, d)).astype(np.float32))
        * spectrum[None, :]
    )
    return quantize_embedding_np(z), quantize_embedding_np(zq)


def test_rerank_recovers_recall_on_structured_embeddings():
    rng = np.random.default_rng(7)
    db, q = _structured_latents(rng, n=20_000, d=64, q=16)
    exp_d, exp_i = cosine_scan_topk_np(q, db, k=10, max_distance=1e7)
    raw_d, raw_i = cosine4a_scan_topk_np(q, db, k=400, max_distance=1e7)
    rer_d, rer_i = rerank_candidates_u8(q, raw_i, db, k=10, max_distance=1e7)

    def recall10(got):
        return np.mean([
            len(set(got[i][:10]) & set(exp_i[i][:10])) / 10
            for i in range(len(got))
        ])

    raw = recall10(raw_i)
    rer = recall10(rer_i)
    # Raw int4 loses neighbors on this geometry; the rerank recovers them.
    assert raw < 1.0
    assert rer > raw
    assert rer == 1.0
    # And the recovered distances are the exact u8 values.
    for i in range(len(q)):
        covered = set(exp_i[i][:10]) <= set(raw_i[i][raw_i[i] >= 0])
        if covered:
            np.testing.assert_array_equal(rer_d[i], exp_d[i])


def test_serving_int4_rerank_returns_u8_distances(rng):
    """BatchingScanService with a rows provider rescored to exact u8."""
    from pixelbox_tpu.serving import BatchingScanService

    db = rng.integers(0, 256, size=(2048, 32), dtype=np.uint8)
    index = build_semantic4_index(db, block_rows=1024)
    svc = BatchingScanService(
        lambda: index, k=10, max_distance=1e7,
        rerank_rows_provider=lambda: db,
    )
    try:
        q = db[7]
        dist, idx = svc.submit(q)
        exp_d, exp_i = cosine_scan_topk_np(q, db, k=10, max_distance=1e7)
        np.testing.assert_array_equal(idx, exp_i[0])
        np.testing.assert_array_equal(dist, exp_d[0])
        assert idx[0] == 7 and dist[0] == 0.0  # exact u8 self-match
    finally:
        svc.close()


def test_engine_duplicates_int4_rerank(tmp_path):
    """find_duplicate_pairs under int4 reports u8-metric pair distances:
    exact duplicates score exactly 0."""
    from PIL import Image

    from pixelbox_tpu.engine import Engine
    from fixtures import textured_image

    d = tmp_path / "photos"
    d.mkdir()
    arr = textured_image(seed=3, size=(48, 48))
    Image.fromarray(arr).save(d / "a.png")
    Image.fromarray(arr).save(d / "a_copy.png")
    Image.fromarray(textured_image(seed=9, size=(48, 48))).save(d / "b.png")
    eng = Engine.new(str(tmp_path / "dup.db"), embedder="stub",
                     embedder_kwargs={"dim": 32}, semantic_precision="int4")
    try:
        for f in ("a.png", "a_copy.png", "b.png"):
            eng.insert_image_from_path(str(d / f))
        pairs = eng.find_duplicate_pairs(
            max_distance=1e-3, by="semantic", k=3
        )
        assert len(pairs) == 1
        a, b, dist = pairs[0]
        assert dist == 0.0  # exact u8 rescoring of the duplicate pair
    finally:
        eng.close()
