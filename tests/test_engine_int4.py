"""Engine-level int4 index precision (semantic_precision='int4')."""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.ops.int4 import cosine4a_scan_topk_np

from fixtures import textured_image


@pytest.fixture(scope="module")
def int4_engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("photos")
    for s in range(8):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    db = tmp_path_factory.mktemp("db") / "i4.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 32},
                     semantic_precision="int4")
    eng.max_distance_from_query = 1e7
    for s in range(8):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    yield eng, d, str(db)
    eng.close()


def test_store_is_packed(int4_engine):
    eng, d, _ = int4_engine
    assert eng._sem_store.kind == "semantic4"
    # Device bytes per row: half the embedding width.
    assert eng._sem_store.device_index.data.shape[1] == 16
    # The catalog keeps full u8 hashes.
    _, blob = next(iter(eng.catalog.iter_hashes("semantic_hashes")))
    assert len(blob) == 32


def _catalog_hashes(eng):
    ids, blobs = [], []
    for image_id, blob in eng.catalog.iter_hashes("semantic_hashes"):
        ids.append(image_id)
        blobs.append(np.frombuffer(blob, np.uint8))
    return ids, np.stack(blobs)


def test_query_matches_u8_oracle_via_rerank(int4_engine):
    """Default int4 queries rescore candidates with the EXACT u8 metric
    (engine.int4_rerank): on a small library the candidate list covers
    everything, so results equal the full-precision u8 oracle — same ids,
    same distances an int8 library would report."""
    from pixelbox_tpu.ops.oracle import cosine_scan_topk_np

    eng, d, _ = int4_engine
    rec = eng.load_image(str(d / "s3.png"))
    eng.query_by_image_hash_from_image(rec)
    got = [
        (r.id, round(r.distance_from_query, 6)) for r in eng.get_query_results()
    ]
    ids, blobs = _catalog_hashes(eng)
    exp_d, exp_i = cosine_scan_topk_np(
        rec.visual_hash, blobs, k=eng.max_search_results,
        max_distance=eng.max_distance_from_query,
    )
    want = [
        (ids[i], round(float(v), 6))
        for v, i in zip(exp_d[0], exp_i[0]) if i >= 0
    ]
    assert got == want
    # Exact-u8 rescoring restores the EXACT self-match: distance 0.
    assert got[0][1] == 0.0


def test_query_matches_int4_oracle_without_rerank(int4_engine):
    """int4_rerank=False restores raw asymmetric int4-metric results."""
    eng, d, _ = int4_engine
    rec = eng.load_image(str(d / "s3.png"))
    eng.int4_rerank = False
    try:
        eng.query_by_image_hash_from_image(rec)
        got = [
            (r.id, round(r.distance_from_query, 6))
            for r in eng.get_query_results()
        ]
    finally:
        eng.int4_rerank = True
    ids, blobs = _catalog_hashes(eng)
    exp_d, exp_i = cosine4a_scan_topk_np(
        rec.visual_hash, blobs, k=eng.max_search_results,
        max_distance=eng.max_distance_from_query,
    )
    want = [
        (ids[i], round(float(v), 6))
        for v, i in zip(exp_d[0], exp_i[0]) if i >= 0
    ]
    assert got == want
    # Asymmetric metric: the u8 query vs its int4-quantized row carries
    # quantization error, so the self-match is near-0 (top-ranked), not
    # exactly 0.
    assert got[0][0] is not None and 0.0 < got[0][1] < 0.01


def test_exact_mode_matches_auto(int4_engine):
    eng, d, _ = int4_engine
    rec = eng.load_image(str(d / "s5.png"))
    eng.scan_mode = "exact"
    eng.query_by_image_hash_from_image(rec)
    exact = [(r.id, round(r.distance_from_query, 6))
             for r in eng.get_query_results()]
    eng.scan_mode = "auto"
    eng.query_by_image_hash_from_image(rec)
    auto = [(r.id, round(r.distance_from_query, 6))
            for r in eng.get_query_results()]
    assert exact == auto


def test_mesh_matches_single_chip(int4_engine):
    from pixelbox_tpu.parallel.mesh import make_mesh

    eng, d, _ = int4_engine
    rec = eng.load_image(str(d / "s0.png"))
    eng.scan_mesh = None
    eng.query_by_image_hash_from_image(rec)
    single = [
        (r.id, round(r.distance_from_query, 6)) for r in eng.get_query_results()
    ]
    eng.serve_on_mesh(make_mesh(8))
    try:
        for mode in ("auto", "exact"):
            eng.scan_mode = mode
            eng.query_by_image_hash_from_image(rec)
            sharded = [
                (r.id, round(r.distance_from_query, 6))
                for r in eng.get_query_results()
            ]
            assert sharded == single, mode
    finally:
        eng.scan_mesh = None
        eng.scan_mode = "auto"


def test_precision_persists_and_explicit_override(int4_engine, tmp_path):
    eng, d, db = int4_engine
    # Reopen WITHOUT the flag: the library's persisted precision applies.
    eng_keep = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 32})
    assert eng_keep.semantic_precision == "int4"
    assert eng_keep._sem_store.kind == "semantic4"
    eng_keep.close()

    # Explicit override reopens at full precision (catalog keeps u8).
    eng2 = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 32},
                       semantic_precision="int8")
    eng2.max_distance_from_query = 1e7
    assert eng2._sem_store.kind == "semantic"
    rec = eng2.load_image(str(d / "s2.png"))
    eng2.query_by_image_hash_from_image(rec)
    assert eng2.get_query_results()[0].filename == "s2.png"
    assert eng2.get_query_results()[0].distance_from_query == 0.0
    eng2.close()
    # The override persisted; flip the library back to int4 for any
    # later tests sharing the fixture.
    Engine.open(db, embedder="stub", embedder_kwargs={"dim": 32},
                semantic_precision="int4").close()


def test_odd_dim_rejected_for_int4(tmp_path):
    eng = Engine.new(str(tmp_path / "odd.db"), embedder="stub",
                     embedder_kwargs={"dim": 33}, semantic_precision="int4")
    img = tmp_path / "a.png"
    Image.fromarray(textured_image(seed=1, size=(32, 32))).save(img)
    with pytest.raises(ValueError, match="even embedding dim"):
        eng.insert_image_from_path(str(img))
    eng.close()


def test_similar_text_query_uses_int4(int4_engine):
    eng, d, _ = int4_engine
    eng.query(f"similar:{d / 's4.png'}")
    results = eng.get_query_results()
    assert results[0].filename == "s4.png"
    dists = [r.distance_from_query for r in results]
    assert dists == sorted(dists)


def test_semantic4_store_lifecycle(tmp_path, rng):
    """save/load/delete/compact round-trip for the packed int4 store."""
    from pixelbox_tpu.index.store import VectorStore
    from pixelbox_tpu.ops.int4 import unpack_u4_rows_np, quantize_u8_to_u4

    store = VectorStore(dim=32, kind="semantic4", block_rows=1024)
    rows = rng.integers(0, 256, size=(300, 32), dtype=np.uint8)
    ids = store.append(rows)
    assert store.device_index.data.shape[1] == 16  # packed
    # Device nibbles decode back to the quantized codes.
    got = unpack_u4_rows_np(np.asarray(store.device_index.data)[:300])
    np.testing.assert_array_equal(got, quantize_u8_to_u4(rows))

    store.delete(ids[:10])
    assert store.size == 290
    assert not bool(np.asarray(store.device_index.valid)[:10].any())

    p = str(tmp_path / "s4.npz")
    store.save(p)
    loaded = VectorStore.load(p)
    assert loaded.kind == "semantic4"
    assert loaded.size == 290
    np.testing.assert_array_equal(
        np.asarray(loaded.device_index.data), np.asarray(store.device_index.data)
    )

    mapping = store.compact()
    assert store.n == 290 and store.n_deleted == 0
    assert (mapping[:10] == -1).all()


def test_no_rerank_warns_loudly(tmp_path, capsys):
    """Disabling the exact-u8 rerank on an int4 library prints the loud
    quality warning (raw int4 recall@10 vs u8 measured ~0.5 — VERDICT
    r4 ask #6), exactly once at engine construction; the default
    (rerank on) stays silent."""
    db = str(tmp_path / "warn.db")
    eng = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 32},
                     semantic_precision="int4", int4_rerank=False)
    eng.close()
    err = capsys.readouterr().err
    assert "int4_rerank disabled" in err and "recall@10" in err

    # Rerank on (the default): no warning.
    eng = Engine(db, int4_rerank=True)
    eng.close()
    assert "int4_rerank disabled" not in capsys.readouterr().err

    # Reopen WITHOUT an explicit precision (persisted int4) but with the
    # rerank off: the warning must still fire.
    eng = Engine(db, int4_rerank=False)
    eng.close()
    assert "int4_rerank disabled" in capsys.readouterr().err

    # u8 library: the flag is a no-op, no warning.
    db8 = str(tmp_path / "warn8.db")
    eng = Engine.new(db8, embedder="stub", embedder_kwargs={"dim": 32},
                     int4_rerank=False)
    eng.close()
    assert "int4_rerank disabled" not in capsys.readouterr().err
