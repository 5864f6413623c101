"""End-to-end Engine tests: index a folder, search by text and by image."""

import os

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine

from fixtures import flat_white, gradient_image, textured_image


@pytest.fixture(scope="module")
def photo_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("photos")
    (d / "sub").mkdir()
    images = {
        "white.png": flat_white((64, 64)),
        "tex1.png": textured_image(seed=1, size=(64, 64)),
        "tex2.png": textured_image(seed=2, size=(64, 64)),
        "grad.jpg": gradient_image((60, 90)),
        os.path.join("sub", "tex1_copy.png"): textured_image(seed=1, size=(64, 64)),
    }
    for name, arr in images.items():
        Image.fromarray(arr).save(d / name)
    # A non-image file that must be ignored.
    (d / "notes.txt").write_text("not an image")
    return d


@pytest.fixture(scope="module")
def engine(photo_dir, tmp_path_factory):
    db = tmp_path_factory.mktemp("db") / "lib.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 32})
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    return eng


def test_indexing_counts(engine):
    assert engine.get_num_indexed_images() == 5
    assert engine.try_get_num_indexed_images() == 5


def test_reindex_is_idempotent(engine):
    engine.start_indexing(num_workers=2)
    assert engine.wait_for_indexing(timeout=120)
    assert engine.get_num_indexed_images() == 5


def test_text_query_by_filename(engine):
    engine.query("tex1")
    results = engine.get_query_results()
    names = {r.filename for r in results}
    assert names == {"tex1.png", "tex1_copy.png"}


def test_text_query_no_match(engine):
    engine.query("zzz_nothing")
    assert engine.get_query_results() == []


def test_empty_query_keeps_results(engine):
    engine.query("tex1")
    engine.query("")
    assert engine.get_query_results() is not None


def test_query_by_image_finds_duplicate_first(engine, photo_dir):
    engine.query_by_image_hash_from_file(str(photo_dir / "tex1.png"))
    results = engine.get_query_results()
    assert len(results) >= 2
    # tex1 and its copy are pixel-identical → distance ~0, ranked first.
    top_names = {results[0].filename, results[1].filename}
    assert top_names == {"tex1.png", "tex1_copy.png"}
    assert results[0].distance_from_query < 1e-5
    assert results[1].distance_from_query < 1e-5


def test_query_respects_max_results(engine, photo_dir):
    engine.max_search_results = 2
    try:
        engine.query_by_image_hash_from_file(str(photo_dir / "tex1.png"))
        assert len(engine.get_query_results()) <= 2
    finally:
        engine.max_search_results = 100


def test_similar_operator_orders_by_distance(engine, photo_dir):
    engine._cached_image_search = None
    engine.query(f'similar:{photo_dir / "tex1.png"} tex')
    results = engine.get_query_results()
    assert results, "similar: with filename filter returned nothing"
    assert results[0].filename in ("tex1.png", "tex1_copy.png")
    dists = [r.distance_from_query for r in results]
    assert dists == sorted(dists)


def test_pure_similar_query_works(engine, photo_dir):
    """Divergence from the reference (whose empty WHERE clause errors)."""
    engine._cached_image_search = None
    engine.query(f'similar:{photo_dir / "white.png"}')
    results = engine.get_query_results()
    assert results
    assert results[0].filename == "white.png"


def test_results_carry_metadata(engine):
    engine.query("grad")
    (r,) = engine.get_query_results()
    assert r.filename == "grad.jpg"
    assert r.resolution == (90, 60)  # width, height
    assert r.thumbnail is not None
    rgb, (w, h) = r.get_thumbnail()
    assert (w, h) == (90, 60)
    assert r.visual_hash is not None


def test_phash_query(engine, photo_dir):
    rec = engine.load_image(str(photo_dir / "tex2.png"))
    engine.query_by_phash(rec.phash)
    results = engine.get_query_results()
    assert results
    assert results[0].filename == "tex2.png"
    assert results[0].distance_from_query == 0.0


def test_insert_single_image(engine, tmp_path):
    img = textured_image(seed=9, size=(40, 40))
    p = tmp_path / "extra.png"
    Image.fromarray(img).save(p)
    image_id = engine.insert_image_from_path(str(p))
    assert image_id is not None
    assert engine.get_num_indexed_images() == 6
    # Inserting the same path again is a no-op.
    assert engine.insert_image_from_path(str(p)) is None
    assert str(p) in " ".join(engine.get_last_added()) or engine.get_last_added()


def test_reopen_rebuilds_device_stores(engine, tmp_path_factory, photo_dir):
    eng2 = Engine.open(engine.db_path, embedder="stub", embedder_kwargs={"dim": 32})
    assert eng2.get_num_indexed_images() == engine.get_num_indexed_images()
    eng2.query_by_image_hash_from_file(str(photo_dir / "tex1.png"))
    results = eng2.get_query_results()
    assert results[0].distance_from_query < 1e-5
    eng2.close()


def test_malformed_query_raises(engine):
    from pixelbox_tpu.query import QueryTokenizeError

    with pytest.raises(QueryTokenizeError):
        engine.query('broken "quote')


def test_pallas_scan_mode(engine, photo_dir):
    """Engine scan_mode='pallas' runs the fused Mosaic kernel (interpret
    mode on CPU) and finds the exact duplicate pair."""
    from jax.experimental.pallas import tpu as pltpu

    engine.scan_mode = "pallas"
    try:
        with pltpu.force_tpu_interpret_mode():
            engine.query_by_image_hash_from_file(str(photo_dir / "tex1.png"))
        results = engine.get_query_results()
        names = {results[0].filename, results[1].filename}
        assert names == {"tex1.png", "tex1_copy.png"}
        assert results[0].distance_from_query < 1e-5
    finally:
        engine.scan_mode = "auto"


def test_query_by_image_hash_from_id(engine):
    """Find-similar on an indexed image uses the STORED hash: exact
    self-match at dist 0 with no re-decode."""
    eng = engine
    eng.query("tex")  # populate results to grab an id
    target = eng.get_query_results()[0]
    eng.max_distance_from_query = 1e7
    eng.query_by_image_hash_from_id(target.id)
    results = eng.get_query_results()
    assert results[0].id == target.id
    assert results[0].distance_from_query == 0.0
    # Unknown id → friendly error, empty results.
    eng.query_by_image_hash_from_id(10 ** 9)
    assert eng.get_query_results() == []
    assert "no semantic hash" in eng.last_query_error
    eng.max_distance_from_query = 1e3


def test_reopen_without_dim_restores_stored_width(tmp_path, photo_dir):
    """The embedding width persists in the library (like
    semantic_precision): reopening with no dim restores the indexed
    width instead of the embedder default (which later failed with an
    opaque reshape error — round-3 UX fix).  Pre-existing libraries
    without the setting fall back to the stored hash width."""
    db = str(tmp_path / "redim.db")
    eng = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 48})
    eng.max_distance_from_query = 1e7
    probe = None
    imgs = sorted(q for q in photo_dir.iterdir() if q.suffix == ".png")
    for p in imgs[:3]:
        eng.insert_image_from_path(str(p))
        probe = probe or str(p)
    eng.close()

    eng2 = Engine.open(db, embedder="stub")  # NO dim anywhere
    try:
        assert eng2.embedder.dim == 48
        eng2.max_distance_from_query = 1e7
        eng2.query_by_image_hash_from_file(probe)
        assert eng2.get_query_results()[0].path == probe
    finally:
        eng2.close()

    # Fallback source: a library whose settings row predates the
    # feature (or a reference DB) infers from the stored hashes.
    eng3 = Engine.open(db)
    eng3.catalog.set_setting("embedder_dim", "")
    eng3.close()
    eng4 = Engine.open(db, embedder="stub")
    try:
        assert eng4.embedder.dim == 48
    finally:
        eng4.close()


def test_embedder_choice_persists(tmp_path, photo_dir):
    """The embedder name + model path persist in the library: reopening
    with NO flags restores them (querying a real-model library with the
    default stub would silently return garbage rankings)."""
    import json

    from test_onnx_graph import _build_tiny_cnn

    rng = np.random.default_rng(3)
    model_path = str(tmp_path / "user_model.onnx")
    _build_tiny_cnn(model_path, rng, latent=16)

    db = str(tmp_path / "emb.db")
    eng = Engine.new(
        db, embedder="onnx",
        embedder_kwargs={"model": model_path, "input_size": 32},
    )
    imgs = sorted(q for q in photo_dir.iterdir() if q.suffix == ".png")
    probe = str(imgs[0])
    eng.max_distance_from_query = 1e7
    for p in imgs[:3]:
        eng.insert_image_from_path(str(p))
    eng.query_by_image_hash_from_file(probe)
    expected = [
        (r.filename, round(float(r.distance_from_query), 5))
        for r in eng.get_query_results()
    ]
    eng.close()

    eng2 = Engine.open(db)  # NO embedder / model / dim flags at all
    try:
        assert eng2._embedder_name == "onnx"
        assert eng2._embedder_kwargs.get("model") == model_path
        eng2.max_distance_from_query = 1e7
        eng2.query_by_image_hash_from_file(probe)
        got = [
            (r.filename, round(float(r.distance_from_query), 5))
            for r in eng2.get_query_results()
        ]
        assert got == expected
    finally:
        eng2.close()

    # Explicit choice still overrides and re-persists.
    eng3 = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 16})
    try:
        assert eng3._embedder_name == "stub"
    finally:
        eng3.close()
    eng4 = Engine.open(db)
    try:
        assert eng4._embedder_name == "stub"
    finally:
        eng4.close()


def test_blip_and_ocr_flags_persist(tmp_path):
    """--blip / --ocr persist in the library like --faces / --precision:
    flag-less reopen keeps text: and OCR indexing working."""
    db = str(tmp_path / "flags.db")
    eng = Engine.new(
        db, embedder="stub", embedder_kwargs={"dim": 16},
        blip=True, ocr=True,
    )
    eng.close()
    eng2 = Engine.open(db)
    try:
        assert eng2._blip_enabled and eng2.ocr_enabled
    finally:
        eng2.close()
    # Explicit False turns them off and persists.
    eng3 = Engine.open(db, blip=False, ocr=False)
    eng3.close()
    eng4 = Engine.open(db)
    try:
        assert not eng4._blip_enabled and not eng4.ocr_enabled
    finally:
        eng4.close()


def test_phash_compat_persists(tmp_path):
    """phash geometry (compat/aspect vs fixed-square) persists — a
    square-hash library must not silently compute aspect-preserving
    QUERY phashes after a flag-less reopen."""
    db = str(tmp_path / "pc.db")
    Engine.new(
        db, embedder="stub", embedder_kwargs={"dim": 16},
        phash_compat=False,
    ).close()
    eng = Engine.open(db)
    try:
        assert eng.phash_compat is False
    finally:
        eng.close()
    # Default for fresh/reference libraries stays compat=True.
    db2 = str(tmp_path / "pc2.db")
    eng2 = Engine.new(db2, embedder="stub", embedder_kwargs={"dim": 16})
    try:
        assert eng2.phash_compat is True
    finally:
        eng2.close()
