"""Image removal (the reference's unimplemented TODO, engine.rs:414)."""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine

from fixtures import textured_image


@pytest.fixture
def engine(tmp_path):
    photos = tmp_path / "photos"
    (photos / "sub").mkdir(parents=True)
    for s in (1, 2, 3):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            photos / f"r{s}.png"
        )
    Image.fromarray(textured_image(seed=4, size=(48, 48))).save(
        photos / "sub" / "r4.png"
    )
    eng = Engine.new(str(tmp_path / "rm.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    return eng


def test_remove_image(engine):
    engine.query("r2")
    (rec,) = engine.get_query_results()
    assert engine.remove_image(rec.id)
    assert engine.get_num_indexed_images() == 3
    # Gone from text search...
    engine.query("r2")
    assert engine.get_query_results() == []
    # ...and from similarity search: its own hash must not return it.
    from pixelbox_tpu.records import IndexedImage

    hr = IndexedImage(visual_hash=rec.visual_hash)
    engine.query_by_image_hash_from_image(hr)
    names = {r.filename for r in engine.get_query_results()}
    assert "r2.png" not in names


def test_remove_missing_returns_false(engine):
    assert engine.remove_image(99999) is False


def test_remove_idempotent(engine):
    engine.query("r1")
    (rec,) = engine.get_query_results()
    assert engine.remove_image(rec.id)
    assert engine.remove_image(rec.id) is False


def test_compact_after_removal(engine):
    engine.query("r3")
    (rec,) = engine.get_query_results()
    engine.remove_image(rec.id)
    deleted_before = engine._sem_store.n_deleted
    assert deleted_before > 0
    engine.compact()
    assert engine._sem_store.n_deleted == 0
    # Mappings renumbered consistently: every surviving image still
    # searchable by its own hash at distance ~0.
    engine.query("r1")
    results = engine.get_query_results()
    if results:  # r1 may have been removed by earlier tests in this module
        from pixelbox_tpu.records import IndexedImage

        hr = IndexedImage(visual_hash=results[0].visual_hash)
        engine.query_by_image_hash_from_image(hr)
        assert engine.get_query_results()[0].filename == "r1.png"
        assert engine.get_query_results()[0].distance_from_query < 1e-5


def test_remove_folder_and_images(engine, tmp_path):
    sub = str(tmp_path / "photos" / "sub")
    n = engine.remove_tracked_folder_and_images(sub)
    assert n == 1
    engine.query("r4")
    assert engine.get_query_results() == []
    assert engine.get_num_indexed_images() == 3
