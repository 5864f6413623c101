"""Turbo ingest mode: device-batched phash + single host resize."""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine

from fixtures import textured_image


@pytest.fixture(scope="module")
def turbo_engine(tmp_path_factory):
    photos = tmp_path_factory.mktemp("photos")
    for s in (1, 2, 3):
        Image.fromarray(textured_image(seed=s, size=(90, 140))).save(
            photos / f"t{s}.png"
        )
    db = tmp_path_factory.mktemp("db") / "turbo.db"
    eng = Engine.new(
        str(db), embedder="stub", embedder_kwargs={"dim": 16}, phash_compat=False
    )
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    return eng


def test_turbo_indexes_everything(turbo_engine):
    assert turbo_engine.get_num_indexed_images() == 3


def test_turbo_phashes_fixed_width(turbo_engine):
    hashes = list(turbo_engine.catalog.iter_hashes("phashes"))
    assert len(hashes) == 3
    for _, h in hashes:
        assert len(h) == 32  # square-mode 256-bit hash


def test_turbo_similarity_still_exact(turbo_engine, tmp_path):
    img = textured_image(seed=2, size=(90, 140))
    p = tmp_path / "probe.png"
    Image.fromarray(img).save(p)
    turbo_engine.query_by_image_hash_from_file(str(p))
    results = turbo_engine.get_query_results()
    assert results[0].filename == "t2.png"
    assert results[0].distance_from_query < 1e-4


def test_turbo_phash_query(turbo_engine):
    ph = turbo_engine._ph_store.get_rows([1])[0]
    turbo_engine.query_by_phash(ph)
    results = turbo_engine.get_query_results()
    assert results[0].distance_from_query == 0.0
