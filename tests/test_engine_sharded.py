"""Engine serving from a row-sharded multi-chip index (8-dev CPU mesh)."""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.parallel.mesh import make_mesh

from fixtures import textured_image


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    photos = tmp_path_factory.mktemp("photos")
    for s in range(6):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            photos / f"s{s}.png"
        )
    db = tmp_path_factory.mktemp("db") / "sh.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 32})
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    return eng, photos


def results_list(eng):
    return [
        (r.filename, round(r.distance_from_query, 6))
        for r in eng.get_query_results()
    ]


def test_sharded_serving_matches_single_chip(engines):
    eng, photos = engines
    probe = str(photos / "s3.png")

    eng.scan_mesh = None
    eng.query_by_image_hash_from_file(probe)
    single = results_list(eng)

    eng.serve_on_mesh(make_mesh(8))
    eng.query_by_image_hash_from_file(probe)
    sharded = results_list(eng)
    eng.scan_mesh = None

    assert sharded == single
    assert sharded[0][0] == "s3.png"


def test_sharded_lazy_reshard_after_insert(engines, tmp_path):
    eng, photos = engines
    eng.serve_on_mesh(make_mesh(8))
    eng.query_by_image_hash_from_file(str(photos / "s1.png"))
    n_before = eng._sharded_at_ver

    extra = tmp_path / "extra.png"
    Image.fromarray(textured_image(seed=42, size=(48, 48))).save(extra)
    eng.insert_image_from_path(str(extra))

    eng.query_by_image_hash_from_file(str(extra))
    assert eng._sharded_at_ver > n_before
    assert eng.get_query_results()[0].filename == "extra.png"
    eng.scan_mesh = None
