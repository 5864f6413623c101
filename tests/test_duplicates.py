"""find_duplicate_pairs: all-pairs near-duplicate detection via batched
device self-scans (phash Hamming + semantic cosine, incl. int4)."""

import json

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.cli import main as cli_main
from pixelbox_tpu.engine import Engine

from fixtures import textured_image


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dups")
    base = textured_image(seed=1, size=(64, 64))
    Image.fromarray(base).save(d / "orig.png")
    Image.fromarray(base).save(d / "copy.png")           # exact duplicate
    # Re-encoded as JPEG: near-duplicate (tiny pixel drift).
    Image.fromarray(base).save(d / "lossy.jpg", quality=92)
    Image.fromarray(textured_image(seed=2, size=(64, 64))).save(d / "other.png")
    return d


@pytest.fixture(scope="module")
def engine(dup_dir, tmp_path_factory):
    db = tmp_path_factory.mktemp("db") / "dup.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 16})
    eng.add_tracked_folder(str(dup_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    yield eng
    eng.close()


def _names(engine, pairs):
    out = set()
    for a, b, _ in pairs:
        na = engine.catalog.get_image(a)["filename"]
        nb = engine.catalog.get_image(b)["filename"]
        out.add(frozenset((na, nb)))
    return out


def test_phash_duplicates(engine):
    pairs = engine.find_duplicate_pairs(max_distance=0.1, by="phash")
    names = _names(engine, pairs)
    assert frozenset(("orig.png", "copy.png")) in names
    assert frozenset(("orig.png", "lossy.jpg")) in names
    # The unrelated image pairs with nothing.
    assert not any("other.png" in fs for fs in names)
    # Exact duplicates at distance 0, sorted first.
    assert pairs[0][2] == 0.0
    # Pairs unique with a < b.
    keys = [(a, b) for a, b, _ in pairs]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_semantic_duplicates(engine):
    pairs = engine.find_duplicate_pairs(max_distance=0.05, by="semantic")
    names = _names(engine, pairs)
    assert frozenset(("orig.png", "copy.png")) in names
    assert not any("other.png" in fs for fs in names)


def test_duplicates_respect_removal(engine):
    info = [
        r
        for r in (
            engine.catalog.get_image(a) or engine.catalog.get_image(b)
            for a, b, _ in engine.find_duplicate_pairs(by="phash")
        )
    ]
    assert info  # sanity
    # Remove 'copy.png'; its pairs must disappear.
    conn = engine.catalog._connect()
    (copy_id,) = conn.execute(
        "SELECT id FROM images WHERE filename='copy.png'"
    ).fetchone()
    assert engine.remove_image(copy_id)
    pairs = engine.find_duplicate_pairs(max_distance=0.1, by="phash")
    names = _names(engine, pairs)
    assert not any("copy.png" in fs for fs in names)
    assert frozenset(("orig.png", "lossy.jpg")) in names


def test_duplicate_groups(engine):
    """orig/copy/lossy form one transitive group (run before removal
    tests would shrink it — module fixture order puts this after
    test_duplicates_respect_removal, so copy.png is already gone:
    expect the 2-element group)."""
    groups = engine.find_duplicate_groups(max_distance=0.1, by="phash")
    names = [
        sorted(engine.catalog.get_image(i)["filename"] for i in g)
        for g in groups
    ]
    assert ["lossy.jpg", "orig.png"] in names
    assert all(len(g) >= 2 for g in groups)


def test_duplicates_cli(dup_dir, tmp_path_factory, capsys):
    db = str(tmp_path_factory.mktemp("db2") / "c.db")
    assert cli_main(["init", db, "--dim", "16"]) == 0
    assert cli_main(["add-folder", db, str(dup_dir)]) == 0
    assert cli_main(["index", db, "--dim", "16"]) == 0
    capsys.readouterr()
    assert cli_main(["duplicates", db, "--json", "--dim", "16"]) == 0
    pairs = json.loads(capsys.readouterr().out)
    assert len(pairs) >= 2
    assert all(p["a"] < p["b"] for p in pairs)


def test_duplicates_web_api(engine):
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from pixelbox_tpu.serve import make_handler

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(engine, threading.Lock())
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/api/duplicates") as r:
            got = json.loads(r.read())
        assert got["pairs"] and all(p["a"] < p["b"] for p in got["pairs"])
        with urllib.request.urlopen(base + "/api/duplicates?groups=1") as r:
            got = json.loads(r.read())
        assert got["groups"] and all(len(g) >= 2 for g in got["groups"])
    finally:
        httpd.shutdown()


def test_empty_index(tmp_path_factory):
    db = tmp_path_factory.mktemp("db3") / "e.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 16})
    assert eng.find_duplicate_pairs() == []
    assert eng.find_duplicate_pairs(by="semantic") == []
    eng.close()


def test_mixed_width_phash_groups(tmp_path_factory):
    """Compat phash gives non-square images shorter hashes; duplicate
    detection groups by true width and still finds same-width pairs."""
    d = tmp_path_factory.mktemp("mixed")
    # Non-square (the fixture only generates square sizes — crop one).
    wide = textured_image(seed=3, size=(64, 64))[:32, :]
    Image.fromarray(wide).save(d / "wide1.png")
    Image.fromarray(wide).save(d / "wide2.png")
    sq = textured_image(seed=4, size=(64, 64))
    Image.fromarray(sq).save(d / "sq.png")
    db = tmp_path_factory.mktemp("db4") / "m.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 16})
    eng.add_tracked_folder(str(d))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert len(set(eng._ph_widths)) > 1  # genuinely mixed-width
    pairs = eng.find_duplicate_pairs(max_distance=0.1, by="phash")
    names = _names(eng, pairs)
    assert frozenset(("wide1.png", "wide2.png")) in names
    assert not any("sq.png" in fs for fs in names)
    eng.close()


def test_duplicates_on_mesh_match_single_chip(engine):
    """Whole-index duplicate finding rides the mesh under serve_on_mesh
    (sharded hamming / semantic scans) with identical pairs."""
    from pixelbox_tpu.parallel.mesh import make_mesh

    ph_single = engine.find_duplicate_pairs(max_distance=0.1, by="phash")
    sem_single = engine.find_duplicate_pairs(max_distance=0.5, by="semantic")
    engine.serve_on_mesh(make_mesh(8))
    try:
        assert (
            engine.find_duplicate_pairs(max_distance=0.1, by="phash")
            == ph_single
        )
        assert engine._ph_sharded is not None  # the mesh path actually ran
        assert (
            engine.find_duplicate_pairs(max_distance=0.5, by="semantic")
            == sem_single
        )
        assert engine._sharded_index is not None
    finally:
        engine.scan_mesh = None


def test_int4_duplicates_on_mesh(tmp_path, dup_dir):
    """int4 libraries find the same duplicate pairs from the mesh
    (sharded int4 candidates + exact-u8 rerank)."""
    from pixelbox_tpu.parallel.mesh import make_mesh

    eng = Engine.new(
        str(tmp_path / "dup4.db"), embedder="stub",
        embedder_kwargs={"dim": 16}, semantic_precision="int4",
    )
    try:
        eng.add_tracked_folder(str(dup_dir))
        eng.start_indexing(num_workers=2)
        assert eng.wait_for_indexing(timeout=120)
        single = eng.find_duplicate_pairs(max_distance=0.5, by="semantic")
        assert single and single[0][2] == 0.0  # exact u8 rerank distances
        eng.serve_on_mesh(make_mesh(8))
        assert (
            eng.find_duplicate_pairs(max_distance=0.5, by="semantic")
            == single
        )
    finally:
        eng.scan_mesh = None
        eng.close()
