"""Catalog: reference schema, idempotent inserts, tracked folders, UDFs."""

import sqlite3

import numpy as np
import pytest

from pixelbox_tpu.index.catalog import Catalog
from pixelbox_tpu.ops import oracle


@pytest.fixture
def cat(tmp_path):
    return Catalog(str(tmp_path / "test.db"), create=True)


def test_schema_matches_reference(cat):
    conn = sqlite3.connect(cat.db_path)
    tables = {
        r[0]
        for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")
    }
    assert {"images", "tags", "watched_directories", "phashes", "semantic_hashes"} <= tables
    cols = [r[1] for r in conn.execute("PRAGMA table_info(images)")]
    assert cols == [
        "id", "filename", "path", "image_width", "image_height",
        "thumbnail", "created", "indexed",
    ]


def test_insert_idempotent_on_path(cat):
    i1 = cat.insert_image("a.png", "/x/a.png", 10, 20, b"thumb", {"Make": "Pixel"})
    assert i1 is not None
    i2 = cat.insert_image("a.png", "/x/a.png", 10, 20, b"thumb2")
    assert i2 is None  # INSERT OR IGNORE on UNIQUE(path), engine.rs:231
    assert cat.num_images() == 1
    img = cat.get_image(i1)
    assert img["filename"] == "a.png"
    assert img["resolution"] == (10, 20)
    assert cat.get_tags(i1) == {"Make": "Pixel"}
    assert cat.get_image_by_path("/x/a.png")["id"] == i1
    assert cat.has_path("/x/a.png")
    assert not cat.has_path("/x/b.png")


def test_hashes_roundtrip(cat, rng):
    ph = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    sh = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
    i1 = cat.insert_image("a.png", "/a.png", 1, 1, phash=ph, semantic_hash=sh)
    assert cat.get_hash("phashes", i1) == ph
    assert cat.get_hash("semantic_hashes", i1) == sh
    assert list(cat.iter_hashes("semantic_hashes")) == [(i1, sh)]


def test_tracked_folders(cat):
    cat.add_tracked_folder("/photos")
    cat.add_tracked_folder("/art")
    assert sorted(cat.get_tracked_folders()) == ["/art", "/photos"]
    cat.remove_tracked_folder("/photos")
    assert cat.get_tracked_folders() == ["/art"]


def test_distance_udfs_available(cat, rng):
    """The reference registers distance UDFs on its connections
    (engine.rs:124-129); ours answer identically to the oracle."""
    a = rng.integers(0, 256, 64, dtype=np.uint8)
    b = rng.integers(0, 256, 64, dtype=np.uint8)
    conn = cat._connect()
    got = conn.execute(
        "SELECT cosine_distance(?, ?), byte_distance(?, ?), hamming_distance(?, ?)",
        (a.tobytes(), b.tobytes()) * 3,
    ).fetchone()
    assert got[0] == pytest.approx(float(oracle.cosine_distance_np(a, b)), abs=0)
    assert got[1] == pytest.approx(float(oracle.byte_distance_np(a, b)), abs=0)
    assert got[2] == pytest.approx(float(oracle.hamming_distance_np(a, b)), abs=0)


def test_filter_images_parameterized(cat):
    cat.insert_image("cat.png", "/p/cat.png", 1, 1, tags={"Subject": "cat"})
    cat.insert_image("dog.png", "/p/dog.png", 1, 1, tags={"Subject": "dog"})
    ids = cat.filter_images("images.filename LIKE ?", ["%cat%"])
    assert len(ids) == 1
    # Injection attempt stays inert as a bound parameter.
    ids = cat.filter_images("images.filename LIKE ?", ["%' OR '1'='1%"])
    assert ids == []


def test_reopen_existing(tmp_path):
    path = str(tmp_path / "re.db")
    c1 = Catalog(path, create=True)
    c1.insert_image("a.png", "/a.png", 1, 1)
    c1.close()
    c2 = Catalog(path)
    assert c2.num_images() == 1
