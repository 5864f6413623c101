"""Interop: open a database created externally with the reference's exact
schema/SQL (simulating a pixelbox-made .db file) and query it."""

import sqlite3

import numpy as np
import pytest

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.ops.oracle import quantize_embedding_np


@pytest.fixture
def reference_made_db(tmp_path, rng):
    """Create the DB exactly like the Rust code does (engine.rs:98-115):
    raw CREATE TABLE statements + INSERT OR IGNORE rows."""
    path = str(tmp_path / "rustmade.db")
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE images (
            id               INTEGER PRIMARY KEY,
            filename         TEXT NOT NULL,
            path             TEXT NOT NULL,
            image_width      INTEGER,
            image_height     INTEGER,
            thumbnail        BLOB,
            created          DATETIME,
            indexed          DATETIME,
            UNIQUE(path)
        );
        CREATE TABLE watched_directories (glob TEXT PRIMARY KEY);
        CREATE TABLE tags (
            image_id        INTEGER,
            name            TEXT NOT NULL,
            value           TEXT
        );
        CREATE TABLE phashes (image_id INTEGER PRIMARY KEY, hash BLOB);
        CREATE TABLE semantic_hashes (image_id INTEGER PRIMARY KEY, hash BLOB);
        """
    )
    embeds = rng.normal(size=(5, 8)).astype(np.float32)  # reference 8-d latent
    hashes = quantize_embedding_np(np.tanh(embeds))
    for i in range(5):
        conn.execute(
            "INSERT OR IGNORE INTO images (filename, path, image_width,"
            " image_height, thumbnail) VALUES (?, ?, ?, ?, ?)",
            (f"img{i}.png", f"/photos/img{i}.png", 640, 480, None),
        )
        image_id = conn.execute("SELECT last_insert_rowid()").fetchone()[0]
        conn.execute(
            "INSERT OR IGNORE INTO semantic_hashes (image_id, hash) VALUES (?, ?)",
            (image_id, sqlite3.Binary(hashes[i].tobytes())),
        )
        conn.execute(
            "INSERT OR IGNORE INTO phashes (image_id, hash) VALUES (?, ?)",
            (image_id, sqlite3.Binary(rng.integers(0, 256, 32, dtype=np.uint8).tobytes())),
        )
        conn.execute(
            "INSERT OR IGNORE INTO tags (image_id, name, value) VALUES (?, ?, ?)",
            (image_id, "Make", f"Camera{i}"),
        )
    conn.execute(
        "INSERT INTO watched_directories (glob) VALUES ('/photos')"
    )
    conn.commit()
    conn.close()
    return path, hashes


def test_open_and_text_query(reference_made_db):
    path, _ = reference_made_db
    eng = Engine.open(path, embedder="stub", embedder_kwargs={"dim": 8})
    assert eng.get_num_indexed_images() == 5
    assert eng.get_tracked_folders() == ["/photos"]
    eng.query("img3")
    (r,) = eng.get_query_results()
    assert r.filename == "img3.png"
    assert r.tags == {"Make": "Camera3"}
    eng.close()


def test_similarity_over_reference_hashes(reference_made_db):
    path, hashes = reference_made_db
    eng = Engine.open(path, embedder="stub", embedder_kwargs={"dim": 8})
    # Query by the raw 8-d hash of row 2: it must come back first, dist 0.
    from pixelbox_tpu.records import IndexedImage

    rec = IndexedImage(visual_hash=hashes[2])
    eng.query_by_image_hash_from_image(rec)
    results = eng.get_query_results()
    assert results[0].filename == "img2.png"
    assert results[0].distance_from_query < 1e-6
    eng.close()


def test_tag_query_against_reference_db(reference_made_db):
    path, _ = reference_made_db
    eng = Engine.open(path, embedder="stub", embedder_kwargs={"dim": 8})
    eng.query("tag:Make:Camera1")
    (r,) = eng.get_query_results()
    assert r.filename == "img1.png"
    eng.close()
