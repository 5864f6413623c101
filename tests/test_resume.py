"""Checkpoint/resume: interrupted indexing resumes idempotently.

The reference's durability story is "the SQLite DB is the checkpoint"
(INSERT OR IGNORE + UNIQUE(path) + WAL — SURVEY.md §5); ours is the same
catalog plus rebuildable device stores.
"""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine

from fixtures import textured_image


def test_stop_and_resume_indexing(tmp_path):
    photos = tmp_path / "photos"
    photos.mkdir()
    for s in range(12):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            photos / f"p{s:02d}.png"
        )

    eng = Engine.new(str(tmp_path / "res.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=1)
    eng.stop_indexing()  # interrupt (may land mid-batch)
    eng.wait_for_indexing(timeout=60)
    partial = eng.get_num_indexed_images()
    assert partial <= 12
    eng.close()

    # Reopen cold (device stores rebuilt from the catalog) and re-index.
    eng2 = Engine.open(str(tmp_path / "res.db"), embedder="stub",
                       embedder_kwargs={"dim": 16})
    assert eng2.get_num_indexed_images() == partial
    eng2.start_indexing(num_workers=2)
    assert eng2.wait_for_indexing(timeout=120)
    assert eng2.get_num_indexed_images() == 12

    # No duplicates: each path exactly once.
    conn = eng2.catalog._connect()
    dupes = conn.execute(
        "SELECT path, COUNT(*) c FROM images GROUP BY path HAVING c > 1"
    ).fetchall()
    assert dupes == []
    # Every image searchable.
    eng2.query("p07")
    assert [r.filename for r in eng2.get_query_results()] == ["p07.png"]
    eng2.close()


def test_store_snapshot_roundtrip_under_use(tmp_path):
    """Device-store shard snapshots reload and serve identical results."""
    import jax.numpy as jnp

    from pixelbox_tpu.index.store import VectorStore
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = np.random.default_rng(0)
    store = VectorStore(dim=32, kind="semantic", block_rows=128)
    db = rng.integers(0, 256, (300, 32), dtype=np.uint8)
    store.append(db)
    store.delete([7])
    path = str(tmp_path / "snap.npz")
    store.save(path)

    loaded = VectorStore.load(path)
    q = jnp.asarray(db[33])
    d1, i1 = cosine_scan_topk(q, store.device_index, k=10, block_rows=128)
    d2, i2 = cosine_scan_topk(q, loaded.device_index, k=10, block_rows=128)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
