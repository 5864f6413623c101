"""VectorStore: append/grow/delete/compact/save-load, scans stay correct."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.index.store import VectorStore
from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.scan import cosine_scan_topk, hamming_scan_topk


def test_append_assigns_stable_ids(rng):
    store = VectorStore(dim=16, kind="semantic", block_rows=128)
    a = rng.integers(0, 256, (10, 16), dtype=np.uint8)
    b = rng.integers(0, 256, (5, 16), dtype=np.uint8)
    ids_a = store.append(a)
    ids_b = store.append(b)
    np.testing.assert_array_equal(ids_a, np.arange(10))
    np.testing.assert_array_equal(ids_b, np.arange(10, 15))
    np.testing.assert_array_equal(store.get_rows(ids_a), a)
    np.testing.assert_array_equal(store.get_rows(ids_b), b)
    assert store.size == 15


def test_growth_across_capacity(rng):
    store = VectorStore(dim=8, kind="semantic", block_rows=128)
    chunks = [rng.integers(0, 256, (700, 8), dtype=np.uint8) for _ in range(5)]
    for c in chunks:
        store.append(c)
    allrows = np.concatenate(chunks)
    assert store.size == 3500
    # Device index holds exactly the appended rows (centered).
    dev = store.device_index
    got = np.asarray(dev.data[:3500], dtype=np.int32) + 128
    np.testing.assert_array_equal(got.astype(np.uint8), allrows)
    assert np.asarray(dev.valid).sum() == 3500
    # Capacity is block-aligned.
    assert dev.capacity % 128 == 0


def test_scan_after_incremental_appends(rng):
    store = VectorStore(dim=32, kind="semantic", block_rows=128)
    db = rng.integers(0, 256, (900, 32), dtype=np.uint8)
    store.append(db[:100])
    store.append(db[100:650])
    store.append(db[650:])
    q = rng.integers(0, 256, (3, 32), dtype=np.uint8)
    got_d, got_i = cosine_scan_topk(jnp.asarray(q), store.device_index, k=10, block_rows=128)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=10)
    np.testing.assert_array_equal(np.asarray(got_d), exp_d)
    np.testing.assert_array_equal(np.asarray(got_i), exp_i)


def test_delete_tombstones_and_compact(rng):
    store = VectorStore(dim=16, kind="semantic", block_rows=128)
    db = rng.integers(0, 256, (50, 16), dtype=np.uint8)
    store.append(db)
    store.delete([3, 7, 20])
    assert store.size == 47
    q = db[3]  # exact row that was deleted
    d, i = cosine_scan_topk(jnp.asarray(q), store.device_index, k=50, block_rows=128)
    assert 3 not in np.asarray(i)

    mapping = store.compact()
    assert store.size == 47
    assert mapping[3] == -1 and mapping[7] == -1 and mapping[20] == -1
    assert mapping[4] == 3  # shifted down past the hole
    # Scan over the compacted store matches oracle on the surviving rows.
    live = np.delete(db, [3, 7, 20], axis=0)
    got_d, _ = cosine_scan_topk(jnp.asarray(db[0]), store.device_index, k=5, block_rows=128)
    exp_d, _ = oracle.cosine_scan_topk_np(db[0], live, k=5)
    np.testing.assert_array_equal(np.asarray(got_d), exp_d[0])


def test_hamming_store(rng):
    store = VectorStore(dim=32, kind="hamming", block_rows=128)
    db = rng.integers(0, 256, (300, 32), dtype=np.uint8)
    store.append(db)
    q = rng.integers(0, 256, (2, 32), dtype=np.uint8)
    got_d, got_i = hamming_scan_topk(jnp.asarray(q), store.device_index, k=7, block_rows=128)
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=7)
    np.testing.assert_array_equal(np.asarray(got_d), exp_d)
    np.testing.assert_array_equal(np.asarray(got_i), exp_i)


def test_save_load_roundtrip(tmp_path, rng):
    store = VectorStore(dim=16, kind="semantic", block_rows=128)
    db = rng.integers(0, 256, (77, 16), dtype=np.uint8)
    store.append(db)
    store.delete([5])
    path = str(tmp_path / "shard.npz")
    store.save(path)

    loaded = VectorStore.load(path)
    assert loaded.dim == 16 and loaded.kind == "semantic"
    assert loaded.size == 76
    np.testing.assert_array_equal(loaded.get_rows(np.arange(77)), db)
    # Tombstone survived the roundtrip.
    _, i = cosine_scan_topk(jnp.asarray(db[5]), loaded.device_index, k=77, block_rows=128)
    assert 5 not in np.asarray(i)


def test_empty_store_scan_is_safe():
    store = VectorStore(dim=16, kind="semantic", block_rows=128)
    q = np.full((1, 16), 7, dtype=np.uint8)
    d, i = cosine_scan_topk(jnp.asarray(q), store.device_index, k=5, block_rows=128)
    assert np.all(np.asarray(i) == -1)
    assert np.all(np.isinf(np.asarray(d)))
