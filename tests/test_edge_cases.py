"""Edge-case robustness across subsystems."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.ingest.thumbnail import qoi_decode, qoi_encode
from pixelbox_tpu.models.wordpiece import WordPieceTokenizer
from pixelbox_tpu.ops.phash import phash
from pixelbox_tpu.ops.scan import cosine_scan_topk
from pixelbox_tpu.records import IndexedImage

from fixtures import textured_image
from test_scan import make_semantic_index


class TestQoiEdges:
    def test_1x1_image(self):
        img = np.array([[[7, 8, 9]]], dtype=np.uint8)
        out, (w, h) = qoi_decode(qoi_encode(img))
        assert (w, h) == (1, 1)
        np.testing.assert_array_equal(out, img)

    def test_long_run_boundary(self):
        # 62-px runs are the QOI run-length cap; cross it.
        img = np.full((1, 200, 3), 55, dtype=np.uint8)
        out, _ = qoi_decode(qoi_encode(img))
        np.testing.assert_array_equal(out, img)

    def test_single_row(self):
        img = np.arange(100 * 3, dtype=np.uint8).reshape(1, 100, 3)
        out, (w, h) = qoi_decode(qoi_encode(img))
        assert (w, h) == (100, 1)
        np.testing.assert_array_equal(out, img)


class TestPhashEdges:
    def test_tiny_image(self):
        img = textured_image(seed=1, size=(8, 8))
        h = phash(img)  # smaller than 16x16 target: upscales
        assert len(h) == 32

    def test_extreme_aspect_ratio(self):
        base = textured_image(seed=2, size=(8, 8))
        img = np.tile(base[:4], (1, 32, 1))  # 4 x 256 x 3
        h = phash(img, aspect_preserving=True)
        # 256x4 fits to 16x1 → 16 px → 2 bytes (variable-length compat mode)
        assert len(h) == 2

    def test_grayscale_2d_input(self):
        img = textured_image(seed=3, size=(64, 64))[:, :, 0]
        assert phash(img).shape == (32,)


class TestScanEdges:
    def test_single_row_index(self, rng):
        db = rng.integers(0, 256, size=(1, 16), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=128)
        d, i = cosine_scan_topk(jnp.asarray(db[0]), idx, k=5, block_rows=128)
        assert int(np.asarray(i)[0]) == 0
        assert np.all(np.asarray(i)[1:] == -1)

    def test_all_identical_rows(self, rng):
        row = rng.integers(0, 256, size=16, dtype=np.uint8)
        db = np.tile(row, (64, 1))
        idx = make_semantic_index(db, block_rows=128)
        d, i = cosine_scan_topk(jnp.asarray(row), idx, k=10, block_rows=128)
        # Ties broken by ascending id.
        np.testing.assert_array_equal(np.asarray(i), np.arange(10))

    def test_max_distance_zero_returns_nothing(self, rng):
        db = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=128)
        d, i = cosine_scan_topk(
            jnp.asarray(db[0]), idx, k=5, max_distance=0.0, block_rows=128
        )
        assert np.all(np.asarray(i) == -1)  # strict <, so even dist 0 excluded


class TestWordPieceEdges:
    def test_empty_string(self):
        tok = WordPieceTokenizer.toy()
        ids = tok.encode("", add_special=True)
        assert ids == [tok.cls_id, tok.sep_id]

    def test_very_long_word_is_unk(self):
        tok = WordPieceTokenizer.toy()
        ids = tok.encode("a" * 200, add_special=False)
        assert ids == [tok.unk_id]

    def test_truncation(self):
        tok = WordPieceTokenizer.toy()
        ids = tok.encode("a b c d e f g h", max_len=5)
        assert len(ids) == 5
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id


class TestEngineEdges:
    def test_similar_on_empty_db(self, tmp_path):
        eng = Engine.new(str(tmp_path / "empty.db"), embedder="stub",
                         embedder_kwargs={"dim": 8})
        rec = IndexedImage(visual_hash=np.full(8, 128, np.uint8))
        eng.query_by_image_hash_from_image(rec)
        assert eng.get_query_results() == []
        eng.query_by_phash(np.zeros(32, np.uint8))
        assert eng.get_query_results() == []
        eng.close()

    def test_concurrent_catalog_inserts(self, tmp_path):
        eng = Engine.new(str(tmp_path / "conc.db"), embedder="stub",
                         embedder_kwargs={"dim": 8})

        def insert(start):
            for i in range(start, start + 20):
                eng.catalog.insert_image(f"f{i}.png", f"/c/f{i}.png", 1, 1)

        threads = [threading.Thread(target=insert, args=(s,)) for s in (0, 100, 200)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert eng.catalog.num_images() == 60
        eng.close()

    def test_unicode_filenames(self, tmp_path):
        photos = tmp_path / "ph"
        photos.mkdir()
        Image.fromarray(textured_image(seed=1, size=(32, 32))).save(
            photos / "日本語_ファイル.png"
        )
        eng = Engine.new(str(tmp_path / "uni.db"), embedder="stub",
                         embedder_kwargs={"dim": 8})
        eng.add_tracked_folder(str(photos))
        eng.start_indexing(num_workers=1)
        assert eng.wait_for_indexing(timeout=60)
        assert eng.get_num_indexed_images() == 1
        eng.query("日本語")
        assert len(eng.get_query_results()) == 1
        eng.close()
