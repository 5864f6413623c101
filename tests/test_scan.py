"""Scan + top-k parity tests against the CPU oracle.

The north-star correctness requirement (BASELINE.md): exact top-k parity
with the reference CPU scan at equal u8 quantization.
"""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.packed import (
    PackedHammingIndex,
    PackedSemanticIndex,
    semantic_rows_from_u8,
)
from pixelbox_tpu.ops.scan import cosine_scan_topk, hamming_scan_topk


def make_semantic_index(db_u8: np.ndarray, block_rows: int = 256):
    n, d = db_u8.shape
    n_pad = -(-n // block_rows) * block_rows
    data, row_sum, row_mag2 = semantic_rows_from_u8(db_u8)
    data_p = np.zeros((n_pad, d), dtype=np.int8)
    data_p[:n] = data
    sum_p = np.zeros(n_pad, dtype=np.int32)
    sum_p[:n] = row_sum
    mag_p = np.zeros(n_pad, dtype=np.int32)
    mag_p[:n] = row_mag2
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    return PackedSemanticIndex(
        jnp.asarray(data_p), jnp.asarray(sum_p), jnp.asarray(mag_p), jnp.asarray(valid)
    )


def make_hamming_index(db_u8: np.ndarray, block_rows: int = 256):
    n, h = db_u8.shape
    n_pad = -(-n // block_rows) * block_rows
    data_p = np.zeros((n_pad, h), dtype=np.uint8)
    data_p[:n] = db_u8
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    return PackedHammingIndex(jnp.asarray(data_p), jnp.asarray(valid))


def check_topk_parity(got_d, got_i, exp_d, exp_i):
    """Indices must match exactly except inside exact-distance tie groups."""
    got_d, got_i = np.asarray(got_d), np.asarray(got_i)
    np.testing.assert_array_equal(got_d, exp_d)
    # Within each row, indices may permute only among equal distances.
    for qi in range(got_i.shape[0]):
        gd, gi, ed, ei = got_d[qi], got_i[qi], exp_d[qi], exp_i[qi]
        for dist in np.unique(ed[np.isfinite(ed)]):
            np.testing.assert_array_equal(
                np.sort(gi[gd == dist]), np.sort(ei[ed == dist])
            )
        np.testing.assert_array_equal(gi[~np.isfinite(gd)], ei[~np.isfinite(ed)])


class TestCosineScan:
    def test_small_vs_oracle(self, rng):
        db = rng.integers(0, 256, size=(1000, 128), dtype=np.uint8)
        q = rng.integers(0, 256, size=(7, 128), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=256)
        got_d, got_i = cosine_scan_topk(jnp.asarray(q), idx, k=10, block_rows=256)
        exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=10)
        check_topk_parity(got_d, got_i, exp_d, exp_i)

    def test_exact_match_first(self, rng):
        db = rng.integers(0, 256, size=(512, 64), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=128)
        # Query with a row that IS in the db: it must come back first, dist≈0.
        q = db[137]
        d, i = cosine_scan_topk(jnp.asarray(q), idx, k=5, block_rows=128)
        assert int(np.asarray(i)[0]) == 137
        assert float(np.asarray(d)[0]) < 1e-6

    def test_max_distance_filter(self, rng):
        db = rng.integers(0, 256, size=(256, 32), dtype=np.uint8)
        q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=128)
        for max_d in (0.05, 0.5, 2.0):
            got_d, got_i = cosine_scan_topk(
                jnp.asarray(q), idx, k=20, max_distance=max_d, block_rows=128
            )
            exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=20, max_distance=max_d)
            check_topk_parity(got_d, got_i, exp_d, exp_i)
            # Everything returned is strictly below the threshold.
            gd = np.asarray(got_d)
            assert np.all(gd[np.isfinite(gd)] < max_d)

    def test_padding_never_leaks(self, rng):
        # 130 rows padded to 256: padding rows must never appear.
        db = rng.integers(0, 256, size=(130, 32), dtype=np.uint8)
        q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=256)
        _, got_i = cosine_scan_topk(jnp.asarray(q), idx, k=100, block_rows=256)
        gi = np.asarray(got_i)
        assert gi.max() < 130

    def test_k_larger_than_n(self, rng):
        db = rng.integers(0, 256, size=(10, 16), dtype=np.uint8)
        q = rng.integers(0, 256, size=(2, 16), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=128)
        got_d, got_i = cosine_scan_topk(jnp.asarray(q), idx, k=32, block_rows=128)
        exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=32)
        check_topk_parity(got_d, got_i, exp_d, exp_i)
        assert np.all(np.asarray(got_i)[:, 10:] == -1)

    def test_multi_block(self, rng):
        db = rng.integers(0, 256, size=(2048, 128), dtype=np.uint8)
        q = rng.integers(0, 256, size=(5, 128), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=256)
        got_d, got_i = cosine_scan_topk(jnp.asarray(q), idx, k=50, block_rows=256)
        exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=50)
        check_topk_parity(got_d, got_i, exp_d, exp_i)

    def test_1d_query_squeezes(self, rng):
        db = rng.integers(0, 256, size=(256, 32), dtype=np.uint8)
        idx = make_semantic_index(db, block_rows=128)
        d, i = cosine_scan_topk(jnp.asarray(db[0]), idx, k=3, block_rows=128)
        assert d.shape == (3,) and i.shape == (3,)


class TestHammingScan:
    def test_vs_oracle(self, rng):
        db = rng.integers(0, 256, size=(777, 32), dtype=np.uint8)
        q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
        idx = make_hamming_index(db, block_rows=128)
        got_d, got_i = hamming_scan_topk(jnp.asarray(q), idx, k=25, block_rows=128)
        exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=25)
        check_topk_parity(got_d, got_i, exp_d, exp_i)

    def test_exact_match_first(self, rng):
        db = rng.integers(0, 256, size=(300, 32), dtype=np.uint8)
        idx = make_hamming_index(db, block_rows=128)
        d, i = hamming_scan_topk(jnp.asarray(db[42]), idx, k=3, block_rows=128)
        assert float(np.asarray(d)[0]) == 0.0
        # Row 42 must be among the zero-distance results (dups possible).
        zero = np.asarray(i)[np.asarray(d) == 0.0]
        assert 42 in zero

    def test_wrap_compat(self, rng):
        db = rng.integers(0, 256, size=(128, 64), dtype=np.uint8)
        q = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
        idx = make_hamming_index(db, block_rows=128)
        got_d, got_i = hamming_scan_topk(
            jnp.asarray(q), idx, k=10, block_rows=128, wrap_u8=True
        )
        exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=10, wrap_u8=True)
        check_topk_parity(got_d, got_i, exp_d, exp_i)
