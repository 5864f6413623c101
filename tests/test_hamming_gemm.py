"""GEMM-based hamming scan parity with the xor-popcount oracle."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.hamming_gemm import (
    build_hamming_gemm_index,
    hamming_gemm_scan_topk,
    unpack_pm1,
)

from test_scan import check_topk_parity, make_hamming_index


def test_unpack_pm1_lsb_first():
    got = unpack_pm1(np.array([[0b00000101]], dtype=np.uint8))
    np.testing.assert_array_equal(
        got[0], np.array([1, -1, 1, -1, -1, -1, -1, -1], np.int8)
    )


def test_gemm_matches_oracle(rng):
    db = rng.integers(0, 256, size=(1000, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    idx = build_hamming_gemm_index(make_hamming_index(db, block_rows=256))
    got_d, got_i = hamming_gemm_scan_topk(jnp.asarray(q), idx, k=25, block_rows=256)
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=25)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_gemm_exact_duplicate(rng):
    db = rng.integers(0, 256, size=(512, 32), dtype=np.uint8)
    idx = build_hamming_gemm_index(make_hamming_index(db, block_rows=256))
    d, i = hamming_gemm_scan_topk(jnp.asarray(db[77]), idx, k=3, block_rows=256)
    assert float(np.asarray(d)[0]) == 0.0
    assert 77 in np.asarray(i)


def test_gemm_threshold_and_padding(rng):
    db = rng.integers(0, 256, size=(300, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    idx = build_hamming_gemm_index(make_hamming_index(db, block_rows=512))
    got_d, got_i = hamming_gemm_scan_topk(
        jnp.asarray(q), idx, k=50, max_distance=0.45, block_rows=512
    )
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=50, max_distance=0.45)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)
    assert np.asarray(got_i).max() < 300


def test_gemm_wrap_compat(rng):
    a = np.zeros((1, 64), dtype=np.uint8)
    b = np.full((1, 64), 255, dtype=np.uint8)  # 512 differing bits → 0 mod 256
    db = np.concatenate([a, b, rng.integers(0, 256, (126, 64), np.uint8)])
    idx = build_hamming_gemm_index(make_hamming_index(db, block_rows=128))
    d, i = hamming_gemm_scan_topk(
        jnp.asarray(a[0]), idx, k=2, block_rows=128, wrap_u8=True
    )
    d = np.asarray(d)
    # Both the identical row AND the complementary row report distance 0.
    assert d[0] == 0.0 and d[1] == 0.0


def test_gemm_fast_mode(rng):
    db = rng.integers(0, 256, size=(2048, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    idx = build_hamming_gemm_index(make_hamming_index(db, block_rows=512))
    got_d, got_i = hamming_gemm_scan_topk(
        jnp.asarray(q), idx, k=20, block_rows=512, mode="fast"
    )
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=20)
    got_i = np.asarray(got_i)
    recall = np.mean([len(set(got_i[i]) & set(exp_i[i])) / 20 for i in range(4)])
    assert recall >= 0.9
