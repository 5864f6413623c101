"""Pallas fused-scan kernel vs oracle (interpret mode on CPU).

Interpret mode executes ops eagerly through XLA CPU, where dynamic f32
division can be 1 ulp off the correctly-rounded value, so distance values
are compared with a tight tolerance and index parity is asserted exactly
(random data keeps top-k gaps far above 1 ulp).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.pallas_scan import build_row_meta, pallas_cosine_scan_topk

from test_scan import make_semantic_index


def run_fused(db, q, k, max_distance=1e3, tile_rows=256, block_rows=256):
    idx = make_semantic_index(db, block_rows=block_rows)
    meta = build_row_meta(idx)
    with pltpu.force_tpu_interpret_mode():
        d, i = pallas_cosine_scan_topk(
            jnp.asarray(q), idx, meta, k=k, max_distance=max_distance,
            tile_rows=tile_rows,
        )
    return np.asarray(d), np.asarray(i)


def assert_matches_oracle(got_d, got_i, exp_d, exp_i):
    np.testing.assert_array_equal(got_i, exp_i)
    finite = np.isfinite(exp_d)
    np.testing.assert_allclose(got_d[finite], exp_d[finite], rtol=3e-6, atol=0)
    assert np.all(~np.isfinite(got_d[~finite]))


def test_small_vs_oracle(rng):
    db = rng.integers(0, 256, size=(1024, 128), dtype=np.uint8)
    q = rng.integers(0, 256, size=(3, 128), dtype=np.uint8)
    got_d, got_i = run_fused(db, q, k=10)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=10)
    assert_matches_oracle(got_d, got_i, exp_d, exp_i)


def test_exact_duplicate_first(rng):
    db = rng.integers(0, 256, size=(512, 64), dtype=np.uint8)
    got_d, got_i = run_fused(db, db[300][None, :], k=5)
    assert got_i[0, 0] == 300
    assert got_d[0, 0] < 1e-6


def test_threshold_filter(rng):
    db = rng.integers(0, 256, size=(512, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    got_d, got_i = run_fused(db, q, k=30, max_distance=0.5)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=30, max_distance=0.5)
    assert_matches_oracle(got_d, got_i, exp_d, exp_i)


def test_multi_tile_and_padding(rng):
    # 700 valid rows padded to 1024, scanned in 4 tiles of 256.
    db = rng.integers(0, 256, size=(700, 64), dtype=np.uint8)
    q = rng.integers(0, 256, size=(2, 64), dtype=np.uint8)
    got_d, got_i = run_fused(db, q, k=20, block_rows=1024, tile_rows=256)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=20)
    assert_matches_oracle(got_d, got_i, exp_d, exp_i)
    assert got_i.max() < 700


def test_k_exceeds_valid_rows(rng):
    db = rng.integers(0, 256, size=(40, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(1, 32), dtype=np.uint8)
    got_d, got_i = run_fused(db, q, k=64, block_rows=256, tile_rows=256)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=64)
    assert_matches_oracle(got_d, got_i, exp_d, exp_i)
    assert np.all(got_i[0, 40:] == -1)


def test_1d_query(rng):
    db = rng.integers(0, 256, size=(256, 32), dtype=np.uint8)
    got_d, got_i = run_fused(db, db[7], k=3)
    assert got_d.shape == (3,)
    assert got_i[0] == 7
