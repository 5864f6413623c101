"""Verified-fast (auto) scan: guaranteed oracle-exact results."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.scan import (
    _fast_scan_with_verification,
    cosine_scan_topk_auto,
)

from test_scan import check_topk_parity, make_semantic_index


def test_auto_matches_oracle(rng):
    db = rng.integers(0, 256, size=(3000, 64), dtype=np.uint8)
    q = rng.integers(0, 256, size=(6, 64), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=512)
    got_d, got_i = cosine_scan_topk_auto(q, idx, k=25, block_rows=512)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=25)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_auto_with_threshold(rng):
    db = rng.integers(0, 256, size=(1024, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=256)
    got_d, got_i = cosine_scan_topk_auto(
        q, idx, k=30, max_distance=0.5, block_rows=256
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=30, max_distance=0.5)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_verification_flags_exact_on_cpu(rng):
    # approx_min_k is exact on the CPU backend, so verification must pass.
    db = rng.integers(0, 256, size=(512, 32), dtype=np.uint8)
    q = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=256)
    d, i, exact = _fast_scan_with_verification(
        jnp.asarray(q), idx, 10, 1e3, 256
    )
    assert bool(np.asarray(exact).all())


def test_auto_duplicates_at_boundary(rng):
    """Heavy exact-duplicate ties exercise the conservative fallback."""
    base = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    db = np.repeat(base, 64, axis=0)  # 512 rows, each dup'd 64x
    q = base[:2]
    idx = make_semantic_index(db, block_rows=256)
    got_d, got_i = cosine_scan_topk_auto(q, idx, k=16, block_rows=256)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=16)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_auto_1d_query(rng):
    db = rng.integers(0, 256, size=(256, 16), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=256)
    d, i = cosine_scan_topk_auto(db[9], idx, k=3, block_rows=256)
    assert np.asarray(i).ravel()[0] == 9
