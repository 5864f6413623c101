"""Sampled-threshold selection (the guaranteed-exact fast path, round 2).

Every test checks full parity against the CPU oracle — the threshold
machinery (sample θ, per-block budgets, overflow detection, repair) must
never change RESULTS, only speed."""

import numpy as np
import jax.numpy as jnp
import pytest

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.scan import (
    build_scan_sample,
    cosine_scan_topk_auto,
    cosine_scan_topk_threshold,
)

from test_scan import check_topk_parity, make_semantic_index

# capacity 8192 with block_rows=512 → 16 blocks: well past the
# small-index fallback (capacity > 4·block_rows), so these exercise the
# real threshold path.
BLOCK = 512


@pytest.fixture(scope="module")
def big_db():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(8192, 32), dtype=np.uint8)


@pytest.fixture(scope="module")
def big_index(big_db):
    return make_semantic_index(big_db, block_rows=BLOCK)


def test_threshold_scan_matches_oracle(big_db, big_index, rng):
    q = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    got_d, got_i = cosine_scan_topk_auto(
        q, big_index, k=50, block_rows=BLOCK
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, big_db, k=50)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_threshold_exact_flags_are_sound(big_db, big_index, rng):
    """Whenever exact=True, the result must equal the oracle (the flag is
    a PROOF, not a heuristic)."""
    q = rng.integers(0, 256, size=(16, 32), dtype=np.uint8)
    sample = build_scan_sample(big_index, sample_rows=1024)
    d, i, exact = cosine_scan_topk_threshold(
        jnp.asarray(q), big_index, sample, k=25, block_rows=BLOCK
    )
    exact = np.asarray(exact)
    assert exact.mean() > 0.5  # sampling should succeed for most queries
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, big_db, k=25)
    ok = np.nonzero(exact)[0]
    check_topk_parity(
        np.asarray(d)[ok], np.asarray(i)[ok], exp_d[ok], exp_i[ok]
    )


def test_tiny_budget_forces_repair_but_stays_exact(big_db, big_index, rng):
    """budget=2 overflows nearly every block → the auto wrapper must
    repair every failing query and still match the oracle."""
    q = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    got_d, got_i = cosine_scan_topk_auto(
        q, big_index, k=40, block_rows=BLOCK, budget=2
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, big_db, k=40)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_duplicate_flood_ties(rng):
    """Heavy exact-duplicate ties: θ lands ON the tied distance, strict-<
    counts 0 → unproven → repair path must deliver oracle tie-breaks."""
    base = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    db = np.repeat(base, 2048, axis=0)  # 8192 rows, each dup'd 2048×
    idx = make_semantic_index(db, block_rows=BLOCK)
    q = base[:2]
    got_d, got_i = cosine_scan_topk_auto(q, idx, k=20, block_rows=BLOCK)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=20)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_tight_max_distance_unbound_theta(big_db, big_index, rng):
    """max_distance excludes almost everything: θ == md, fewer than k
    rows pass — exact via the 'unbound' proof, results == oracle."""
    q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    got_d, got_i = cosine_scan_topk_auto(
        q, big_index, k=50, max_distance=0.05, block_rows=BLOCK
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, big_db, k=50, max_distance=0.05)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_moderate_max_distance(big_db, big_index, rng):
    q = rng.integers(0, 256, size=(6, 32), dtype=np.uint8)
    got_d, got_i = cosine_scan_topk_auto(
        q, big_index, k=30, max_distance=0.6, block_rows=BLOCK
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, big_db, k=30, max_distance=0.6)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_threshold_1d_query(big_db, big_index):
    d, i = cosine_scan_topk_auto(big_db[99], big_index, k=3, block_rows=BLOCK)
    assert np.asarray(i).ravel()[0] == 99
    assert np.asarray(d).ravel()[0] == 0.0


def test_cached_sample_reuse(big_db, big_index, rng):
    sample = build_scan_sample(big_index)
    q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    got_d, got_i = cosine_scan_topk_auto(
        q, big_index, k=10, block_rows=BLOCK, sample=sample
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, big_db, k=10)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_build_scan_sample_stride():
    import jax.numpy as jnp
    from pixelbox_tpu.ops.packed import PackedSemanticIndex

    cap, d = 16384, 8
    idx = PackedSemanticIndex(
        jnp.zeros((cap, d), jnp.int8), jnp.zeros(cap, jnp.int32),
        jnp.zeros(cap, jnp.int32), jnp.ones(cap, bool),
    )
    s = build_scan_sample(idx, sample_rows=4096)
    assert s.data.shape == (4096, d)
    # sample_rows ≥ capacity → stride 1 (sample is the whole index).
    s = build_scan_sample(idx, sample_rows=1 << 20)
    assert s.data.shape == (cap, d)
