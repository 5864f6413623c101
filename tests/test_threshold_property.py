"""Property test: the guaranteed-exact auto scans equal the oracle for
RANDOMIZED configurations (sizes, k, thresholds, duplicate rates,
query sources) — the exactness claim must not depend on tuned shapes."""

import numpy as np
import jax.numpy as jnp
import pytest

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.hamming_gemm import (
    build_hamming_gemm_index,
    hamming_gemm_scan_topk_auto,
)
from pixelbox_tpu.ops.int4 import (
    build_semantic4_index,
    cosine4_scan_topk_auto,
    cosine4a_scan_topk_np,
)
from pixelbox_tpu.ops.scan import cosine_scan_topk_auto

from test_scan import check_topk_parity, make_hamming_index, make_semantic_index


def _random_db(rng, n, d):
    """Random rows with a controlled duplicate rate (tie pressure)."""
    base = rng.integers(0, 256, size=(max(8, n // 8), d), dtype=np.uint8)
    picks = rng.integers(0, len(base), size=n)
    noise = rng.integers(0, 256, size=(n, d), dtype=np.uint8)
    mask = rng.uniform(size=(n, 1)) < rng.uniform(0.2, 0.9)
    return np.where(mask, base[picks], noise).astype(np.uint8)


@pytest.mark.parametrize("trial", range(6))
def test_cosine_auto_randomized(trial):
    r = np.random.default_rng(100 + trial)
    n = int(r.integers(2000, 9000))
    d = int(r.choice([16, 32, 64]))
    k = int(r.integers(3, 60))
    md = float(r.choice([0.05, 0.5, 1e3, 1e7]))
    block = int(r.choice([256, 512]))
    db = _random_db(r, n, d)
    q_own = db[r.integers(0, n, size=3)]
    q_rand = r.integers(0, 256, size=(3, d), dtype=np.uint8)
    q = np.concatenate([q_own, q_rand])

    idx = make_semantic_index(db, block_rows=block)
    got_d, got_i = cosine_scan_topk_auto(
        q, idx, k=k, max_distance=md, block_rows=block
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=k, max_distance=md)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


@pytest.mark.parametrize("trial", range(3))
def test_hamming_auto_randomized(trial):
    r = np.random.default_rng(200 + trial)
    n = int(r.integers(2000, 6000))
    h = int(r.choice([16, 32]))
    k = int(r.integers(5, 40))
    md = float(r.choice([0.3, 0.45, 1e3]))
    db = _random_db(r, n, h)
    q = np.concatenate([db[r.integers(0, n, size=2)],
                        r.integers(0, 256, size=(2, h), dtype=np.uint8)])
    gidx = build_hamming_gemm_index(make_hamming_index(db, block_rows=512))
    got_d, got_i = hamming_gemm_scan_topk_auto(
        q, gidx, k=k, max_distance=md, block_rows=512
    )
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=k, max_distance=md)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


@pytest.mark.parametrize("trial", range(3))
def test_int4_auto_randomized(trial):
    r = np.random.default_rng(300 + trial)
    n = int(r.integers(2000, 6000))
    d = int(r.choice([16, 32]))
    k = int(r.integers(5, 40))
    md = float(r.choice([0.5, 1e3, 1e7]))
    db = _random_db(r, n, d)
    q = np.concatenate([db[r.integers(0, n, size=2)],
                        r.integers(0, 256, size=(2, d), dtype=np.uint8)])
    idx4 = build_semantic4_index(db, block_rows=512)
    got_d, got_i = cosine4_scan_topk_auto(
        q, idx4, k=k, max_distance=md, block_rows=512
    )
    exp_d, exp_i = cosine4a_scan_topk_np(q, db, k=k, max_distance=md)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)
