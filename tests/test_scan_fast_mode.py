"""Fast-mode (approx_min_k) scan: high recall, exact distances."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.scan import cosine_scan_topk

from test_scan import make_semantic_index


def test_fast_mode_high_recall(rng):
    db = rng.integers(0, 256, size=(4096, 64), dtype=np.uint8)
    q = rng.integers(0, 256, size=(8, 64), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=1024)
    got_d, got_i = cosine_scan_topk(
        jnp.asarray(q), idx, k=20, block_rows=1024, mode="fast"
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=20)
    got_i = np.asarray(got_i)
    recall = np.mean(
        [len(set(got_i[i]) & set(exp_i[i])) / 20 for i in range(8)]
    )
    assert recall >= 0.9
    # Distances of whatever was selected are exact.
    gd = np.asarray(got_d)
    full = oracle.cosine_distance_np(q[:, None, :], db[None, :, :])
    for i in range(8):
        for j in range(20):
            if got_i[i, j] >= 0:
                assert gd[i, j] == full[i, got_i[i, j]]


def test_fast_mode_exact_duplicate_found(rng):
    db = rng.integers(0, 256, size=(2048, 32), dtype=np.uint8)
    idx = make_semantic_index(db, block_rows=1024)
    d, i = cosine_scan_topk(
        jnp.asarray(db[1500]), idx, k=5, block_rows=1024, mode="fast"
    )
    assert float(np.asarray(d)[0]) < 1e-6
    assert 1500 in np.asarray(i)
