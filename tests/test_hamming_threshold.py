"""Hamming threshold scan (Pallas, interpret mode) + the auto wrapper."""

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
import pytest

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.hamming_gemm import (
    build_hamming_gemm_index,
    build_hamming_scan_sample,
    hamming_gemm_scan_topk_auto,
)
from pixelbox_tpu.ops.pallas_scan import (
    build_hamming_meta,
    pallas_hamming_threshold_scan_topk,
)

from test_scan import check_topk_parity, make_hamming_index


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(13)
    base = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)
    # Correlated rows (bit flips off 64 bases) — realistic phash clusters.
    reps = np.repeat(base, 64, axis=0)
    flips = rng.integers(0, 256, size=reps.shape, dtype=np.uint8) & \
        rng.integers(0, 256, size=reps.shape, dtype=np.uint8) & \
        rng.integers(0, 256, size=reps.shape, dtype=np.uint8)
    return reps ^ flips  # 4096 rows, 16 bytes (128 bits)


@pytest.fixture(scope="module")
def gemm_index(db):
    return build_hamming_gemm_index(make_hamming_index(db, block_rows=256))


def test_pallas_hamming_threshold_matches_oracle(db, gemm_index, rng):
    q = rng.integers(0, 256, size=(5, 16), dtype=np.uint8)
    sample = build_hamming_scan_sample(gemm_index, sample_rows=1024)
    meta = build_hamming_meta(gemm_index)
    with pltpu.force_tpu_interpret_mode():
        d, i, exact = pallas_hamming_threshold_scan_topk(
            jnp.asarray(q), gemm_index, meta, sample.data, sample.valid,
            k=20, cap=512, tile_rows=256,
        )
    d, i, exact = np.asarray(d), np.asarray(i), np.asarray(exact)
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=20)
    ok = np.nonzero(exact)[0]
    assert len(ok) >= 1
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_auto_wrapper_cpu_falls_back_exact(db, gemm_index, rng):
    q = rng.integers(0, 256, size=(4, 16), dtype=np.uint8)
    d, i = hamming_gemm_scan_topk_auto(q, gemm_index, k=15)
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=15)
    check_topk_parity(np.asarray(d), np.asarray(i), exp_d, exp_i)


def test_auto_wrapper_pallas_path_with_repair(db, gemm_index, rng):
    """prefer_pallas under interpret mode, including the repair splice."""
    q = rng.integers(0, 256, size=(3, 16), dtype=np.uint8)
    with pltpu.force_tpu_interpret_mode():
        d, i = hamming_gemm_scan_topk_auto(
            q, gemm_index, k=30, prefer_pallas=True, block_rows=256
        )
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=30)
    check_topk_parity(np.asarray(d), np.asarray(i), exp_d, exp_i)


def test_pallas_hamming_v2_matches_oracle(db, gemm_index, rng):
    from pixelbox_tpu.ops.pallas_scan import (
        pallas_hamming_threshold_scan_topk_v2,
    )

    q = rng.integers(0, 256, size=(4, 16), dtype=np.uint8)
    sample = build_hamming_scan_sample(gemm_index, sample_rows=1024)
    meta = build_hamming_meta(gemm_index)
    with pltpu.force_tpu_interpret_mode():
        d, i, exact = pallas_hamming_threshold_scan_topk_v2(
            jnp.asarray(q), gemm_index, meta, sample.data, sample.valid,
            k=20, tile_rows=256,
        )
    d, i, exact = np.asarray(d), np.asarray(i), np.asarray(exact)
    exp_d, exp_i = oracle.hamming_scan_topk_np(q, db, k=20)
    ok = np.nonzero(exact)[0]
    assert len(ok) >= 1
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])
