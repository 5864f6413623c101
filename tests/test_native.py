"""Native C++ components: build, QOI, multithreaded CPU scan parity."""

import ctypes

import numpy as np
import pytest

from pixelbox_tpu.native import load_native
from pixelbox_tpu.ops import oracle


@pytest.fixture(scope="module")
def lib():
    lib = load_native()
    if lib is None:
        pytest.skip("no C++ toolchain / native build failed")
    return lib


def _scan(lib, db, q, k, max_distance=1e3, threads=4):
    qn = q.shape[0]
    out_d = np.empty((qn, k), np.float32)
    out_i = np.empty((qn, k), np.int32)
    lib.cpu_cosine_scan_topk(
        db.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        db.shape[0], db.shape[1],
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        qn, k, max_distance, threads,
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_d, out_i


def test_cpu_scan_matches_oracle(lib, rng):
    db = rng.integers(0, 256, (5000, 128), dtype=np.uint8)
    q = rng.integers(0, 256, (4, 128), dtype=np.uint8)
    got_d, got_i = _scan(lib, db, q, k=25)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=25)
    np.testing.assert_array_equal(got_d, exp_d)
    np.testing.assert_array_equal(got_i, exp_i)


def test_cpu_scan_threshold(lib, rng):
    db = rng.integers(0, 256, (2000, 64), dtype=np.uint8)
    q = rng.integers(0, 256, (2, 64), dtype=np.uint8)
    got_d, got_i = _scan(lib, db, q, k=50, max_distance=0.5)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=50, max_distance=0.5)
    np.testing.assert_array_equal(got_d, exp_d)
    np.testing.assert_array_equal(got_i, exp_i)


def test_cpu_scan_thread_count_invariant(lib, rng):
    """Result must not depend on the thread split."""
    db = rng.integers(0, 256, (3333, 32), dtype=np.uint8)
    q = rng.integers(0, 256, (2, 32), dtype=np.uint8)
    d1, i1 = _scan(lib, db, q, k=10, threads=1)
    d8, i8 = _scan(lib, db, q, k=10, threads=8)
    np.testing.assert_array_equal(d1, d8)
    np.testing.assert_array_equal(i1, i8)


def test_qoi_native_roundtrip(lib, rng):
    from pixelbox_tpu.ingest.thumbnail import qoi_decode, qoi_encode

    img = rng.integers(0, 256, (33, 57, 3), dtype=np.uint8)
    out, (w, h) = qoi_decode(qoi_encode(img))
    assert (w, h) == (57, 33)
    np.testing.assert_array_equal(out, img)
