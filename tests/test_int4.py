"""Int4 (half-byte) semantic index: packing, oracle parity, Pallas kernel."""

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
import pytest

from pixelbox_tpu.ops.int4 import (
    build_semantic4_index,
    build_semantic4_meta,
    cosine4_scan_topk,
    cosine4_scan_topk_auto,
    cosine4_scan_topk_np,
    cosine4a_scan_topk_np,
    dequantize_u4_to_u8,
    pack_u4_rows,
    pallas_threshold4_scan_topk,
    quantize_u8_to_u4,
    unpack_u4_rows_np,
)
from pixelbox_tpu.ops.scan import build_scan_sample

from test_scan import check_topk_parity


def test_quantize_endpoints_exact():
    v8 = np.array([0, 17, 128, 238, 255], dtype=np.uint8)
    v4 = quantize_u8_to_u4(v8)
    assert v4.tolist() == [0, 1, 8, 14, 15]
    # Grid values round-trip exactly.
    grid = np.arange(16, dtype=np.uint8)
    assert np.array_equal(quantize_u8_to_u4(dequantize_u4_to_u8(grid)), grid)


def test_pack_unpack_roundtrip(rng):
    v4 = rng.integers(0, 16, size=(32, 64), dtype=np.uint8)
    assert np.array_equal(unpack_u4_rows_np(pack_u4_rows(v4)), v4)


@pytest.fixture(scope="module")
def db():
    return np.random.default_rng(17).integers(
        0, 256, size=(8192, 32), dtype=np.uint8
    )


@pytest.fixture(scope="module")
def index4(db):
    return build_semantic4_index(db, block_rows=512)


def test_xla_scan_matches_oracle(db, index4, rng):
    q = rng.integers(0, 256, size=(6, 32), dtype=np.uint8)
    got_d, got_i = cosine4_scan_topk(jnp.asarray(q), index4, k=30,
                                     block_rows=512)
    exp_d, exp_i = cosine4_scan_topk_np(q, db, k=30)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_self_match(db, index4):
    d, i = cosine4_scan_topk(jnp.asarray(db[42]), index4, k=3, block_rows=512)
    assert np.asarray(i).ravel()[0] == 42
    assert np.asarray(d).ravel()[0] == 0.0


def test_pallas_threshold4_matches_oracle(db, index4, rng):
    """Symmetric kind (query_mode='sym', the r2 metric) vs its oracle."""
    q = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    sample = build_scan_sample(index4, sample_rows=1024)
    meta = build_semantic4_meta(index4)
    with pltpu.force_tpu_interpret_mode():
        d, i, exact = pallas_threshold4_scan_topk(
            jnp.asarray(q), index4, meta, sample, k=25, tile_rows=256,
            query_mode="sym",
        )
    d, i, exact = np.asarray(d), np.asarray(i), np.asarray(exact)
    exp_d, exp_i = cosine4_scan_topk_np(q, db, k=25)
    ok = np.nonzero(exact)[0]
    assert len(ok) >= 1
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_pallas_threshold4_asym_matches_oracle(db, index4, rng):
    """Asymmetric kind (the default): u8 query against int4 rows."""
    from pixelbox_tpu.ops.int4 import cosine4a_scan_topk

    q = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    sample = build_scan_sample(index4, sample_rows=1024)
    meta = build_semantic4_meta(index4)
    with pltpu.force_tpu_interpret_mode():
        d, i, exact = pallas_threshold4_scan_topk(
            jnp.asarray(q), index4, meta, sample, k=25, tile_rows=256
        )
    d, i, exact = np.asarray(d), np.asarray(i), np.asarray(exact)
    exp_d, exp_i = cosine4a_scan_topk_np(q, db, k=25)
    ok = np.nonzero(exact)[0]
    assert len(ok) >= 1
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])
    # XLA exact asym path agrees bitwise too.
    xd, xi = cosine4a_scan_topk(jnp.asarray(q), index4, k=25, block_rows=512)
    check_topk_parity(np.asarray(xd), np.asarray(xi), exp_d, exp_i)


def test_auto_wrapper_small_dim_falls_back_threshold(db, index4, rng):
    """dim 32 fails the pallas gate (the gate checks the UNPACKED dim %
    128 — at the primary d=128 deployment the packed block is 64 lanes,
    which Mosaic pads internally) — the wrapper must fall back to the
    XLA threshold scan + repair and still match the oracle."""
    q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    d, i = cosine4_scan_topk_auto(
        q, index4, k=40, prefer_pallas=True, block_rows=512
    )
    exp_d, exp_i = cosine4a_scan_topk_np(q, db, k=40)
    check_topk_parity(np.asarray(d), np.asarray(i), exp_d, exp_i)


def test_auto_wrapper_pallas_with_repair(rng):
    """256-dim index passes the gate; interpret-mode pallas + repair."""
    db = rng.integers(0, 256, size=(4096, 256), dtype=np.uint8)
    index4 = build_semantic4_index(db, block_rows=256)
    q = rng.integers(0, 256, size=(3, 256), dtype=np.uint8)
    with pltpu.force_tpu_interpret_mode():
        d, i = cosine4_scan_topk_auto(
            q, index4, k=30, prefer_pallas=True, block_rows=256
        )
    exp_d, exp_i = cosine4a_scan_topk_np(q, db, k=30)
    check_topk_parity(np.asarray(d), np.asarray(i), exp_d, exp_i)


def test_auto_wrapper_cpu_exact(db, index4, rng):
    q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    d, i = cosine4_scan_topk_auto(q, index4, k=15, block_rows=512)
    exp_d, exp_i = cosine4a_scan_topk_np(q, db, k=15)
    check_topk_parity(np.asarray(d), np.asarray(i), exp_d, exp_i)


def test_int4_recall_vs_u8_truth(db, index4, rng):
    """Informational floor: the coarse index still finds most of the u8
    ground-truth neighborhood on random data."""
    from pixelbox_tpu.ops.oracle import cosine_scan_topk_np

    q = db[rng.integers(0, len(db), size=8)]
    _, got = cosine4_scan_topk(jnp.asarray(q), index4, k=50, block_rows=512)
    got = np.asarray(got)
    _, want = cosine_scan_topk_np(q, db, k=10)
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(len(q))]
    )
    assert recall >= 0.5  # coarse but useful; exact top-1 (self) always hits
