"""Batched-Q Pallas threshold scan vs oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas.tpu as pltpu
import pytest

from pixelbox_tpu.ops import oracle
from pixelbox_tpu.ops.pallas_scan import (
    build_row_meta,
    pallas_threshold_scan_topk,
)
from pixelbox_tpu.ops.scan import build_scan_sample

from test_scan import check_topk_parity, make_semantic_index


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, size=(4096, 32), dtype=np.uint8)


@pytest.fixture(scope="module")
def index(db):
    return make_semantic_index(db, block_rows=256)


def _run(q, index, db, k=25, md=1e3, cap=512, **kw):
    sample = build_scan_sample(index, sample_rows=1024)
    meta = build_row_meta(index)
    with pltpu.force_tpu_interpret_mode():
        d, i, exact = pallas_threshold_scan_topk(
            jnp.asarray(q), index, meta, sample, k=k, max_distance=md,
            cap=cap, tile_rows=256, **kw,
        )
    return np.asarray(d), np.asarray(i), np.asarray(exact)


def test_matches_oracle_where_proven(db, index, rng):
    q = rng.integers(0, 256, size=(6, 32), dtype=np.uint8)
    d, i, exact = _run(q, index, db)
    assert exact.mean() > 0.5
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=25)
    ok = np.nonzero(exact)[0]
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_exact_count_accounting(db, index, rng):
    """Tiny cap forces uncollected rows; those queries must be flagged
    unproven rather than silently truncated."""
    q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    d, i, exact = _run(q, index, db, cap=128, target_count=2000)
    assert not exact.all()


def test_max_distance_unbound(db, index, rng):
    q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    d, i, exact = _run(q, index, db, k=50, md=0.05)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=50, max_distance=0.05)
    ok = np.nonzero(exact)[0]
    assert len(ok) == 3  # few passing rows: θ==md proves completeness
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_single_query_self_match(db, index):
    d, i, exact = _run(db[7], index, db, k=3)
    assert i.ravel()[0] == 7
    assert d.ravel()[0] == 0.0


# ------------------------------------------------------------------ #
# v2 (in-kernel running sorted top-k)


def _run_v2(q, index, db, k=25, md=1e3, **kw):
    from pixelbox_tpu.ops.pallas_scan import pallas_threshold_scan_topk_v2

    kw.setdefault("tile_rows", 256)
    sample = build_scan_sample(index, sample_rows=1024)
    meta = build_row_meta(index)
    with pltpu.force_tpu_interpret_mode():
        d, i, exact = pallas_threshold_scan_topk_v2(
            jnp.asarray(q), index, meta, sample, k=k, max_distance=md, **kw,
        )
    return np.asarray(d), np.asarray(i), np.asarray(exact)


def test_v2_segmented_extraction_matches_oracle(db, index, rng):
    """tile_rows=1024 splits extraction into 512-lane segments (the
    production shape); results must stay oracle-exact incl. tie order."""
    q = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    d, i, exact = _run_v2(q, index, db, k=40, tile_rows=1024)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=40)
    ok = np.nonzero(exact)[0]
    assert len(ok) >= 3
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_v2_segmented_tie_flood(rng):
    """Duplicate ties spanning segment boundaries must keep ascending-id
    order under segmented extraction."""
    base = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    db2 = np.repeat(base, 1024, axis=0)  # 4096 rows, giant tie groups
    idx2 = make_semantic_index(db2, block_rows=1024)
    d, i, exact = _run_v2(base[:2], idx2, db2, k=20, tile_rows=1024)
    exp_d, exp_i = oracle.cosine_scan_topk_np(base[:2], db2, k=20)
    ok = np.nonzero(exact)[0]
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_v2_matches_oracle_where_proven(db, index, rng):
    q = rng.integers(0, 256, size=(6, 32), dtype=np.uint8)
    d, i, exact = _run_v2(q, index, db)
    assert exact.mean() > 0.5
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=25)
    ok = np.nonzero(exact)[0]
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_v2_duplicate_ties(rng):
    base = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)
    db2 = np.repeat(base, 512, axis=0)  # 4096 rows of ties
    idx2 = make_semantic_index(db2, block_rows=256)
    d, i, exact = _run_v2(base[:2], idx2, db2, k=20)
    exp_d, exp_i = oracle.cosine_scan_topk_np(base[:2], db2, k=20)
    ok = np.nonzero(exact)[0]
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_v2_round_bound_poisons_not_corrupts(db, index, rng):
    """max_rounds=2 guarantees pending insertions: affected queries must
    come back unproven, never silently wrong."""
    q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    d, i, exact = _run_v2(q, index, db, k=25, max_rounds=2,
                          target_count=2000)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=25)
    ok = np.nonzero(exact)[0]
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_v2_unbound_max_distance(db, index, rng):
    q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    d, i, exact = _run_v2(q, index, db, k=50, md=0.05)
    assert exact.all()
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=50, max_distance=0.05)
    check_topk_parity(d, i, exp_d, exp_i)


def test_v2_k_beyond_one_lane_block(db, index, rng):
    """k=150 needs 256 carry lanes; insertion must stay oracle-exact."""
    q = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
    d, i, exact = _run_v2(q, index, db, k=150)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=150)
    ok = np.nonzero(exact)[0]
    assert len(ok) >= 1
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_v2_all_rows_invalid(rng):
    """Empty (all-masked) index: zero results, proven exact via θ==md."""
    from pixelbox_tpu.ops.packed import PackedSemanticIndex

    cap, dim = 4096, 32
    idx = PackedSemanticIndex(
        jnp.zeros((cap, dim), jnp.int8), jnp.zeros(cap, jnp.int32),
        jnp.zeros(cap, jnp.int32), jnp.zeros(cap, bool),
    )
    q = rng.integers(0, 256, size=(2, dim), dtype=np.uint8)
    d, i, exact = _run_v2(q, idx, None, k=10)
    assert exact.all()
    assert (np.asarray(i) == -1).all()


# ------------------------------------------------------------------ #
# cos-key epilogue (PIXELBOX_SCAN_EPILOGUE=cos) — the A/B knob'd carry
# path (ADVICE r4: previously zero coverage; regressions would ship
# undetected because only the default 'dist' epilogue was ever tested).


@pytest.fixture
def cos_epilogue(monkeypatch):
    from pixelbox_tpu.ops import pallas_scan

    monkeypatch.setattr(pallas_scan, "_EPILOGUE", "cos")
    # The v2 wrapper is jitted: clear its trace cache so the monkeypatched
    # module global is actually read (a cached 'dist' trace would
    # silently serve otherwise), and again on exit for later tests.
    pallas_scan.pallas_threshold_scan_topk_v2.clear_cache()
    yield
    pallas_scan.pallas_threshold_scan_topk_v2.clear_cache()


def test_coskey_matches_oracle_where_proven(db, index, rng, cos_epilogue):
    q = rng.integers(0, 256, size=(6, 32), dtype=np.uint8)
    d, i, exact = _run_v2(q, index, db)
    assert exact.mean() > 0.5
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=25)
    ok = np.nonzero(exact)[0]
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_coskey_tie_plateau(rng, cos_epilogue):
    """Giant duplicate tie groups: the plateau-membership proof must
    either resolve ascending-id order exactly or mark the query
    unproven — never a silently wrong order."""
    base = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    db2 = np.repeat(base, 1024, axis=0)
    idx2 = make_semantic_index(db2, block_rows=1024)
    d, i, exact = _run_v2(base[:2], idx2, db2, k=20, tile_rows=1024)
    exp_d, exp_i = oracle.cosine_scan_topk_np(base[:2], db2, k=20)
    ok = np.nonzero(exact)[0]
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_coskey_saturated_theta(db, index, rng, cos_epilogue):
    """max_distance below the sample threshold: θ saturates at md (the
    carry IS the full WHERE-clause result) and the exclusion semantics
    must match the oracle's bounded scan."""
    q = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    d, i, exact = _run_v2(q, index, db, k=50, md=0.05)
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=50,
                                              max_distance=0.05)
    ok = np.nonzero(exact)[0]
    assert len(ok) >= 2
    check_topk_parity(d[ok], i[ok], exp_d[ok], exp_i[ok])


def test_coskey_self_match_zero(db, index, cos_epilogue):
    d, i, exact = _run_v2(db[7][None], index, db, k=3)
    assert i.ravel()[0] == 7
    assert d.ravel()[0] == 0.0
