"""Mesh-sharded IVF (parallel/sharded_ivf): clustered ANN over the mesh.

Contract mirrors single-chip IVF: approximate candidate selection (every
shard probes the same nprobe clusters under the shared centroids), exact
u8 reciprocal-cosine distances, ascending-global-row-id tie-break; with
``nprobe == n_clusters`` the probe covers every bucket and — together
with the always-exact per-shard spills — equals the flat exact scan
bit-for-bit.  Runs on the conftest 8-device CPU mesh.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.ops import ivf as ivf_ops
from pixelbox_tpu.ops.packed import PackedSemanticIndex, semantic_rows_from_u8
from pixelbox_tpu.ops.scan import cosine_scan_topk
from pixelbox_tpu.parallel.mesh import make_mesh
from pixelbox_tpu.parallel.sharded_ivf import (
    build_sharded_ivf,
    rebuild_sharded_spill,
    sharded_ivf_scan_topk,
)

from fixtures import textured_image


def _flat_index(rows, valid=None):
    n, d = rows.shape
    data, s, m = semantic_rows_from_u8(rows)
    if valid is None:
        valid = np.ones(n, dtype=bool)
    return PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(s), jnp.asarray(m), jnp.asarray(valid)
    )


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_full_nprobe_equals_exact_scan(mesh, rng):
    rows = np.clip(
        rng.normal(size=(4096, 32)) * 40 + 128, 0, 255
    ).astype(np.uint8)
    valid = np.ones(4096, dtype=bool)
    valid[::5] = False  # tombstones must never return
    cents = ivf_ops.spherical_kmeans(rows, valid, 12, iters=5, seed=0)
    sivf, spill_ids = build_sharded_ivf(rows, valid, cents, mesh,
                                        bucket_cap=24)
    assert sum(len(s) for s in spill_ids) > 0  # tiny cap forces spill

    q = rows[rng.integers(0, 4096, size=6)]
    d_s, i_s = sharded_ivf_scan_topk(q, sivf, mesh, k=20, nprobe=12)
    d_e, i_e = cosine_scan_topk(jnp.asarray(q), _flat_index(rows, valid),
                                k=20, block_rows=4096)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_e))
    np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_e))
    returned = np.asarray(i_s)[np.asarray(i_s) >= 0]
    assert np.all(returned % 5 != 0)


def test_cross_shard_tie_breaks_by_global_row_id(mesh, rng):
    """Duplicate rows living on DIFFERENT shards tie exactly; the merge
    must order them by ascending global row id, like the flat scan."""
    rows = np.clip(
        rng.normal(size=(1024, 16)) * 40 + 128, 0, 255
    ).astype(np.uint8)
    # Local rows per shard = 128.  Plant the same vector on shards 6, 1,
    # and 4 (descending probe-agnostic order to stress the merge).
    dup = rows[7]
    rows[6 * 128 + 3] = dup
    rows[1 * 128 + 9] = dup
    rows[4 * 128 + 77] = dup
    valid = np.ones(1024, dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 8, iters=4, seed=1)
    sivf, _ = build_sharded_ivf(rows, valid, cents, mesh)

    d_s, i_s = sharded_ivf_scan_topk(dup, sivf, mesh, k=4, nprobe=8)
    d_e, i_e = cosine_scan_topk(jnp.asarray(dup), _flat_index(rows),
                                k=4, block_rows=1024)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_e))
    got = np.asarray(i_s)
    assert list(got) == sorted(got)  # ties at dist 0 ascend by global id
    assert got[0] == 7
    assert np.all(np.asarray(d_s)[:4] == 0.0)


def test_rebuild_sharded_spill_extends_incrementally(mesh, rng):
    """Appended rows join per-shard spills without bucket repack, and the
    extended full-probe scan equals the exact scan over all rows."""
    rows = np.clip(
        rng.normal(size=(2048, 32)) * 40 + 128, 0, 255
    ).astype(np.uint8)
    valid = np.ones(2048, dtype=bool)
    packed_n = 1792  # last 256 rows "appended" later (32 per shard)
    valid0 = valid.copy()
    valid0[packed_n:] = False
    cents = ivf_ops.spherical_kmeans(rows[:packed_n], valid0[:packed_n],
                                     8, iters=4, seed=2)
    sivf, spill_ids = build_sharded_ivf(rows, valid0, cents, mesh)

    local_rows = 2048 // 8
    delta = np.arange(packed_n, 2048, dtype=np.int64)
    per_shard = [
        np.concatenate([spill_ids[s], delta[(delta // local_rows) == s]])
        for s in range(8)
    ]
    ext = rebuild_sharded_spill(sivf, rows, per_shard, mesh)
    assert ext.bucket_data is sivf.bucket_data  # buckets shared

    q = rows[rng.integers(0, 2048, size=5)]
    d_s, i_s = sharded_ivf_scan_topk(q, ext, mesh, k=15, nprobe=8)
    d_e, i_e = cosine_scan_topk(jnp.asarray(q), _flat_index(rows),
                                k=15, block_rows=2048)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_e))
    np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_e))


def test_int4_sharded_full_probe_equals_flat_int4_exact(mesh, rng):
    """precision='int4' shards nibble buckets (half the per-chip HBM);
    full-probe equals the flat asymmetric int4 oracle, ties included."""
    from pixelbox_tpu.ops.int4 import cosine4a_scan_topk_np

    rows = np.clip(
        rng.normal(size=(2048, 32)) * 40 + 128, 0, 255
    ).astype(np.uint8)
    valid = np.ones(2048, dtype=bool)
    valid[::6] = False
    cents = ivf_ops.spherical_kmeans(rows, valid, 8, iters=5, seed=21)
    sivf, spill_ids = build_sharded_ivf(rows, valid, cents, mesh,
                                        bucket_cap=24, precision="int4")
    assert sivf.bucket_data.dtype == jnp.uint8
    assert sivf.bucket_data.shape[2] == 16  # D/2 — half the bucket HBM
    assert sum(len(s) for s in spill_ids) > 0

    q = rows[rng.integers(0, 2048, size=5)]
    d_s, i_s = sharded_ivf_scan_topk(q, sivf, mesh, k=15, nprobe=8)
    db = rows.copy()
    d_np, i_np = cosine4a_scan_topk_np(q, db[valid], k=15)
    live_map = np.flatnonzero(valid)
    i_np = np.where(np.asarray(i_np) >= 0, live_map[np.asarray(i_np)], -1)
    np.testing.assert_array_equal(np.asarray(i_s), i_np)


def test_partial_nprobe_recall(mesh, rng):
    """Low-nprobe sharded IVF keeps useful recall (same clustering as
    single-chip; spills only add exact-scanned rows)."""
    centers = rng.normal(size=(16, 32)) * 40.0
    which = rng.integers(0, 16, size=4096)
    rows = np.clip(
        centers[which] + rng.normal(size=(4096, 32)) * 6 + 128, 0, 255
    ).astype(np.uint8)
    valid = np.ones(4096, dtype=bool)
    cents = ivf_ops.spherical_kmeans(rows, valid, 16, iters=8, seed=3)
    sivf, _ = build_sharded_ivf(rows, valid, cents, mesh)

    base = rows[rng.integers(0, 4096, size=8)].astype(np.int32)
    q = np.clip(base + rng.integers(-5, 6, size=base.shape), 0, 255
                ).astype(np.uint8)
    _, i_s = sharded_ivf_scan_topk(q, sivf, mesh, k=10, nprobe=4)
    _, i_e = cosine_scan_topk(jnp.asarray(q), _flat_index(rows), k=10,
                              block_rows=4096)
    i_s, i_e = np.asarray(i_s), np.asarray(i_e)
    hits = sum(
        len(set(i_s[r]) & set(i_e[r][i_e[r] >= 0])) for r in range(len(q))
    )
    total = int((i_e >= 0).sum())
    assert hits / total >= 0.8, hits / total


# --------------------------------------------------------------------- #
# Engine-level: scan_mode="ivf" under serve_on_mesh


@pytest.fixture()
def mesh_ivf_engine(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    for s in range(12):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    db = tmp_path / "mesh_ivf.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 32})
    eng.max_distance_from_query = 1e7
    for s in range(12):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    eng.scan_mode = "ivf"
    eng.ivf_clusters = 3
    eng.ivf_nprobe = 3  # exhaustive -> oracle-equal
    yield eng, d
    eng.close()


def _results(eng):
    return [(r.id, round(float(r.distance_from_query), 6))
            for r in eng.get_query_results()]


def test_engine_ivf_serves_from_mesh(mesh_ivf_engine):
    eng, d = mesh_ivf_engine
    rec = eng.load_image(str(d / "s4.png"))

    eng.scan_mode = "exact"
    eng.query_by_image_hash_from_image(rec)
    want = _results(eng)
    eng.scan_mode = "ivf"

    eng.serve_on_mesh(make_mesh(8))
    try:
        eng.query_by_image_hash_from_image(rec)
        assert eng._ivf_sharded is not None  # the mesh path actually ran
        assert eng._ivf is None  # and not the single-chip one
        assert _results(eng) == want
        assert want[0][1] == 0.0
    finally:
        eng.scan_mesh = None


def test_engine_mesh_ivf_appends_extend_spill(mesh_ivf_engine, tmp_path):
    eng, d = mesh_ivf_engine
    eng.serve_on_mesh(make_mesh(8))
    try:
        rec = eng.load_image(str(d / "s1.png"))
        eng.query_by_image_hash_from_image(rec)
        bd0 = eng._ivf_sharded.bucket_data
        packed = eng._ivf_sharded_packed_n

        for i in range(2):
            p = tmp_path / f"x{i}.png"
            Image.fromarray(
                textured_image(seed=200 + i, size=(48, 48))
            ).save(p)
            eng.insert_image_from_path(str(p))
            eng.query_by_image_hash_from_file(str(p))
            top = eng.get_query_results()[0]
            assert top.filename == f"x{i}.png"
            assert float(top.distance_from_query) == 0.0
        assert eng._ivf_sharded.bucket_data is bd0  # spill-extend only
        assert eng._ivf_sharded_packed_n == packed

        # Structural change (removal) -> full rebuild, row gone.
        victim = top.id
        eng.remove_image(victim)
        eng.query_by_image_hash_from_image(rec)
        assert all(r.id != victim for r in eng.get_query_results())
        assert eng._ivf_sharded.bucket_data is not bd0
    finally:
        eng.scan_mesh = None


def test_engine_mesh_ivf_survives_compaction(mesh_ivf_engine):
    """Regression: compact() shrinks the host mirror to exactly n rows,
    which need not divide the mesh size — the sharded IVF builder must
    pad instead of asserting (every ivf query crashed after a compact)."""
    eng, d = mesh_ivf_engine
    eng.serve_on_mesh(make_mesh(8))
    try:
        rec = eng.load_image(str(d / "s3.png"))
        eng.query_by_image_hash_from_image(rec)
        victim = [
            r.id for r in eng.get_query_results()
            if not r.path.endswith("s3.png")
        ][0]
        eng.remove_image(victim)
        eng.compact()  # host mirror now exactly n rows (11, not %8)

        eng.query_by_image_hash_from_image(rec)  # used to AssertionError
        res = eng.get_query_results()
        assert res and res[0].path.endswith("s3.png")
        assert all(r.id != victim for r in res)

        eng.scan_mode = "exact"
        eng.query_by_image_hash_from_image(rec)
        want = [(r.id, round(float(r.distance_from_query), 6))
                for r in eng.get_query_results()]
        eng.scan_mode = "ivf"
        eng.query_by_image_hash_from_image(rec)
        got = [(r.id, round(float(r.distance_from_query), 6))
               for r in eng.get_query_results()]
        assert got == want
    finally:
        eng.scan_mesh = None


def test_engine_mesh_ivf_matches_single_chip_full_probe(mesh_ivf_engine):
    """Full-probe results are identical between the sharded and
    single-chip IVF paths (both equal the exact scan)."""
    eng, d = mesh_ivf_engine
    rec = eng.load_image(str(d / "s7.png"))

    eng.query_by_image_hash_from_image(rec)
    single = _results(eng)

    eng.serve_on_mesh(make_mesh(8))
    try:
        eng.query_by_image_hash_from_image(rec)
        assert _results(eng) == single
    finally:
        eng.scan_mesh = None


@pytest.mark.parametrize("trial", range(2))
def test_sharded_full_probe_randomized(mesh, trial):
    """Property: full-probe SHARDED ivf equals the flat exact scan for
    random configs (caps/ties/tombstones, u8 + int4 packings), mirroring
    the single-chip randomized trials in test_ivf.py."""
    r = np.random.default_rng(400 + trial)
    n = int(r.choice([1024, 2048]))  # divisible by the 8-shard mesh
    d = int(r.choice([16, 32]))
    c = int(r.integers(2, 10))
    cap = int(r.choice([8, 16]))
    k = int(r.integers(3, 30))
    md = float(r.choice([0.5, 1e3, 1e7]))
    precision = str(r.choice(["u8", "int4"]))
    base = r.integers(0, 256, size=(max(8, n // 8), d), dtype=np.uint8)
    picks = r.integers(0, len(base), size=n)
    noise = r.integers(0, 256, size=(n, d), dtype=np.uint8)
    dup = r.uniform(size=(n, 1)) < 0.5
    rows = np.where(dup, base[picks], noise).astype(np.uint8)
    valid = r.uniform(size=n) > 0.1
    if not valid.any():
        valid[0] = True
    q = np.concatenate([
        rows[r.integers(0, n, size=3)],
        r.integers(0, 256, size=(2, d), dtype=np.uint8),
    ])

    cents = ivf_ops.spherical_kmeans(rows, valid, c, iters=4, seed=trial)
    sivf, _ = build_sharded_ivf(rows, valid, cents, mesh, bucket_cap=cap,
                                precision=precision)
    got_d, got_i = sharded_ivf_scan_topk(q, sivf, mesh, k=k,
                                         nprobe=sivf.n_clusters,
                                         max_distance=md)
    got_d, got_i = np.asarray(got_d), np.asarray(got_i)

    if precision == "int4":
        from pixelbox_tpu.ops.int4 import cosine4a_scan_topk_np

        exp_d, exp_i = cosine4a_scan_topk_np(q, rows[valid], k=k,
                                             max_distance=md)
    else:
        from pixelbox_tpu.ops import oracle

        exp_d, exp_i = oracle.cosine_scan_topk_np(q, rows[valid], k=k,
                                                  max_distance=md)
    live_map = np.flatnonzero(valid)
    exp_i = np.where(np.asarray(exp_i) >= 0,
                     live_map[np.maximum(np.asarray(exp_i), 0)], -1)
    np.testing.assert_array_equal(got_i, exp_i)
    np.testing.assert_array_equal(got_d, np.asarray(exp_d))
