"""Multi-chip serving unification (round 2): the guaranteed-exact auto
path under shard_map, pallas-mode fallback on a mesh, sharded phash
queries, and incremental (delta-only) shard sync after appends."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.ops import oracle
from pixelbox_tpu.parallel.mesh import make_mesh
from pixelbox_tpu.parallel.sharded_scan import (
    shard_semantic_index,
    sharded_cosine_scan_topk_auto,
)

from fixtures import textured_image
from test_scan import check_topk_parity, make_semantic_index


def test_sharded_auto_threshold_matches_oracle(rng):
    """local_rows(2048) > 4·block_rows(256): the per-shard THRESHOLD path
    runs (not the small-shard exact fallback) and must match the oracle."""
    db = rng.integers(0, 256, size=(16384, 32), dtype=np.uint8)
    mesh = make_mesh(8)
    index = shard_semantic_index(make_semantic_index(db, block_rows=2048), mesh)
    q = rng.integers(0, 256, size=(6, 32), dtype=np.uint8)
    got_d, got_i = sharded_cosine_scan_topk_auto(
        jnp.asarray(q), index, mesh, k=30, block_rows=256
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(q, db, k=30)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_sharded_auto_duplicate_flood_repairs(rng):
    base = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    db = np.repeat(base, 4096, axis=0)  # 16384 rows of heavy ties
    mesh = make_mesh(8)
    index = shard_semantic_index(make_semantic_index(db, block_rows=2048), mesh)
    got_d, got_i = sharded_cosine_scan_topk_auto(
        jnp.asarray(base[:2]), index, mesh, k=20, block_rows=256
    )
    exp_d, exp_i = oracle.cosine_scan_topk_np(base[:2], db, k=20)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


def test_sharded_int4_auto_matches_oracle(rng):
    from pixelbox_tpu.ops.int4 import (
        build_semantic4_index,
        cosine4a_scan_topk_np,
    )
    from pixelbox_tpu.parallel.sharded_scan import (
        sharded_cosine4_scan_topk_auto,
    )

    db = rng.integers(0, 256, size=(16384, 32), dtype=np.uint8)
    mesh = make_mesh(8)
    index = shard_semantic_index(build_semantic4_index(db, block_rows=2048), mesh)
    q = rng.integers(0, 256, size=(5, 32), dtype=np.uint8)
    got_d, got_i = sharded_cosine4_scan_topk_auto(
        jnp.asarray(q), index, mesh, k=25, block_rows=256
    )
    exp_d, exp_i = cosine4a_scan_topk_np(q, db, k=25)
    check_topk_parity(np.asarray(got_d), np.asarray(got_i), exp_d, exp_i)


@pytest.fixture(scope="module")
def mesh_engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("photos")
    for s in range(8):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    db = tmp_path_factory.mktemp("db") / "mesh.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 32})
    eng.max_distance_from_query = 1e7
    for s in range(8):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    yield eng, d
    eng.close()


def _results(eng):
    return [
        (r.filename, round(r.distance_from_query, 6))
        for r in eng.get_query_results()
    ]


@pytest.mark.parametrize("mode", ["auto", "pallas", "exact", "fast"])
def test_every_scan_mode_works_on_mesh(mesh_engine, mode):
    """Regression: scan_mode='pallas' + serve_on_mesh used to crash with
    an AssertionError; auto silently downgraded.  All modes must now run
    on a mesh and match the single-chip exact results."""
    eng, d = mesh_engine
    probe = str(d / "s3.png")

    eng.scan_mesh = None
    eng.scan_mode = "exact"
    eng.query_by_image_hash_from_file(probe)
    single = _results(eng)

    eng.serve_on_mesh(make_mesh(8))
    eng.scan_mode = mode
    try:
        eng.query_by_image_hash_from_file(probe)
        assert _results(eng) == single
        assert single[0][0] == "s3.png"
    finally:
        eng.scan_mesh = None
        eng.scan_mode = "auto"


def test_phash_query_uses_mesh(mesh_engine):
    eng, d = mesh_engine
    rec = eng.load_image(str(d / "s4.png"))

    eng.scan_mesh = None
    eng.query_by_phash(rec.phash)
    single = _results(eng)

    eng.serve_on_mesh(make_mesh(8))
    try:
        eng.query_by_phash(rec.phash)
        assert _results(eng) == single
        assert eng._ph_sharded is not None  # the sharded path actually ran
        assert single[0][0] == "s4.png"
    finally:
        eng.scan_mesh = None


def test_incremental_shard_append(mesh_engine, tmp_path):
    """In-capacity appends must NOT re-transfer the sharded index —
    only the delta rows ship (one full reshard total)."""
    eng, d = mesh_engine
    eng.serve_on_mesh(make_mesh(8))
    try:
        eng.query_by_image_hash_from_file(str(d / "s1.png"))
        base = eng._sharded_full_reshards
        assert base >= 1

        for i in range(3):
            p = tmp_path / f"extra{i}.png"
            Image.fromarray(
                textured_image(seed=100 + i, size=(48, 48))
            ).save(p)
            eng.insert_image_from_path(str(p))
            eng.query_by_image_hash_from_file(str(p))
            assert eng.get_query_results()[0].filename == f"extra{i}.png"
        assert eng._sharded_full_reshards == base  # deltas only

        # Removal is structural → exactly one more full reshard.
        victim = eng.get_query_results()[0].id
        eng.remove_image(victim)
        eng.query_by_image_hash_from_file(str(d / "s1.png"))
        assert all(r.id != victim for r in eng.get_query_results())
        assert eng._sharded_full_reshards == base + 1

        # A later in-capacity append's bucket padding covers the
        # tombstoned row — it must NOT be resurrected in the mirror.
        p = tmp_path / "after_removal.png"
        Image.fromarray(textured_image(seed=200, size=(48, 48))).save(p)
        eng.insert_image_from_path(str(p))
        eng.query_by_image_hash_from_file(str(d / "s1.png"))
        assert all(r.id != victim for r in eng.get_query_results())
        assert eng._sharded_full_reshards == base + 1  # delta, not reshard
    finally:
        eng.scan_mesh = None


def test_mixed_width_compat_phash_on_mesh(tmp_path):
    """Compat (aspect-preserving, variable-width) phash libraries —
    the DEFAULT configuration — must serve their grouped zip-truncate
    scans from the mesh and match the single-chip results exactly.
    (Round-2 verdict: this path silently dropped to single-chip.)"""
    d = tmp_path / "photos"
    d.mkdir()
    shapes = [(48, 48), (64, 32), (32, 64), (48, 48), (80, 40)]
    for s, (h, w) in enumerate(shapes):
        Image.fromarray(textured_image(seed=s, size=(h, w))).save(
            d / f"m{s}.png"
        )
    eng = Engine.new(
        str(tmp_path / "mixed.db"), embedder="stub",
        embedder_kwargs={"dim": 32},
    )
    eng.max_distance_from_query = 1e7
    for s in range(len(shapes)):
        eng.insert_image_from_path(str(d / f"m{s}.png"))
    # Variable widths really present (compat aspect behavior).
    assert len(set(eng._ph_widths)) > 1

    rec = eng.load_image(str(d / "m1.png"))
    eng.query_by_phash(rec.phash)
    single = _results(eng)
    assert single and single[0][0] == "m1.png" and single[0][1] == 0.0

    eng.serve_on_mesh(make_mesh(8))
    try:
        eng.query_by_phash(rec.phash)
        assert _results(eng) == single
        assert eng._ph_sharded is not None  # mesh path actually ran
    finally:
        eng.scan_mesh = None
        eng.close()


def test_face_query_uses_mesh(tmp_path):
    """face: queries run row-sharded under serve_on_mesh and match the
    single-chip results."""
    from fixtures import face_image

    d = tmp_path / "photos"
    d.mkdir()
    for i in range(4):
        img, _ = face_image(person=i % 2, bg_seed=30 + i)
        Image.fromarray(img).save(d / f"p{i}.png")
    eng = Engine.new(
        str(tmp_path / "facemesh.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
    )
    try:
        for i in range(4):
            eng.insert_image_from_path(str(d / f"p{i}.png"))
        probe = str(d / "p1.png")

        eng.query_by_face_from_file(probe)
        single = _results(eng)
        assert single and single[0][0] == "p1.png"

        eng.serve_on_mesh(make_mesh(8))
        try:
            eng.query_by_face_from_file(probe)
            assert _results(eng) == single
            assert eng._face_sharded is not None  # the sharded path ran
        finally:
            eng.scan_mesh = None
    finally:
        eng.close()


def test_text_query_uses_mesh(tmp_path):
    """Unfiltered ``text:`` (BLIP) queries serve from the mesh and match
    single-chip exactly — every modality routes through serve_on_mesh."""
    from pixelbox_tpu.models.blip import BlipConfig, BlipSearcher
    from pixelbox_tpu.models.wordpiece import WordPieceTokenizer

    d = tmp_path / "photos"
    d.mkdir()
    for s in (1, 2, 3, 4):
        Image.fromarray(textured_image(seed=s, size=(64, 64))).save(
            d / f"img{s}.png"
        )
    eng = Engine.new(
        str(tmp_path / "blipmesh.db"), embedder="stub",
        embedder_kwargs={"dim": 16},
    )
    eng._blip_enabled = True
    eng._blip_searcher = BlipSearcher(
        cfg=BlipConfig.tiny(),
        tokenizer=WordPieceTokenizer.toy(words=["sunset", "beach"]),
        max_text_len=16,
    )
    eng.catalog.ensure_aux_hash_table("blip_hashes")
    try:
        eng.add_tracked_folder(str(d))
        eng.start_indexing(num_workers=2)
        assert eng.wait_for_indexing(timeout=120)
        assert eng._blip_store is not None and eng._blip_store.size == 4

        eng.query("text:sunset")
        single = _results(eng)
        assert len(single) == 4

        eng.serve_on_mesh(make_mesh(8))
        eng.query("text:sunset")
        assert _results(eng) == single
        assert eng._blip_sharded is not None  # the mesh path actually ran

        # Batched serving path (kind="blip") shards too.
        q = eng._blip_searcher.text_hashes(["sunset"])
        ver = eng._blip_sharded_at_ver
        dist, idx = eng.blip_scan_batched(
            np.asarray(q, np.uint8), k=4, max_distance=np.inf
        )
        assert eng._blip_sharded_at_ver == ver  # mirror reused, not rebuilt
        got = [
            (eng._blip_image_ids[int(r)], round(float(v), 5))
            for v, r in zip(dist[0], idx[0])
            if r >= 0
        ]
        exp = [
            (next(r.id for r in eng.get_query_results() if r.filename == f), dd)
            for f, dd in single
        ]
        assert got == exp

        # Filtered text queries stay correct alongside (masked path).
        eng.query("text:sunset img1")
        filtered = _results(eng)
        assert [f for f, _ in filtered] == ["img1.png"]
        assert filtered[0][1] == dict(single)["img1.png"]
    finally:
        eng.scan_mesh = None
        eng.close()


def test_incremental_phash_shard_append(mesh_engine, tmp_path):
    """Phash in-capacity appends ship only delta rows to the mesh (the
    semantic mirror's contract, round-3); width growth / removal full-
    reshards."""
    eng, d = mesh_engine
    eng.serve_on_mesh(make_mesh(8))
    try:
        rec = eng.load_image(str(d / "s1.png"))
        eng.query_by_phash(rec.phash)
        base = eng._ph_sharded_full_reshards
        assert base >= 1

        for i in range(3):
            p = tmp_path / f"phx{i}.png"
            Image.fromarray(
                textured_image(seed=300 + i, size=(48, 48))
            ).save(p)
            eng.insert_image_from_path(str(p))
            r = eng.load_image(str(p))
            eng.query_by_phash(r.phash)
            assert eng.get_query_results()[0].filename == f"phx{i}.png"
        assert eng._ph_sharded_full_reshards == base  # deltas only

        # Removal is structural → full reshard, and the tombstone must
        # not be visible from the mirror afterwards.
        victim = eng.get_query_results()[0].id
        eng.remove_image(victim)
        eng.query_by_phash(rec.phash)
        assert all(r.id != victim for r in eng.get_query_results())
        assert eng._ph_sharded_full_reshards == base + 1

        # Later delta padding must not resurrect the tombstoned row.
        p = tmp_path / "phx_after.png"
        Image.fromarray(textured_image(seed=310, size=(48, 48))).save(p)
        eng.insert_image_from_path(str(p))
        eng.query_by_phash(rec.phash)
        assert all(r.id != victim for r in eng.get_query_results())
        assert eng._ph_sharded_full_reshards == base + 1
    finally:
        eng.scan_mesh = None


def test_masked_exact_topk_on_mesh(tmp_path, rng):
    """The shared broad-filter helper (filtered text:/face: scans) folds
    the row mask into the sharded mirror and matches the oracle over the
    masked subset."""
    from pixelbox_tpu.index.store import VectorStore

    eng = Engine.new(
        str(tmp_path / "mask.db"), embedder="stub",
        embedder_kwargs={"dim": 16},
    )
    try:
        rows_u8 = rng.integers(0, 256, size=(20000, 16), dtype=np.uint8)
        store = VectorStore(dim=16, kind="semantic")
        store.append(rows_u8)
        sel = np.sort(rng.choice(20000, 17000, replace=False))
        q = rows_u8[int(sel[5])]

        d1, i1 = eng._masked_exact_topk(
            jnp.asarray(q), store, None, sel, 10, np.inf
        )
        mesh = make_mesh(8)
        eng.serve_on_mesh(mesh)
        d2, i2 = eng._masked_exact_topk(
            jnp.asarray(q), store,
            lambda: shard_semantic_index(store.device_index, mesh),
            sel, 10, np.inf,
        )
        exp_d, exp_i = oracle.cosine_scan_topk_np(
            q, rows_u8[sel], k=10, max_distance=np.inf
        )
        # Map subset oracle ids back to global rows.
        exp_global = sel[exp_i[0]]
        np.testing.assert_array_equal(np.asarray(i1), exp_global)
        np.testing.assert_array_equal(np.asarray(i2), exp_global)
        np.testing.assert_allclose(np.asarray(d1), exp_d[0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d2), exp_d[0], rtol=1e-6)
    finally:
        eng.scan_mesh = None
        eng.close()
