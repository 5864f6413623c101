"""Engine-level IVF mode (scan_mode='ivf'): clustered ANN serving.

Small libraries make the probe set exhaustive, so engine results must
match the exact oracle; the cache tests cover rebuild-on-mutation and
retrain-on-doubling behavior.
"""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine

from fixtures import textured_image


@pytest.fixture()
def ivf_engine(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    for s in range(10):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    db = tmp_path / "ivf.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 32})
    eng.max_distance_from_query = 1e7
    for s in range(10):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    eng.scan_mode = "ivf"
    eng.ivf_clusters = 3
    eng.ivf_nprobe = 3  # exhaustive at this size -> oracle-equal
    yield eng, d
    eng.close()


def _results(eng):
    return [(r.id, round(float(r.distance_from_query), 6))
            for r in eng.get_query_results()]


def test_ivf_query_matches_exact(ivf_engine):
    eng, d = ivf_engine
    rec = eng.load_image(str(d / "s4.png"))
    eng.query_by_image_hash_from_image(rec)
    got = _results(eng)

    eng.scan_mode = "exact"
    eng.query_by_image_hash_from_image(rec)
    want = _results(eng)
    eng.scan_mode = "ivf"
    assert got == want
    assert got[0][1] == 0.0  # self-match at exactly 0


def test_ivf_rebuilds_after_append(ivf_engine):
    eng, d = ivf_engine
    rec = eng.load_image(str(d / "s1.png"))
    eng.query_by_image_hash_from_image(rec)
    v1 = eng._ivf_version

    Image.fromarray(textured_image(seed=99, size=(48, 48))).save(
        d / "late.png"
    )
    eng.insert_image_from_path(str(d / "late.png"))
    rec2 = eng.load_image(str(d / "late.png"))
    eng.query_by_image_hash_from_image(rec2)
    assert eng._ivf_version != v1
    # The appended image is findable (self-match first).
    top = eng.get_query_results()[0]
    assert top.path.endswith("late.png")
    assert float(top.distance_from_query) == 0.0


def test_ivf_skips_removed_images(ivf_engine):
    eng, d = ivf_engine
    rec = eng.load_image(str(d / "s2.png"))
    eng.query_by_image_hash_from_image(rec)
    removed_id = eng.get_query_results()[0].id
    eng.remove_image(removed_id)
    eng.query_by_image_hash_from_image(rec)
    assert all(r.id != removed_id for r in eng.get_query_results())


def test_ivf_centroids_retrain_on_doubling(ivf_engine):
    eng, d = ivf_engine
    rec = eng.load_image(str(d / "s0.png"))
    eng.query_by_image_hash_from_image(rec)
    trained_at = eng._ivf_trained_n
    c0 = eng._ivf_centroids

    # +1 image: rebuild, but no retrain.
    Image.fromarray(textured_image(seed=50, size=(48, 48))).save(
        d / "one.png"
    )
    eng.insert_image_from_path(str(d / "one.png"))
    eng.query_by_image_hash_from_image(rec)
    assert eng._ivf_trained_n == trained_at
    assert eng._ivf_centroids is c0

    # Past 2x live rows: retrain fires.
    for s in range(60, 60 + 2 * trained_at):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"x{s}.png"
        )
        eng.insert_image_from_path(str(d / f"x{s}.png"))
    eng.query_by_image_hash_from_image(rec)
    assert eng._ivf_trained_n > trained_at


def test_ivf_clusters_change_takes_effect(ivf_engine):
    """Changing ivf_clusters retrains to the requested count even with
    trained centroids cached and no store mutation in between."""
    eng, d = ivf_engine
    rec = eng.load_image(str(d / "s5.png"))
    eng.query_by_image_hash_from_image(rec)
    assert eng._ivf_centroids.shape[0] == 3

    eng.ivf_clusters = 2
    eng.query_by_image_hash_from_image(rec)
    assert eng._ivf_centroids.shape[0] == 2
    # Results still match the exact oracle at the new cluster count.
    got = _results(eng)
    eng.scan_mode = "exact"
    eng.query_by_image_hash_from_image(rec)
    want = _results(eng)
    eng.scan_mode = "ivf"
    assert got == want


def test_append_extends_spill_without_bucket_repack(ivf_engine):
    """Pure appends ride the incremental spill path: buckets are shared
    (no O(N) repack per query during interleaved indexing), repeated
    extends don't duplicate rows, and results stay oracle-equal."""
    eng, d = ivf_engine
    rec = eng.load_image(str(d / "s6.png"))
    eng.query_by_image_hash_from_image(rec)
    bd0 = eng._ivf.bucket_data
    packed_n = eng._ivf_packed_n

    for s in (70, 71):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"a{s}.png"
        )
        eng.insert_image_from_path(str(d / f"a{s}.png"))
        rec2 = eng.load_image(str(d / f"a{s}.png"))
        eng.query_by_image_hash_from_image(rec2)
        top = eng.get_query_results()[0]
        assert top.path.endswith(f"a{s}.png")
        assert float(top.distance_from_query) == 0.0
    assert eng._ivf.bucket_data is bd0
    assert eng._ivf_packed_n == packed_n
    # No duplicates from the repeated extends: each store row at most once.
    ids = np.asarray(eng._ivf.spill_rows)
    live = ids[ids >= 0]
    assert len(live) == len(np.unique(live))

    eng.query_by_image_hash_from_image(rec)
    got = _results(eng)
    eng.scan_mode = "exact"
    eng.query_by_image_hash_from_image(rec)
    want = _results(eng)
    eng.scan_mode = "ivf"
    assert got == want


def test_sidecar_from_other_library_rejected(tmp_path):
    """A stale <db>.ivf.npz left behind after the library is rebuilt in
    place must NOT steer the new library's probes: the uuid check forces
    a retrain on the new corpus."""
    import os

    d = tmp_path / "photos"
    d.mkdir()
    for s in range(8):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    db = str(tmp_path / "re.db")
    eng = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 32})
    eng.max_distance_from_query = 1e7
    for s in range(8):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    eng.scan_mode = "ivf"
    eng.ivf_clusters = 2
    rec = eng.load_image(str(d / "s0.png"))
    eng.query_by_image_hash_from_image(rec)
    assert eng._ivf_trained_n == 8
    eng.close()
    assert os.path.exists(db + ".ivf.npz")

    # Rebuild the library from scratch at the same path (sidecar remains).
    os.remove(db)
    eng2 = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 32})
    eng2.max_distance_from_query = 1e7
    for s in range(20, 25):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"n{s}.png"
        )
        eng2.insert_image_from_path(str(d / f"n{s}.png"))
    eng2.scan_mode = "ivf"
    eng2.ivf_clusters = 2
    rec2 = eng2.load_image(str(d / "n20.png"))
    eng2.query_by_image_hash_from_image(rec2)
    # Retrained on the NEW corpus (5 rows), not adopted from the stale
    # sidecar (trained_n=8).
    assert eng2._ivf_trained_n == 5
    assert eng2.get_query_results()[0].path.endswith("n20.png")
    eng2.close()


def test_int4_library_ivf_matches_exact_with_rerank(tmp_path):
    """On an int4 library, ivf packs nibble buckets (half the bucket
    HBM) and — with the default exact-u8 rerank — full-probe results
    match scan_mode='exact' identically (true u8 distances)."""
    d = tmp_path / "photos"
    d.mkdir()
    for s in range(10):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    eng = Engine.new(
        str(tmp_path / "i4.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, semantic_precision="int4",
    )
    eng.max_distance_from_query = 1e7
    try:
        for s in range(10):
            eng.insert_image_from_path(str(d / f"s{s}.png"))
        rec = eng.load_image(str(d / "s2.png"))

        eng.scan_mode = "exact"
        eng.query_by_image_hash_from_image(rec)
        want = _results(eng)
        assert want[0][1] == 0.0  # rerank restores the exact-0 self-match

        eng.scan_mode = "ivf"
        eng.ivf_clusters = 3
        eng.ivf_nprobe = 3
        eng.query_by_image_hash_from_image(rec)
        assert eng._ivf is not None
        assert eng._ivf.kind == "cosine4a"  # nibble buckets, not u8
        assert _results(eng) == want

        # Raw int4-metric results when rerank is off (flat parity).
        eng.int4_rerank = False
        eng.query_by_image_hash_from_image(rec)
        got_raw = _results(eng)
        eng.scan_mode = "exact"
        eng.query_by_image_hash_from_image(rec)
        assert got_raw == _results(eng)
    finally:
        eng.close()


def test_cli_ivf_flags(tmp_path):
    from pixelbox_tpu import cli

    d = tmp_path / "photos"
    d.mkdir()
    for s in range(4):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    db = str(tmp_path / "c.db")
    assert cli.main(["init", db, "--dim", "32"]) == 0
    assert cli.main(["add-folder", db, str(d)]) == 0
    assert cli.main(["index", db]) == 0
    assert cli.main([
        "similar", db, str(d / "s1.png"),
        "--scan-mode", "ivf", "--nprobe", "2", "--ivf-clusters", "2",
        "--max-distance", "1e7",
    ]) == 0


def test_ivf_sidecar_persists_centroids(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    for s in range(6):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    db = str(tmp_path / "side.db")
    eng = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 32})
    eng.max_distance_from_query = 1e7
    for s in range(6):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    eng.scan_mode = "ivf"
    eng.ivf_clusters = 2
    rec = eng.load_image(str(d / "s0.png"))
    eng.query_by_image_hash_from_image(rec)
    c_trained = np.array(eng._ivf_centroids)
    eng.close()
    import os

    assert os.path.exists(db + ".ivf.npz")

    eng2 = Engine(db)
    eng2.max_distance_from_query = 1e7
    eng2.scan_mode = "ivf"
    rec2 = eng2.load_image(str(d / "s0.png"))
    eng2.query_by_image_hash_from_image(rec2)
    # Reopen restored the trained centroids instead of retraining.
    np.testing.assert_array_equal(np.array(eng2._ivf_centroids), c_trained)
    assert eng2.get_query_results()[0].path.endswith("s0.png")
    eng2.close()


def test_ivf_concurrent_queries_single_train(ivf_engine):
    """Concurrent ivf queries share one build: no duplicate k-means, no
    crashes, consistent results."""
    import threading

    eng, d = ivf_engine
    rec = eng.load_image(str(d / "s3.png"))
    calls = {"n": 0}
    orig = eng._build_ivf_locked

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    eng._build_ivf_locked = counting
    errs = []

    def worker():
        try:
            for _ in range(3):
                eng.query_by_image_hash_from_image(rec)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    eng._build_ivf_locked = orig
    assert not errs
    # Every thread raced the same stale cache, but the double-check under
    # the lock means only the winner actually rebuilt.
    assert eng._ivf is not None


def test_large_clusters_knob_does_not_retrain_per_append(tmp_path):
    """ivf_clusters LARGER than the live count: the n_live clamp changes
    on every append, but retrain keys on the requested knob, so appends
    ride the incremental spill path instead of paying k-means + full
    repack per query (growth toward the knob is the doubling rule's
    job)."""
    d = tmp_path / "photos"
    d.mkdir()
    for s in range(8):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    eng = Engine.new(str(tmp_path / "big.db"), embedder="stub",
                     embedder_kwargs={"dim": 32})
    eng.max_distance_from_query = 1e7
    try:
        for s in range(8):
            eng.insert_image_from_path(str(d / f"s{s}.png"))
        eng.scan_mode = "ivf"
        eng.ivf_clusters = 50  # far beyond the 8 live rows
        rec = eng.load_image(str(d / "s1.png"))
        eng.query_by_image_hash_from_image(rec)
        gen0 = eng._ivf_centroid_gen
        bd0 = eng._ivf.bucket_data
        assert eng._ivf_centroids.shape[0] == 8  # clamped at train time

        Image.fromarray(textured_image(seed=90, size=(48, 48))).save(
            d / "more.png"
        )
        eng.insert_image_from_path(str(d / "more.png"))
        eng.query_by_image_hash_from_file(str(d / "more.png"))
        assert eng.get_query_results()[0].filename == "more.png"
        assert eng._ivf_centroid_gen == gen0  # NO retrain
        assert eng._ivf.bucket_data is bd0    # spill-extend, no repack
    finally:
        eng.close()
