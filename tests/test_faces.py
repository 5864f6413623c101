"""Face search (reference roadmap "Face search", README.md:33).

Detector unit tests on deterministic synthetic faces + engine-level
face indexing/query/removal, the ingest-pipeline path, and backfill.
"""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.faces.detect import FaceBox, crop_face, detect_faces, nms

from fixtures import face_image, flat_white, gradient_image, textured_image


def _iou(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
    ua = (
        (a[2] - a[0]) * (a[3] - a[1])
        + (b[2] - b[0]) * (b[3] - b[1])
        - inter
    )
    return inter / ua if ua else 0.0


# --------------------------------------------------------------------- #
# Detector


@pytest.mark.parametrize("person", [0, 1, 2])
@pytest.mark.parametrize(
    "frac,center,size",
    [
        (0.5, None, (256, 256)),
        (0.3, (90, 150), (256, 320)),
        (0.25, (60, 60), (192, 192)),
    ],
)
def test_detects_synthetic_faces(person, frac, center, size):
    img, box = face_image(
        size=size, face_frac=frac, center=center, person=person,
        bg_seed=5 + person,
    )
    dets = detect_faces(img)
    assert dets, "face not detected"
    assert max(_iou(box, d[:4]) for d in dets) > 0.35


def test_no_faces_in_negatives():
    rng = np.random.default_rng(0)
    negatives = [
        flat_white(),
        gradient_image(),
        rng.integers(0, 255, (256, 256, 3)).astype(np.uint8),
    ] + [textured_image(seed=s) for s in range(12)]
    for img in negatives:
        assert detect_faces(img) == []


def test_detects_two_faces():
    img1, _ = face_image(
        size=(320, 480), face_frac=0.35, center=(140, 120), person=0, bg_seed=3
    )
    img2, box2 = face_image(
        size=(320, 480), face_frac=0.28, center=(170, 350), person=1, bg_seed=3
    )
    x0, y0, x1, y1 = (
        int(round(v * s)) for v, s in zip(box2, (480, 320, 480, 320))
    )
    img = img1.copy()
    img[y0:y1, x0:x1] = img2[y0:y1, x0:x1]
    assert len(detect_faces(img)) == 2


def test_large_image_detection_capped():
    img, box = face_image(size=(960, 1280), face_frac=0.3, person=0)
    dets = detect_faces(img)  # runs through the max_dim downscale path
    assert dets and max(_iou(box, d[:4]) for d in dets) > 0.35


def test_nms_suppresses_overlaps():
    a = FaceBox(0.1, 0.1, 0.5, 0.5, 2.0)
    b = FaceBox(0.12, 0.12, 0.52, 0.52, 1.0)  # heavy overlap, lower score
    c = FaceBox(0.6, 0.6, 0.9, 0.9, 1.5)
    out = nms([a, b, c])
    assert [o.score for o in out] == [2.0, 1.5]


def test_crop_face_square_and_clipped():
    img, box = face_image(size=(200, 200), face_frac=0.6, person=0)
    crop = crop_face(img, FaceBox(*box, 1.0))
    h, w = crop.shape[:2]
    assert min(h, w) > 0.5 * 200 * 0.6
    edge = crop_face(img, FaceBox(-0.2, -0.2, 0.3, 0.3, 1.0))
    assert edge.size > 0  # clipped, not crashed


# --------------------------------------------------------------------- #
# Engine


@pytest.fixture(scope="module")
def face_lib(tmp_path_factory):
    d = tmp_path_factory.mktemp("photos")
    # Person 0 in two different scenes, person 1 in one, one no-face image.
    for name, person, seed, center in [
        ("alice_park.png", 0, 4, None),
        ("alice_home.png", 0, 9, (100, 150)),
        ("bob_home.png", 1, 9, None),
    ]:
        img, _ = face_image(
            size=(256, 256), face_frac=0.45, person=person,
            bg_seed=seed, center=center,
        )
        Image.fromarray(img).save(d / name)
    Image.fromarray(textured_image(seed=2)).save(d / "landscape.png")
    db = tmp_path_factory.mktemp("db") / "faces.db"
    eng = Engine.new(
        str(db), embedder="stub", embedder_kwargs={"dim": 32}, faces=True
    )
    for name in ("alice_park.png", "alice_home.png", "bob_home.png", "landscape.png"):
        eng.insert_image_from_path(str(d / name))
    yield eng, d, str(db)
    eng.close()


def test_faces_stored(face_lib):
    eng, d, _ = face_lib
    assert eng.catalog.num_faces() == 3
    assert eng._face_store.size == 3
    # Boxes are queryable per image and normalized.
    img = eng.catalog.get_image_by_path(str(d / "alice_park.png"))
    faces = eng.get_faces(img["id"])
    assert len(faces) == 1
    x0, y0, x1, y1 = faces[0]["box"]
    assert 0 <= x0 < x1 <= 1 and 0 <= y0 < y1 <= 1
    # The no-face image stored none.
    land = eng.catalog.get_image_by_path(str(d / "landscape.png"))
    assert eng.get_faces(land["id"]) == []


def test_face_query_ranks_same_person_first(face_lib):
    eng, d, _ = face_lib
    eng.query(f"face:{d}/alice_park.png")
    assert eng.last_query_error is None
    results = eng.get_query_results()
    names = [r.filename for r in results]
    # Both alice images rank above bob's.
    assert names[0] == "alice_park.png"  # self-match first, dist 0
    assert results[0].distance_from_query == 0.0
    assert names.index("alice_home.png") < names.index("bob_home.png") if (
        "bob_home.png" in names
    ) else True
    assert "landscape.png" not in names


def test_face_query_direct_api(face_lib):
    eng, d, _ = face_lib
    eng.query_by_face_from_file(str(d / "alice_home.png"))
    assert eng.last_query_error is None
    results = eng.get_query_results()
    assert results and results[0].filename == "alice_home.png"


def test_face_query_with_filter(face_lib):
    eng, d, _ = face_lib
    # Combine the face modality with a filename filter (AND semantics).
    eng.query(f"face:{d}/alice_park.png home")
    results = eng.get_query_results()
    names = [r.filename for r in results]
    assert "alice_park.png" not in names  # filtered out by `home`
    assert "alice_home.png" in names


def test_face_query_dedupes_images(face_lib):
    """An image whose several faces match counts once, at its closest."""
    eng, d, _ = face_lib
    eng.query_by_face_from_file(str(d / "alice_park.png"))
    ids = [r.id for r in eng.get_query_results()]
    assert len(ids) == len(set(ids))


def test_face_query_no_face_in_query_image(face_lib, tmp_path):
    eng, d, _ = face_lib
    p = tmp_path / "noface.png"
    Image.fromarray(textured_image(seed=3)).save(p)
    eng.query_by_face_from_file(str(p))
    assert eng.last_query_error is not None
    assert "no face" in eng.last_query_error
    assert eng.get_query_results() == []


def test_faces_setting_persisted(face_lib):
    eng, d, db = face_lib
    other = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 32})
    try:
        assert other.faces_enabled  # inherited from the library
        assert other._face_store is not None and other._face_store.size == 3
        other.query_by_face_from_file(str(d / "bob_home.png"))
        results = other.get_query_results()
        assert results and results[0].filename == "bob_home.png"
        assert results[0].distance_from_query == 0.0
    finally:
        other.catalog.close()


def test_face_rows_removed_with_image(tmp_path):
    img, _ = face_image(person=0)
    p = tmp_path / "one.png"
    Image.fromarray(img).save(p)
    eng = Engine.new(
        str(tmp_path / "rm.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
    )
    try:
        image_id = eng.insert_image_from_path(str(p))
        assert eng.catalog.num_faces() == 1
        eng.remove_image(image_id)
        assert eng.catalog.num_faces() == 0
        assert eng._face_store.n_deleted == 1
        eng.compact()
        assert eng._face_store.size == 0
        assert eng._face_rows_by_image == {}
    finally:
        eng.close()


def test_face_compaction_renumbers(tmp_path):
    eng = Engine.new(
        str(tmp_path / "cp.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
    )
    try:
        ids = []
        for person in range(3):
            img, _ = face_image(person=person, bg_seed=4 + person)
            p = tmp_path / f"p{person}.png"
            Image.fromarray(img).save(p)
            ids.append(eng.insert_image_from_path(str(p)))
        eng.remove_image(ids[1])
        eng.compact()
        assert eng._face_store.size == 2
        # Remaining mapping still finds the right images.
        eng.query_by_face_from_file(str(tmp_path / "p2.png"))
        results = eng.get_query_results()
        assert results[0].id == ids[2]
        assert results[0].distance_from_query == 0.0
    finally:
        eng.close()


def test_pipeline_ingest_with_faces(tmp_path):
    """The batched ingest pipeline detects + embeds faces (writer path)."""
    d = tmp_path / "photos"
    d.mkdir()
    for person in range(2):
        img, _ = face_image(person=person, bg_seed=6 + person)
        Image.fromarray(img).save(d / f"p{person}.png")
    Image.fromarray(textured_image(seed=1)).save(d / "bg.png")
    eng = Engine.new(
        str(tmp_path / "pipe.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
    )
    try:
        eng.add_tracked_folder(str(d))
        eng.start_indexing()
        assert eng.wait_for_indexing(timeout=120)
        assert eng.get_num_indexed_images() == 3
        assert eng.catalog.num_faces() == 2
        eng.query_by_face_from_file(str(d / "p0.png"))
        results = eng.get_query_results()
        assert results and results[0].filename == "p0.png"
        assert results[0].distance_from_query == 0.0
    finally:
        eng.close()


# --------------------------------------------------------------------- #
# CLI + web surface


def test_cli_face_surface(tmp_path, capsys):
    import json

    from pixelbox_tpu.cli import main

    d = tmp_path / "photos"
    d.mkdir()
    for person in range(2):
        img, _ = face_image(person=person, bg_seed=7 + person)
        Image.fromarray(img).save(d / f"p{person}.png")
    db = str(tmp_path / "cli.db")
    assert main(["init", db, "--dim", "32", "--faces"]) == 0
    assert main(["add-folder", db, str(d)]) == 0
    assert main(["index", db, "--dim", "32"]) == 0
    capsys.readouterr()

    assert main(["stats", db, "--dim", "32"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["faces_enabled"] is True and stats["faces"] == 2

    assert main(["face-similar", db, str(d / "p0.png"), "--dim", "32", "--json"]) == 0
    results = json.loads(capsys.readouterr().out)
    assert results and results[0]["filename"] == "p0.png"
    assert results[0]["distance"] == 0.0

    # The query-language operator drives the same modality.
    assert main(["search", db, f"face:{d}/p1.png", "--dim", "32", "--json"]) == 0
    results = json.loads(capsys.readouterr().out)
    assert results and results[0]["filename"] == "p1.png"

    # Stored boxes listing.
    assert main(["faces", db, str(results[0]["id"]), "--dim", "32"]) == 0
    boxes = json.loads(capsys.readouterr().out)
    assert len(boxes) == 1 and len(boxes[0]["box"]) == 4

    # No-face query image → friendly error, exit 1.
    p = tmp_path / "noface.png"
    Image.fromarray(textured_image(seed=3)).save(p)
    assert main(["face-similar", db, str(p), "--dim", "32"]) == 1
    assert "no face" in capsys.readouterr().err


def test_web_face_surface(tmp_path):
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer
    from io import BytesIO

    from pixelbox_tpu.serve import make_handler

    d = tmp_path / "photos"
    d.mkdir()
    img0, _ = face_image(person=0, bg_seed=7)
    Image.fromarray(img0).save(d / "p0.png")
    Image.fromarray(textured_image(seed=1)).save(d / "bg.png")
    eng = Engine.new(
        str(tmp_path / "web.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
    )
    for name in ("p0.png", "bg.png"):
        eng.insert_image_from_path(str(d / name))
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(eng, threading.Lock())
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/api/status", timeout=30) as r:
            status = json.loads(r.read())
        assert status["faces_enabled"] is True and status["faces"] == 1

        img_id = eng.catalog.get_image_by_path(str(d / "p0.png"))["id"]
        with urllib.request.urlopen(
            base + f"/api/faces?id={img_id}", timeout=30
        ) as r:
            boxes = json.loads(r.read())
        assert len(boxes) == 1

        buf = BytesIO()
        Image.fromarray(img0).save(buf, format="PNG")
        req = urllib.request.Request(
            base + "/api/face-similar", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            results = json.loads(r.read())
        assert results and results[0]["id"] == img_id
        assert results[0]["distance"] == 0.0

        # No-face upload → 422 with a friendly error.
        buf2 = BytesIO()
        Image.fromarray(textured_image(seed=9)).save(buf2, format="PNG")
        req = urllib.request.Request(
            base + "/api/face-similar", data=buf2.getvalue(), method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 422"
        except urllib.error.HTTPError as e:
            assert e.code == 422
            assert "no face" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        eng.close()


def test_index_faces_backfill(tmp_path):
    """A library indexed WITHOUT faces backfills via index_faces()."""
    d = tmp_path / "photos"
    d.mkdir()
    img, _ = face_image(person=0)
    Image.fromarray(img).save(d / "a.png")
    db = str(tmp_path / "bf.db")
    eng = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 32})
    try:
        eng.insert_image_from_path(str(d / "a.png"))
        assert eng.catalog.num_faces() == 0
        added = eng.index_faces()
        assert added == 1
        assert eng.faces_enabled  # backfill turns the mode on + persists
        eng.query_by_face_from_file(str(d / "a.png"))
        assert eng.get_query_results()[0].filename == "a.png"
    finally:
        eng.close()


def test_face_overfetch_retries_until_k_images(tmp_path):
    """Multi-face images crowding the face top-k must not starve the
    image-level result count: the scan retries with a doubled face
    over-fetch until max_search_results IMAGES fill (or candidates
    exhaust)."""
    d = tmp_path / "photos"
    d.mkdir()
    rng = np.random.default_rng(3)
    eng = Engine.new(
        str(tmp_path / "crowd.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
    )
    try:
        ids = []
        for i in range(6):
            p = d / f"img{i}.png"
            Image.fromarray(textured_image(seed=10 + i, size=(32, 32))).save(p)
            ids.append(eng.insert_image_from_path(str(p)))
        base = rng.integers(60, 200, size=32).astype(np.uint8)
        box = (0.1, 0.1, 0.5, 0.5)

        def near(delta, n):
            out = np.tile(base, (n, 1)).astype(np.int64)
            out[:, :4] += delta
            return np.clip(out, 0, 255).astype(np.uint8)

        # Image 0: a "group photo" with 40 faces, all closest to q.
        with eng.index_rwlock.write_locked():
            eng._append_faces(ids[0], [(box, h) for h in near(1, 40)])
            # Images 1..5: one slightly-farther face each.
            for j, img_id in enumerate(ids[1:]):
                eng._append_faces(img_id, [(box, near(8 + j, 1)[0])])
        eng.max_search_results = 3
        eng.query_by_face_hash(base)
        results = eng.get_query_results()
        assert len(results) == 3  # 4*k+16 = 28 < 40 without the retry
        assert results[0].id == ids[0]
        assert len({r.id for r in results}) == 3
    finally:
        eng.close()


def test_face_detector_lazy_init_is_single(tmp_path):
    """Concurrent first access (the ingest pipeline's decode workers)
    constructs the detector exactly once."""
    import threading as _threading
    import time as _time

    import pixelbox_tpu.faces.onnx_detector as onnx_det_mod

    eng = Engine.new(
        str(tmp_path / "lock.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
        face_detector_kwargs={"onnx_path": "fake.onnx"},
    )
    built = []

    class CountingDetector:
        def __init__(self, path, **kw):
            _time.sleep(0.05)  # widen the race window
            built.append(path)

        def __call__(self, rgb):
            return []

    real = onnx_det_mod.OnnxFaceDetector
    onnx_det_mod.OnnxFaceDetector = CountingDetector
    try:
        threads = [
            _threading.Thread(target=lambda: eng.face_detector)
            for _ in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert built == ["fake.onnx"]
    finally:
        onnx_det_mod.OnnxFaceDetector = real
        eng.close()


def test_index_faces_batches_embeds(tmp_path):
    """index_faces embeds batch_size images' crops per device launch."""
    d = tmp_path / "photos"
    d.mkdir()
    for i in range(5):
        img, _ = face_image(person=i % 2, bg_seed=20 + i)
        Image.fromarray(img).save(d / f"f{i}.png")
    eng = Engine.new(
        str(tmp_path / "batch.db"), embedder="stub",
        embedder_kwargs={"dim": 32},
    )
    try:
        for i in range(5):
            eng.insert_image_from_path(str(d / f"f{i}.png"))
        emb = eng.embedder
        calls = []
        real = emb.embed_preprocessed
        emb.embed_preprocessed = lambda b: (calls.append(b.shape), real(b))[1]
        added = eng.index_faces(batch_size=2)
        assert added == 5
        assert len(calls) == 3  # ceil(5 images / batch_size 2) flushes
        # Batches pad to power-of-two buckets (no per-count jit shapes).
        assert all((n & (n - 1)) == 0 for n, *_ in calls)
    finally:
        eng.close()


def test_face_queries_coalesce_through_scan_service(tmp_path):
    """Concurrent face queries batch into shared device scans
    (kind="face"), returning image-deduped ids that match the engine
    path."""
    import threading

    from pixelbox_tpu.serving import BatchingScanService

    d = tmp_path / "photos"
    d.mkdir()
    for i in range(6):
        img, _ = face_image(person=i % 3, bg_seed=40 + i)
        Image.fromarray(img).save(d / f"p{i}.png")
    eng = Engine.new(
        str(tmp_path / "svc.db"), embedder="stub",
        embedder_kwargs={"dim": 32}, faces=True,
    )
    svc = BatchingScanService(
        lambda: eng._sem_store.device_index, k=4, max_wait_ms=40.0,
    )
    try:
        for i in range(6):
            eng.insert_image_from_path(str(d / f"p{i}.png"))
        eng.attach_scan_service(svc)
        assert "face" in svc.kinds

        # Engine-path expectations per probe.
        probes = []
        expected = []
        for i in range(4):
            faces = eng.detect_and_embed_faces(
                np.asarray(Image.open(d / f"p{i}.png").convert("RGB"))
            )
            q = faces[0][1]
            probes.append(q)
            eng.max_search_results = 4
            eng.query_by_face_hash(q)
            expected.append([
                (r.id, round(r.distance_from_query, 5))
                for r in eng.get_query_results()
            ])

        results = {}

        def run(i):
            svc.k = 4
            results[i] = svc.submit(probes[i], kind="face")

        threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        for i in range(4):
            dist, img_ids = results[i]
            keep = img_ids >= 0
            got = [
                (int(im), round(float(dv), 5))
                for im, dv in zip(img_ids[keep], dist[keep])
            ]
            assert got == expected[i]
        assert svc.queries_served == 4
        assert svc.batches_run <= 2  # coalesced, not per-query
    finally:
        svc.close()
        eng.close()
