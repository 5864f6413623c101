"""Web UI / JSON API end-to-end over real HTTP."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.serve import make_handler

from fixtures import textured_image


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    photos = tmp_path_factory.mktemp("photos")
    for s in (1, 2):
        Image.fromarray(textured_image(seed=s, size=(64, 64))).save(
            photos / f"img{s}.png"
        )
    db = tmp_path_factory.mktemp("db") / "srv.db"
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 16})
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(eng, threading.Lock())
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, eng, photos
    httpd.shutdown()


def get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        ct = r.headers.get("Content-Type", "")
        body = r.read()
    return ct, body


def get_json(base, path):
    ct, body = get(base, path)
    assert "json" in ct
    return json.loads(body)


def post(base, path, data=b"", expect_error=False):
    req = urllib.request.Request(base + path, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        if not expect_error:
            raise
        return e.code, json.loads(e.read())


def test_index_page(server):
    base, _, _ = server
    ct, body = get(base, "/")
    assert "html" in ct
    assert b"pixelbox-tpu" in body


def test_status(server):
    base, _, _ = server
    s = get_json(base, "/api/status")
    assert s["images"] == 2
    assert s["indexing"] is False


def test_search(server):
    base, _, _ = server
    res = get_json(base, "/api/search?q=img1")
    assert len(res) == 1
    assert res[0]["filename"] == "img1.png"


def test_search_pagination(server):
    base, _, _ = server
    allr = get_json(base, "/api/search?q=img")
    assert len(allr) == 2
    page = get_json(base, "/api/search?q=img&offset=1&limit=1")
    assert len(page) == 1
    assert page[0]["id"] == allr[1]["id"]


def test_thumbnail_png(server):
    base, _, _ = server
    res = get_json(base, "/api/search?q=img1")
    ct, body = get(base, f"/api/thumbnail?id={res[0]['id']}")
    assert ct == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_similar_by_id(server):
    base, _, _ = server
    res = get_json(base, "/api/search?q=img1")
    sim = get_json(base, f"/api/similar?id={res[0]['id']}")
    assert sim[0]["filename"] == "img1.png"
    assert sim[0]["distance"] < 1e-5


def test_similar_upload(server, tmp_path):
    base, _, photos = server
    data = (photos / "img2.png").read_bytes()
    status, res = post(base, "/api/similar", data)
    assert status == 200
    assert res[0]["filename"] == "img2.png"


def test_similar_upload_garbage(server):
    base, _, _ = server
    status, res = post(base, "/api/similar", b"not an image", expect_error=True)
    assert status == 400
    assert "error" in res


def test_folders_and_settings(server):
    base, eng, photos = server
    folders = get_json(base, "/api/folders")
    assert str(photos) in folders
    status, _ = post(
        base, "/api/settings",
        json.dumps({"max_search_results": 7}).encode(),
    )
    assert status == 200
    assert eng.max_search_results == 7


def test_unknown_route_404(server):
    base, _, _ = server
    try:
        get(base, "/api/nope")
        assert False, "should 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_full_image_endpoint(server):
    base, eng, photos = server
    res = get_json(base, "/api/search?q=img1")
    image_id = res[0]["id"]
    ct, body = get(base, f"/api/image?id={image_id}")
    assert ct == "image/png"
    assert body == (photos / "img1.png").read_bytes()
    # Unknown id → 404.
    import urllib.error
    import urllib.request
    try:
        urllib.request.urlopen(base + "/api/image?id=999999", timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_ui_settings_roundtrip_and_clamping(server):
    base, _, _ = server
    code, body = post(
        base, "/api/settings",
        json.dumps({"search_min_length": 7, "thumbnail_size": 999}).encode(),
    )
    assert code == 200 and body == {"ok": True}
    s = get_json(base, "/api/status")
    assert s["search_min_length"] == 7
    assert s["thumbnail_size"] == 512  # clamped to the valid range
    post(base, "/api/settings",
         json.dumps({"search_min_length": -3, "thumbnail_size": 1}).encode())
    s = get_json(base, "/api/status")
    assert s["search_min_length"] == 0
    assert s["thumbnail_size"] == 60
    post(base, "/api/settings",
         json.dumps({"search_min_length": 3, "thumbnail_size": 180}).encode())


def test_settings_scan_mode_and_ivf(server):
    base, eng, photos = server
    st = get_json(base, "/api/status")
    assert st["scan_mode"] == eng.scan_mode
    assert st["ivf_nprobe"] == eng.ivf_nprobe

    code, _ = post(
        base, "/api/settings",
        json.dumps({"scan_mode": "bogus"}).encode(), expect_error=True,
    )
    assert code == 400

    code, _ = post(
        base, "/api/settings",
        json.dumps({"scan_mode": "ivf", "ivf_nprobe": 2}).encode(),
    )
    assert code == 200
    assert eng.scan_mode == "ivf" and eng.ivf_nprobe == 2

    # This server runs without a batching service, so /api/similar takes
    # the engine's ivf dispatch directly and must find the duplicate
    # first (the batched kind="ivf" path is covered in
    # test_serve_batching.py).
    eng.max_distance_from_query = 1e7
    img = (photos / "img1.png").read_bytes()
    code, res = post(base, "/api/similar", img)
    assert code == 200
    assert res[0]["path"].endswith("img1.png")
    assert res[0]["distance"] == 0.0
    assert eng._ivf is not None  # the ivf path actually served it

    post(base, "/api/settings", json.dumps({"scan_mode": "auto"}).encode())
    assert eng.scan_mode == "auto"


def test_settings_bad_values_are_400_and_atomic(server):
    """Malformed numeric values are client errors (400, like bad
    scan_mode), not 500s — and nothing in the same request is applied."""
    base, eng, _ = server
    before = eng.ivf_nprobe
    code, res = post(
        base, "/api/settings",
        json.dumps({"ivf_nprobe": "fast"}).encode(), expect_error=True,
    )
    assert code == 400 and "error" in res
    assert eng.ivf_nprobe == before

    before_k = eng.max_search_results
    code, _ = post(
        base, "/api/settings",
        json.dumps({"max_search_results": 9, "max_distance": "wide"}
                   ).encode(),
        expect_error=True,
    )
    assert code == 400
    assert eng.max_search_results == before_k  # validate-then-apply


def test_settings_ivf_clusters(server):
    """ivf_clusters round-trips through /api/settings like the CLI flag:
    explicit count, 0/null = back to auto, bad value = 400."""
    base, eng, _ = server
    code, _ = post(
        base, "/api/settings", json.dumps({"ivf_clusters": 2}).encode()
    )
    assert code == 200
    assert eng.ivf_clusters == 2
    s = get_json(base, "/api/status")
    assert s["ivf_clusters"] == 2

    post(base, "/api/settings", json.dumps({"ivf_clusters": 0}).encode())
    assert eng.ivf_clusters is None
    s = get_json(base, "/api/status")
    assert s["ivf_clusters"] is None

    code, _ = post(
        base, "/api/settings",
        json.dumps({"ivf_clusters": "many"}).encode(), expect_error=True,
    )
    assert code == 400


def test_index_page_has_scan_controls(server):
    """The settings panel renders scan-mode + nprobe controls wired to
    /api/settings (previously API-only)."""
    base, _, _ = server
    _, body = get(base, "/")
    html = body.decode()
    assert 'id="scanmode"' in html and 'id="nprobe"' in html
    for mode in ("auto", "exact", "fast", "pallas", "ivf"):
        assert f"<option>{mode}</option>" in html
    assert "body.scan_mode" in html and "body.ivf_nprobe" in html
