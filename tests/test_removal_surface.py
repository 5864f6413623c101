"""CLI/web exposure of image + purge removal (engine.remove_image and
remove_tracked_folder_and_images already exist; the reference stages
folder-purge as a TODO at engine.rs:414)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest
from PIL import Image

from pixelbox_tpu.cli import main as cli_main
from pixelbox_tpu.engine import Engine

from fixtures import textured_image


@pytest.fixture()
def photo_dir(tmp_path):
    d = tmp_path / "photos"
    (d / "sub").mkdir(parents=True)
    Image.fromarray(textured_image(seed=1, size=(64, 64))).save(d / "a.png")
    Image.fromarray(textured_image(seed=2, size=(64, 64))).save(
        d / "sub" / "b.png"
    )
    return d


def test_cli_remove_image_and_compact(photo_dir, tmp_path, capsys):
    db = str(tmp_path / "r.db")
    assert cli_main(["init", db, "--dim", "16"]) == 0
    assert cli_main(["add-folder", db, str(photo_dir)]) == 0
    assert cli_main(["index", db, "--dim", "16"]) == 0
    assert cli_main(["remove-image", db, "1", "--dim", "16"]) == 0
    assert cli_main(["remove-image", db, "1", "--dim", "16"]) == 1  # gone
    assert cli_main(["compact", db, "--dim", "16"]) == 0
    capsys.readouterr()
    assert cli_main(["stats", db, "--dim", "16"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["images"] == 1


def test_cli_remove_folder_purge(photo_dir, tmp_path, capsys):
    db = str(tmp_path / "p.db")
    assert cli_main(["init", db, "--dim", "16"]) == 0
    assert cli_main(["add-folder", db, str(photo_dir)]) == 0
    assert cli_main(["index", db, "--dim", "16"]) == 0
    capsys.readouterr()
    assert cli_main(
        ["remove-folder", db, str(photo_dir), "--purge", "--dim", "16"]
    ) == 0
    assert "removed 2 images" in capsys.readouterr().out
    eng = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 16})
    assert eng.get_num_indexed_images() == 0
    assert eng.get_tracked_folders() == []
    eng.close()


def test_web_remove_endpoints(photo_dir, tmp_path):
    from pixelbox_tpu.serve import make_handler

    eng = Engine.new(
        str(tmp_path / "w.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(eng, threading.Lock())
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    try:
        got = post("/api/remove", {"id": 1})
        assert got == {"removed": 1}
        assert eng.get_num_indexed_images() == 1
        got = post("/api/folders/remove", {"folder": str(photo_dir), "purge": True})
        assert got["removed_images"] == 1
        assert got["folders"] == []
        assert eng.get_num_indexed_images() == 0
    finally:
        httpd.shutdown()
        eng.close()
