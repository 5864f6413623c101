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


def test_compact_concurrent_with_queries(tmp_path):
    """Compaction renumbers row↔id mappings; concurrent query flows hold
    the engine's index read lock, so results never mix pre-compact scan
    rows with post-compact id tables (round-3 review finding)."""
    import threading

    from PIL import Image

    from fixtures import textured_image
    from pixelbox_tpu.engine import Engine

    d = tmp_path / "photos"
    d.mkdir()
    for s in range(12):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"s{s}.png"
        )
    eng = Engine.new(
        str(tmp_path / "cc.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.max_distance_from_query = 1e7
    for s in range(12):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    probe = eng.load_image(str(d / "s5.png"))

    stop = threading.Event()
    errors = []

    def churn():
        # Tombstone + re-add + compact in a loop.
        i = 0
        while not stop.is_set():
            try:
                eng.query_by_image_hash_from_image(probe)
                res = eng.get_query_results()
                assert res, "query returned nothing"
                assert res[0].path.endswith("s5.png"), res[0].path
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
            i += 1

    t = threading.Thread(target=churn)
    t.start()
    try:
        for round_ in range(6):
            victim = 10 if round_ % 2 == 0 else 11
            eng.remove_image(victim + 1) if False else None
            # Remove by id: find ids of s10/s11 by path lookup.
            row = eng.catalog._connect().execute(
                "SELECT id FROM images WHERE path LIKE ?",
                (f"%s{victim}.png",),
            ).fetchone()
            if row:
                eng.remove_image(int(row[0]))
            eng.compact()
            eng.insert_image_from_path(str(d / f"s{victim}.png"))
    finally:
        stop.set()
        t.join(timeout=30)
        eng.close()
    assert not errors, errors[0]


def test_watch_unreachable_root_does_not_mass_delete(tmp_path):
    """A tracked folder that disappears wholesale (unmounted drive) must
    NOT tombstone its rows — only individually deleted files do
    (round-3 review finding)."""
    import shutil
    import time as _time

    from PIL import Image

    from fixtures import textured_image
    from pixelbox_tpu.engine import Engine

    d = tmp_path / "mount"
    d.mkdir()
    for s in range(3):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"m{s}.png"
        )
    eng = Engine.new(
        str(tmp_path / "um.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(d))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert eng.get_num_indexed_images() == 3

    # Simulate the unmount: the whole root vanishes.
    shutil.rmtree(d)
    eng.watch(interval_s=0.2, num_workers=2)
    deadline = _time.time() + 10
    while eng.watch_passes < 3 and _time.time() < deadline:
        _time.sleep(0.1)
    eng.stop_watching()
    assert eng.get_num_indexed_images() == 3  # nothing tombstoned
    assert eng.watch_removals == 0
    eng.close()
