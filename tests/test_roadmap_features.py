"""Reference-roadmap features the reference never built (README.md TODOs):
editable tags, tags-only mode (embedder='none'), watched directories."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.cli import main as cli_main
from pixelbox_tpu.engine import Engine

from fixtures import textured_image


@pytest.fixture()
def photo_dir(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    for s in (1, 2):
        Image.fromarray(textured_image(seed=s, size=(64, 64))).save(
            d / f"img{s}.png"
        )
    return d


# ------------------------------------------------------------------ #
# Editable tags


def test_set_search_and_remove_tag(photo_dir, tmp_path):
    eng = Engine.new(
        str(tmp_path / "t.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)

    eng.query("img1")
    target = eng.get_query_results()[0].id

    assert eng.set_tag(target, "animal", "cat")
    assert eng.catalog.get_tags(target)["animal"] == "cat"

    # Searchable immediately through the existing tag: operator.
    eng.query("tag:cat")
    assert [r.id for r in eng.get_query_results()] == [target]

    # Overwrite: one value per name.
    eng.set_tag(target, "animal", "dog")
    assert eng.catalog.get_tags(target)["animal"] == "dog"
    eng.query("tag:cat")
    assert eng.get_query_results() == []

    assert eng.remove_tag(target, "animal")
    assert "animal" not in eng.catalog.get_tags(target)
    assert not eng.remove_tag(target, "animal")  # already gone
    assert not eng.set_tag(999999, "x", "y")  # unknown image
    eng.close()


def test_tag_cli(photo_dir, tmp_path, capsys):
    db = str(tmp_path / "c.db")
    assert cli_main(["init", db, "--dim", "16"]) == 0
    assert cli_main(["add-folder", db, str(photo_dir)]) == 0
    assert cli_main(["index", db, "--dim", "16"]) == 0
    assert cli_main(["tag", db, "1", "mood", "happy", "--dim", "16"]) == 0
    capsys.readouterr()  # clear earlier commands' output
    assert cli_main(["search", db, "tag:happy", "--json", "--dim", "16"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert [r["id"] for r in out] == [1]
    assert cli_main(["untag", db, "1", "mood", "--dim", "16"]) == 0
    assert cli_main(["untag", db, "1", "mood", "--dim", "16"]) == 1


def test_tag_web_api(photo_dir, tmp_path):
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
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        got = post("/api/tag", {"id": 1, "name": "place", "value": "beach"})
        assert got["tags"]["place"] == "beach"
        assert eng.catalog.get_tags(1)["place"] == "beach"
        got = post("/api/untag", {"id": 1, "name": "place"})
        assert "place" not in got["tags"]
    finally:
        httpd.shutdown()
        eng.close()


# ------------------------------------------------------------------ #
# Tags-only mode (embedder='none')


def test_none_embedder_indexes_without_semantic_hashes(photo_dir, tmp_path):
    eng = Engine.new(str(tmp_path / "n.db"), embedder="none")
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert eng.get_num_indexed_images() == 2
    # No semantic hashes; phashes still present (no model needed).
    assert eng._sem_store is None
    assert eng._ph_store is not None and eng._ph_store.size == 2

    # Text search works from the catalog.
    eng.query("img1")
    assert [r.filename for r in eng.get_query_results()] == ["img1.png"]
    eng.query("img")
    assert len(eng.get_query_results()) == 2

    # Similarity-by-file is disabled with a friendly error.
    eng.query_by_image_hash_from_file(str(photo_dir / "img1.png"))
    assert "disabled" in (eng.last_query_error or "")
    assert eng.get_query_results() == []

    # phash near-duplicate search still works (model-free).
    from pixelbox_tpu.ingest.decode import decode_image_file
    from pixelbox_tpu.ops.phash import phash

    decoded = decode_image_file(str(photo_dir / "img1.png"))
    eng.query_by_phash(phash(decoded.rgb, aspect_preserving=True))
    results = eng.get_query_results()
    assert results and results[0].filename == "img1.png"
    assert results[0].distance_from_query == 0.0
    eng.close()


def test_none_embedder_keeps_stored_hashes_usable(photo_dir, tmp_path):
    """A library indexed WITH a model, reopened with embedder='none':
    similar-id on stored hashes must still work (reference README.md's
    'after finding a seed image you can right-click and do find
    similar')."""
    db = str(tmp_path / "m.db")
    eng = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 16})
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    eng.close()

    eng = Engine.open(db, embedder="none")
    eng.query_by_image_hash_from_id(1)
    results = eng.get_query_results()
    assert results and results[0].id == 1
    assert results[0].distance_from_query == 0.0
    # Text queries keep reference INNER-JOIN semantics (hashes exist).
    eng.query("img")
    assert len(eng.get_query_results()) == 2
    eng.close()


# ------------------------------------------------------------------ #
# Watched directories


def test_watch_indexes_new_files(photo_dir, tmp_path):
    eng = Engine.new(
        str(tmp_path / "wd.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert eng.get_num_indexed_images() == 2

    eng.watch(interval_s=0.2, num_workers=2)
    assert eng.is_watching()
    # A poll pass with nothing new must not reindex forever.
    deadline = time.time() + 30
    while eng.watch_passes < 1 and time.time() < deadline:
        time.sleep(0.05)
    assert eng.watch_passes >= 1
    assert eng.get_num_indexed_images() == 2

    Image.fromarray(textured_image(seed=3, size=(64, 64))).save(
        photo_dir / "img3.png"
    )
    # Poll on the QUERY (the catalog insert commits a moment before the
    # device-store append becomes visible to text search).
    deadline = time.time() + 60
    while time.time() < deadline:
        eng.query("img3")
        if eng.get_query_results():
            break
        time.sleep(0.1)
    assert eng.get_num_indexed_images() == 3
    assert [r.filename for r in eng.get_query_results()] == ["img3.png"]

    eng.stop_watching()
    assert not eng.is_watching()
    eng.close()  # close() after stop is a no-op for the watcher


def test_watch_ignores_permanently_failing_files(photo_dir, tmp_path):
    """A corrupt file in a watched folder must trigger at most ONE
    indexing attempt, not one per poll forever."""
    eng = Engine.new(
        str(tmp_path / "wf.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    (photo_dir / "broken.png").write_bytes(b"definitely not a png")

    calls = []
    orig = eng.start_indexing

    def counting_start(**kw):
        calls.append(1)
        return orig(**kw)

    eng.start_indexing = counting_start
    eng.watch(interval_s=0.2, num_workers=2)
    deadline = time.time() + 60
    while eng.watch_passes < 4 and time.time() < deadline:
        time.sleep(0.05)
    eng.stop_watching()
    assert eng.watch_passes >= 4
    assert len(calls) == 1, calls  # retried once, then remembered as failed
    assert eng.get_num_indexed_images() == 2
    eng.close()


def test_none_mode_similar_warns_even_with_stored_hashes(photo_dir, tmp_path):
    db = str(tmp_path / "ws.db")
    eng = Engine.new(db, embedder="stub", embedder_kwargs={"dim": 16})
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    eng.close()

    eng = Engine.open(db, embedder="none")
    eng.query(f"similar:{photo_dir}/img1.png img")
    assert "tags-only" in (eng.last_query_error or "")
    # Filters still apply; results just lack similarity ordering.
    assert len(eng.get_query_results()) == 2
    eng.close()


# ------------------------------------------------------------------ #
# Index inside zip files


@pytest.fixture()
def zip_dir(tmp_path):
    import io
    import zipfile

    d = tmp_path / "zphotos"
    d.mkdir()
    Image.fromarray(textured_image(seed=1, size=(64, 64))).save(d / "loose.png")

    def png_bytes(seed):
        buf = io.BytesIO()
        Image.fromarray(textured_image(seed=seed, size=(64, 64))).save(
            buf, "PNG"
        )
        return buf.getvalue()

    with zipfile.ZipFile(d / "bundle.zip", "w") as zf:
        zf.writestr("ziptex.png", png_bytes(4))
        zf.writestr("nested/deep.png", png_bytes(5))
        zf.writestr("notes.txt", b"not an image")
    (d / "corrupt.zip").write_bytes(b"PK\x03\x04 not really a zip")
    return d


def test_zip_members_are_indexed_and_searchable(zip_dir, tmp_path):
    eng = Engine.new(
        str(tmp_path / "z.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(zip_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    # loose.png + 2 zip members; notes.txt and the corrupt zip skipped.
    assert eng.get_num_indexed_images() == 3

    eng.query("deep")
    results = eng.get_query_results()
    assert len(results) == 1
    assert results[0].path.endswith("bundle.zip!/nested/deep.png")
    assert results[0].filename == "deep.png"

    # Re-index is idempotent for pseudo-paths too.
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert eng.get_num_indexed_images() == 3

    # Similarity by the member's id: exact self-match from the stored hash.
    member_id = results[0].id
    eng.query_by_image_hash_from_id(member_id)
    sim = eng.get_query_results()
    assert sim and sim[0].id == member_id and sim[0].distance_from_query == 0.0
    eng.close()


def test_zip_member_decode_roundtrip(zip_dir):
    from pixelbox_tpu.ingest.crawler import crawl
    from pixelbox_tpu.ingest.decode import decode_image_file, split_zip_path

    paths = sorted(crawl([str(zip_dir)]))
    members = [p for p in paths if "!/" in p]
    assert len(members) == 2
    decoded = decode_image_file(members[0])
    assert decoded is not None and decoded.rgb.shape == (64, 64, 3)
    zpath, member = split_zip_path(decoded.path)
    assert zpath.endswith("bundle.zip") and member in (
        "ziptex.png", "nested/deep.png"
    )
    # Nonexistent member: decode fails cleanly.
    assert decode_image_file(str(zip_dir / "bundle.zip") + "!/nope.png") is None


def test_watch_removes_deleted_files(photo_dir, tmp_path):
    """Deletion sync: files removed from a watched folder leave the index
    (the other half of the watched-directories roadmap semantics), and a
    delete-then-re-add cycle converges both ways."""
    eng = Engine.new(
        str(tmp_path / "wr.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(photo_dir))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert eng.get_num_indexed_images() == 2

    eng.watch(interval_s=0.2, num_workers=2)
    # Delete one file; the watcher must tombstone it.
    (photo_dir / "img1.png").unlink()
    deadline = time.time() + 60
    while (
        eng.get_num_indexed_images() != 1 or eng.watch_removals != 1
    ) and time.time() < deadline:
        time.sleep(0.1)
    assert eng.get_num_indexed_images() == 1
    assert eng.watch_removals == 1
    eng.query("img1")
    assert not eng.get_query_results()

    # Re-add a file at the SAME path: it must index again.
    Image.fromarray(textured_image(seed=9, size=(64, 64))).save(
        photo_dir / "img1.png"
    )
    deadline = time.time() + 60
    while eng.get_num_indexed_images() != 2 and time.time() < deadline:
        time.sleep(0.1)
    assert eng.get_num_indexed_images() == 2
    eng.stop_watching()
    eng.close()


def test_watch_removal_spares_untracked_rows(photo_dir, tmp_path):
    """Rows outside every tracked folder (their folder was un-tracked
    without --purge) must survive deletion sync."""
    other = tmp_path / "other"
    other.mkdir()
    Image.fromarray(textured_image(seed=7, size=(64, 64))).save(
        other / "keepme.png"
    )
    eng = Engine.new(
        str(tmp_path / "ws.db"), embedder="stub", embedder_kwargs={"dim": 16}
    )
    eng.add_tracked_folder(str(photo_dir))
    eng.add_tracked_folder(str(other))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert eng.get_num_indexed_images() == 3

    # Stop tracking `other`, delete its file on disk, then watch: the
    # catalog row must remain (not under any tracked folder anymore).
    eng.remove_tracked_folder(str(other))
    (other / "keepme.png").unlink()
    eng.watch(interval_s=0.2, num_workers=2)
    deadline = time.time() + 15
    while eng.watch_passes < 2 and time.time() < deadline:
        time.sleep(0.1)
    assert eng.get_num_indexed_images() == 3
    assert eng.watch_removals == 0
    eng.stop_watching()
    eng.close()
