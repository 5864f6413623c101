"""Regression tests for the round-2 correctness fixes (VERDICT.md §8 /
ADVICE.md): folder-removal prefix matching, stale derived-index caches
after removal, Rust-parity rounding, loud distributed init failures,
XSS-safe web UI rendering, and batched result assembly."""

import math

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.index.catalog import Catalog
from pixelbox_tpu.ops.resample import resize_dimensions

from fixtures import textured_image


def _mkimg(path, seed, size=(48, 48)):
    Image.fromarray(textured_image(seed=seed, size=size)).save(path)


# --------------------------------------------------------------------- #
# remove_tracked_folder_and_images: sibling-prefix + LIKE-wildcard safety


def test_remove_folder_does_not_touch_sibling_prefix(tmp_path):
    vacay = tmp_path / "vacay"
    vacation = tmp_path / "vacation"
    vacay.mkdir()
    vacation.mkdir()
    _mkimg(vacay / "a.png", 1)
    _mkimg(vacation / "b.png", 2)

    eng = Engine.new(str(tmp_path / "t.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    eng.insert_image_from_path(str(vacay / "a.png"))
    eng.insert_image_from_path(str(vacation / "b.png"))

    removed = eng.remove_tracked_folder_and_images(str(vacay))
    assert removed == 1
    assert eng.catalog.get_image_by_path(str(vacation / "b.png")) is not None
    assert eng.catalog.get_image_by_path(str(vacay / "a.png")) is None
    eng.close()


def test_remove_folder_strips_crawler_glob_tail(tmp_path):
    d = tmp_path / "photos"
    d.mkdir()
    _mkimg(d / "a.png", 3)
    eng = Engine.new(str(tmp_path / "t.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    eng.insert_image_from_path(str(d / "a.png"))
    assert eng.remove_tracked_folder_and_images(str(d) + "/**/*.*") == 1
    eng.close()


def test_remove_folder_escapes_like_wildcards(tmp_path):
    tricky = tmp_path / "100%_done"
    other = tmp_path / "100x_done"  # would match '100%_done' as LIKE pattern
    tricky.mkdir()
    other.mkdir()
    _mkimg(tricky / "a.png", 4)
    _mkimg(other / "b.png", 5)
    eng = Engine.new(str(tmp_path / "t.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    eng.insert_image_from_path(str(tricky / "a.png"))
    eng.insert_image_from_path(str(other / "b.png"))
    assert eng.remove_tracked_folder_and_images(str(tricky)) == 1
    assert eng.catalog.get_image_by_path(str(other / "b.png")) is not None
    eng.close()


# --------------------------------------------------------------------- #
# Derived-index caches must invalidate on remove_image (ADVICE: caches
# were keyed on store.n, unchanged by tombstone deletes)


@pytest.fixture()
def removal_engine(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for s in range(8):
        _mkimg(d / f"s{s}.png", s)
    eng = Engine.new(str(tmp_path / "r.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    # Reciprocal-cosine distance blows up toward 1e6 for near-orthogonal
    # stub vectors; keep every live row in range so the count assertions
    # below test CACHE validity, not the threshold.
    eng.max_distance_from_query = 1e7
    for s in range(8):
        eng.insert_image_from_path(str(d / f"s{s}.png"))
    yield eng, d
    eng.close()


def test_phash_gemm_cache_invalidated_on_remove(removal_engine):
    eng, d = removal_engine
    probe = eng.load_image(str(d / "s3.png"))
    eng.query_by_phash(probe.phash)  # builds + caches the GEMM index
    top = eng.get_query_results()[0]
    assert top.filename == "s3.png"

    eng.remove_image(top.id)
    eng.query_by_phash(probe.phash)
    results = eng.get_query_results()
    assert all(r.id != top.id for r in results)
    # The tombstoned row must not silently eat a top-k slot: all 7
    # remaining images still appear.
    assert len(results) == 7


def test_pallas_meta_cache_invalidated_on_remove(removal_engine):
    from jax._src.pallas.mosaic import interpret as pltpu_interpret  # noqa: F401
    import jax.experimental.pallas.tpu as pltpu

    eng, d = removal_engine
    eng.scan_mode = "pallas"
    probe = eng.load_image(str(d / "s2.png"))
    with pltpu.force_tpu_interpret_mode():
        eng.query_by_image_hash_from_image(probe)
        top = eng.get_query_results()[0]
        assert top.filename == "s2.png"

        eng.remove_image(top.id)
        eng.query_by_image_hash_from_image(probe)
        results = eng.get_query_results()
    assert all(r.id != top.id for r in results)
    assert len(results) == 7


def test_sharded_cache_invalidated_on_remove(removal_engine):
    from pixelbox_tpu.parallel.mesh import make_mesh

    eng, d = removal_engine
    eng.serve_on_mesh(make_mesh(8))
    probe = eng.load_image(str(d / "s5.png"))
    eng.query_by_image_hash_from_image(probe)
    top = eng.get_query_results()[0]
    assert top.filename == "s5.png"

    eng.remove_image(top.id)
    eng.query_by_image_hash_from_image(probe)
    results = eng.get_query_results()
    assert all(r.id != top.id for r in results)
    assert len(results) == 7
    eng.scan_mesh = None


# --------------------------------------------------------------------- #
# resize_dimensions: Rust f64::round (half away from zero), not banker's


def test_resize_dimensions_half_away_from_zero():
    # 5 px at ratio 1/2 → 2.5 → Rust rounds to 3; banker's gives 2.
    assert resize_dimensions(5, 10, 100, 5, fill=False) == (3, 5)
    # fill=True symmetric case.
    assert resize_dimensions(10, 5, 5, 100, fill=True) == (200, 100)


def test_resize_dimensions_monotone_sanity():
    for w, h in [(1, 1), (7, 3), (1920, 1080), (31, 999)]:
        ow, oh = resize_dimensions(w, h, 16, 16, fill=False)
        assert 1 <= ow <= 16 and 1 <= oh <= 16


# --------------------------------------------------------------------- #
# init_distributed must fail loudly when multi-host was requested


def test_init_distributed_raises_on_requested_failure(monkeypatch):
    import jax

    from pixelbox_tpu.parallel import distributed

    monkeypatch.setattr(distributed.init_distributed, "_done", False,
                        raising=False)

    def boom(**kwargs):
        raise ValueError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="connection refused"):
        distributed.init_distributed(coordinator_address="10.0.0.1:1234",
                                     num_processes=2, process_id=0)
    # And a plain single-host call stays a no-op (no raise).
    monkeypatch.setattr(distributed.init_distributed, "_done", False,
                        raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    distributed.init_distributed()


# --------------------------------------------------------------------- #
# Web UI renders filenames as text, never as markup (stored XSS)


def test_page_renders_filenames_with_textcontent():
    from pixelbox_tpu import serve

    assert "textContent = it.filename" in serve._PAGE
    # No template interpolation of attacker-controlled fields into HTML.
    assert "${it.filename}" not in serve._PAGE
    assert "${it.path}" not in serve._PAGE


# --------------------------------------------------------------------- #
# Batched catalog assembly (one IN-list pair instead of 2 queries per hit)


def test_get_images_with_tags_batched(tmp_path):
    cat = Catalog(str(tmp_path / "c.db"), create=True)
    n = 600  # crosses the 500-id chunking boundary
    ids = []
    for i in range(n):
        ids.append(
            cat.insert_image(
                filename=f"f{i}.png", path=f"/p/f{i}.png", width=1, height=1,
                tags={"n": str(i)},
            )
        )
    got = cat.get_images_with_tags(ids + [10 ** 9])
    assert len(got) == n
    assert got[ids[0]]["filename"] == "f0.png"
    assert got[ids[599]]["tags"] == {"n": "599"}
    assert 10 ** 9 not in got
    cat.close()
