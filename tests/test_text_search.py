"""Text→image search through the Engine (tiny BLIP, end-to-end)."""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.models.blip import BlipConfig, BlipSearcher
from pixelbox_tpu.models.wordpiece import WordPieceTokenizer
from pixelbox_tpu.query import parse_query

from fixtures import textured_image


@pytest.fixture(scope="module")
def blip_engine(tmp_path_factory):
    photos = tmp_path_factory.mktemp("photos")
    for s in (1, 2, 3):
        Image.fromarray(textured_image(seed=s, size=(64, 64))).save(
            photos / f"img{s}.png"
        )
    db = tmp_path_factory.mktemp("db") / "blip.db"
    searcher = BlipSearcher(
        cfg=BlipConfig.tiny(),
        tokenizer=WordPieceTokenizer.toy(words=["sunset", "beach"]),
        max_text_len=16,
    )
    eng = Engine.new(str(db), embedder="stub", embedder_kwargs={"dim": 16})
    eng._blip_enabled = True
    eng._blip_searcher = searcher
    eng.catalog.ensure_aux_hash_table("blip_hashes")
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    return eng


def test_parser_text_operator():
    p = parse_query("text:sunset text:beach grad")
    assert p.text_query == "sunset beach"
    assert p.where_sql == "images.filename LIKE ?"


def test_blip_hashes_ingested(blip_engine):
    assert blip_engine._blip_store is not None
    assert blip_engine._blip_store.size == 3
    # Durable in the catalog too.
    assert len(list(blip_engine.catalog.iter_hashes("blip_hashes"))) == 3


def test_text_query_returns_ranked_results(blip_engine):
    blip_engine.query("text:sunset")
    results = blip_engine.get_query_results()
    assert len(results) == 3
    dists = [r.distance_from_query for r in results]
    assert dists == sorted(dists)


def test_text_query_with_filename_filter(blip_engine):
    blip_engine.query("text:sunset img1")
    results = blip_engine.get_query_results()
    assert len(results) == 1
    assert results[0].filename == "img1.png"


def test_query_by_text_api(blip_engine):
    blip_engine.query_by_text("a beach at sunset")
    assert len(blip_engine.get_query_results()) == 3


def test_text_query_without_blip_errors(tmp_path):
    eng = Engine.new(str(tmp_path / "noblip.db"), embedder="stub",
                     embedder_kwargs={"dim": 8})
    eng.query("text:anything")
    assert eng.get_query_results() == []
    assert "BLIP" in eng.last_query_error


def test_reopen_loads_blip_store(blip_engine, tmp_path_factory):
    eng2 = Engine.open(blip_engine.db_path, embedder="stub",
                       embedder_kwargs={"dim": 16})
    assert eng2._blip_store is not None
    assert eng2._blip_store.size == 3
    eng2.close()


def test_image_to_image_consistency(blip_engine, tmp_path):
    """An image identical to an indexed one must rank first when its own
    BLIP latent queries the index (image-side sanity of the ITC space)."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.scan import cosine_scan_topk

    target = blip_engine._blip_store.get_rows([0])[0]
    d, i = cosine_scan_topk(
        jnp.asarray(target), blip_engine._blip_store.device_index, k=1,
        block_rows=1024,
    )
    assert int(np.asarray(i)[0]) == 0
    assert float(np.asarray(d)[0]) < 1e-5
