"""Exact self-match parity (reference engine.rs:352-361).

The reference recomputes a query image's hash through its one and only
embed path, so a drag-dropped copy of an indexed image scores exactly 0.
Here ingest embeds in padded batches while queries arrive singly; the
engine routes query embeds through the SAME padded batch shape and the
same jitted functions (engine._embed_query_ingest_exact) so the two are
bit-identical at the quantized u8 level.
"""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from fixtures import textured_image


def _ingest_batch_hashes(embedder, frames_u8, batch_size):
    """Reproduce the ingest writer's embed path verbatim
    (ingest/pipeline.py:_embed_and_insert): pad → normalize → embed →
    quantize."""
    from pixelbox_tpu.ingest.pipeline import _normalize_frames
    from pixelbox_tpu.ops.quantize import quantize_embedding

    m = frames_u8.shape[0]
    padded = np.zeros((batch_size,) + frames_u8.shape[1:], dtype=np.uint8)
    padded[:m] = frames_u8
    stacked = _normalize_frames(jnp.asarray(padded))
    latents = embedder.embed_preprocessed(stacked)
    return np.asarray(quantize_embedding(latents))[:m]


def test_single_embed_bitexact_vs_batched(rng, tmp_path):
    """embed-single == embed-batched at the u8 level, at EVERY batch
    position (the ingest batch packs the image at an arbitrary slot; the
    query helper packs it at slot 0 of a zero-padded batch)."""
    from pixelbox_tpu.engine import Engine
    from pixelbox_tpu.ops.preprocess import fill_resize_u8

    eng = Engine.new(
        str(tmp_path / "sm.db"),
        embedder="efficientnet",
        embedder_kwargs={"dim": 8, "input_size": 32},
    )
    try:
        imgs = [textured_image(seed=s, size=(50, 70)) for s in range(6)]
        frames = np.stack(
            [fill_resize_u8(im, eng.embedder.input_size) for im in imgs]
        )
        batched = _ingest_batch_hashes(eng.embedder, frames, batch_size=64)
        for i, im in enumerate(imgs):
            single = eng._embed_query_ingest_exact(im)
            np.testing.assert_array_equal(
                single, batched[i],
                err_msg=f"u8 hash drift for image {i} (batch pos {i})",
            )
    finally:
        eng.close()


def test_redropped_indexed_image_scores_exactly_zero(rng, tmp_path):
    """End-to-end: index a folder, then drag-drop one of the indexed
    files — the top result must be that image at distance exactly 0.0.

    Uses the stub embedder: its hashes are distinct per image (an
    UNtrained tiny efficientnet quantizes everything to the all-128 hash,
    which makes "top result" a rowid tie-break, not a self-match).  The
    batched-vs-single bit-exactness property on the real net is covered
    by test_single_embed_bitexact_vs_batched above."""
    from pixelbox_tpu.engine import Engine

    photos = tmp_path / "photos"
    photos.mkdir()
    for s in range(5):
        Image.fromarray(textured_image(seed=s, size=(60, 45))).save(
            photos / f"p{s}.png"
        )
    eng = Engine.new(
        str(tmp_path / "lib.db"),
        embedder="stub",
        embedder_kwargs={"dim": 32, "input_size": 64},
    )
    try:
        eng.add_tracked_folder(str(photos))
        eng.start_indexing(num_workers=2)
        eng.wait_for_indexing()
        assert eng.get_num_indexed_images() == 5

        eng.query_by_image_hash_from_file(str(photos / "p2.png"))
        results = eng.get_query_results()
        assert results, eng.last_query_error
        top = results[0]
        assert top.path.endswith("p2.png")
        assert top.distance_from_query == 0.0
        # Guard against a vacuous pass (everything hashing identically):
        # the other images must NOT also sit at distance zero.
        assert all(r.distance_from_query > 0.0 for r in results[1:])
    finally:
        eng.close()


def test_embed_batch_size_persists_across_reopen(rng, tmp_path):
    """A library ingested at a NON-default batch size keeps the exact
    self-match guarantee in a fresh process: the size persists in the
    catalog and the query embed replays it (ADVICE r4 — previously the
    attr was in-process only, so a reopen silently routed queries
    through a different XLA program shape)."""
    from pixelbox_tpu.engine import Engine
    from pixelbox_tpu.ingest.pipeline import IngestPipeline

    photos = tmp_path / "photos"
    photos.mkdir()
    for s in range(3):
        Image.fromarray(textured_image(seed=s, size=(60, 45))).save(
            photos / f"p{s}.png"
        )
    db = str(tmp_path / "lib.db")
    eng = Engine.new(db, embedder="stub",
                     embedder_kwargs={"dim": 32, "input_size": 64})
    try:
        eng.add_tracked_folder(str(photos))
        pipe = IngestPipeline(eng, [str(photos)], num_workers=2,
                              batch_size=7)
        pipe.start()
        pipe.join()
        assert eng.catalog.get_setting("embed_batch_size") == "7"
    finally:
        eng.close()

    # Fresh engine (new process stand-in): no in-process attr.
    eng = Engine(db)
    try:
        assert not hasattr(eng, "_embed_batch_size")
        eng.query_by_image_hash_from_file(str(photos / "p1.png"))
        results = eng.get_query_results()
        assert results, eng.last_query_error
        assert results[0].path.endswith("p1.png")
        assert results[0].distance_from_query == 0.0
        # The restored batch size drove the query embed.
        assert eng._embed_batch_size == 7
    finally:
        eng.close()
