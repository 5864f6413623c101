"""Data-parallel ingest embedding on the 8-device CPU mesh."""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.models import get_embedder
from pixelbox_tpu.parallel.data_parallel import embed_batch_sharded, shard_batch
from pixelbox_tpu.parallel.mesh import make_mesh

from fixtures import textured_image


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_shard_batch_layout(mesh):
    batch = np.zeros((16, 8, 8, 3), np.float32)
    sharded = shard_batch(batch, mesh)
    assert sharded.shape == (16, 8, 8, 3)
    # Each device holds 2 rows.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_shard_batch_pads_to_axis_multiple(mesh):
    batch = np.zeros((5, 4, 4, 3), np.float32)
    sharded = shard_batch(batch, mesh)
    assert sharded.shape[0] == 8  # padded; caller trims


def test_sharded_embed_matches_single_device(mesh):
    emb = get_embedder("stub", dim=16, input_size=32)
    batch = np.stack(
        [
            np.asarray(
                textured_image(seed=s, size=(32, 32)), dtype=np.float32
            ) / 255.0
            for s in range(6)
        ]
    )
    sharded = embed_batch_sharded(emb, batch, mesh)
    import jax.numpy as jnp

    single = np.asarray(emb.embed_preprocessed(jnp.asarray(batch)))
    assert sharded.shape == (6, 16)
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_engine_ingest_with_mesh(tmp_path, mesh):
    photos = tmp_path / "photos"
    photos.mkdir()
    for s in range(5):
        Image.fromarray(textured_image(seed=s, size=(40, 40))).save(
            photos / f"m{s}.png"
        )
    eng = Engine.new(str(tmp_path / "dp.db"), embedder="stub",
                     embedder_kwargs={"dim": 16})
    eng.mesh = mesh
    eng.add_tracked_folder(str(photos))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=120)
    assert eng.get_num_indexed_images() == 5
    # Results identical to a no-mesh engine over the same images.
    eng2 = Engine.new(str(tmp_path / "dp2.db"), embedder="stub",
                      embedder_kwargs={"dim": 16})
    eng2.add_tracked_folder(str(photos))
    eng2.start_indexing(num_workers=2)
    assert eng2.wait_for_indexing(timeout=120)
    h1 = dict(eng.catalog.iter_hashes("semantic_hashes"))
    h2 = dict(eng2.catalog.iter_hashes("semantic_hashes"))
    paths1 = {eng.catalog.get_image(i)["filename"]: h for i, h in h1.items()}
    paths2 = {eng2.catalog.get_image(i)["filename"]: h for i, h in h2.items()}
    assert paths1 == paths2
