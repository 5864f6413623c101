"""BLIP ITC training smoke test (tiny config, CPU mesh)."""

import numpy as np

from pixelbox_tpu.models.blip import BlipConfig, BlipSearcher
from pixelbox_tpu.models.wordpiece import WordPieceTokenizer
from pixelbox_tpu.parallel.mesh import make_mesh
from pixelbox_tpu.training.blip_train import BlipTrainConfig, itc_loss, train_blip

from fixtures import textured_image


def test_itc_loss_prefers_aligned_pairs():
    import jax.numpy as jnp

    z = jnp.eye(4, 8)
    aligned = float(itc_loss(z, z, jnp.float32(10.0)))
    shuffled = float(itc_loss(z, jnp.roll(z, 1, axis=0), jnp.float32(10.0)))
    assert aligned < shuffled


def test_train_blip_runs_and_descends():
    cfg = BlipConfig.tiny()
    tok = WordPieceTokenizer.toy(words=["red", "blue", "green", "texture"])
    pairs = [
        (textured_image(seed=s, size=(64, 64)), f"texture {name}")
        for s, name in ((1, "red"), (2, "blue"), (3, "green"))
    ]
    mesh = make_mesh(8, axis_names=("data",))
    tc = BlipTrainConfig(cfg=cfg, max_text_len=8, batch_size=8, lr=1e-3)
    variables, losses = train_blip(pairs, tc, mesh, tokenizer=tok, steps=6)
    assert len(losses) == 6
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # in-batch ITC on 3 pairs learns fast

    # Trained weights drop into the searcher.
    searcher = BlipSearcher(cfg=cfg, tokenizer=tok, params=variables, max_text_len=8)
    h = searcher.text_hashes(["texture red"])
    assert h.shape == (1, cfg.projection_dim)
