"""Full train-state checkpointing (orbax): resume restores params AND
optimizer moments bit-for-bit."""

import numpy as np
import jax
import pytest
from PIL import Image

from pixelbox_tpu.parallel.mesh import make_mesh
from pixelbox_tpu.training.train import (
    TrainConfig,
    restore_train_state,
    save_train_state,
    train_loop,
)

from fixtures import textured_image


def test_save_restore_roundtrip_and_resume(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for s in range(3):
        Image.fromarray(textured_image(seed=s, size=(48, 48))).save(
            d / f"t{s}.png"
        )
    paths = [str(d / f"t{s}.png") for s in range(3)]
    cfg = TrainConfig(latent_dim=4, input_size=32, batch_size=4)
    mesh = make_mesh(4, axis_names=("data", "model"), shape=(2, 2))

    state, _ = train_loop(
        paths, cfg, mesh, epochs=1, steps_per_epoch=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert (tmp_path / "ckpt" / "state").exists()

    restored = restore_train_state(str(tmp_path / "ckpt" / "state"), cfg, mesh)
    flat_a = jax.tree_util.tree_leaves(state.variables)
    flat_b = jax.tree_util.tree_leaves(restored.variables)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer moments restored too (not re-initialized to zeros).
    opt_a = jax.tree_util.tree_leaves(state.opt_state)
    opt_b = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.asarray(x).any() for x in opt_a if hasattr(x, "shape"))
    for a, b in zip(opt_a, opt_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step) == 2

    # And training continues from it.
    state2, losses = train_loop(
        paths, cfg, mesh, epochs=1, steps_per_epoch=1,
        resume_from=str(tmp_path / "ckpt" / "state"),
    )
    assert int(state2.step) == 3
