"""Training: loss semantics, one sharded step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixelbox_tpu.parallel.mesh import make_mesh
from pixelbox_tpu.training.train import (
    TrainConfig,
    cosine_embedding_loss,
    init_train_state,
    make_pair_batch,
    make_sharded_train_step,
)

from fixtures import textured_image


class TestCosineEmbeddingLoss:
    def test_identical_positive_pair_zero(self):
        z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
        loss = cosine_embedding_loss(z, z, jnp.ones(4))
        assert float(loss) < 1e-6

    def test_identical_negative_pair_penalized(self):
        z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
        loss = cosine_embedding_loss(z, z, -jnp.ones(4))
        assert abs(float(loss) - 1.0) < 1e-5  # cos=1, margin 0 → 1.0

    def test_orthogonal(self):
        a = jnp.asarray([[1.0, 0.0]])
        b = jnp.asarray([[0.0, 1.0]])
        assert float(cosine_embedding_loss(a, b, jnp.ones(1))) == pytest.approx(1.0)
        assert float(cosine_embedding_loss(a, b, -jnp.ones(1))) == pytest.approx(0.0)


def test_make_pair_batch_shapes():
    cfg = TrainConfig(latent_dim=4, input_size=32, batch_size=6)
    rng = np.random.default_rng(0)
    imgs = [textured_image(seed=s, size=(48, 48)) for s in range(3)]
    left, right, labels = make_pair_batch(imgs, cfg, rng)
    assert left.shape == (6, 32, 32, 3)
    assert right.shape == (6, 32, 32, 3)
    assert set(np.unique(labels)) <= {-1.0, 1.0}


def test_sharded_train_step_runs_and_descends():
    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    cfg = TrainConfig(latent_dim=16, input_size=32, batch_size=8)
    state = init_train_state(cfg, mesh, seed=0)
    step = make_sharded_train_step(cfg, mesh)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    right = left + 0.01  # near-identical pairs, all labeled +1
    labels = jnp.ones(8, jnp.float32)
    state, loss0 = step(state, left, right, labels)
    for _ in range(3):
        state, loss = step(state, left, right, labels)
    assert float(loss) <= float(loss0) + 1e-3
    assert int(state.step) == 4


def test_bf16_backbone_train_step():
    """bfloat16 backbone compute (CLI --bf16): the step runs, the loss
    stays finite and descends, and PARAMS remain f32 (Flax param_dtype
    is independent of compute dtype), so checkpoints and the deployable
    export are f32 either way."""
    mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
    cfg = TrainConfig(latent_dim=16, input_size=32, batch_size=8,
                      dtype=jnp.bfloat16)
    state = init_train_state(cfg, mesh, seed=0)
    import jax

    leaves = jax.tree_util.tree_leaves(state.variables)
    assert all(l.dtype == jnp.float32 for l in leaves)

    step = make_sharded_train_step(cfg, mesh)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)), jnp.float32)
    right = left + 0.01
    labels = jnp.ones(8, jnp.float32)
    state, loss0 = step(state, left, right, labels)
    for _ in range(3):
        state, loss = step(state, left, right, labels)
    assert np.isfinite(float(loss))
    assert float(loss) <= float(loss0) + 1e-3
