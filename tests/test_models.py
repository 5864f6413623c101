"""Embedder tests: stub determinism, EfficientNet architecture shape/parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixelbox_tpu.models import get_embedder
from pixelbox_tpu.models.efficientnet import (
    B0_CONFIG,
    EfficientNetEmbedderModule,
    HEAD_CHANNELS,
)

from fixtures import textured_image


class TestStub:
    def test_deterministic(self):
        e1 = get_embedder("stub", dim=32, seed=3)
        e2 = get_embedder("stub", dim=32, seed=3)
        img = textured_image(size=(64, 64))
        np.testing.assert_array_equal(e1.mlhash(img), e2.mlhash(img))

    def test_bounded_by_tanh(self):
        e = get_embedder("stub", dim=16)
        z = e.embed_images([textured_image(seed=s, size=(50, 50)) for s in range(3)])
        assert z.shape == (3, 16)
        assert np.all(np.abs(z) <= 1.0)

    def test_mlhash_is_u8(self):
        e = get_embedder("stub", dim=16)
        h = e.mlhash(textured_image(size=(40, 40)))
        assert h.dtype == np.uint8 and h.shape == (16,)


class TestEfficientNetArchitecture:
    @pytest.fixture(scope="class")
    def module_and_vars(self):
        m = EfficientNetEmbedderModule(latent_dim=8)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        return m, v

    def test_output_shape_and_tanh_bound(self, module_and_vars):
        m, v = module_and_vars
        out = m.apply(v, jnp.zeros((2, 64, 64, 3)))
        assert out.shape == (2, 8)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)

    def test_resolution_agnostic(self, module_and_vars):
        # Adaptive pooling means any input a multiple of 32 works.
        m, v = module_and_vars
        out = m.apply(v, jnp.zeros((1, 96, 96, 3)))
        assert out.shape == (1, 8)

    def test_parameter_count_matches_torchvision_features(self, module_and_vars):
        """torchvision efficientnet_b0 features has 4,007,548 params; ours
        must match exactly (same architecture), plus the 1280→8 head."""
        _, v = module_and_vars
        flat = jax.tree_util.tree_leaves(v["params"])
        total = sum(int(np.prod(p.shape)) for p in flat)
        head = 1280 * 8 + 8
        assert total == 4_007_548 + head

    def test_stage_structure(self):
        # 16 MBConv blocks in B0.
        assert sum(n for _, _, n, _, _ in B0_CONFIG) == 16
        assert HEAD_CHANNELS == 1280


class TestEfficientNetEmbedder:
    def test_embedder_end_to_end(self):
        e = get_embedder("efficientnet", dim=8, input_size=64)
        h = e.mlhash(textured_image(size=(80, 100)))
        assert h.shape == (8,) and h.dtype == np.uint8

    def test_batched_deterministic(self):
        e = get_embedder("efficientnet", dim=8, input_size=64, seed=1)
        imgs = [textured_image(seed=s, size=(64, 64)) for s in (1, 2)]
        a = e.mlhash_batch(imgs)
        b = e.mlhash_batch(imgs)
        np.testing.assert_array_equal(a, b)
