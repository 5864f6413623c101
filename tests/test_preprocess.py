"""Preprocess + resample geometry tests."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops.preprocess import preprocess_batch_tpu, preprocess_host
from pixelbox_tpu.ops.resample import (
    resample_weights,
    resize_dimensions,
    resize_np,
    resize_to_fill_np,
)

from fixtures import gradient_image, textured_image


class TestResizeDimensions:
    def test_fit_within(self):
        # 300x200 → fit 16x16: ratio min(16/300,16/200)=16/300 → (16, 11)
        assert resize_dimensions(300, 200, 16, 16, fill=False) == (16, 11)

    def test_fill_cover(self):
        # 300x200 → cover 224: ratio max → 224/200 → (336, 224)
        assert resize_dimensions(300, 200, 224, 224, fill=True) == (336, 224)

    def test_square_identity_ratio(self):
        assert resize_dimensions(512, 512, 16, 16, fill=False) == (16, 16)

    def test_min_one(self):
        assert resize_dimensions(10000, 10, 16, 16, fill=False)[1] >= 1


class TestResampleWeights:
    def test_rows_sum_to_one(self):
        for n_in, n_out, f in [(256, 16, "gaussian"), (100, 224, "triangle")]:
            w = resample_weights(n_in, n_out, f)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)

    def test_identity_upscale_triangle_center(self):
        # Triangle filter at same size is identity.
        w = resample_weights(64, 64, "triangle")
        np.testing.assert_allclose(w, np.eye(64), atol=1e-6)

    def test_downscale_flat_preserved(self):
        img = np.full((128, 128), 77.0, dtype=np.float32)
        out = resize_np(img, 16, 16, "gaussian")
        np.testing.assert_allclose(out, 77.0, atol=1e-3)


class TestResizeToFill:
    def test_output_shape(self):
        img = gradient_image((200, 300))
        out = resize_to_fill_np(img, 224, 224)
        assert out.shape == (224, 224, 3)

    def test_no_distortion_beyond_crop(self):
        # A horizontal gradient covered to square keeps monotone columns.
        img = gradient_image((100, 400))
        out = resize_to_fill_np(img, 64, 64)
        g = out[:, :, 1]
        assert np.all(np.diff(g.mean(axis=0)) > 0)


class TestPreprocess:
    def test_host_shape_and_range(self):
        img = textured_image(size=(150, 210))
        out = preprocess_host(img)
        assert out.shape == (224, 224, 3)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_fast_and_exact_paths_agree(self):
        img = textured_image(size=(150, 210))
        fast = preprocess_host(img)
        exact = preprocess_host(img, exact=True)
        # PIL triangle vs matmul triangle: same kernel family, u8-grid
        # rounding differences only.
        np.testing.assert_allclose(fast, exact, atol=2 / 255.0 + 1e-6)

    def test_batch_tpu_matches_host(self):
        imgs = np.stack([textured_image(seed=s, size=(120, 160)) for s in (1, 2)])
        got = np.asarray(preprocess_batch_tpu(jnp.asarray(imgs), size=64))
        # exact=True: the matmul path shares weights with the device path.
        exp = np.stack([preprocess_host(im, 64, exact=True) for im in imgs])
        # Same weights; f32 einsum vs numpy f64 path — tiny tolerance, and
        # both round back to the same u8 grid almost everywhere.
        assert np.mean(np.abs(got - exp) > 1e-6) < 0.01
        np.testing.assert_allclose(got, exp, atol=1 / 255.0 + 1e-6)
