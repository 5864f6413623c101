"""Difference hash (dhash) — host + device batch paths."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops.phash import dhash, dhash_batch_tpu
from pixelbox_tpu.ops.oracle import hamming_distance_np

from fixtures import flat_white, gradient_image, textured_image


def hamming(a, b):
    return float(hamming_distance_np(a, b))


def test_shape():
    assert dhash(textured_image()).shape == (8,)


def test_flat_image_all_zero():
    # No gradients → no bits set.
    np.testing.assert_array_equal(dhash(flat_white()), np.zeros(8, np.uint8))


def test_horizontal_gradient_all_ones():
    img = gradient_image((64, 128))
    g = img.copy()
    g[:, :, 0] = g[:, :, 1]  # strictly increasing columns in every channel
    h = dhash(g)
    np.testing.assert_array_equal(h, np.full(8, 255, np.uint8))


def test_brightness_shift_invariance():
    img = textured_image(seed=3)
    brighter = np.clip(img.astype(np.int16) + 40, 0, 255).astype(np.uint8)
    assert hamming(dhash(img), dhash(brighter)) < 0.15


def test_resize_invariance():
    from pixelbox_tpu.ops.resample import resize_np, to_u8

    img = textured_image(seed=5)
    small = to_u8(resize_np(img, 96, 96, "triangle"))
    assert hamming(dhash(img), dhash(small)) < 0.15


def test_dissimilar_far():
    a = dhash(textured_image(seed=1))
    b = dhash(textured_image(seed=2))
    assert hamming(a, b) > 0.2


def test_batch_tpu_matches_host():
    imgs = np.stack([textured_image(seed=s, size=(96, 96)) for s in (1, 2, 3)])
    got = np.asarray(dhash_batch_tpu(jnp.asarray(imgs)))
    assert got.shape == (3, 8)
    for i in range(3):
        expected = dhash(imgs[i])
        assert hamming(got[i], expected) <= 2 / 64
