"""Perceptual-hash tests — the reference's invariance suite
(src/image_hashes/phash.rs:24-88) on generated fixtures, plus batched-TPU
vs host agreement."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops.phash import (
    HASH_SIZE,
    pack_bits_lsb_first,
    phash,
    phash_batch_tpu,
)
from pixelbox_tpu.ops.oracle import hamming_distance_np
from pixelbox_tpu.ops.resample import resize_np, to_u8

from fixtures import flat_white, gradient_image, textured_image


def hamming(a, b):
    return float(hamming_distance_np(a, b))


class TestPackBits:
    def test_lsb_first(self):
        bits = np.zeros(16, dtype=np.uint8)
        bits[0] = 1   # LSB of byte 0
        bits[9] = 1   # bit 1 of byte 1
        out = pack_bits_lsb_first(bits)
        np.testing.assert_array_equal(out, [1, 2])

    def test_trailing_bits_dropped(self):
        bits = np.ones(13, dtype=np.uint8)
        out = pack_bits_lsb_first(bits)
        np.testing.assert_array_equal(out, [255])  # 13//8 = 1 byte


class TestPhashReferenceSuite:
    """Ports the invariance assertions of phash.rs:37-78."""

    def test_flat_white_is_all_zero(self):
        # Every pixel equals the mean, so no bit is strictly greater
        # (phash.rs:37-41: flat white → 32 zero bytes).
        h = phash(flat_white())
        np.testing.assert_array_equal(h, np.zeros(32, dtype=np.uint8))

    def test_identical_distance_zero(self):
        img = textured_image()
        assert hamming(phash(img), phash(img)) == 0.0

    def test_resize_invariance(self):
        img = textured_image()
        resized = to_u8(resize_np(img, 128, 128, "triangle"))
        assert hamming(phash(img), phash(resized)) < 0.1

    def test_crop_similarity(self):
        img = textured_image(size=(256, 256))
        cropped = img[8:248, 8:248]
        assert hamming(phash(img), phash(cropped)) < 0.5

    def test_dissimilar_images_far(self):
        a = phash(textured_image(seed=7))
        flat = phash(flat_white())
        assert hamming(a, flat) > 0.5

    def test_square_input_gives_32_bytes(self):
        assert phash(textured_image()).shape == (32,)


class TestAspectRatioCompat:
    def test_nonsquare_variable_length(self):
        # 200x300 fits to 11x16 (ratio-preserved) = 176 px → 22 bytes, the
        # reference's variable-length behavior (phash.rs:7-10).
        h = phash(gradient_image(), aspect_preserving=True)
        assert len(h) == (11 * 16) // 8

    def test_nonsquare_square_mode_fixed_length(self):
        h = phash(gradient_image(), aspect_preserving=False)
        assert h.shape == (32,)


class TestBatchedTpuPhash:
    def test_matches_host_square_mode(self):
        imgs = np.stack(
            [
                textured_image(seed=s, size=(128, 128))
                for s in (1, 2, 3, 4)
            ]
        )
        got = np.asarray(phash_batch_tpu(jnp.asarray(imgs)))
        assert got.shape == (4, 32)
        for i in range(4):
            expected = phash(imgs[i], aspect_preserving=False)
            # Bit-identical up to f32-vs-f64 resampling rounding at exact
            # threshold boundaries; allow a tiny bit-flip budget.
            assert hamming(got[i], expected) <= 2 / 256

    def test_flat_white_batch(self):
        imgs = np.stack([flat_white((64, 64))] * 2)
        got = np.asarray(phash_batch_tpu(jnp.asarray(imgs)))
        np.testing.assert_array_equal(got, np.zeros((2, 32), dtype=np.uint8))
