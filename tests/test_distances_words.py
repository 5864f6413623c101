"""Word-packed SWAR popcount equivalence."""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops.distances import (
    pack_u8_words,
    popcount_u32,
    xor_popcount_bits,
    popcount_u8,
)


def test_popcount_u32_random(rng):
    x = rng.integers(0, 2**32, size=512, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(popcount_u32(jnp.asarray(x)))
    exp = np.array([bin(int(v)).count("1") for v in x], dtype=np.uint32)
    np.testing.assert_array_equal(got, exp)


def test_word_and_byte_paths_agree(rng):
    a = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
    b = rng.integers(0, 256, size=(64, 32), dtype=np.uint8)
    byte_bits = np.asarray(
        jnp.sum(popcount_u8(jnp.bitwise_xor(jnp.asarray(a), jnp.asarray(b))), axis=-1)
    )
    word_bits = np.asarray(
        xor_popcount_bits(pack_u8_words(jnp.asarray(a)), pack_u8_words(jnp.asarray(b)))
    )
    np.testing.assert_array_equal(byte_bits, word_bits)


def test_pack_shape():
    x = jnp.zeros((5, 32), jnp.uint8)
    assert pack_u8_words(x).shape == (5, 8)
