"""Distance-function parity tests.

Golden cases are ported from the reference's own unit tests
(src/engine.rs:693-708) plus broadened random agreement checks against the
numpy oracle.
"""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops.distances import (
    cosine_distance,
    byte_distance,
    hamming_distance,
    popcount_u8,
)
from pixelbox_tpu.ops import oracle


def u8(*vals):
    return jnp.array(vals, dtype=jnp.uint8)


class TestHammingGolden:
    """Exact values from reference engine.rs:694-700."""

    def test_all_bits_differ(self):
        assert float(hamming_distance(u8(0x00), u8(0xFF))) == 1.0

    def test_half_bits_differ(self):
        assert float(hamming_distance(u8(0x0F), u8(0xFF))) == 0.5

    def test_identical(self):
        assert float(hamming_distance(u8(0x00), u8(0x00))) == 0.0

    def test_alternating(self):
        assert float(hamming_distance(u8(0b10101010), u8(0b01010101))) == 1.0

    def test_multibyte_alternating(self):
        a = u8(0b10101010, 0b01010101)
        b = u8(0b01010101, 0b10101010)
        assert float(hamming_distance(a, b)) == 1.0

    def test_quarter(self):
        # 4 bits of 16 differ (engine.rs:700).
        assert float(hamming_distance(u8(0xFF, 0x0F), u8(0x0F, 0x0F))) == 0.25

    def test_wrap_u8_compat(self):
        # 32 fully-complementary bytes = 256 differing bits; the reference's
        # u8 accumulator wraps to 0 (engine.rs:603).
        a = jnp.zeros(32, dtype=jnp.uint8)
        b = jnp.full(32, 255, dtype=jnp.uint8)
        assert float(hamming_distance(a, b, wrap_u8=True)) == 0.0
        assert float(hamming_distance(a, b)) == 1.0


class TestCosineGolden:
    """Asserted bounds from reference engine.rs:703-708."""

    def test_identical_opposed_axes(self):
        assert float(cosine_distance(u8(255, 0), u8(255, 0))) < 1e-6
        assert float(cosine_distance(u8(0, 255), u8(0, 255))) < 1e-6

    def test_orthogonal_blows_up(self):
        assert float(cosine_distance(u8(255, 0), u8(0, 255))) > 2.0

    def test_identical_random(self, rng):
        v = jnp.asarray(rng.integers(0, 256, size=128, dtype=np.uint8))
        assert float(cosine_distance(v, v)) < 1e-6

    def test_anti_parallel_hits_floor(self):
        # cos = -1 → max(cos, 1e-6) = 1e-6 → dist = 1e6 - 1.
        d = float(cosine_distance(u8(255, 255), u8(0, 0)))
        assert abs(d - (1e6 - 1.0)) < 1.0

    def test_distance_nonnegative_for_aligned(self):
        # Identical vectors: cos may exceed 1 only by f32 rounding; distance
        # magnitude stays ~0.
        v = u8(*range(128))
        assert abs(float(cosine_distance(v, v))) < 1e-6


class TestByteDistance:
    def test_identical(self):
        assert float(byte_distance(u8(1, 2, 3), u8(1, 2, 3))) == 0.0

    def test_max(self):
        # l1/(255*2) = 1.0; canonical spec scales by the f32 reciprocal
        # (see distances.py), so compare to the oracle, and to the true
        # value within 1 ulp.
        got = float(byte_distance(u8(0, 0), u8(255, 255)))
        assert got == float(oracle.byte_distance_np(np.array([0, 0]), np.array([255, 255])))
        assert abs(got - 1.0) <= 2 ** -23

    def test_half(self):
        got = float(byte_distance(u8(0, 255), u8(255, 255)))
        assert abs(got - 0.5) <= 2 ** -24


def test_popcount_u8_all_bytes():
    x = jnp.arange(256, dtype=jnp.uint8)
    got = np.asarray(popcount_u8(x))
    expected = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
    np.testing.assert_array_equal(got, expected)


def test_random_agreement_with_oracle(rng):
    a = rng.integers(0, 256, size=(64, 128), dtype=np.uint8)
    b = rng.integers(0, 256, size=(64, 128), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(cosine_distance(jnp.asarray(a), jnp.asarray(b))),
        oracle.cosine_distance_np(a, b),
    )
    np.testing.assert_array_equal(
        np.asarray(byte_distance(jnp.asarray(a), jnp.asarray(b))),
        oracle.byte_distance_np(a, b),
    )
    np.testing.assert_array_equal(
        np.asarray(hamming_distance(jnp.asarray(a), jnp.asarray(b))),
        oracle.hamming_distance_np(a, b),
    )


def test_broadcast_query_against_rows(rng):
    q = rng.integers(0, 256, size=128, dtype=np.uint8)
    db = rng.integers(0, 256, size=(1000, 128), dtype=np.uint8)
    d = np.asarray(cosine_distance(jnp.asarray(q)[None, :], jnp.asarray(db)))
    assert d.shape == (1000,)
    np.testing.assert_array_equal(d, oracle.cosine_distance_np(q[None, :], db))
