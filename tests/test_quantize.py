"""Bit-exactness tests for the u8 quantization (the parity anchor).

Golden values derive from the reference's Rust expression
``128u8.saturating_add_signed((f*128.0).max(-128.0).min(128.0) as i8)``
(reference src/image_hashes/efficientnet.rs:39) under Rust float→int cast
semantics (truncate toward zero, saturate, NaN→0).
"""

import numpy as np
import jax.numpy as jnp

from pixelbox_tpu.ops.quantize import (
    quantize_embedding,
    dequantize_embedding,
    center_u8,
    center_u8_i8,
)
from pixelbox_tpu.ops.oracle import quantize_embedding_np

# (input f32, expected u8) — hand-evaluated against the Rust semantics.
GOLDEN = [
    (1.0, 255),       # 128.0 clamps→128.0, as i8 saturates→127, 128+127
    (-1.0, 0),        # -128.0 → -128 → 0
    (0.0, 128),
    (0.5, 192),       # 64.0 → 64
    (-0.5, 64),       # -64.0 → -64
    (0.999, 255),     # 127.872 truncates → 127
    (-0.999, 1),      # -127.872 truncates toward zero → -127
    (0.0078125, 129), # exactly 1.0 → 1
    (0.005, 128),     # 0.64 truncates → 0
    (-0.005, 128),    # -0.64 truncates toward zero → 0
    (2.0, 255),       # 256 clamps → 128 → saturates 127
    (-2.0, 0),
    (float("inf"), 255),
    (float("-inf"), 0),
    (float("nan"), 128),  # Rust NaN as i8 → 0
    (0.9921875, 255),     # 127.0 exactly → 127
    (-0.9921875, 1),      # -127.0 → -127
]


def test_quantize_golden():
    x = jnp.array([v for v, _ in GOLDEN], dtype=jnp.float32)
    expected = np.array([e for _, e in GOLDEN], dtype=np.uint8)
    got = np.asarray(quantize_embedding(x))
    np.testing.assert_array_equal(got, expected)


def test_quantize_matches_numpy_oracle(rng):
    x = rng.normal(size=(4096,)).astype(np.float32) * 1.5
    x[:8] = [0.0, 1.0, -1.0, 1e-9, -1e-9, 100.0, -100.0, 0.25]
    got = np.asarray(quantize_embedding(jnp.asarray(x)))
    np.testing.assert_array_equal(got, quantize_embedding_np(x))


def test_quantize_monotonic(rng):
    """Quantization must be monotone non-decreasing in the input."""
    x = np.sort(rng.uniform(-1.2, 1.2, size=10000).astype(np.float32))
    q = np.asarray(quantize_embedding(jnp.asarray(x)))
    assert np.all(np.diff(q.astype(np.int32)) >= 0)


def test_dequantize_roundtrip_bounds():
    q = jnp.arange(256, dtype=jnp.uint8)
    x = np.asarray(dequantize_embedding(q))
    assert x[0] == -1.0 and x[255] == 1.0
    assert np.all(np.diff(x) > 0)


def test_centered_forms_consistent():
    q = jnp.arange(256, dtype=jnp.uint8)
    c = np.asarray(center_u8(q))
    np.testing.assert_array_equal(c, 2 * np.arange(256) - 255)
    c8 = np.asarray(center_u8_i8(q), dtype=np.int32)
    # 2q-255 == 2*(q-128) + 1
    np.testing.assert_array_equal(c, 2 * c8 + 1)
    # Dequantized value is exactly center/255.
    deq = np.asarray(dequantize_embedding(q))
    np.testing.assert_allclose(deq, c / 255.0, rtol=0, atol=1e-7)
