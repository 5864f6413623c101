"""Bit-exact u8 embedding quantization.

The reference quantizes each f32 embedding component to a byte via

    128u8.saturating_add_signed((f*128.0).max(-128.0).min(128.0) as i8)

(reference src/image_hashes/efficientnet.rs:39).  Rust's ``as i8`` float→int
cast truncates toward zero, saturates to [-128, 127], and maps NaN to 0, so
the full mapping is::

    q(f) = 128 + clamp(trunc(clamp(f*128, -128, 128)), -128, 127)   (NaN → 128)

e.g. +1.0 → 255, -1.0 → 0, 0.0 → 128, 0.999 → 255 (127.87 truncates to 127).

``quantize_embedding`` replicates this exactly; it is the parity anchor for
recall@k equivalence against the reference CPU scan (BASELINE.json north star:
"recall@k must match the reference bit-for-bit at equal memory via identical
u8 quantization").

Dequantization matches the reference's distance-side mapping
``(v/255)*2 - 1`` (reference src/engine.rs:575-577).
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_embedding(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize f32 embeddings to u8, bit-exact with the reference Rust cast.

    Works on any shape; elementwise.  Input may be any float dtype (computed
    in f32, matching the reference's f32 arithmetic).
    """
    xf = x.astype(jnp.float32)
    scaled = jnp.clip(xf * jnp.float32(128.0), -128.0, 128.0)
    # Rust `as i8`: truncate toward zero, saturate, NaN→0.
    as_i8 = jnp.clip(jnp.trunc(scaled), -128.0, 127.0)
    as_i8 = jnp.where(jnp.isnan(xf), jnp.float32(0.0), as_i8)
    return (as_i8 + jnp.float32(128.0)).astype(jnp.uint8)


def dequantize_embedding(q: jnp.ndarray) -> jnp.ndarray:
    """Map u8 back to [-1, 1] floats: ``(q/255)*2 - 1`` (engine.rs:575-577)."""
    return (q.astype(jnp.float32) / jnp.float32(255.0)) * jnp.float32(2.0) - jnp.float32(1.0)


def center_u8(q: jnp.ndarray) -> jnp.ndarray:
    """Map u8 → int32 ``2*q - 255`` (an exact integer multiple of the
    dequantized value: ``dequantize(q) == center_u8(q) / 255``).

    All integer-exact distance kernels operate on this centered form; the
    255 scale cancels in cosine similarity and is divided out once for
    byte/L1 distances.
    """
    return 2 * q.astype(jnp.int32) - 255


def center_u8_i8(q: jnp.ndarray) -> jnp.ndarray:
    """Map u8 → int8 by subtracting 128 (``q - 128`` in [-128, 127]).

    This is the storage form used by the MXU scan kernels: int8×int8→int32
    matmuls run on the MXU at full rate, and the exact centered dot product
    is recovered with per-row affine corrections::

        sum(ca*cb) = 4*dot_i8(a', b') + 2*(s(a') + s(b')) + D
        where x' = x - 128, ca = 2a-255 = 2x' + 1, s(x') = sum(x')
    """
    return (q.astype(jnp.int32) - 128).astype(jnp.int8)
