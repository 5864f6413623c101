"""Reference-parity distance functions over u8 hash vectors.

The reference defines three distances over opaque u8 blobs
(src/engine.rs:572-604), registered as SQLite scalar UDFs and invoked once
per row during a full-table scan.  Here they are vectorized: every function
accepts ``a`` of shape ``[..., D]`` and ``b`` of shape ``[..., D]`` with
normal broadcasting, so a single query against N rows is
``cosine_distance(q[None, :], db[N, :]) -> [N]``.

Exactness strategy: the reference dequantizes each byte to f32 and folds
sequentially (engine.rs:575-588).  We instead compute the dot product and
squared magnitudes **exactly in int32** on centered integers ``2q - 255``
(a lossless integer scaling of the dequantized values — see
``ops.quantize.center_u8``) and perform only the final divide/sqrt in f32.
This is strictly more accurate than the reference's f32 fold and preserves
its top-k ordering; the values agree with the reference to f32 rounding.

Distance semantics (must match bit-for-bit in behavior):

- ``cosine_distance`` (engine.rs:572-588): dist = 1/max(cos, 1e-6) - 1
  (reciprocal form, NOT 1-cos): 0 for identical, ~1e6 for orthogonal or
  anti-parallel; returns 0.0 when the magnitude product (in dequantized
  scale) is below 1e-6.
- ``byte_distance`` (engine.rs:590-592): L1 / (255 * D).
- ``hamming_distance`` (engine.rs:594-604): popcount(xor) / (8 * D).  The
  reference accumulates per-byte popcounts in a u8, so totals wrap mod 256
  for hashes with >255 differing bits; pass ``wrap_u8=True`` to replicate
  that overflow exactly (the default computes the non-overflowing value).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pixelbox_tpu.ops.quantize import center_u8

# The reference's guards (engine.rs:582-587).
_MAGNITUDE_EPS = 1e-6
_COSINE_FLOOR = 1e-6


def rsqrt_spec(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical reciprocal square root: ``fl(1.0 / fl(sqrt(x)))``.

    Both ops are correctly rounded on CPU (and in numpy / C++), so every
    implementation agrees bit-for-bit.  The ``optimization_barrier`` is
    load-bearing: XLA rewrites ``divide(1, sqrt(x))`` into its ``rsqrt``
    primitive even with fast-math disabled (measured: 59k/204k last-ulp
    mismatches vs numpy over the integer-moment domain), and the barrier
    is the supported way to pin the as-written composition.
    """
    return jnp.float32(1.0) / jax.lax.optimization_barrier(jnp.sqrt(x))


@jax.jit
def cosine_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reciprocal cosine distance over u8 vectors (engine.rs:572-588).

    Shapes broadcast over leading dims; reduces the last axis.

    Jitted deliberately: constant divisors must stay compile-time literals —
    XLA's eager/dynamic f32 division can take a 1-ulp-off reciprocal path,
    while division by a literal is exact.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ca = center_u8(a)
    cb = center_u8(b)
    # Exact int32 accumulations (D*255^2 fits comfortably for D <= 2^15).
    dot = jnp.sum(ca * cb, axis=-1)
    mag2_a = jnp.sum(ca * ca, axis=-1)
    mag2_b = jnp.sum(cb * cb, axis=-1)
    return _cosine_distance_from_moments(
        dot.astype(jnp.float32),
        mag2_a.astype(jnp.float32),
        mag2_b.astype(jnp.float32),
    )


def _cosine_distance_from_moments(
    dot_c: jnp.ndarray, mag2_a_c: jnp.ndarray, mag2_b_c: jnp.ndarray
) -> jnp.ndarray:
    """Finalize the reciprocal cosine distance from centered-integer moments.

    Arguments are f32 copies of the exact int32 moments over centered values
    ``2q-255`` (i.e. 255× the dequantized values, so dot_c = 255^2 * dot_deq).
    Shared by the jnp scan, the Pallas kernel epilogue, the C++ CPU scan,
    and the oracle.

    Canonical rounding spec (v2, separable magnitudes):

        cos  = fl(dot_c · fl(rsqrt_spec(m2a) · rsqrt_spec(m2b)))
        dist = fl(1 / max(cos, 1e-6)) − 1        (the −1 is EXACT in f32
                                                  for any x ≥ 1, so the
                                                  fl(1/g) plateaus define
                                                  the tie groups)

    The separable form lets device scans PRECOMPUTE ``rsqrt_spec(m2_row)``
    per index row (cached meta), turning the per-element epilogue into two
    multiplies plus one divide — no sqrt in the hot loop.  Every op is
    correctly rounded on CPU (with the harness's fast-math-off flag), so
    numpy/C++/XLA stay bit-identical; on TPU values may drift by hardware
    sqrt/div ulps exactly as under the v1 (single-sqrt) spec.  (The
    reference's own f32 fold order is unreproducible on any vector
    hardware; parity is defined against the exact-integer oracle, which
    this is.)

    Zero-magnitude guard (engine.rs:582-584): the reference returns 0.0
    when ``mag = sqrt(m2a·m2b)/255² < 1e-6``.  The moments are integers,
    so that condition is EXACTLY ``m2a·m2b == 0`` (the smallest nonzero
    product gives mag ≥ 1/65025 > 1e-6), which is how it is evaluated
    here — no magnitude product needed.
    """
    # cos = dot_deq / (|a|·|b|) — the 255^2 scales cancel.  Constant
    # divisions elsewhere in this codebase are multiplies by the
    # f32-rounded reciprocal (XLA rewrites them that way regardless of
    # flags; the spec bakes the rewrite in).
    inv = rsqrt_spec(mag2_a_c) * rsqrt_spec(mag2_b_c)
    cos = dot_c * inv
    dist = jnp.float32(1.0) / jnp.maximum(cos, jnp.float32(_COSINE_FLOOR)) - jnp.float32(1.0)
    # Rounding guards (both part of the spec): true cos never exceeds 1
    # (Cauchy-Schwarz), so negative dist is pure rsqrt/divide noise —
    # clamp it; and IDENTICAL vectors (⟺ dot == m2a == m2b, the C-S
    # equality case) score exactly 0 like the v1 single-sqrt spec did,
    # instead of ±1 ulp of it.  The equality is evaluated on the F32
    # MOMENT COPIES every implementation shares: exact for dim ≤ 258
    # (moments < 2^24 — covers the shipped 128/256 widths); above that,
    # distinct near-identical vectors whose moments alias in f32 also
    # pin to 0 — consistently across oracle/XLA/kernel/C++.
    dist = jnp.maximum(dist, jnp.float32(0.0))
    ident = (dot_c == mag2_a_c) & (mag2_a_c == mag2_b_c)
    zero = (mag2_a_c == jnp.float32(0.0)) | (mag2_b_c == jnp.float32(0.0))
    return jnp.where(ident | zero, jnp.float32(0.0), dist)


@jax.jit
def byte_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Normalized L1 distance: sum |a-b| / (255 * D) (engine.rs:590-592)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    d = a.shape[-1]
    l1 = jnp.sum(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)), axis=-1)
    # Multiply-by-reciprocal is the canonical constant-scale spec (see
    # _cosine_distance_from_moments).
    return l1.astype(jnp.float32) * jnp.float32(1.0 / (255.0 * d))


def popcount_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Per-byte popcount of a u8 array, as int32 (SWAR nibble trick)."""
    x = x.astype(jnp.int32)
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return (x + (x >> 4)) & 0x0F


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Per-word popcount of a uint32 array, as uint32 (SWAR).

    Processing the hash 4 bytes at a time quarters the VPU op count of the
    Hamming scan; see :func:`xor_popcount_bits`.
    """
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (
        (x & jnp.uint32(0xFF))
        + ((x >> 8) & jnp.uint32(0xFF))
        + ((x >> 16) & jnp.uint32(0xFF))
        + (x >> 24)
    )


def pack_u8_words(x: jnp.ndarray) -> jnp.ndarray:
    """u8 [..., H] → uint32 [..., H/4] (little-endian word packing).

    Requires H % 4 == 0; xor distributes over the packing, so Hamming
    distances computed on words equal those computed on bytes.
    """
    h = x.shape[-1]
    assert h % 4 == 0, h
    grouped = x.reshape(x.shape[:-1] + (h // 4, 4))
    return jax.lax.bitcast_convert_type(grouped, jnp.uint32)


def xor_popcount_bits(a_words: jnp.ndarray, b_words: jnp.ndarray) -> jnp.ndarray:
    """Total differing bits between word-packed hashes, int32, last axis."""
    return jnp.sum(
        popcount_u32(jnp.bitwise_xor(a_words, b_words)), axis=-1
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("wrap_u8",))
def hamming_distance(
    a: jnp.ndarray, b: jnp.ndarray, *, wrap_u8: bool = False
) -> jnp.ndarray:
    """Normalized Hamming distance: popcount(a^b) / (8*D) (engine.rs:594-604).

    ``wrap_u8=True`` replicates the reference's u8 accumulator overflow
    (engine.rs:603 sums per-byte popcounts into a u8, wrapping mod 256 when
    hashes differ in more than 255 bits — e.g. two fully-complementary
    32-byte phashes "measure" distance 0.0).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    d = a.shape[-1]
    bits = jnp.sum(popcount_u8(jnp.bitwise_xor(a, b)), axis=-1)
    if wrap_u8:
        bits = bits % 256
    return bits.astype(jnp.float32) * jnp.float32(1.0 / (8.0 * d))
