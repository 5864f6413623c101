"""Perceptual hash (mean-threshold 16×16) — host path + batched TPU path.

Algorithm (reference src/image_hashes/phash.rs:3-22):

1. aspect-preserving resize to fit 16×16 with the Gaussian filter;
2. grayscale;
3. mean over pixels — with a FIXED 256 divisor (phash.rs:10), so non-square
   images (fewer than 256 pixels after the aspect-preserving fit)
   underestimate the mean and yield a shorter, biased hash;
4. per-pixel bit = (pixel > mean), packed LSB-first into len/8 bytes
   (32 bytes for square inputs).

``phash`` replicates all of that, including the variable-length
aspect-ratio behavior, behind ``aspect_preserving=True`` (the compat
default).  ``aspect_preserving=False`` resizes to exactly 16×16 (square
hash for every input) — the recommended mode for new indexes since hashes
stay fixed-width and unbiased; it is also what the batched TPU path
computes.

``phash_batch_tpu`` is the ingest hot path: a whole batch of same-sized
images is hashed on device with two MXU matmuls (the separable Gaussian
resize — see ``ops.resample``), a luma projection, mean-threshold, and an
LSB-first bit-pack matmul.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.resample import (
    SRGB_LUMA,
    box_downsample_np,
    grayscale_np,
    resample_weights,
    resize_dimensions,
    resize_native,
    resize_np,
    to_u8,
)

HASH_SIZE = 16  # 16x16 = 256 bits = 32 bytes (phash.rs:4-5)


def pack_bits_lsb_first(bits: np.ndarray) -> np.ndarray:
    """Pack a flat 0/1 array LSB-first into bytes (phash.rs:11-20).

    Trailing bits that don't fill a byte are DROPPED (len/8 floor), like the
    reference.
    """
    bits = np.asarray(bits).astype(np.uint8).ravel()
    n_bytes = len(bits) // 8
    if n_bytes == 0:
        return np.zeros(0, dtype=np.uint8)
    b = bits[: n_bytes * 8].reshape(n_bytes, 8)
    return np.packbits(b, axis=-1, bitorder="little").ravel()


def phash(
    img_rgb: np.ndarray, aspect_preserving: bool = True, fast: bool = True
) -> np.ndarray:
    """Perceptual hash of one RGB image (HxWx3 uint8) → uint8 bytes.

    aspect_preserving=True replicates the reference exactly (variable-length
    hash + fixed-256 mean divisor for non-square images).

    fast=True box-prefilters large images by an integer factor before the
    Gaussian resample (≈50× cheaper on megapixel inputs, hash bits
    unchanged in practice since a 16-px Gaussian already averages huge
    windows); fast=False runs the direct dense resample.
    """
    img = np.asarray(img_rgb)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    if aspect_preserving:
        out_w, out_h = resize_dimensions(w, h, HASH_SIZE, HASH_SIZE, fill=False)
    else:
        out_w, out_h = HASH_SIZE, HASH_SIZE
    small_u8 = None
    if fast:
        # Box-prefilter only pays off above ~2MP (numpy mean temporaries
        # cost more than the tensordot resample below that).
        factor = max(1, min(h, w) // 1024)
        if factor >= 2:
            img = box_downsample_np(img, factor)
        elif img.dtype == np.uint8:
            # Sub-2MP u8 input (the ingest hot path: native decode DCT-
            # scales JPEGs to min-dim >=448): the C++ separable gaussian
            # resample shares resample_weights' definition and the same
            # round-half-away u8 output as to_u8(resize_np(...)) — only
            # f32 accumulation order differs (ulp-level, within the
            # cross-path hash tolerance the batched TPU path already has).
            small_u8 = resize_native(img, out_w, out_h, "gaussian")
    if small_u8 is None:
        # The reference resizes u8→u8 (rounded) then grayscales u8→u8
        # (rounded).
        small_u8 = to_u8(resize_np(img, out_w, out_h, "gaussian"))
    grey = to_u8(grayscale_np(small_u8))
    flat = grey.ravel().astype(np.uint64)
    # Fixed 256 divisor regardless of actual pixel count (phash.rs:10),
    # with integer (floor) division like the Rust u64 division.
    mean = np.uint8(flat.sum() // np.uint64(HASH_SIZE * HASH_SIZE))
    return pack_bits_lsb_first(flat > mean)


def dhash(img_rgb: np.ndarray, fast: bool = True) -> np.ndarray:
    """Difference hash: 8 bytes (64 bits) of horizontal gradient signs.

    Classic dHash: resize to 9×8 grayscale (triangle filter), bit[i,j] =
    px[i,j] < px[i,j+1], packed LSB-first row-major.  The BASELINE's
    perceptual-hash config names phash/dhash; the reference ships only
    phash — dhash complements it (robust to uniform brightness shifts,
    which flip mean-threshold phash bits).
    """
    img = np.asarray(img_rgb)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    small_u8 = None
    if fast:
        h, w = img.shape[:2]
        factor = max(1, min(h, w) // 1024)
        if factor >= 2:
            img = box_downsample_np(img, factor)
        elif img.dtype == np.uint8:
            small_u8 = resize_native(img, 9, 8, "triangle")
    if small_u8 is None:
        small_u8 = to_u8(resize_np(img, 9, 8, "triangle"))  # [8 rows, 9 cols]
    grey = grayscale_np(small_u8)
    bits = (grey[:, :-1] < grey[:, 1:]).astype(np.uint8)  # [8, 8]
    return pack_bits_lsb_first(bits.ravel())


@lru_cache(maxsize=64)
def _dhash_resize_weights(h: int, w: int):
    return (
        resample_weights(h, 8, "triangle"),  # [8, H]
        resample_weights(w, 9, "triangle"),  # [9, W]
    )


@partial(jax.jit, static_argnames=())
def _dhash_batch_kernel(imgs_f32, wv, wh, pack):
    small = jnp.einsum(
        "oh,bhwc,pw->bopc", wv, imgs_f32, wh, preferred_element_type=jnp.float32
    )
    small = jnp.clip(jnp.floor(small + 0.5), 0.0, 255.0)
    grey = small @ jnp.asarray(SRGB_LUMA)          # [B, 8, 9]
    bits = (grey[:, :, :-1] < grey[:, :, 1:]).astype(jnp.float32)
    packed = bits.reshape(bits.shape[0], 64) @ pack
    return packed.astype(jnp.uint8)


@lru_cache(maxsize=2)
def _dhash_pack_matrix():
    m = np.zeros((64, 8), dtype=np.float32)
    for i in range(64):
        m[i, i // 8] = float(1 << (i % 8))
    return m


def dhash_batch_tpu(imgs_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, H, W, 3] → uint8 [B, 8] difference hashes on device."""
    b, h, w, c = imgs_u8.shape
    assert c == 3, imgs_u8.shape
    wv, wh = _dhash_resize_weights(h, w)
    return _dhash_batch_kernel(
        imgs_u8.astype(jnp.float32), jnp.asarray(wv), jnp.asarray(wh),
        jnp.asarray(_dhash_pack_matrix()),
    )


# --------------------------------------------------------------------- #
# Batched TPU path


@lru_cache(maxsize=64)
def _phash_resize_weights(h: int, w: int):
    wv = resample_weights(h, HASH_SIZE, "gaussian")  # [16, H]
    wh = resample_weights(w, HASH_SIZE, "gaussian")  # [16, W]
    return wv, wh


@lru_cache(maxsize=8)
def _bit_pack_matrix():
    """[256, 32] matrix M with M[i, i//8] = 1<<(i%8): bits @ M packs LSB-first."""
    m = np.zeros((HASH_SIZE * HASH_SIZE, HASH_SIZE * HASH_SIZE // 8), dtype=np.float32)
    for i in range(HASH_SIZE * HASH_SIZE):
        m[i, i // 8] = float(1 << (i % 8))
    return m


@partial(jax.jit, static_argnames=())
def _phash_batch_kernel(imgs_f32, wv, wh, pack):
    # imgs_f32: [B, H, W, 3] in 0..255
    small = jnp.einsum(
        "oh,bhwc,pw->bopc", wv, imgs_f32, wh, preferred_element_type=jnp.float32
    )
    small = jnp.clip(jnp.floor(small + 0.5), 0.0, 255.0)
    grey = small @ jnp.asarray(SRGB_LUMA)
    grey = jnp.clip(jnp.floor(grey + 0.5), 0.0, 255.0)  # [B, 16, 16]
    flat = grey.reshape(grey.shape[0], -1)  # [B, 256]
    mean = jnp.floor(jnp.sum(flat, axis=1, keepdims=True) / (HASH_SIZE * HASH_SIZE))
    bits = (flat > mean).astype(jnp.float32)
    packed = bits @ pack  # [B, 32]
    return packed.astype(jnp.uint8)


def phash_batch_tpu(imgs_u8: jnp.ndarray) -> jnp.ndarray:
    """Hash a batch of same-sized RGB images on device.

    imgs_u8: uint8 [B, H, W, 3] → uint8 [B, 32].  Square-resize mode
    (aspect_preserving=False); bit-compatible with
    ``phash(img, aspect_preserving=False)`` up to f32 summation order at
    exact threshold boundaries.
    """
    b, h, w, c = imgs_u8.shape
    assert c == 3, imgs_u8.shape
    wv, wh = _phash_resize_weights(h, w)
    return _phash_batch_kernel(
        imgs_u8.astype(jnp.float32), jnp.asarray(wv), jnp.asarray(wh),
        jnp.asarray(_bit_pack_matrix()),
    )
