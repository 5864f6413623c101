"""Embedder input preprocessing — reference-compatible, batched on device.

The reference preprocess (src/image_hashes/efficientnet.rs:19-29):
``resize_to_fill(224, 224, Triangle)`` → RGB8 → NCHW f32 ``pixel/255``
(mean 0, std 1 — the commented-out ImageNet normalization is NOT applied).

TPU path: host decoders produce same-sized RGB batches (any size); the
cover-resize + center-crop is linear, so it compiles to two MXU matmuls
with host-precomputed triangle weights (see ``ops.resample``).  Output is
NHWC (the TPU-friendly conv layout; the Flax embedder consumes NHWC
directly — only the ONNX/torch reference used NCHW).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.resample import (
    resample_weights,
    resize_dimensions,
    resize_to_fill_np,
    to_u8,
)

MODEL_INPUT_SIZE = 224  # efficientnet.rs:6-7


def preprocess_host(
    img_rgb: np.ndarray, size: int = MODEL_INPUT_SIZE, exact: bool = False
) -> np.ndarray:
    """One image HxWx3 u8 → f32 [size, size, 3] in [0, 1] (reference semantics).

    Matches efficientnet.rs:19-29 except layout (HWC here, CHW there).
    Default path runs PIL's SIMD triangle resampler (same kernel family);
    ``exact=True`` uses the numpy matmul resampler that is bit-compatible
    with the device path's weights.
    """
    img = np.asarray(img_rgb)
    if exact:
        filled = to_u8(resize_to_fill_np(img, size, size, "triangle"))
    else:
        from pixelbox_tpu.ops.resample import resize_dimensions, resize_fast

        h, w = img.shape[:2]
        out_w, out_h = resize_dimensions(w, h, size, size, fill=True)
        big = resize_fast(img, out_w, out_h)
        x0 = (out_w - size) // 2
        y0 = (out_h - size) // 2
        filled = big[y0 : y0 + size, x0 : x0 + size]
    return filled.astype(np.float32) / np.float32(255.0)


def fill_resize_u8(img_rgb: np.ndarray, size: int = MODEL_INPUT_SIZE) -> np.ndarray:
    """Cover-resize + center-crop to a square u8 frame (PIL fast path).

    The turbo ingest pipeline's single host resize: the resulting frame is
    both the embedder input (÷255 on device) and the device-phash input.
    """
    return fill_resize_u8_with_big(img_rgb, size)[0]


def fill_resize_u8_with_big(
    img_rgb: np.ndarray, size: int = MODEL_INPUT_SIZE
) -> tuple:
    """Like :func:`fill_resize_u8` but also returns the pre-crop cover
    image (``big``, u8 [out_h, out_w, 3] with min(out_h, out_w) == size).

    ``big`` still shows the WHOLE image (the crop only trims the long
    axis), so ingest re-uses it as the source for the display thumbnail —
    one full-resolution resample per image instead of two
    (make_thumbnail(prescaled=big)).  The cropped frame is bit-identical
    to :func:`fill_resize_u8`'s by construction.
    """
    from pixelbox_tpu.ops.resample import resize_dimensions, resize_fast

    img = np.asarray(img_rgb)
    h, w = img.shape[:2]
    out_w, out_h = resize_dimensions(w, h, size, size, fill=True)
    big = resize_fast(img, out_w, out_h)
    x0 = (out_w - size) // 2
    y0 = (out_h - size) // 2
    return np.ascontiguousarray(big[y0 : y0 + size, x0 : x0 + size]), big


@lru_cache(maxsize=64)
def _fill_weights(h: int, w: int, size: int):
    """Weight matrices implementing cover-resize + center-crop for HxW → size²."""
    out_w, out_h = resize_dimensions(w, h, size, size, fill=True)
    wv = resample_weights(h, out_h, "triangle")  # [out_h, h]
    wh = resample_weights(w, out_w, "triangle")  # [out_w, w]
    y0 = (out_h - size) // 2
    x0 = (out_w - size) // 2
    return wv[y0 : y0 + size], wh[x0 : x0 + size]


@partial(jax.jit, static_argnames=())
def _preprocess_kernel(imgs_f32, wv, wh):
    out = jnp.einsum(
        "oh,bhwc,pw->bopc", wv, imgs_f32, wh, preferred_element_type=jnp.float32
    )
    out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)  # round back to u8 grid
    return out / jnp.float32(255.0)


def preprocess_batch_tpu(
    imgs_u8: jnp.ndarray, size: int = MODEL_INPUT_SIZE
) -> jnp.ndarray:
    """uint8 [B, H, W, 3] → f32 [B, size, size, 3] in [0, 1], on device."""
    b, h, w, c = imgs_u8.shape
    assert c == 3, imgs_u8.shape
    wv, wh = _fill_weights(h, w, size)
    return _preprocess_kernel(
        imgs_u8.astype(jnp.float32), jnp.asarray(wv), jnp.asarray(wh)
    )
