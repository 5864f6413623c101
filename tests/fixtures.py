"""Deterministic test images (the reference's test_resources/ directory is
referenced by its tests but absent from its repo — SURVEY.md §4; we ship
generated equivalents)."""

import numpy as np


def flat_white(size=(256, 256)):
    return np.full((*size, 3), 255, dtype=np.uint8)


def textured_image(seed=7, size=(256, 256)):
    """Smooth random texture — stable under resize, unlike white noise."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, size=(8, 8, 3))
    # Upsample with bilinear-ish smoothing via repeated doubling + averaging.
    img = small
    while img.shape[0] < size[0]:
        img = img.repeat(2, axis=0).repeat(2, axis=1)
        img = (
            img
            + np.roll(img, 1, axis=0)
            + np.roll(img, 1, axis=1)
            + np.roll(np.roll(img, 1, axis=0), 1, axis=1)
        ) / 4.0
    return np.clip(img[: size[0], : size[1]], 0, 255).astype(np.uint8)


def gradient_image(size=(200, 300)):
    h, w = size
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    r = np.broadcast_to(y, (h, w))
    g = np.broadcast_to(x, (h, w))
    b = (r + g) / 2
    return np.stack([r, g, b], axis=-1).astype(np.uint8)
