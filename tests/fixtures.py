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


def face_image(
    size=(256, 256),
    face_frac=0.5,
    center=None,
    person=0,
    bg_seed=11,
    bg="textured",
):
    """Deterministic frontal "face" for detector/identity tests.

    ``person`` selects stable identity parameters (skin tone, eye spacing,
    mouth width, per-person texture) so same-person crops embed closer
    than different-person crops under any pixel-based embedder.
    Returns (image u8 HxWx3, (x0, y0, x1, y1) normalized face box).
    """
    h, w = size
    if bg == "textured":
        m = max(h, w)  # textured_image grows square; crop to (h, w)
        img = (
            textured_image(seed=bg_seed, size=(m, m))[:h, :w].astype(np.float32)
            / 255.0
        )
    elif bg == "flat":
        img = np.full((h, w, 3), 0.35, dtype=np.float32)
    else:
        raise ValueError(bg)
    cy, cx = center if center is not None else (h / 2, w / 2)
    s = face_frac * min(h, w)

    prng = np.random.default_rng(1000 + person)
    skin = 0.66 + 0.10 * prng.uniform()
    eye_dx = (0.15 + 0.05 * prng.uniform()) * s
    eye_r = (0.055 + 0.015 * prng.uniform()) * s
    mouth_hw = (0.14 + 0.08 * prng.uniform()) * s
    tex = prng.uniform(-0.03, 0.03, size=(h, w))

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # Head: ellipse filling the face box.
    head = ((xx - cx) / (0.46 * s)) ** 2 + ((yy - cy) / (0.55 * s)) ** 2 <= 1.0
    shade = 1.0 - 0.08 * ((yy - cy) / s)  # slight top-lit shading
    for c, tint in enumerate((1.0, 0.86, 0.72)):  # skin-ish RGB ratios
        ch = img[..., c]
        ch[head] = np.clip((skin * tint) * shade[head] + tex[head], 0, 1)

    def dark_ellipse(ecy, ecx, ry, rx, value):
        m = ((xx - ecx) / rx) ** 2 + ((yy - ecy) / ry) ** 2 <= 1.0
        img[m] = value

    eye_y = cy - 0.10 * s
    dark_ellipse(eye_y, cx - eye_dx, eye_r, eye_r * 1.25, 0.12)
    dark_ellipse(eye_y, cx + eye_dx, eye_r, eye_r * 1.25, 0.12)
    # Nose: slightly brighter strip between/below the eyes.
    nose = (
        (np.abs(xx - cx) < 0.045 * s)
        & (yy > eye_y - 0.05 * s)
        & (yy < cy + 0.16 * s)
        & head
    )
    img[nose] = np.clip(img[nose] * 1.12, 0, 1)
    # Mouth: dark bar in the lower face.
    dark_ellipse(cy + 0.32 * s, cx, 0.035 * s, mouth_hw, 0.22)

    box = (
        (cx - 0.5 * s) / w,
        (cy - 0.5 * s) / h,
        (cx + 0.5 * s) / w,
        (cy + 0.5 * s) / h,
    )
    return (img * 255).astype(np.uint8), box


def gradient_image(size=(200, 300)):
    h, w = size
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    r = np.broadcast_to(y, (h, w))
    g = np.broadcast_to(x, (h, w))
    b = (r + g) / 2
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


SCENE_COLORS = {
    "red": (220, 40, 30),
    "green": (40, 200, 60),
    "blue": (40, 70, 220),
    "yellow": (230, 210, 40),
}
SCENE_SHAPES = ("circle", "square", "triangle", "stripes")


def captioned_scene(shape, color, size=(64, 64), seed=0):
    """Procedural (image, caption) pair for text→image retrieval tests.

    Draws one colored shape on a gray background with a little seed-keyed
    jitter (position/scale/noise) so each class has visual variants.
    Caption: "a <color> <shape>".
    """
    h, w = size
    rng = np.random.default_rng(hash((shape, color, seed)) % (2**32))
    img = np.full((h, w, 3), 110, dtype=np.float32)
    img += rng.normal(0, 6, size=(h, w, 3))
    cy = h / 2 + rng.uniform(-0.08, 0.08) * h
    cx = w / 2 + rng.uniform(-0.08, 0.08) * w
    r = (0.28 + rng.uniform(-0.04, 0.04)) * min(h, w)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    if shape == "circle":
        m = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
    elif shape == "square":
        m = (np.abs(xx - cx) <= r) & (np.abs(yy - cy) <= r)
    elif shape == "triangle":
        m = (yy >= cy - r) & (np.abs(xx - cx) <= (yy - (cy - r)) / 2.0)
        m &= yy <= cy + r
    elif shape == "stripes":
        m = ((xx + yy) // max(2, int(r / 2))) % 2 == 0
    else:
        raise ValueError(shape)
    for c, v in enumerate(SCENE_COLORS[color]):
        ch = img[..., c]
        ch[m] = v + rng.normal(0, 4)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img, f"a {color} {shape}"


def captioned_corpus(variants=3, size=(64, 64)):
    """All shape×color classes × ``variants`` seeds → [(image, caption)]."""
    return [
        (captioned_scene(s, c, size=size, seed=v))
        for s in SCENE_SHAPES
        for c in SCENE_COLORS
        for v in range(variants)
    ]
