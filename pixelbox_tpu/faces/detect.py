"""Built-in frontal-face detector: multi-scale integral-image rules.

A hand-designed mini-cascade of the same bright/dark rectangle contrasts
a Viola–Jones cascade learns first (the eye band is darker than the
cheeks and forehead; the nose bridge is brighter than the eyes; the mouth
is darker than the cheeks), evaluated over an image pyramid with one
integral image per scale — every rule is four adds per window, fully
vectorized over all window positions at once.  Candidates then pass a
normalized-correlation check against a procedural average-face template
(one small matmul, the OCR module's classification pattern) and NMS.

Scope, honestly: this detects clear, roughly upright frontal faces — the
class the hand rules encode — and is the zero-dependency default.  For
production-grade detection (profiles, occlusion, small faces) plug in any
user ONNX detector via ``faces.onnx_detector.OnnxFaceDetector``; the rest
of the pipeline (crop → embed → packed device index → exact scan) is
identical.  The reference never built any of this (README.md:33 TODO).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np


class FaceBox(NamedTuple):
    """Face bounding box in NORMALIZED image coordinates ([0, 1])."""

    x0: float
    y0: float
    x1: float
    y1: float
    score: float


#: Canonical detection window (pixels, per pyramid level).
WINDOW = 24
#: Rule regions in window units: (r0, r1, c0, c1), end-exclusive.
_EYE_L = (7, 12, 3, 10)
_EYE_R = (7, 12, 14, 21)
_BRIDGE = (7, 12, 10, 14)
_CHEEK_L = (13, 18, 3, 10)
_CHEEK_R = (13, 18, 14, 21)
_FOREHEAD = (2, 6, 4, 20)
_MOUTH = (18, 23, 7, 17)

#: Minimum brightness margin (in [0,1] gray units) each dark/bright rule
#: must clear.  Smooth textures produce region-mean differences well
#: under this; faces produce 0.1+.
MARGIN = 0.05
#: Eye-symmetry cap: |mean(eyeL) − mean(eyeR)| must stay under this.
SYMMETRY = 0.12
#: Window standard-deviation floor (flat regions cannot be faces).
MIN_STD = 0.05
#: Normalized-correlation floor against the procedural face template.
#: Measured separation on the fixture corpus: real frontal faces ≥ 0.47,
#: textured/noise false candidates ≤ 0.39.
MIN_TEMPLATE_NCC = 0.42
#: Combined (rules + NCC) score floor — the second independent gate
#: (faces ≥ 1.15, best surviving non-face candidates ≤ 0.93 measured).
MIN_TOTAL_SCORE = 1.0
#: Blob-refinement gates: pupils and mouth are the darkest structures in
#: a frontal face — each eye region's MINIMUM must sit at least this far
#: below the cheek mean (and the mouth region's minimum 0.3 below).
#: Measured: faces ≥ 0.49 eye depth / 0.39 mouth; the best texture false
#: candidates reach 0.31 / 0.32.  Region means alone can't see this
#: (smooth gradients mimic the means, not the dark blob).
EYE_DEPTH = 0.35
MOUTH_DEPTH = 0.30
#: Max row misalignment (window px) between the two eyes' darkest points.
EYE_ROW_SKEW = 3
#: Pyramid scale step.
SCALE_STEP = 1.25
#: NMS IoU threshold.
NMS_IOU = 0.35


def _to_gray(rgb: np.ndarray) -> np.ndarray:
    img = np.asarray(rgb)
    if img.ndim == 3:
        g = img[..., :3].astype(np.float32) @ np.asarray(
            [0.299, 0.587, 0.114], np.float32
        )
    else:
        g = img.astype(np.float32)
    return g / np.float32(255.0)


def _resize_bilinear(g: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = g.shape
    ys = np.linspace(0, h - 1, oh, dtype=np.float32)
    xs = np.linspace(0, w - 1, ow, dtype=np.float32)
    y0 = np.clip(ys.astype(np.int32), 0, h - 2)
    x0 = np.clip(xs.astype(np.int32), 0, w - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = g[np.ix_(y0, x0)]
    b = g[np.ix_(y0, x0 + 1)]
    c = g[np.ix_(y0 + 1, x0)]
    d = g[np.ix_(y0 + 1, x0 + 1)]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx


def _integral(g: np.ndarray) -> np.ndarray:
    ii = np.zeros((g.shape[0] + 1, g.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(g, axis=0), axis=1, out=ii[1:, 1:])
    return ii


def _region_mean(ii, ys, xs, region):
    """Mean of `region` for every window at (ys × xs) top-left corners."""
    r0, r1, c0, c1 = region
    s = (
        ii[np.ix_(ys + r1, xs + c1)]
        - ii[np.ix_(ys + r0, xs + c1)]
        - ii[np.ix_(ys + r1, xs + c0)]
        + ii[np.ix_(ys + r0, xs + c0)]
    )
    return s / float((r1 - r0) * (c1 - c0))


def face_template(size: int = WINDOW) -> np.ndarray:
    """Procedural zero-mean unit-norm average-face template [size²]."""
    t = np.full((size, size), 0.65, dtype=np.float32)
    s = size / float(WINDOW)

    def fill(region, v):
        r0, r1, c0, c1 = (int(round(e * s)) for e in region)
        t[r0:r1, c0:c1] = v

    fill(_FOREHEAD, 0.75)
    fill(_EYE_L, 0.25)
    fill(_EYE_R, 0.25)
    fill(_BRIDGE, 0.75)
    fill(_CHEEK_L, 0.72)
    fill(_CHEEK_R, 0.72)
    fill(_MOUTH, 0.35)
    flat = t.reshape(-1)
    flat = flat - flat.mean()
    n = np.linalg.norm(flat)
    return (flat / n).astype(np.float32)


_TEMPLATE = None


def _template() -> np.ndarray:
    global _TEMPLATE
    if _TEMPLATE is None:
        _TEMPLATE = face_template()
    return _TEMPLATE


def _ncc_scores(crops: np.ndarray) -> np.ndarray:
    """[n, W²] raw crops → normalized correlation with the face template.

    One small device matmul (the OCR classification pattern); falls back
    to numpy transparently since the shapes are tiny.
    """
    x = crops - crops.mean(axis=1, keepdims=True)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.maximum(norms, 1e-6)
    return x @ _template()


def nms(boxes: List[FaceBox], iou: float = NMS_IOU) -> List[FaceBox]:
    """Greedy non-maximum suppression, highest score first."""
    out: List[FaceBox] = []
    for b in sorted(boxes, key=lambda b: -b.score):
        keep = True
        for o in out:
            ix0, iy0 = max(b.x0, o.x0), max(b.y0, o.y0)
            ix1, iy1 = min(b.x1, o.x1), min(b.y1, o.y1)
            inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
            union = (
                (b.x1 - b.x0) * (b.y1 - b.y0)
                + (o.x1 - o.x0) * (o.y1 - o.y0)
                - inter
            )
            if union > 0 and inter / union > iou:
                keep = False
                break
        if keep:
            out.append(b)
    return out


def detect_faces(
    rgb: np.ndarray,
    max_faces: int = 16,
    min_face: int = 24,
    stride: int = 2,
    min_score: Optional[float] = None,
    max_dim: int = 384,
) -> List[FaceBox]:
    """Detect frontal faces; boxes in normalized coords, best first.

    ``min_face``: smallest face size in DETECTION pixels considered.
    ``max_dim``: large images are downscaled so their long side is at
    most this before the pyramid (ingest-time cost control: detection is
    O(pixels); boxes are normalized so the cap never changes coordinates,
    only the effective minimum face size on large images — at the
    default, faces ≥ ~6% of the long side).  Pass 0 to disable.
    """
    gray = _to_gray(rgb)
    if max_dim and max(gray.shape) > max_dim:
        f = max_dim / float(max(gray.shape))
        gray = _resize_bilinear(
            gray,
            max(WINDOW, int(round(gray.shape[0] * f))),
            max(WINDOW, int(round(gray.shape[1] * f))),
        )
    h, w = gray.shape
    if min(h, w) < min_face:
        return []
    candidates: List[FaceBox] = []
    crops: List[np.ndarray] = []
    # Pyramid: one level per face size from min_face up to the short side.
    face_px = float(max(min_face, WINDOW))
    while face_px <= min(h, w):
        scale = WINDOW / face_px
        sh, sw = int(round(h * scale)), int(round(w * scale))
        if min(sh, sw) < WINDOW:
            break
        g = gray if scale == 1.0 else _resize_bilinear(gray, sh, sw)
        ii = _integral(g)
        ii2 = _integral(g * g)
        ys = np.arange(0, sh - WINDOW + 1, stride)
        xs = np.arange(0, sw - WINDOW + 1, stride)
        if len(ys) == 0 or len(xs) == 0:
            face_px *= SCALE_STEP
            continue
        eye_l = _region_mean(ii, ys, xs, _EYE_L)
        eye_r = _region_mean(ii, ys, xs, _EYE_R)
        bridge = _region_mean(ii, ys, xs, _BRIDGE)
        cheek_l = _region_mean(ii, ys, xs, _CHEEK_L)
        cheek_r = _region_mean(ii, ys, xs, _CHEEK_R)
        forehead = _region_mean(ii, ys, xs, _FOREHEAD)
        mouth = _region_mean(ii, ys, xs, _MOUTH)
        win = (0, WINDOW, 0, WINDOW)
        mean = _region_mean(ii, ys, xs, win)
        mean2 = _region_mean(ii2, ys, xs, win)
        std = np.sqrt(np.maximum(mean2 - mean * mean, 0.0))

        eyes = 0.5 * (eye_l + eye_r)
        d_eye_l = cheek_l - eye_l
        d_eye_r = cheek_r - eye_r
        d_bridge = bridge - eyes
        d_forehead = forehead - eyes
        d_mouth = 0.5 * (cheek_l + cheek_r) - mouth
        sym = np.abs(eye_l - eye_r)

        ok = (
            (d_eye_l > MARGIN)
            & (d_eye_r > MARGIN)
            & (d_bridge > 0.5 * MARGIN)
            & (d_forehead > 0.5 * MARGIN)
            & (d_mouth > 0.5 * MARGIN)
            & (sym < SYMMETRY)
            & (std > MIN_STD)
        )
        score = (
            d_eye_l + d_eye_r + d_bridge + 0.5 * d_forehead + d_mouth - 2.0 * sym
        )
        if min_score is not None:
            ok &= score > min_score
        yi, xi = np.nonzero(ok)
        for a, b in zip(yi, xi):
            y, x = float(ys[a]), float(xs[b])
            candidates.append(
                FaceBox(
                    x0=x / scale / w,
                    y0=y / scale / h,
                    x1=(x + WINDOW) / scale / w,
                    y1=(y + WINDOW) / scale / h,
                    score=float(score[a, b]),
                )
            )
            crops.append(
                g[int(ys[a]) : int(ys[a]) + WINDOW, int(xs[b]) : int(xs[b]) + WINDOW]
                .reshape(-1)
                .astype(np.float32)
            )
        face_px *= SCALE_STEP

    if not candidates:
        return []
    # Template verification: one batched correlation over all candidates.
    ncc = _ncc_scores(np.stack(crops))
    verified = [
        (b._replace(score=b.score + float(c)), crop)
        for b, c, crop in zip(candidates, ncc, crops)
        if c >= MIN_TEMPLATE_NCC
    ]
    verified = [
        b
        for b, crop in verified
        if b.score >= MIN_TOTAL_SCORE and _refine(crop)
    ]
    return nms(verified)[:max_faces]


def _refine(crop_flat: np.ndarray) -> bool:
    """Blob-level gates on one candidate window (see EYE_DEPTH above)."""
    c = crop_flat.reshape(WINDOW, WINDOW)

    def reg(r):
        r0, r1, c0, c1 = r
        return c[r0:r1, c0:c1]

    eye_l, eye_r = reg(_EYE_L), reg(_EYE_R)
    cheek = 0.5 * (float(reg(_CHEEK_L).mean()) + float(reg(_CHEEK_R).mean()))
    if cheek - float(eye_l.min()) < EYE_DEPTH:
        return False
    if cheek - float(eye_r.min()) < EYE_DEPTH:
        return False
    if cheek - float(reg(_MOUTH).min()) < MOUTH_DEPTH:
        return False
    row_l = int(np.argmin(eye_l.min(axis=1) if eye_l.size else [0]))
    row_r = int(np.argmin(eye_r.min(axis=1) if eye_r.size else [0]))
    return abs(row_l - row_r) <= EYE_ROW_SKEW


def crop_face(rgb: np.ndarray, box: FaceBox, margin: float = 0.15) -> np.ndarray:
    """Square face crop with `margin` context, clipped to the image."""
    img = np.asarray(rgb)
    h, w = img.shape[:2]
    cx = 0.5 * (box.x0 + box.x1) * w
    cy = 0.5 * (box.y0 + box.y1) * h
    side = max((box.x1 - box.x0) * w, (box.y1 - box.y0) * h) * (1.0 + 2 * margin)
    half = side / 2.0
    x0 = int(round(max(0.0, cx - half)))
    y0 = int(round(max(0.0, cy - half)))
    x1 = int(round(min(float(w), cx + half)))
    y1 = int(round(min(float(h), cy + half)))
    if x1 <= x0 or y1 <= y0:  # degenerate box
        return img[:1, :1]
    return img[y0:y1, x0:x1]


def largest_face(faces):
    """Pick the entry with the largest normalized box area from a list of
    ``(box, payload)`` pairs (box = (x0, y0, x1, y1) in [0, 1]).

    The query-image selection policy — shared by the CLI/query-language
    path (Engine._query_face_filtered) and the web upload path
    (serve /api/face-similar) so they cannot diverge."""
    return max(faces, key=lambda f: (f[0][2] - f[0][0]) * (f[0][3] - f[0][1]))
