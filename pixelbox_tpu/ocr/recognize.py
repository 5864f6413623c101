"""Text recognition for machine-rendered images (see ocr/__init__.py).

Segmentation is classical CV on the host (binarize → connected
components → geometric line/word grouping); classification is ONE
batched device matmul of the normalized crops against the glyph atlas —
the same shape of work as the similarity scan, so it rides the MXU.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from pixelbox_tpu.ocr.glyphs import glyph_atlas, normalize_patch

#: Minimum normalized cross-correlation for a character to be emitted.
MIN_CONFIDENCE = 0.42
#: Components smaller than this (pixels, either dimension) are noise.
MIN_GLYPH_PX = 4
#: Aspect-prior weight: score = corr − ASPECT_W·|log(a_crop/a_template)|.
ASPECT_W = 0.08


def _otsu_threshold(gray: np.ndarray) -> float:
    hist, edges = np.histogram(gray, bins=64, range=(0.0, 1.0))
    hist = hist.astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0.5
    centers = (edges[:-1] + edges[1:]) / 2
    w0 = np.cumsum(hist)
    w1 = total - w0
    m0 = np.cumsum(hist * centers) / np.maximum(w0, 1e-9)
    m1 = (np.sum(hist * centers) - np.cumsum(hist * centers)) / np.maximum(
        w1, 1e-9
    )
    var_between = w0 * w1 * (m0 - m1) ** 2
    return float(centers[int(np.argmax(var_between[:-1]))])


def _components(ink: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """Ink mask → [(y0, y1, x0, x1)] component boxes (exclusive ends)."""
    import scipy.ndimage as ndi

    lab, n = ndi.label(ink)
    boxes = []
    for sl in ndi.find_objects(lab):
        if sl is None:
            continue
        y0, y1 = sl[0].start, sl[0].stop
        x0, x1 = sl[1].start, sl[1].stop
        if (y1 - y0) < MIN_GLYPH_PX and (x1 - x0) < MIN_GLYPH_PX:
            continue
        boxes.append((y0, y1, x0, x1))
    return boxes


def _merge_vertical(boxes: List[Tuple[int, int, int, int]]):
    """Merge components stacked in the same column span (i/j dots, ':',
    '=', '%' pieces) into one glyph box."""
    boxes = sorted(boxes, key=lambda b: (b[2], b[0]))
    merged: List[Tuple[int, int, int, int]] = []
    for b in boxes:
        y0, y1, x0, x1 = b
        hit = None
        for i, m in enumerate(merged):
            my0, my1, mx0, mx1 = m
            ox = min(x1, mx1) - max(x0, mx0)
            if ox <= 0:
                continue
            # Substantial horizontal overlap and not already overlapping
            # vertically by much → same glyph, different strokes.
            if ox >= 0.6 * min(x1 - x0, mx1 - mx0):
                gap = max(y0, my0) - min(y1, my1)
                if gap < 0.8 * max(y1 - y0, my1 - my0, 8):
                    hit = i
                    break
        if hit is None:
            merged.append(b)
        else:
            my0, my1, mx0, mx1 = merged[hit]
            merged[hit] = (
                min(y0, my0), max(y1, my1), min(x0, mx0), max(x1, mx1)
            )
    return merged


def _group_lines(boxes):
    """Glyph boxes → list of lines, each a list of boxes sorted by x."""
    if not boxes:
        return []
    heights = np.asarray([b[1] - b[0] for b in boxes], np.float64)
    med_h = float(np.median(heights))
    order = sorted(boxes, key=lambda b: ((b[0] + b[1]) / 2, b[2]))
    lines: List[List[Tuple[int, int, int, int]]] = []
    centers: List[float] = []
    for b in order:
        cy = (b[0] + b[1]) / 2
        placed = False
        for i, c in enumerate(centers):
            if abs(cy - c) < 0.6 * med_h:
                lines[i].append(b)
                centers[i] = (c * (len(lines[i]) - 1) + cy) / len(lines[i])
                placed = True
                break
        if not placed:
            lines.append([b])
            centers.append(cy)
    ordered = sorted(zip(centers, lines), key=lambda t: t[0])
    return [sorted(line, key=lambda b: b[2]) for _, line in ordered]


def _classify_batch(crops: List[np.ndarray], aspects: np.ndarray):
    """Normalized crops → (chars, confidences) via one device matmul."""
    import jax.numpy as jnp

    templates, labels, t_aspect = glyph_atlas()
    x = jnp.asarray(np.stack(crops))                       # [n, 256]
    corr = np.asarray(x @ jnp.asarray(templates).T)        # [n, n_templ]
    penalty = ASPECT_W * np.abs(
        np.log(np.maximum(aspects[:, None], 1e-3))
        - np.log(np.maximum(t_aspect[None, :], 1e-3))
    )
    score = corr - penalty
    best = np.argmax(score, axis=1)
    conf = corr[np.arange(len(crops)), best]
    chars = [labels[i] for i in best]
    return chars, conf


def recognize_text(rgb: np.ndarray, min_confidence: Optional[float] = None) -> str:
    """HxWx3 (or HxW) u8 image → recognized text ('' when none).

    Lines join with newlines; word breaks come from horizontal gaps
    > 0.45× the line's median glyph width.  Characters under the
    confidence floor are dropped (never guessed).
    """
    min_confidence = MIN_CONFIDENCE if min_confidence is None else min_confidence
    img = np.asarray(rgb)
    if img.ndim == 3:
        gray = img.astype(np.float32) @ np.asarray(
            [0.299, 0.587, 0.114], np.float32
        )
        gray = gray / 255.0
    else:
        gray = img.astype(np.float32) / 255.0
    t = _otsu_threshold(gray)
    ink = gray < t
    if ink.mean() > 0.5:  # light text on dark background
        ink = ~ink
    if not ink.any():
        return ""

    boxes = _merge_vertical(_components(ink))
    if not boxes:
        return ""
    lines = _group_lines(boxes)

    crops: List[np.ndarray] = []
    aspects: List[float] = []
    boxes_flat: List[Tuple[int, int, int, int]] = []
    layout: List[List[int]] = []  # per line: crop indices (-1 = space)
    for line in lines:
        widths = [b[3] - b[2] for b in line]
        med_w = float(np.median(widths)) if widths else 1.0
        idxs: List[int] = []
        prev_x1 = None
        for (y0, y1, x0, x1) in line:
            if prev_x1 is not None and (x0 - prev_x1) > 0.45 * med_w:
                idxs.append(-1)
            crop = np.where(ink[y0:y1, x0:x1], 1.0, 0.0).astype(np.float32)
            crops.append(normalize_patch(crop))
            aspects.append((y1 - y0) / max(1, x1 - x0))
            boxes_flat.append((y0, y1, x0, x1))
            idxs.append(len(crops) - 1)
            prev_x1 = x1
        layout.append(idxs)
    if not crops:
        return ""

    chars, conf = _classify_batch(crops, np.asarray(aspects, np.float32))

    out_lines = []
    for idxs in layout:
        kept = [
            i for i in idxs if i >= 0 and conf[i] >= min_confidence
        ]
        # Hallucination guards (template matching happily reads noise
        # blobs as dots/bars at high correlation): a real text line has
        # ≥2 confident ALPHANUMERIC characters AND a consistent baseline
        # (glyph bottoms cluster within a fraction of the glyph height —
        # random blobs don't align).
        alnum = [i for i in kept if chars[i].isalnum()]
        # Bar-shaped glyphs (l/I/1/i/j) match any elongated blob, so they
        # count as output but not as EVIDENCE that the line is text.
        evidence = [i for i in alnum if chars[i] not in "lI1ij"]
        if len(alnum) < 2 or len(evidence) < 2:
            continue
        bottoms = np.asarray([boxes_flat[i][1] for i in alnum], np.float64)
        heights = np.asarray(
            [boxes_flat[i][1] - boxes_flat[i][0] for i in alnum], np.float64
        )
        med_h = float(np.median(heights))
        baseline_mad = float(np.median(np.abs(bottoms - np.median(bottoms))))
        if med_h > 0 and baseline_mad > 0.3 * med_h:
            continue
        parts: List[str] = []
        for i in idxs:
            if i == -1:
                parts.append(" ")
            elif conf[i] >= min_confidence:
                parts.append(chars[i])
        text = "".join(parts).strip()
        if text:
            out_lines.append(text)
    return "\n".join(out_lines)
