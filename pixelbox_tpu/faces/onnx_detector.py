"""User-supplied ONNX face detectors, executed by the JAX graph interpreter.

The same "user-moddable" contract the reference applies to its embedder
(README.md:51-59: drop in your own trained ONNX and the app runs it):
``Engine(faces=True, face_detector_kwargs={"onnx_path": ...})`` runs any
detector the graph interpreter (models/onnx_graph.py) can execute, with
the decode conventions of the common lightweight SSD face detectors
(UltraFace/version-RFB: paired ``scores [1, N, 2]`` + ``boxes [1, N, 4]``
outputs with normalized corner coordinates; also accepted: a single
``[N, 5+]`` array of ``x0, y0, x1, y1, score``).

The built-in classical detector (faces/detect.py) stays the default —
this module exists so production users get real detection quality
without the framework shipping (or requiring) any weights.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from pixelbox_tpu.faces.detect import FaceBox, _resize_bilinear, nms


class OnnxFaceDetector:
    """Callable: HxWx3 u8 RGB → List[FaceBox] (normalized coords).

    Parameters
    ----------
    onnx_path: detector graph (any opset-11 CNN subset the interpreter
        supports).
    input_size: (height, width) the graph expects.  Default (240, 320),
        the UltraFace RFB-320 convention.
    mean, scale: input normalization ``(x - mean) * scale`` applied to
        f32 RGB in [0, 255].  Defaults match UltraFace ((x−127)/128).
    score_threshold, iou: decode confidence floor and NMS overlap.
    """

    def __init__(
        self,
        onnx_path: str,
        input_size: Tuple[int, int] = (240, 320),
        mean: float = 127.0,
        scale: float = 1.0 / 128.0,
        score_threshold: float = 0.7,
        iou: float = 0.35,
        max_faces: int = 16,
    ):
        from pixelbox_tpu.models.onnx_graph import OnnxGraphModel

        self.model = OnnxGraphModel(onnx_path)
        self.input_size = (int(input_size[0]), int(input_size[1]))
        self.mean = float(mean)
        self.scale = float(scale)
        self.score_threshold = float(score_threshold)
        self.iou = float(iou)
        self.max_faces = int(max_faces)

    # ------------------------------------------------------------------ #

    def _preprocess(self, rgb: np.ndarray) -> np.ndarray:
        img = np.asarray(rgb)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        h, w = self.input_size
        chans = [
            _resize_bilinear(img[..., c].astype(np.float32), h, w)
            for c in range(3)
        ]
        x = (np.stack(chans, axis=0) - self.mean) * self.scale
        return x[None].astype(np.float32)  # NCHW [1, 3, h, w]

    @staticmethod
    def _decode_outputs(outputs) -> Tuple[np.ndarray, np.ndarray]:
        """Model output(s) → (scores [N], boxes [N, 4] corner-normalized)."""
        outs = outputs if isinstance(outputs, tuple) else (outputs,)
        outs = [np.asarray(o, dtype=np.float32) for o in outs]
        scores: Optional[np.ndarray] = None
        boxes: Optional[np.ndarray] = None
        for o in outs:
            a = o.reshape(-1, o.shape[-1]) if o.ndim >= 2 else o[None]
            if a.shape[-1] == 4 and boxes is None:
                boxes = a
            elif a.shape[-1] in (1, 2) and scores is None:
                # Two-class scores: column 1 is the face probability.
                scores = a[:, -1]
            elif a.shape[-1] in (5, 6) and boxes is None and scores is None:
                boxes, scores = a[:, :4], a[:, 4]
        if boxes is None or scores is None or len(boxes) != len(scores):
            raise ValueError(
                "unrecognized detector outputs: expected scores [1,N,2] + "
                "boxes [1,N,4] (UltraFace convention) or one [N,5] "
                "(x0,y0,x1,y1,score) array; "
                f"got shapes {[o.shape for o in outs]}"
            )
        return scores, boxes

    def __call__(self, rgb: np.ndarray, max_faces: Optional[int] = None) -> List[FaceBox]:
        scores, boxes = self._decode_outputs(self.model(self._preprocess(rgb)))
        keep = scores >= self.score_threshold
        out = [
            FaceBox(
                x0=float(np.clip(b[0], 0.0, 1.0)),
                y0=float(np.clip(b[1], 0.0, 1.0)),
                x1=float(np.clip(b[2], 0.0, 1.0)),
                y1=float(np.clip(b[3], 0.0, 1.0)),
                score=float(s),
            )
            for b, s in zip(boxes[keep], scores[keep])
            if b[2] > b[0] and b[3] > b[1]
        ]
        return nms(out, iou=self.iou)[: max_faces or self.max_faces]
