"""User ONNX face detectors through the JAX graph interpreter.

Builds a deterministic UltraFace-convention detector (paired
scores [1, N, 2] + boxes [1, N, 4] outputs) with the repo's own ONNX
writer primitives and runs it standalone and end-to-end through
``Engine(faces=True, face_detector_kwargs={"onnx_path": ...})`` — the
reference's user-moddable contract (README.md:51-59) applied to
detection.
"""

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.engine import Engine
from pixelbox_tpu.faces.onnx_detector import OnnxFaceDetector
from pixelbox_tpu.models.onnx_io import _attr, _node, _tensor

from fixtures import face_image
from test_onnx_graph import _write_model

#: The synthetic detector always reports these (box, face-probability)
#: anchors; only the first two clear the default 0.7 threshold.
ANCHORS = [
    ((0.25, 0.25, 0.75, 0.75), 0.95),
    ((0.05, 0.05, 0.30, 0.40), 0.80),
    ((0.60, 0.60, 0.90, 0.90), 0.10),
]


def _build_detector(path):
    n = len(ANCHORS)
    score_bias = np.asarray(
        [[1.0 - p, p] for _, p in ANCHORS], np.float32
    ).reshape(-1)
    box_bias = np.asarray([b for b, _ in ANCHORS], np.float32).reshape(-1)
    # Zero weights: the output is the bias regardless of the image —
    # a deterministic detector exercising the full decode path.
    w_s = np.zeros((3, 2 * n), np.float32)
    w_b = np.zeros((3, 4 * n), np.float32)
    nodes = [
        _node("GlobalAveragePool", ["input"], ["g"]),
        _node("Flatten", ["g"], ["f"], [_attr("axis", i=1)]),
        _node("Gemm", ["f", "w_s", "b_s"], ["s_flat"]),
        _node("Reshape", ["s_flat", "s_shape"], ["scores"]),
        _node("Gemm", ["f", "w_b", "b_b"], ["b_flat"]),
        _node("Reshape", ["b_flat", "b_shape"], ["boxes"]),
    ]
    inits = [
        _tensor("w_s", w_s),
        _tensor("b_s", score_bias),
        _tensor("w_b", w_b),
        _tensor("b_b", box_bias),
        _tensor("s_shape", np.asarray([1, n, 2], np.int64)),
        _tensor("b_shape", np.asarray([1, n, 4], np.int64)),
    ]
    _write_model(
        path, nodes, inits,
        [("input", [1, 3, 16, 16])],
        [("scores", [1, n, 2]), ("boxes", [1, n, 4])],
    )


@pytest.fixture(scope="module")
def detector_onnx(tmp_path_factory):
    path = tmp_path_factory.mktemp("onnx") / "detector.onnx"
    _build_detector(str(path))
    return str(path)


def test_onnx_detector_decodes_ultraface_outputs(detector_onnx):
    det = OnnxFaceDetector(detector_onnx, input_size=(16, 16))
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = det(img)
    assert len(boxes) == 2  # the 0.10 anchor is below threshold
    assert boxes[0].score == pytest.approx(0.95)
    assert boxes[0][:4] == pytest.approx(ANCHORS[0][0])
    assert boxes[1][:4] == pytest.approx(ANCHORS[1][0])


def test_onnx_detector_threshold_and_cap(detector_onnx):
    det = OnnxFaceDetector(
        detector_onnx, input_size=(16, 16), score_threshold=0.05, max_faces=2
    )
    assert len(det(np.zeros((32, 32, 3), np.uint8))) == 2  # capped


def test_onnx_detector_rejects_garbage_outputs(tmp_path):
    # A single [1, latent] output is not a detector output layout.
    path = str(tmp_path / "notdet.onnx")
    w = np.zeros((3, 8), np.float32)
    nodes = [
        _node("GlobalAveragePool", ["input"], ["g"]),
        _node("Flatten", ["g"], ["f"], [_attr("axis", i=1)]),
        _node("Gemm", ["f", "w"], ["out"]),
    ]
    _write_model(
        path, nodes, [_tensor("w", w)],
        [("input", [1, 3, 16, 16])], [("out", [1, 8])],
    )
    det = OnnxFaceDetector(path, input_size=(16, 16))
    with pytest.raises(ValueError, match="unrecognized detector outputs"):
        det(np.zeros((32, 32, 3), np.uint8))


def test_engine_with_onnx_detector(detector_onnx, tmp_path):
    img, _ = face_image(person=0)
    p = tmp_path / "a.png"
    Image.fromarray(img).save(p)
    eng = Engine.new(
        str(tmp_path / "onnxdet.db"),
        embedder="stub",
        embedder_kwargs={"dim": 32},
        faces=True,
        face_detector_kwargs={"onnx_path": detector_onnx, "input_size": (16, 16)},
    )
    try:
        image_id = eng.insert_image_from_path(str(p))
        faces = eng.get_faces(image_id)
        assert len(faces) == 2  # both above-threshold anchors stored
        assert faces[0]["box"] == pytest.approx(ANCHORS[0][0])
        eng.query_by_face_from_file(str(p))
        results = eng.get_query_results()
        assert results and results[0].id == image_id
        assert results[0].distance_from_query == 0.0
    finally:
        eng.close()


def test_face_detector_choice_persists(detector_onnx, tmp_path):
    """The detector kwargs persist with the library (query-time detection
    must match index-time); onnx_path='builtin' clears back."""
    img, _ = face_image(person=0)
    p = tmp_path / "a.png"
    Image.fromarray(img).save(p)
    db = str(tmp_path / "persist.db")
    eng = Engine.new(
        db, embedder="stub", embedder_kwargs={"dim": 32}, faces=True,
        face_detector_kwargs={"onnx_path": detector_onnx, "input_size": (16, 16)},
    )
    image_id = eng.insert_image_from_path(str(p))
    eng.close()

    # Reopen WITHOUT kwargs: the ONNX detector (and its input_size)
    # restore from the library.
    eng2 = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 32})
    try:
        assert eng2._face_detector_kwargs["onnx_path"] == detector_onnx
        assert list(eng2._face_detector_kwargs["input_size"]) == [16, 16]
        assert isinstance(eng2.face_detector, OnnxFaceDetector)
        eng2.query_by_face_from_file(str(p))
        results = eng2.get_query_results()
        assert results and results[0].id == image_id
        assert results[0].distance_from_query == 0.0
    finally:
        eng2.close()

    # 'builtin' clears the stored choice…
    eng3 = Engine.open(
        db, embedder="stub", embedder_kwargs={"dim": 32},
        face_detector_kwargs={"onnx_path": "builtin"},
    )
    assert "onnx_path" not in eng3._face_detector_kwargs
    eng3.close()
    # …and the cleared state persists.
    eng4 = Engine.open(db, embedder="stub", embedder_kwargs={"dim": 32})
    try:
        assert "onnx_path" not in eng4._face_detector_kwargs
        assert not isinstance(eng4.face_detector, OnnxFaceDetector)
    finally:
        eng4.close()
