"""QOI codec (native C++ + Python fallback) and thumbnail geometry."""

import numpy as np
import pytest

from pixelbox_tpu.ingest import thumbnail as th
from pixelbox_tpu.ingest.thumbnail import (
    make_thumbnail,
    qoi_decode,
    qoi_encode,
    _qoi_decode_py,
    _qoi_encode_py,
)

from fixtures import flat_white, gradient_image, textured_image


@pytest.mark.parametrize("img_fn", [flat_white, textured_image])
def test_roundtrip(img_fn):
    img = img_fn((64, 64)) if img_fn is flat_white else img_fn(size=(64, 64))
    data = qoi_encode(img)
    decoded, (w, h) = qoi_decode(data)
    assert (w, h) == (64, 64)
    np.testing.assert_array_equal(decoded, img)


def test_roundtrip_gradient_nonsquare():
    img = gradient_image((48, 80))
    decoded, (w, h) = qoi_decode(qoi_encode(img))
    assert (w, h) == (80, 48)
    np.testing.assert_array_equal(decoded, img)


def test_rgba_roundtrip(rng):
    img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    decoded, _ = qoi_decode(qoi_encode(img), channels=4)
    np.testing.assert_array_equal(decoded, img)


def test_native_and_python_encoders_agree():
    img = textured_image(size=(32, 32))
    py = _qoi_encode_py(img, 32, 32, 3)
    # Whichever path qoi_encode takes, both decoders must invert both
    # encodings to the same pixels.
    native_or_py = qoi_encode(img)
    for blob in (py, native_or_py):
        dec_a, _ = _qoi_decode_py(blob, 3)
        dec_b, _ = qoi_decode(blob)
        np.testing.assert_array_equal(dec_a, img)
        np.testing.assert_array_equal(dec_b, img)


def test_compression_on_flat_image():
    img = flat_white((256, 256))
    data = qoi_encode(img)
    # Flat image is nearly all RUN ops: massive compression.
    assert len(data) < 256 * 256 * 3 / 50


def test_header_parse():
    img = textured_image(size=(20, 10))  # H=20, W=10
    data = qoi_encode(img)
    assert data[:4] == b"qoif"
    assert int.from_bytes(data[4:8], "big") == 10   # width
    assert int.from_bytes(data[8:12], "big") == 20  # height


def test_make_thumbnail_fits_256():
    img = gradient_image((400, 800))
    thumb = make_thumbnail(img)
    h, w = thumb.shape[:2]
    assert max(h, w) == 256
    assert abs((w / h) - (800 / 400)) < 0.05  # aspect preserved


def test_make_thumbnail_small_image_untouched():
    img = textured_image(size=(100, 100))
    np.testing.assert_array_equal(make_thumbnail(img), img)
