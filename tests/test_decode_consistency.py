"""Decode policy must be host-independent: the native scaled JPEG decode
and the PIL draft() fallback produce IDENTICAL pixels (both are libjpeg
DCT scaling), and WEBP/PNG decode full-res everywhere — so hashes never
depend on which decoder a host happened to build."""

import io

import numpy as np
import pytest
from PIL import Image

from pixelbox_tpu.ingest import decode as dec
from pixelbox_tpu.native import load_native

from fixtures import textured_image


def _jpeg_bytes(w=1280, h=960, q=90):
    img = np.asarray(
        Image.fromarray(textured_image(seed=5, size=(64, 64))).resize((w, h))
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=q)
    return buf.getvalue()


@pytest.mark.skipif(
    load_native() is None or not hasattr(load_native(), "px_decode_rgb"),
    reason="native decode not built",
)
def test_native_scaled_jpeg_equals_pil_draft(monkeypatch):
    data = _jpeg_bytes()
    native = dec.decode_image_bytes(data, "x.jpg", "/x", min_dim=448)
    assert native.rgb.shape == (480, 640, 3)  # 1/2 DCT scale

    # Force the PIL fallback path.
    monkeypatch.setattr(dec, "_native_decode", lambda *_a, **_k: None)
    fallback = dec.decode_image_bytes(data, "x.jpg", "/x", min_dim=448)
    assert fallback.rgb.shape == native.rgb.shape
    np.testing.assert_array_equal(fallback.rgb, native.rgb)
    assert fallback.resolution == native.resolution == (1280, 960)


@pytest.mark.skipif(
    load_native() is None or not hasattr(load_native(), "px_decode_rgb"),
    reason="native decode not built",
)
def test_webp_full_res_everywhere(monkeypatch):
    img = np.asarray(
        Image.fromarray(textured_image(seed=6, size=(64, 64))).resize(
            (1280, 960)
        )
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "WEBP", quality=85)
    data = buf.getvalue()
    native = dec.decode_image_bytes(data, "x.webp", "/x", min_dim=448)
    assert native.rgb.shape == (960, 1280, 3)  # no decode-time scaling
    monkeypatch.setattr(dec, "_native_decode", lambda *_a, **_k: None)
    fallback = dec.decode_image_bytes(data, "x.webp", "/x", min_dim=448)
    np.testing.assert_array_equal(fallback.rgb, native.rgb)


def test_min_dim_zero_is_full_res():
    data = _jpeg_bytes()
    d = dec.decode_image_bytes(data, "x.jpg", "/x", min_dim=0)
    assert d.rgb.shape == (960, 1280, 3)
