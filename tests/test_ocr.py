"""OCR text-in-image search (the reference's open roadmap item,
README.md:32-34 — built in neither codebase before).

Scope: machine-rendered text; confusion classes fold for search recall.
"""

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from pixelbox_tpu.ocr import recognize_text
from pixelbox_tpu.ocr.glyphs import fold_text

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
SERIF = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"


def _render(text, font_path=FONT, size=36, fg=(0, 0, 0), bg=(255, 255, 255),
            pad=24):
    font = ImageFont.truetype(font_path, size)
    lines = text.split("\n")
    w = max(int(font.getlength(l)) for l in lines) + 2 * pad
    h = (size + 14) * len(lines) + 2 * pad
    img = Image.new("RGB", (w, h), bg)
    d = ImageDraw.Draw(img)
    for i, l in enumerate(lines):
        d.text((pad, pad + i * (size + 14)), l, fill=fg, font=font)
    return np.asarray(img)


def test_recognizes_rendered_text_fold_exact():
    out = recognize_text(_render("Hello World"))
    assert fold_text(out.replace(" ", "")) == fold_text("HelloWorld")


def test_multiline_and_digits():
    out = recognize_text(_render("Invoice 42\nTotal 1337"))
    lines = out.split("\n")
    assert len(lines) == 2
    assert fold_text(lines[0].replace(" ", "")) == fold_text("Invoice42")
    assert fold_text(lines[1].replace(" ", "")) == fold_text("Total1337")


def test_serif_and_inverted_polarity():
    arr = _render("Receipt", font_path=SERIF, fg=(235, 235, 235),
                  bg=(25, 25, 45))
    assert fold_text(recognize_text(arr).replace(" ", "")) == fold_text(
        "Receipt"
    )


def test_no_text_is_empty(rng):
    noise = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    out = recognize_text(noise)
    # Noise may fragment into a few low-confidence shapes; it must not
    # hallucinate substantial text.
    assert len(out.replace(" ", "").replace("\n", "")) <= 6
    assert recognize_text(np.full((80, 80, 3), 255, np.uint8)) == ""


def test_engine_ocr_end_to_end(tmp_path):
    """--ocr index + ocr: operator: render → index → search finds it."""
    from pixelbox_tpu.engine import Engine

    d = tmp_path / "photos"
    d.mkdir()
    Image.fromarray(_render("Quarterly Report")).save(d / "doc.png")
    Image.fromarray(_render("Cat Picture Day")).save(d / "cat.png")
    from fixtures import textured_image

    Image.fromarray(textured_image(seed=3, size=(64, 64))).save(d / "tex.png")

    eng = Engine.new(
        str(tmp_path / "ocr.db"), embedder="stub",
        embedder_kwargs={"dim": 16}, ocr=True,
    )
    eng.add_tracked_folder(str(d))
    eng.start_indexing(num_workers=2)
    assert eng.wait_for_indexing(timeout=180)
    assert eng.get_num_indexed_images() == 3

    eng.query("ocr:Quarterly")
    res = eng.get_query_results()
    assert [r.filename for r in res] == ["doc.png"]
    # Confusion-fold recall: query digits/letters interchangeably.
    eng.query("ocr:p1cture")
    res = eng.get_query_results()
    assert [r.filename for r in res] == ["cat.png"]
    # Composes with other operators.
    eng.query('ocr:Report filename:doc')
    assert [r.filename for r in eng.get_query_results()] == ["doc.png"]
    eng.query("ocr:nonexistenttext")
    assert eng.get_query_results() == []
    eng.close()
