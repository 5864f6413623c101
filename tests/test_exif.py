"""EXIF extraction (reference src/indexed_image.rs:60-67 semantics)."""

import numpy as np
from PIL import Image

from pixelbox_tpu.ingest.decode import decode_image_file

from fixtures import textured_image


def test_exif_tags_extracted(tmp_path):
    img = Image.fromarray(textured_image(seed=1, size=(48, 48)))
    exif = Image.Exif()
    exif[271] = "PixelboxTestMake"   # Make
    exif[272] = "TPU Camera 3000"    # Model
    p = tmp_path / "exif.jpg"
    img.save(p, exif=exif)

    decoded = decode_image_file(str(p))
    assert decoded is not None
    assert decoded.tags.get("Make") == "PixelboxTestMake"
    assert decoded.tags.get("Model") == "TPU Camera 3000"


def test_no_exif_is_empty_tags(tmp_path):
    p = tmp_path / "plain.png"
    Image.fromarray(textured_image(seed=2, size=(32, 32))).save(p)
    decoded = decode_image_file(str(p))
    assert decoded.tags == {}


def test_exif_searchable_through_engine(tmp_path):
    from pixelbox_tpu.engine import Engine

    img = Image.fromarray(textured_image(seed=3, size=(48, 48)))
    exif = Image.Exif()
    exif[271] = "Canon"
    (tmp_path / "photos").mkdir()
    img.save(tmp_path / "photos" / "cam.jpg", exif=exif)

    eng = Engine.new(str(tmp_path / "exif.db"), embedder="stub",
                     embedder_kwargs={"dim": 8})
    eng.add_tracked_folder(str(tmp_path / "photos"))
    eng.start_indexing(num_workers=1)
    assert eng.wait_for_indexing(timeout=60)

    # tag:/exif: operators match the extracted metadata (engine.rs:539-547).
    eng.query("tag:Make:Canon")
    (r,) = eng.get_query_results()
    assert r.filename == "cam.jpg"
    assert r.tags["Make"] == "Canon"

    eng.query("exif:Canon")
    assert len(eng.get_query_results()) == 1
    eng.close()
