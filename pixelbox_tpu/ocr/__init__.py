"""OCR: text-in-image search — the reference's open roadmap item
("Search on text in image (OCR)", /root/reference/README.md:32-34),
which neither codebase had built.

Scope (documented, honest): machine-RENDERED text — screenshots, memes,
scans of digital documents, UI captures — via a classical pipeline with
the character classification running as one batched matmul on the
device.  Photographic text in the wild (perspective, curved baselines,
exotic fonts) is out of scope; the recognizer reports per-character
confidence and drops what it cannot read rather than guessing.

Pipeline (ocr/recognize.py):
  grayscale → Otsu binarize (polarity-corrected) → connected components
  (scipy.ndimage) → merge vertically-split glyphs (i/j dots, colons) →
  line/word grouping by geometry → normalized 16×16 crops → one
  [n_crops, 256] × [256, n_templates] matmul against the glyph atlas
  (zero-mean unit-norm rows ⇒ the product IS normalized cross-
  correlation) → argmax + confidence threshold.

The glyph atlas (ocr/glyphs.py) renders A-Za-z0-9 and common punctuation
from the system's DejaVu family (sans/serif/mono × regular/bold) so the
recognizer is font-robust across the faces machine-rendered text
actually uses.

Engine integration: ``Engine(ocr=True)`` (CLI ``--ocr``) extracts text at
index time into the ``ocr_text`` tag; the ``ocr:`` query operator
searches it (and composes with every other operator, same as ``tag:``).
"""

from pixelbox_tpu.ocr.recognize import recognize_text  # noqa: F401

OCR_TAG = "ocr_text"
