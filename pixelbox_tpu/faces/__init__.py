"""Face search (reference roadmap "Face search", /root/reference/README.md:33).

The last reference-roadmap item neither codebase had.  Same division of
labor as the rest of the framework:

- **Detection** runs on the host at index time (classical integral-image
  rules by default, any user-supplied ONNX detector via the graph
  interpreter — the same "user-moddable" contract the reference applies
  to its embedder, README.md:51-59).
- **Per-face embeddings** ride the engine's semantic embedder (or a
  dedicated face model the user plugs in) and are quantized with the
  bit-exact u8 cast — a face is just another row in a packed device
  index.
- **Search** is the existing guaranteed-exact device scan over the face
  store: ``face:<path>`` embeds the largest face in the query image and
  ranks indexed images by their closest face.

Enable with ``Engine(faces=True)`` / CLI ``--faces`` (persisted in the
library like ``--precision``); backfill an existing library with
``engine.index_faces()`` / CLI ``index-faces``.
"""

from pixelbox_tpu.faces.detect import (  # noqa: F401
    FaceBox,
    crop_face,
    detect_faces,
    largest_face,
)
