"""pixelbox_tpu — a TPU-native image indexing & similarity-search framework.

A from-scratch rebuild of the capabilities of JosephCatrambone/pixelbox
(a Rust/SQLite/ONNX desktop image search tool) designed TPU-first:

- the per-row SQLite cosine-distance UDF scan (reference src/engine.rs:375-383)
  becomes an HBM-resident packed u8 matrix scanned by an int8 MXU GEMM with
  fused top-k (``pixelbox_tpu.ops.scan`` / ``pixelbox_tpu.ops.pallas_scan``);
- the tract-onnx EfficientNet embedder (reference src/image_hashes/efficientnet.rs)
  becomes a batched Flax EfficientNet-B0 tower (``pixelbox_tpu.models``);
- the crawler's 4-thread ingest pipeline (reference src/crawler.rs) becomes a
  host decode pool feeding double-buffered device batches
  (``pixelbox_tpu.ingest``);
- multi-chip scale comes from ``jax.sharding.Mesh`` + ``shard_map`` with
  per-chip top-k merged over ICI (``pixelbox_tpu.parallel``).

Semantics preserved bit-for-bit from the reference:
- u8 embedding quantization (efficientnet.rs:39 saturating-cast mapping),
- the reciprocal cosine distance (engine.rs:587),
- hamming/byte distances (engine.rs:590-604),
- the query language (engine.rs:443-565),
- ``WHERE dist < max_distance ... LIMIT k`` result semantics (engine.rs:375-383).
"""

from pixelbox_tpu.version import __version__

from pixelbox_tpu.ops.quantize import (
    quantize_embedding,
    dequantize_embedding,
)
from pixelbox_tpu.ops.distances import (
    cosine_distance,
    byte_distance,
    hamming_distance,
)


def __getattr__(name):
    # Lazy import: Engine pulls in sqlite3/ingest machinery not needed by
    # pure-ops users (and keeps `import pixelbox_tpu` light).
    if name == "Engine":
        from pixelbox_tpu.engine import Engine

        return Engine
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "__version__",
    "Engine",
    "quantize_embedding",
    "dequantize_embedding",
    "cosine_distance",
    "byte_distance",
    "hamming_distance",
]
