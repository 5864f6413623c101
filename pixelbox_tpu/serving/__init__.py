"""Per-modality serving mixins for :class:`pixelbox_tpu.engine.Engine`.

The engine keeps lifecycle, catalog, locking, and the query-language
dispatcher; each modality's single-chip AND mesh-sharded serving paths
live here, one module per modality, behind the same ``kind`` seam the
BatchingScanService registry uses (engine.attach_scan_service).  The
micro-batching service itself lives in serving/service.py and its
public names re-export here (the package superseded the old
pixelbox_tpu/serving.py module in place).
"""

from pixelbox_tpu.serving.blip import BlipServing
from pixelbox_tpu.serving.service import (
    BatchingScanService,
    _bucket,
    _Request,
)
from pixelbox_tpu.serving.duplicates import DuplicateFinding
from pixelbox_tpu.serving.faces import FaceServing
from pixelbox_tpu.serving.ivf import IvfServing
from pixelbox_tpu.serving.phash import PhashServing
from pixelbox_tpu.serving.semantic import SemanticServing
from pixelbox_tpu.serving.watch import WatchMixin

__all__ = [
    "BatchingScanService",
    "BlipServing",
    "DuplicateFinding",
    "FaceServing",
    "IvfServing",
    "PhashServing",
    "SemanticServing",
    "WatchMixin",
]
