"""Engine — the top-level index/query API (reference src/engine.rs:79-439).

Same public surface as the reference's ``Engine``, re-architected TPU-first:
SQLite survives only as the host-side metadata catalog (durable mirror of
the hashes); distances are computed by device scans over packed HBM-resident
stores; ingest is a batched host-decode → device-embed pipeline.

Semantics kept from the reference:

- ``new``/``open`` lifecycle with WAL + idempotent inserts (engine.rs:98-145);
- query language incl. the sticky ``similar:`` image cache, compared
  case-insensitively by path (engine.rs:510-537);
- text queries INNER JOIN semantic_hashes — images lacking a semantic hash
  never appear (engine.rs:306);
- text queries order by distance to the cached similar-image (0.0 when none)
  and do NOT apply the distance threshold (engine.rs:294-315);
- image-hash queries apply strict ``dist < max_distance_from_query``
  (engine.rs:375-383);
- results cached until the next query (engine.rs:390-402).

Deliberate divergences (reference bugs fixed, each noted inline):
- ``max_search_results`` actually limits results (the reference hardcodes
  LIMIT 100 and never binds the field, engine.rs:314, 383);
- ``filename:`` matches the remainder, not the whole token (engine.rs:556-558);
- a pure ``similar:<path>`` query works alone (in the reference an empty
  WHERE clause makes the assembled SQL fail to parse);
- SQL filters are parameterized (injection at engine.rs:543-560 fixed);
- image ids are never recycled (AUTOINCREMENT — the reference's plain
  rowid would reuse a removed max id; moot there since removal was
  never implemented).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.index.catalog import Catalog
from pixelbox_tpu.index.store import VectorStore
from pixelbox_tpu.ingest.decode import (
    DecodedImage,
    decode_image_bytes,
    decode_image_file,
)
from pixelbox_tpu.ingest.thumbnail import make_thumbnail, qoi_encode
from pixelbox_tpu.models import get_embedder
from pixelbox_tpu.ops import phash as phash_ops
from pixelbox_tpu.ops.distances import cosine_distance
from pixelbox_tpu.ops.scan import (
    cosine_scan_topk,
    cosine_scan_topk_auto,
)
from pixelbox_tpu.query import parse_query
from pixelbox_tpu.records import IndexedImage
from pixelbox_tpu.utils.timing import timed

DEFAULT_MAX_QUERY_DISTANCE = 1e3  # engine.rs:23
DEFAULT_MAX_SEARCH_RESULTS = 100  # engine.rs:24
RECENT_IMAGES_TO_SHOW = 10        # engine.rs:25


def _read_locked(fn):
    """Hold the engine's index read lock for the duration of a query
    entry point: scan-row → image-id mapping must not interleave with a
    compaction renumbering (utils/rwlock.py; reader-preference makes
    nested entry points safe)."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self.index_rwlock.read_locked():
            return fn(self, *args, **kwargs)

    return wrapper


class Engine:
    """Index + query engine over a catalog DB and device vector stores."""

    def __init__(
        self,
        db_path: str,
        create: bool = False,
        embedder: Optional[str] = None,
        embedder_kwargs: Optional[dict] = None,
        dim: Optional[int] = None,
        phash_compat: Optional[bool] = None,
        blip: Optional[bool] = None,
        blip_kwargs: Optional[dict] = None,
        semantic_precision: Optional[str] = None,
        ocr: Optional[bool] = None,
        int4_rerank: bool = True,
        faces: Optional[bool] = None,
        face_detector_kwargs: Optional[dict] = None,
    ):
        assert semantic_precision in (None, "int8", "int4"), semantic_precision
        self.catalog = Catalog(db_path, create=create)
        self.db_path = db_path
        # phash geometry persists too (it defines how QUERY phashes are
        # computed — compat/aspect-preserving vs fixed-square; comparing
        # across geometries silently weakens near-duplicate matching).
        # Explicit wins + persists; None restores; new libraries default
        # to compat (the reference's behavior, phash.rs:7).
        if phash_compat is None:
            stored_pc = self.catalog.get_setting("phash_compat")
            phash_compat = True if stored_pc in (None, "", "1") else False
        else:
            self.catalog.set_setting(
                "phash_compat", "1" if phash_compat else "0"
            )
        self.phash_compat = bool(phash_compat)
        #: "int8" (default, reference-exact distances) or "int4": the
        #: device index packs two 4-bit codes per byte (ops/int4.py) —
        #: 2× rows per chip at coarser distances.  The catalog keeps the
        #: full u8 hashes either way.  The chosen precision PERSISTS in
        #: the catalog: pass None (default) to keep the library's
        #: setting; an explicit value overrides and re-persists it.
        if semantic_precision is None:
            semantic_precision = (
                self.catalog.get_setting("semantic_precision") or "int8"
            )
        else:
            self.catalog.set_setting("semantic_precision", semantic_precision)
        self.semantic_precision = semantic_precision
        #: int4 queries rescore the scan's top-C candidates with the EXACT
        #: u8 metric from the store's host mirror (ops/int4.py,
        #: rerank_candidates_u8): returned distances are true u8
        #: reciprocal-cosine values (directly comparable with int8 mode;
        #: `max_distance_from_query` keeps its u8 meaning; stored-hash
        #: self-matches score exactly 0) and measured recall@10 vs the u8
        #: ground truth goes 0.49 → 1.00 on the structured bench.  Costs
        #: one small host GEMM per query batch.  Off → raw int4-metric
        #: results (the round-2 behavior).
        self.int4_rerank = bool(int4_rerank)
        #: Face search (reference roadmap README.md:33; pixelbox_tpu/faces).
        #: Persisted in the library like semantic_precision: indexing with
        #: --faces on writes face rows; later commands inherit the choice.
        stored_faces = self.catalog.get_setting("faces_enabled")
        if faces is None:
            faces = stored_faces == "1"
        else:
            self.catalog.set_setting("faces_enabled", "1" if faces else "0")
        self.faces_enabled = bool(faces)
        #: The detector CHOICE persists too (it changes results: query
        #: images must be detected the same way indexed ones were), as a
        #: JSON kwargs blob.  Explicit kwargs re-persist; an
        #: onnx_path of ""/"builtin" clears back to the built-in
        #: detector; absent → restore the library's stored choice.
        self._face_detector_kwargs = dict(face_detector_kwargs or {})
        if self._face_detector_kwargs:
            p = self._face_detector_kwargs.get("onnx_path")
            if "onnx_path" in self._face_detector_kwargs and (
                not p or p == "builtin"
            ):
                self._face_detector_kwargs.pop("onnx_path")
                self.catalog.set_setting("face_detector_kwargs", "")
            else:
                self.catalog.set_setting(
                    "face_detector_kwargs",
                    json.dumps(self._face_detector_kwargs),
                )
        else:
            stored_det = self.catalog.get_setting("face_detector_kwargs")
            if stored_det:
                self._face_detector_kwargs = json.loads(stored_det)
        self._face_detector = None
        self._face_detector_init_lock = threading.Lock()
        # blip/ocr persist like faces/precision: an explicit value wins
        # and re-persists; None restores the library's stored choice (a
        # library indexed with --blip keeps text: working on flag-less
        # reopen; same for ocr: continuing to index).
        if blip is None:
            blip = self.catalog.get_setting("blip_enabled") == "1"
        else:
            self.catalog.set_setting("blip_enabled", "1" if blip else "0")
        self._blip_enabled = bool(blip)
        self._blip_kwargs = dict(blip_kwargs or {})
        self._blip_searcher = None
        #: OCR at index time (reference roadmap README.md:32-34): extract
        #: machine-rendered text into the ocr_text/ocr_fold tags, searched
        #: by the ocr: operator (pixelbox_tpu/ocr/).
        if ocr is None:
            ocr = self.catalog.get_setting("ocr_enabled") == "1"
        else:
            self.catalog.set_setting("ocr_enabled", "1" if ocr else "0")
        self.ocr_enabled = bool(ocr)
        #: Guards row↔image-id mappings against compaction renumbering:
        #: query flows (here and in the serving layer) hold the read
        #: side across scan→assemble; compact() takes the write side.
        #: Tombstoning (remove_image) needs no lock — it only flips
        #: validity on an immutable-snapshot index; renumbering is the
        #: hazard (utils/rwlock.py).
        from pixelbox_tpu.utils.rwlock import RWLock

        self.index_rwlock = RWLock()

        # The embedder CHOICE persists in the library too (it defines
        # what the stored hashes MEAN — querying with a different
        # embedder silently returns garbage rankings): explicit name /
        # model path win and re-persist; omitted ones restore the
        # library's stored choice; a brand-new library defaults to the
        # stub.  ("none" is an explicit choice — tags-only mode.)
        if embedder is None:
            embedder = self.catalog.get_setting("embedder_name") or "stub"
        else:
            self.catalog.set_setting("embedder_name", embedder)
        self._embedder_name = embedder
        self._embedder_kwargs = dict(embedder_kwargs or {})
        if dim is not None:
            self._embedder_kwargs.setdefault("dim", dim)
        if self._embedder_kwargs.get("input_size"):
            self.catalog.set_setting(
                "embedder_input_size",
                str(int(self._embedder_kwargs["input_size"])),
            )
        elif "input_size" not in self._embedder_kwargs:
            stored_isz = self.catalog.get_setting("embedder_input_size")
            if stored_isz:
                self._embedder_kwargs["input_size"] = int(stored_isz)
        _model = self._embedder_kwargs.get(
            "checkpoint_path"
        ) or self._embedder_kwargs.get("model")
        if isinstance(_model, str) and _model:
            self.catalog.set_setting("embedder_model", _model)
        elif (
            "checkpoint_path" not in self._embedder_kwargs
            and "model" not in self._embedder_kwargs
            and embedder in ("efficientnet", "nomic", "onnx")
        ):
            stored_model = self.catalog.get_setting("embedder_model")
            if stored_model:
                key = "model" if embedder == "onnx" else "checkpoint_path"
                self._embedder_kwargs[key] = stored_model
        # Normalize the model-kwarg key for the embedder that will run
        # (callers can't know a restored name when they pass --model):
        # OnnxEmbedder takes model=, the towers take checkpoint_path=.
        kw = self._embedder_kwargs
        if embedder == "onnx" and "model" not in kw and "checkpoint_path" in kw:
            kw["model"] = kw.pop("checkpoint_path")
        elif (
            embedder in ("efficientnet", "nomic")
            and "checkpoint_path" not in kw
            and "model" in kw
        ):
            kw["checkpoint_path"] = kw.pop("model")
        # The embedding width PERSISTS in the library (like
        # semantic_precision): reopening without --dim restores the
        # width it was indexed with instead of the embedder's default
        # (which used to fail later with an opaque shape mismatch).
        # Explicit dim wins and re-persists; stored semantic hashes are
        # the fallback source for pre-existing/reference libraries.
        if self._embedder_kwargs.get("dim") is not None:
            self.catalog.set_setting(
                "embedder_dim", str(int(self._embedder_kwargs["dim"]))
            )
        else:
            stored_dim = self.catalog.get_setting("embedder_dim")
            if not stored_dim:
                first = next(
                    self.catalog.iter_hashes("semantic_hashes"), None
                )
                if first is not None:
                    stored_dim = str(len(first[1]))
            if stored_dim:
                self._embedder_kwargs["dim"] = int(stored_dim)
        self._embedder = None  # lazy, like the reference's lazy_static MODEL

        # Searching and filtering (public fields, engine.rs:91-92).
        self.max_search_results: int = DEFAULT_MAX_SEARCH_RESULTS
        self.max_distance_from_query: float = DEFAULT_MAX_QUERY_DISTANCE
        #: "auto" (default) = fast scan + exact verification with fallback
        #: (guaranteed reference-exact results at ~4x direct-exact speed);
        #: "exact" = direct bit-parity scan; "fast" = TPU PartialReduce
        #: selection (recall≈0.99+, exact distances, no guarantee);
        #: "pallas" = the fused single-pass Mosaic kernel (exact; best for
        #: single interactive queries — see ops.pallas_scan);
        #: "ivf" = clustered ANN: probe the ivf_nprobe nearest k-means
        #: clusters only (approximate selection, exact distances — the
        #: >10M-row / lowest-latency option, see ops.ivf).
        self.scan_mode: str = "auto"
        #: IVF (clustered ANN) knobs — active when scan_mode == "ivf".
        #: Approximate candidate selection over the nprobe nearest
        #: clusters; returned distances stay exact (u8 reciprocal-cosine,
        #: or asymmetric cosine4a + exact-u8 rerank on int4 libraries —
        #: ops/ivf.py).  Built lazily from the u8 host mirror; k-means
        #: retrains when the library doubles since training or
        #: ivf_clusters changes.  Row-sharded over the mesh under
        #: serve_on_mesh (parallel/sharded_ivf).
        self.ivf_nprobe: int = 8
        self.ivf_clusters: Optional[int] = None  # default ~4*sqrt(N)
        self._ivf = None
        self._ivf_version = -1
        self._ivf_centroids = None
        self._ivf_trained_n = 0
        self._ivf_trained_want = 0  # requested knob at train (0 = auto)
        # Incremental-append bookkeeping: store state at the last full
        # bucket pack, and the knob values the cached index was built
        # with (changing ivf_clusters invalidates the cache).
        self._ivf_structural = -1
        self._ivf_packed_n = 0
        self._ivf_cfg = None
        # Centroid generation: bumped on every retrain so BOTH packed
        # caches (single-chip + sharded) invalidate when either path
        # retrains at an unchanged store version.
        self._ivf_centroid_gen = 0
        self._ivf_gen = -1
        # Mesh-sharded IVF mirror (serve_on_mesh + scan_mode == "ivf").
        self._ivf_sharded = None
        self._ivf_sharded_at_ver = -1
        self._ivf_sharded_struct = -1
        self._ivf_sharded_packed_n = 0
        self._ivf_sharded_cfg = None
        self._ivf_sharded_gen = -1
        self._ivf_sharded_spill_ids = None
        # Queries hold the read lock, so concurrent ivf queries could
        # otherwise both pay the k-means train; serialize the build.
        self._ivf_build_lock = threading.Lock()
        self._pallas_meta = None
        self._pallas_meta_at_ver = -1
        self._scan_sample = None
        self._scan_sample_at_ver = -1
        self._blip_scan_sample = None
        self._blip_scan_sample_at_ver = -1
        self._blip_pallas_meta = None
        self._blip_pallas_meta_at_ver = -1
        #: ONE result set per engine (reference semantics: the UI pages
        #: through a single cached_search_results, engine.rs).  Queries
        #: are safe against concurrent MUTATIONS (insert/remove/compact
        #: — the internal rwlock covers those), but concurrent CALLERS
        #: must serialize their query→get_query_results pairs at the app
        #: level, like serve.py's request lock (or use
        #: BatchingScanService, which returns per-request results).
        self._cached_search_results: Optional[List[IndexedImage]] = None
        self._cached_image_search: Optional[IndexedImage] = None
        self.last_query_error: Optional[str] = None

        # Device stores + row↔image_id mappings, rebuilt from the catalog
        # (the durable source of truth).
        self._sem_store: Optional[VectorStore] = None
        self._sem_image_ids: List[int] = []
        self._sem_row_by_image: dict = {}
        self._ph_store: Optional[VectorStore] = None
        self._ph_image_ids: List[int] = []
        self._ph_row_by_image: dict = {}
        #: True byte width per phash row (aspect-preserving compat hashes
        #: vary in length, phash.rs:7); the store zero-pads to the max
        #: width but distances use zip-truncate semantics over TRUE widths
        #: (engine.rs:594-604) — see query_by_phash.
        self._ph_widths: List[int] = []
        self._blip_store: Optional[VectorStore] = None
        self._blip_image_ids: List[int] = []
        self._blip_row_by_image: dict = {}
        #: Face store: one row per detected face (an image owns many).
        self._face_store: Optional[VectorStore] = None
        self._face_image_ids: List[int] = []  # store row -> image id
        self._face_rows_by_image: dict = {}   # image id -> [store rows]
        self._face_scan_sample = None
        self._face_scan_sample_at_ver = -1
        self._face_pallas_meta = None
        self._face_pallas_meta_at_ver = -1
        self._face_sharded = None
        self._face_sharded_at_ver = -1
        self._blip_sharded = None
        self._blip_sharded_at_ver = -1
        self._load_stores()

        # Indexing state.
        #: Optional jax.sharding.Mesh: ingest embed batches shard their
        #: batch dim over this mesh's 'data' axis (parallel/data_parallel).
        self.mesh = None
        #: Optional jax.sharding.Mesh for QUERIES: the semantic index is
        #: laid out row-sharded across chips and scans merge per-chip
        #: top-k over ICI (parallel/sharded_scan).  Set via serve_on_mesh().
        self.scan_mesh = None
        self._sharded_index = None
        self._sharded_at_ver = -1
        self._sharded_struct_ver = -1
        self._sharded_synced_n = 0
        self._sharded_full_reshards = 0  # observability (tests assert on it)
        self._ph_sharded = None
        self._ph_sharded_at_ver = -1
        self._ph_sharded_struct_ver = -1
        self._ph_sharded_synced_n = 0
        self._ph_sharded_full_reshards = 0
        self._pipeline = None
        self._watcher: Optional[threading.Thread] = None
        self._watch_stop: Optional[threading.Event] = None
        self.watch_passes = 0
        self._cached_index_size: Optional[int] = None
        self._recently_indexed: List[str] = []
        self._recent_lock = threading.Lock()

    # ------------------------------------------------------------------ #
    # Lifecycle (engine.rs:98-145)

    @classmethod
    def new(cls, db_path: str, **kwargs) -> "Engine":
        """Create a fresh database (like Engine::new, engine.rs:98-115)."""
        return cls(db_path, create=True, **kwargs)

    @classmethod
    def open(cls, db_path: str, **kwargs) -> "Engine":
        """Open an existing database (engine.rs:117-145)."""
        return cls(db_path, create=False, **kwargs)

    def _new_sem_store(self, dim: int) -> VectorStore:
        if self.semantic_precision == "int4" and dim % 2 != 0:
            raise ValueError(
                f"semantic_precision='int4' packs two dims per byte and "
                f"needs an even embedding dim, got {dim}"
            )
        kind = "semantic4" if self.semantic_precision == "int4" else "semantic"
        return VectorStore(dim=dim, kind=kind)

    def _load_stores(self) -> None:
        sem = list(self.catalog.iter_hashes("semantic_hashes"))
        ph = list(self.catalog.iter_hashes("phashes"))
        if sem:
            dim = len(sem[0][1])
            self._sem_store = self._new_sem_store(dim)
            rows = np.frombuffer(b"".join(h for _, h in sem), dtype=np.uint8)
            self._sem_store.append(rows.reshape(len(sem), dim))
            self._sem_image_ids = [i for i, _ in sem]
            self._sem_row_by_image = {img: r for r, img in enumerate(self._sem_image_ids)}
        if ph:
            # Aspect-preserving compat hashes vary in width; the store
            # zero-pads to the max, and the TRUE widths are kept so
            # queries replicate the reference's zip-truncate distance
            # (engine.rs:594-604) per row-width group.
            self._ph_widths = [len(h) for _, h in ph]
            dim = max(self._ph_widths)
            self._ph_store = VectorStore(dim=dim, kind="hamming")
            mat = np.zeros((len(ph), dim), dtype=np.uint8)
            for r, (_, h) in enumerate(ph):
                mat[r, : len(h)] = np.frombuffer(h, dtype=np.uint8)
            self._ph_store.append(mat)
            self._ph_image_ids = [i for i, _ in ph]
            self._ph_row_by_image = {img: r for r, img in enumerate(self._ph_image_ids)}
        bl = list(self.catalog.iter_hashes("blip_hashes"))
        if bl:
            dim = len(bl[0][1])
            self._blip_store = VectorStore(dim=dim, kind="semantic")
            rows = np.frombuffer(b"".join(h for _, h in bl), dtype=np.uint8)
            self._blip_store.append(rows.reshape(len(bl), dim))
            self._blip_image_ids = [i for i, _ in bl]
            self._blip_row_by_image = {
                img: r for r, img in enumerate(self._blip_image_ids)
            }
        fc = list(self.catalog.iter_faces())
        if fc:
            dim = len(fc[0][3])
            self._face_store = VectorStore(dim=dim, kind="semantic")
            rows = np.frombuffer(b"".join(h for *_, h in fc), dtype=np.uint8)
            self._face_store.append(rows.reshape(len(fc), dim))
            self._face_image_ids = [img for _, img, *_ in fc]
            self._face_rows_by_image = {}
            for r, img in enumerate(self._face_image_ids):
                self._face_rows_by_image.setdefault(img, []).append(r)

    @property
    def embedder(self):
        """The semantic embedder, or None in tags-only mode.

        ``embedder="none"`` implements the reference roadmap item "If a
        model is unavailable, don't perform image hash and just disable
        similarity search so people can use it for just tags"
        (README.md TODOs): ingest indexes filename/EXIF/phash/thumbnail
        without semantic hashes, text and phash search work, and
        embed-requiring paths set a friendly ``last_query_error``.
        Similar-by-id still works when stored hashes exist (e.g. a
        library indexed earlier with a model).
        """
        if self._embedder_name in (None, "none"):
            return None
        if self._embedder is None:
            self._embedder = get_embedder(self._embedder_name, **self._embedder_kwargs)
        return self._embedder

    @property
    def blip_searcher(self):
        """BLIP text→image searcher (None unless blip=True)."""
        if not self._blip_enabled:
            return None
        if self._blip_searcher is None:
            from pixelbox_tpu.models.blip import BlipSearcher

            self._blip_searcher = BlipSearcher(**self._blip_kwargs)
            self.catalog.ensure_aux_hash_table("blip_hashes")
        return self._blip_searcher

    @property
    def face_detector(self):
        """Callable rgb → List[FaceBox].  The built-in classical detector
        by default; any user ONNX detector when ``face_detector_kwargs``
        carries an ``onnx_path`` (faces/onnx_detector.py).

        Init is locked: the ingest pipeline's decode workers all hit
        this on their first batch, and an ONNX detector must parse the
        graph and load its weights onto the device exactly once."""
        if self._face_detector is None:
            with self._face_detector_init_lock:
                if self._face_detector is not None:
                    return self._face_detector
                kwargs = dict(self._face_detector_kwargs)
                if "onnx_path" in kwargs:
                    from pixelbox_tpu.faces.onnx_detector import OnnxFaceDetector

                    path = kwargs.pop("onnx_path")
                    self._face_detector = OnnxFaceDetector(path, **kwargs)
                else:
                    from functools import partial

                    from pixelbox_tpu.faces.detect import detect_faces

                    self._face_detector = partial(detect_faces, **kwargs)
        return self._face_detector

    def detect_and_embed_faces(self, rgb: np.ndarray) -> list:
        """Detect faces in one decoded image and embed their crops with
        the semantic embedder → [((x0,y0,x1,y1) normalized, u8 hash)].

        One batched embed for all the image's faces (Embedder.embed_images
        handles arbitrary crop sizes via the host preprocess)."""
        from pixelbox_tpu.faces.detect import crop_face
        from pixelbox_tpu.ops.quantize import quantize_embedding

        if self.embedder is None:
            return []
        boxes = self.face_detector(rgb)
        if not boxes:
            return []
        crops = [crop_face(rgb, b) for b in boxes]
        latents = self.embedder.embed_images(crops)
        hashes = np.asarray(quantize_embedding(jnp.asarray(latents)))
        return [
            ((b.x0, b.y0, b.x1, b.y1), h) for b, h in zip(boxes, hashes)
        ]

    def get_faces(self, image_id: int) -> List[dict]:
        """Stored face boxes for an indexed image (normalized coords)."""
        return self.catalog.get_faces(image_id)

    def enable_blip(self, **blip_kwargs) -> None:
        self._blip_enabled = True
        self.catalog.set_setting("blip_enabled", "1")
        if blip_kwargs:
            self._blip_kwargs = dict(blip_kwargs)
            self._blip_searcher = None

    # ------------------------------------------------------------------ #
    # Index size (engine.rs:157-171)

    def try_get_num_indexed_images(self) -> Optional[int]:
        return self._cached_index_size

    def get_num_indexed_images(self) -> int:
        self._cached_index_size = self.catalog.num_images()
        return self._cached_index_size

    def get_last_added(self) -> List[str]:
        with self._recent_lock:
            return list(self._recently_indexed)

    # ------------------------------------------------------------------ #
    # Ingest (engine.rs:173-259)

    def is_indexing_active(self) -> bool:
        return self._pipeline is not None and self._pipeline.is_active()

    def start_indexing(self, num_workers: Optional[int] = None) -> None:
        """Crawl tracked folders and index everything new (engine.rs:177-205)."""
        from pixelbox_tpu.ingest.pipeline import IngestPipeline

        if self.is_indexing_active():
            return
        self._pipeline = IngestPipeline(
            engine=self,
            folders=self.get_tracked_folders(),
            num_workers=num_workers,
        )
        self._pipeline.start()

    def stop_indexing(self) -> None:
        if self._pipeline is not None:
            self._pipeline.stop()
            self._pipeline = None

    def wait_for_indexing(self, timeout: Optional[float] = None) -> bool:
        if self._pipeline is None:
            return True
        done = self._pipeline.join(timeout)
        if done:
            self._pipeline = None
        return done

    # ------------------------------------------------------------------ #
    # Watched directories (reference roadmap README.md "Watched
    # directories via notify crate" — never built there).  A poll loop
    # rather than inotify: it needs no extra dependency, works on network
    # filesystems, and re-uses the idempotent-by-path pipeline, so a
    # spurious trigger costs one cheap skip pass.

    def watch(
        self, interval_s: float = 30.0, num_workers: Optional[int] = None
    ) -> None:
        """Start a background watcher: poll tracked folders and index any
        file the catalog doesn't know yet.  Idempotent; stop with
        :meth:`stop_watching` (close() stops it too)."""
        if self._watcher is not None and self._watcher.is_alive():
            return
        # The loop closes over ITS OWN stop event: if stop_watching()'s
        # bounded join times out (watcher mid-ingest) and a new watcher
        # starts later, the old loop still sees its own (set) event and
        # exits instead of adopting the new watcher's unset one.
        stop = threading.Event()
        self._watch_stop = stop
        self.watch_passes = 0  # observability (tests/status surface)
        self.watch_removals = 0  # files deleted on disk → tombstoned here
        self._watch_pending_compact = 0
        # Paths that survived an indexing pass without landing in the
        # catalog (undecodable files): remembered so they don't re-trigger
        # a pass every interval forever.  Cleared per watch() call — a
        # watcher restart retries them.
        failed: set = set()

        def _known_paths() -> set:
            conn = self.catalog._connect()
            return {r[0] for r in conn.execute("SELECT path FROM images")}

        def _scan_pass():
            """One crawl: (new paths to index, present-path set)."""
            from pixelbox_tpu.ingest.crawler import crawl
            from pixelbox_tpu.ingest.decode import stringify_filepath

            known = _known_paths()
            news = []
            present = set()
            for p in crawl(self.get_tracked_folders()):
                sp = stringify_filepath(p)
                present.add(sp)
                if sp not in known and sp not in failed:
                    news.append(sp)
                if stop.is_set():
                    return [], set()
            return news, present

        def _verify_gone(path: str) -> bool:
            """Double-check a crawl-missing path is REALLY gone before
            tombstoning — a transient glob/IO error during the crawl must
            not mass-delete a library.  Only a definitive
            FileNotFoundError counts as gone: EACCES/ESTALE/IO errors (an
            unreachable mount stats like this) are NOT deletion."""
            import os

            from pixelbox_tpu.ingest.decode import split_zip_path

            def _stat_gone(p: str) -> bool:
                try:
                    os.stat(p)
                    return False
                except (FileNotFoundError, NotADirectoryError):
                    return True
                except OSError:
                    return False  # unreachable ≠ deleted

            zp = split_zip_path(path)
            if zp is None:
                return _stat_gone(path)
            zpath, member = zp
            if _stat_gone(zpath):
                return True
            try:
                import zipfile

                with zipfile.ZipFile(zpath) as zf:
                    return member not in zf.namelist()
            except Exception:
                return False  # unreadable archive ≠ deleted members

        def _sync_deletions(present: set) -> None:
            """Tombstone rows whose files vanished from watched folders —
            the other half of the reference's 'Watched directories'
            roadmap item (README.md:36): a watcher that only ADDS leaves
            the index lying about deleted files forever.  Rows outside
            every tracked folder are untouched (that's
            remove-folder --purge's job)."""
            import os

            # Only roots that are REACHABLE right now participate: a
            # folder on an unmounted drive must not mass-tombstone its
            # rows (the crawl silently yields nothing for a missing
            # root, so without this check every row under it would look
            # deleted).
            roots = tuple(
                os.path.realpath(f) + os.sep
                for f in self.get_tracked_folders()
                if os.path.isdir(f)
            )
            if not roots:
                return
            conn = self.catalog._connect()
            rows = conn.execute("SELECT id, path FROM images").fetchall()
            removed = 0
            for image_id, path in rows:
                if stop.is_set():
                    break
                if not path.startswith(roots):
                    continue
                if path in present or not _verify_gone(path):
                    continue
                if self.remove_image(int(image_id)):
                    removed += 1
            if removed:
                self.watch_removals += removed
                self._watch_pending_compact += removed
                failed.clear()  # a delete/re-add cycle must retry cleanly
                # Reclaim device rows once tombstones pile up.
                if self._watch_pending_compact >= max(
                    16, self.get_num_indexed_images() // 100
                ):
                    self.compact()
                    self._watch_pending_compact = 0

        def _loop() -> None:
            while not stop.wait(interval_s):
                try:
                    if self.is_indexing_active():
                        continue
                    news, present = _scan_pass()
                    if news:
                        self.start_indexing(num_workers=num_workers)
                        self.wait_for_indexing()
                        still_missing = set(news) - _known_paths()
                        failed.update(still_missing)
                    if present or self.get_tracked_folders():
                        _sync_deletions(present)
                    self.watch_passes += 1
                except Exception as e:  # noqa: BLE001 — keep watching
                    print(f"watch: {type(e).__name__}: {e}", file=sys.stderr)

        self._watcher = threading.Thread(
            target=_loop, name="pixelbox-watch", daemon=True
        )
        self._watcher.start()

    def is_watching(self) -> bool:
        return self._watcher is not None and self._watcher.is_alive()

    def stop_watching(self) -> None:
        if self._watcher is None:
            return
        self._watch_stop.set()
        self._watcher.join(timeout=10)
        self._watcher = None

    def insert_image_from_path(self, path: str) -> Optional[int]:
        record = self.load_image(path)
        if record is None:
            raise IOError(f"cannot decode image: {path}")
        return self.insert_image_from_memory(record)

    def insert_image_from_memory(self, record: IndexedImage) -> Optional[int]:
        """Insert a fully-hashed record; None if path already indexed."""
        image_id = self.catalog.insert_image(
            filename=record.filename,
            path=record.path,
            width=record.resolution[0],
            height=record.resolution[1],
            thumbnail=record.thumbnail,
            tags=record.tags,
            phash=None if record.phash is None else record.phash.tobytes(),
            semantic_hash=(
                None if record.visual_hash is None else record.visual_hash.tobytes()
            ),
        )
        if image_id is None:
            return None
        if record.blip_hash is not None:
            self.catalog.ensure_aux_hash_table("blip_hashes")
            self.catalog.insert_hash(
                "blip_hashes", image_id, record.blip_hash.tobytes()
            )
        with self.index_rwlock.write_locked():
            # Device appends donate the old store buffer — see
            # insert_records_batch.
            self._append_hashes(
                image_id,
                record.visual_hash,
                record.phash,
                record.blip_hash,
            )
            if record.faces:
                self._append_faces(image_id, record.faces)
        self._cached_index_size = None
        with self._recent_lock:
            self._recently_indexed.append(record.path)
            del self._recently_indexed[:-RECENT_IMAGES_TO_SHOW]
        return image_id

    def insert_records_batch(self, records) -> List[Optional[int]]:
        """Insert many fully-hashed records in one catalog transaction and
        one device append per store (the ingest writer's hot path).

        Takes the index WRITE lock: device appends DONATE the old store
        buffer to XLA (in-place growth without copying the whole index),
        which frees it under any query still scanning the old snapshot
        ("Buffer has been deleted or donated" — reproduced by the
        concurrent-compaction test).  Queries hold the read side."""
        with self.index_rwlock.write_locked():
            return self._insert_records_batch_locked(records)

    def _insert_records_batch_locked(self, records) -> List[Optional[int]]:
        rows = [
            {
                "filename": r.filename,
                "path": r.path,
                "width": r.resolution[0],
                "height": r.resolution[1],
                "thumbnail": r.thumbnail,
                "tags": r.tags,
                "phash": None if r.phash is None else r.phash.tobytes(),
                "semantic_hash": (
                    None if r.visual_hash is None else r.visual_hash.tobytes()
                ),
            }
            for r in records
        ]
        ids = self.catalog.insert_images_batch(rows)

        new = [(i, r) for i, r in zip(ids, records) if i is not None]
        if new:
            sem = [(i, r.visual_hash) for i, r in new if r.visual_hash is not None]
            if sem:
                if self._sem_store is None:
                    self._sem_store = self._new_sem_store(len(sem[0][1]))
                row_ids = self._sem_store.append(np.stack([h for _, h in sem]))
                for (img_id, _), row in zip(sem, row_ids):
                    self._sem_image_ids.append(img_id)
                    self._sem_row_by_image[img_id] = int(row)
            ph = [(i, r.phash) for i, r in new if r.phash is not None]
            if ph:
                if self._ph_store is None:
                    self._ph_store = VectorStore(dim=len(ph[0][1]), kind="hamming")
                # Never truncate: a wider hash grows the whole store
                # (existing rows zero-pad; true widths stay recorded).
                w = max(self._ph_store.dim, max(len(h) for _, h in ph))
                if w > self._ph_store.dim:
                    self._ph_store.grow_dim(w)
                mat = np.zeros((len(ph), w), dtype=np.uint8)
                for j, (_, h) in enumerate(ph):
                    mat[j, : len(h)] = h
                row_ids = self._ph_store.append(mat)
                for (img_id, h), row in zip(ph, row_ids):
                    self._ph_image_ids.append(img_id)
                    self._ph_widths.append(len(h))
                    self._ph_row_by_image[img_id] = int(row)
            bl = [(i, r.blip_hash) for i, r in new if r.blip_hash is not None]
            if bl:
                self.catalog.ensure_aux_hash_table("blip_hashes")
                for img_id, h in bl:
                    self.catalog.insert_hash("blip_hashes", img_id, h.tobytes())
                if self._blip_store is None:
                    self._blip_store = VectorStore(dim=len(bl[0][1]), kind="semantic")
                row_ids = self._blip_store.append(np.stack([h for _, h in bl]))
                for (img_id, _), row in zip(bl, row_ids):
                    self._blip_image_ids.append(img_id)
                    self._blip_row_by_image[img_id] = int(row)
            for img_id, r in new:
                if r.faces:
                    self._append_faces(img_id, r.faces)
            with self._recent_lock:
                self._recently_indexed.extend(r.path for _, r in new)
                del self._recently_indexed[:-RECENT_IMAGES_TO_SHOW]
        self._cached_index_size = None
        return ids

    def _append_faces(self, image_id: int, faces) -> None:
        """Store one image's [(box, u8 hash)] faces (catalog + device).

        Caller holds the index write lock (device append donates)."""
        self.catalog.insert_faces(
            image_id, [(box, np.asarray(h, np.uint8).tobytes()) for box, h in faces]
        )
        if self._face_store is None:
            self._face_store = VectorStore(dim=len(faces[0][1]), kind="semantic")
        rows = self._face_store.append(
            np.stack([np.asarray(h, np.uint8) for _, h in faces])
        )
        for row in rows:
            self._face_image_ids.append(image_id)
            self._face_rows_by_image.setdefault(image_id, []).append(int(row))

    def _append_hashes(self, image_id, visual_hash, phash, blip_hash=None) -> None:
        if blip_hash is not None:
            if self._blip_store is None:
                self._blip_store = VectorStore(dim=len(blip_hash), kind="semantic")
            row = int(self._blip_store.append(blip_hash[None, :])[0])
            self._blip_image_ids.append(image_id)
            self._blip_row_by_image[image_id] = row
        if visual_hash is not None:
            if self._sem_store is None:
                self._sem_store = self._new_sem_store(len(visual_hash))
            row = int(self._sem_store.append(visual_hash[None, :])[0])
            self._sem_image_ids.append(image_id)
            self._sem_row_by_image[image_id] = row
        if phash is not None:
            if self._ph_store is None:
                self._ph_store = VectorStore(dim=len(phash), kind="hamming")
            true_w = len(phash)
            if true_w > self._ph_store.dim:
                self._ph_store.grow_dim(true_w)  # never truncate
            if true_w < self._ph_store.dim:
                padded = np.zeros(self._ph_store.dim, dtype=np.uint8)
                padded[:true_w] = phash
                phash = padded
            row = int(self._ph_store.append(phash[None, :])[0])
            self._ph_image_ids.append(image_id)
            self._ph_widths.append(true_w)
            self._ph_row_by_image[image_id] = row

    # ------------------------------------------------------------------ #
    # Record construction (indexed_image.rs:35-91)

    def load_image(self, path: str) -> Optional[IndexedImage]:
        """Decode + hash one image file into an IndexedImage record."""
        decoded = decode_image_file(path)
        if decoded is None:
            return None
        return self._record_from_decoded(decoded)

    def load_image_from_memory(
        self, data: bytes, filename: str = "", path: str = ""
    ) -> Optional[IndexedImage]:
        decoded = decode_image_bytes(data, filename, path)
        if decoded is None:
            return None
        return self._record_from_decoded(decoded)

    def _embed_query_ingest_exact(self, rgb: np.ndarray) -> np.ndarray:
        """Quantized semantic hash through the EXACT ingest batch path.

        The reference recomputes a query image's hash through its one and
        only embed path, so a re-dropped copy of an indexed image scores
        exactly 0 (engine.rs:352-361 → efficientnet.rs:31-42).  A batched
        ingest embed and a single-query embed are different XLA programs
        whose f32 outputs can drift by ulps and flip a u8 bin; routing the
        query through the same padded batch shape and the same jitted
        functions the ingest writer uses makes the two bit-identical
        (asserted in tests/test_selfmatch.py).
        """
        from pixelbox_tpu.ingest.pipeline import (
            DEFAULT_BATCH_SIZE,
            _normalize_frames,
        )
        from pixelbox_tpu.ops.preprocess import fill_resize_u8
        from pixelbox_tpu.ops.quantize import quantize_embedding

        b = getattr(self, "_embed_batch_size", None) or DEFAULT_BATCH_SIZE
        frame = fill_resize_u8(rgb, self.embedder.input_size)
        frames = np.zeros((b,) + frame.shape, dtype=np.uint8)
        frames[0] = frame
        stacked = _normalize_frames(jnp.asarray(frames))
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            from pixelbox_tpu.parallel.data_parallel import embed_batch_sharded

            latents = jnp.asarray(
                embed_batch_sharded(self.embedder, np.asarray(stacked), mesh)
            )
        else:
            latents = self.embedder.embed_preprocessed(stacked)
        return np.asarray(quantize_embedding(latents))[0]

    def _record_from_decoded(self, decoded: DecodedImage) -> IndexedImage:
        thumb = qoi_encode(make_thumbnail(decoded.rgb))
        ph = phash_ops.phash(decoded.rgb, aspect_preserving=self.phash_compat)
        vh = (
            None
            if self.embedder is None
            else self._embed_query_ingest_exact(decoded.rgb)
        )
        faces = (
            self.detect_and_embed_faces(decoded.rgb)
            if self.faces_enabled and self.embedder is not None
            else None
        )
        return IndexedImage(
            filename=decoded.filename,
            path=decoded.path,
            resolution=decoded.resolution,
            thumbnail=thumb,
            tags=decoded.tags,
            phash=ph,
            visual_hash=vh,
            faces=faces,
        )

    def remove_image(self, image_id: int) -> bool:
        """Remove an image from the catalog and all device indexes.

        (The reference stages but never implements removal —
        engine.rs:414 'TODO: Remove images which exist inside the indexed
        folder'.)  Device rows are tombstoned; ids stay stable.  Write
        lock: the tombstone flips the validity array via a donating
        update, same free-under-reader hazard as appends."""
        with self.index_rwlock.write_locked():
            return self._remove_image_locked(image_id)

    def _remove_image_locked(self, image_id: int) -> bool:
        if self.catalog.get_image(image_id) is None:
            return False
        self.catalog.remove_image(image_id)
        for store, row_by_image in (
            (self._sem_store, self._sem_row_by_image),
            (self._ph_store, self._ph_row_by_image),
            (self._blip_store, self._blip_row_by_image),
        ):
            row = row_by_image.pop(image_id, None)
            if store is not None and row is not None:
                store.delete([row])
        face_rows = self._face_rows_by_image.pop(image_id, None)
        if self._face_store is not None and face_rows:
            self._face_store.delete(face_rows)
        self._cached_index_size = None
        return True

    def compact(self) -> None:
        """Drop tombstoned rows from the device stores and renumber the
        row↔image mappings (call after bulk removals).  Takes the index
        write lock: renumbering must not interleave with any query flow
        mapping scan rows back to image ids (the watcher calls this from
        its own thread while serving continues)."""
        with self.index_rwlock.write_locked():
            self._compact_locked()

    def _compact_locked(self) -> None:

        def compact_store(store, image_ids, row_by_image):
            if store is None or store.n_deleted == 0:
                return image_ids, row_by_image
            mapping = store.compact()
            new_ids = [0] * store.n
            new_rows = {}
            for old_row, img_id in enumerate(image_ids):
                new_row = mapping[old_row] if old_row < len(mapping) else -1
                if new_row >= 0:
                    new_ids[int(new_row)] = img_id
                    new_rows[img_id] = int(new_row)
            return new_ids, new_rows

        self._sem_image_ids, self._sem_row_by_image = compact_store(
            self._sem_store, self._sem_image_ids, self._sem_row_by_image
        )
        ph_needs_remap = (
            self._ph_store is not None and self._ph_store.n_deleted > 0
        )
        if ph_needs_remap:
            old_widths = self._ph_widths
            old_ids = self._ph_image_ids
        self._ph_image_ids, self._ph_row_by_image = compact_store(
            self._ph_store, self._ph_image_ids, self._ph_row_by_image
        )
        if ph_needs_remap:
            width_by_image = dict(zip(old_ids, old_widths))
            self._ph_widths = [
                width_by_image[img] for img in self._ph_image_ids
            ]
        self._blip_image_ids, self._blip_row_by_image = compact_store(
            self._blip_store, self._blip_image_ids, self._blip_row_by_image
        )
        if self._face_store is not None and self._face_store.n_deleted > 0:
            # Faces map many rows to one image — remap both views.
            mapping = self._face_store.compact()
            new_imgs = [0] * self._face_store.n
            new_by_image: dict = {}
            for old_row, img in enumerate(self._face_image_ids):
                new_row = mapping[old_row] if old_row < len(mapping) else -1
                if new_row >= 0:
                    new_imgs[int(new_row)] = img
                    new_by_image.setdefault(img, []).append(int(new_row))
            self._face_image_ids = new_imgs
            self._face_rows_by_image = new_by_image
        # Derived/sharded layouts are stale now (version keys catch this
        # too, but drop the references eagerly to free device memory).
        self._sharded_index = None
        self._sharded_at_ver = -1
        self._ph_gemm = None
        self._ph_gemm_at_ver = -1

    def remove_tracked_folder_and_images(self, folder_glob: str) -> int:
        """Remove a folder AND everything indexed under it.

        Only paths strictly INSIDE the directory match (``prefix/…``):
        removing ``/photos/vacay`` must not touch ``/photos/vacation``.
        LIKE wildcards in the folder path are escaped so ``%``/``_`` in
        directory names cannot widen the match.
        """
        self.remove_tracked_folder(folder_glob)
        # Strip the glob tail the crawler appends (crawler.rs:36-40 adds
        # /**/*.* itself), then the trailing separator, leaving a bare dir.
        prefix = folder_glob
        while prefix.endswith(("/*.*", "/**", "/*")):
            prefix = prefix[: prefix.rindex("/")]
        prefix = prefix.rstrip(os.sep + "/")
        if not prefix:
            return 0
        escaped = (
            prefix.replace("!", "!!").replace("%", "!%").replace("_", "!_")
        )
        conn = self.catalog._connect()
        ids = [
            r[0]
            for r in conn.execute(
                "SELECT id FROM images WHERE path LIKE ? ESCAPE '!'",
                (escaped + os.sep + "%",),
            )
        ]
        for i in ids:
            self.remove_image(i)
        return len(ids)

    # ------------------------------------------------------------------ #
    # Editable tags (reference roadmap README.md "Editable tags";
    # searchable immediately via the existing tag:/all: operators)

    def set_tag(self, image_id: int, name: str, value: str = "") -> bool:
        """Set/overwrite a user tag on an indexed image."""
        if self.catalog.get_image(image_id) is None:
            return False
        self.catalog.set_tag(image_id, name, value)
        return True

    def remove_tag(self, image_id: int, name: str) -> bool:
        return self.catalog.remove_tag(image_id, name)

    # ------------------------------------------------------------------ #
    # Tracked folders (engine.rs:404-439)

    def add_tracked_folder(self, folder_glob: str) -> None:
        self.catalog.add_tracked_folder(folder_glob)

    def remove_tracked_folder(self, folder_glob: str) -> None:
        self.catalog.remove_tracked_folder(folder_glob)

    def get_tracked_folders(self) -> List[str]:
        return self.catalog.get_tracked_folders()

    # ------------------------------------------------------------------ #
    # Text query (engine.rs:261-350)

    @_read_locked
    def query(self, user_input: str) -> None:
        """Run a text query; results via :meth:`get_query_results`.

        Raises QueryTokenizeError on malformed input (the reference's Err).
        """
        self.last_query_error = None
        if not user_input:
            return  # bail early, keep previous results (engine.rs:273)

        parsed = parse_query(user_input)
        self._cached_search_results = None

        # `similar:` — recompute the cached query image only when the path
        # changed (case-insensitive), engine.rs:510-533.  The cache is
        # sticky: later queries without `similar:` keep this ordering.
        if parsed.similar_path is not None and self.embedder is None:
            # Tags-only mode: the file can't be embedded — warn instead of
            # silently returning unordered results (filters still apply).
            self.last_query_error = (
                "similar: requires an embedder model (tags-only mode)"
            )
        elif parsed.similar_path is not None:
            cached = self._cached_image_search
            needs_recalc = cached is None or not (
                cached.path.lower() == parsed.similar_path.lower()
            )
            if needs_recalc:
                t0 = time.perf_counter()
                record = self.load_image(parsed.similar_path)
                print(
                    f"Time to compute image hash: {time.perf_counter()-t0:.3f}s",
                    file=sys.stderr,
                )
                self._cached_image_search = record
                if record is not None:
                    # Remember the path as typed for the staleness compare.
                    record.path = parsed.similar_path

        # `face:` — face-similarity modality over the face index.
        if parsed.face_path is not None:
            self._query_face_filtered(parsed)
            return

        # `text:` — semantic text→image modality over the BLIP index.
        if parsed.text_query is not None:
            self._query_text_filtered(parsed)
            return

        # Tags-only mode with no stored hashes: serve text queries straight
        # from the catalog (the reference's INNER JOIN semantic_hashes
        # would hide everything; its roadmap asks exactly for this
        # fallback — "use it for just tags").
        if self.embedder is None and not self._sem_image_ids:
            if parsed.has_filter:
                ids = self.catalog.filter_images(parsed.where_sql, parsed.params)
            else:
                conn = self.catalog._connect()
                ids = [r[0] for r in conn.execute("SELECT id FROM images ORDER BY id")]
            k = int(self.max_search_results)
            ids = ids[:k]
            self._cached_search_results = self._results_from_image_ids(
                ids, np.zeros(len(ids), dtype=np.float32)
            )
            print(f"{len(self._cached_search_results)} results", file=sys.stderr)
            return

        # Candidate rows: text filters via the catalog; INNER JOIN
        # semantic_hashes semantics — only images with embeddings match.
        if parsed.has_filter:
            ids = self.catalog.filter_images(parsed.where_sql, parsed.params)
            rows = np.array(
                [self._sem_row_by_image[i] for i in ids if i in self._sem_row_by_image],
                dtype=np.int64,
            )
        else:
            rows = np.arange(len(self._sem_image_ids), dtype=np.int64)

        k = int(self.max_search_results)
        sim = self._cached_image_search
        if sim is not None and sim.visual_hash is not None and len(rows):
            # Order by cosine distance to the cached image over the matched
            # subset; NO distance threshold on this path (engine.rs:294-315).
            int4 = self.semantic_precision == "int4"
            if len(rows) > 16384:
                # Broad filter: run the device scan with the filter folded
                # into the validity mask (beats gathering the subset to
                # host: one masked pass over the resident index).  Under
                # serve_on_mesh the mask folds into the SHARDED mirror's
                # validity instead, so broad-filtered queries scale with
                # the mesh like unfiltered ones.  Filtered scans run
                # exact (a filter-shrunk validity set breaks the θ
                # sample's assumptions — same choice as text:).
                on_mesh = self.scan_mesh is not None
                if on_mesh:
                    base = self._get_sharded_index()
                else:
                    base = self._sem_store.device_index
                mask = jnp.zeros(base.capacity, dtype=bool).at[
                    jnp.asarray(rows)
                ].set(True)
                masked = base._replace(
                    valid=jnp.logical_and(base.valid, mask)
                )

                def _masked_scan(c, md):
                    if int4 and on_mesh:
                        from pixelbox_tpu.parallel.sharded_scan import (
                            sharded_cosine4_scan_topk,
                        )

                        return sharded_cosine4_scan_topk(
                            jnp.asarray(sim.visual_hash), masked,
                            self.scan_mesh, k=c, max_distance=md,
                        )
                    if int4:
                        from pixelbox_tpu.ops.int4 import cosine4a_scan_topk

                        return cosine4a_scan_topk(
                            jnp.asarray(sim.visual_hash), masked,
                            k=c, max_distance=md,
                        )
                    if on_mesh:
                        from pixelbox_tpu.parallel.sharded_scan import (
                            sharded_cosine_scan_topk,
                        )

                        return sharded_cosine_scan_topk(
                            jnp.asarray(sim.visual_hash), masked,
                            self.scan_mesh, k=c, max_distance=md,
                        )
                    return cosine_scan_topk(
                        jnp.asarray(sim.visual_hash), masked,
                        k=c, max_distance=md,
                    )

                with timed("engine.text_query_scan"):
                    if int4 and self.int4_rerank:
                        # Same rerank contract as the unfiltered path:
                        # int4 candidates from the MASKED index, exact-u8
                        # rescore — so the same image pair scores the
                        # same distance with or without a filter.  No
                        # threshold on this path (engine.rs:294-315).
                        from pixelbox_tpu.ops.int4 import scan_with_u8_rerank

                        dists, idxs = scan_with_u8_rerank(
                            _masked_scan,
                            np.asarray(sim.visual_hash, dtype=np.uint8),
                            self._sem_store._host_rows,
                            k=k, max_distance=np.inf,
                        )
                    else:
                        # no threshold on this path (engine.rs:294-315)
                        dists, idxs = _masked_scan(k, np.inf)
                dists = np.asarray(dists)
                idxs = np.asarray(idxs)
                keep = idxs >= 0
                sel = idxs[keep]
                sel_dists = dists[keep]
            else:
                with timed("engine.text_query_scan"):
                    if int4 and self.int4_rerank:
                        # Rerank semantics degenerate nicely here: the
                        # candidate set IS the filtered subset, so score
                        # it directly in the exact u8 metric from the
                        # host mirror — identical distances/order to the
                        # unfiltered reranked path.  No threshold on
                        # this path (engine.rs:294-315).
                        from pixelbox_tpu.ops.int4 import (
                            rerank_candidates_u8,
                        )

                        d_k, i_k = rerank_candidates_u8(
                            np.asarray(sim.visual_hash, dtype=np.uint8),
                            rows,
                            self._sem_store._host_rows,
                            k=k, max_distance=np.inf,
                        )
                        keep = i_k >= 0
                        sel = i_k[keep]
                        sel_dists = d_k[keep]
                        self._cached_search_results = self._build_results(
                            sel, sel_dists
                        )
                        print(
                            f"{len(self._cached_search_results)} results",
                            file=sys.stderr,
                        )
                        return
                    db_rows = self._sem_store.get_rows(rows)
                    if int4:
                        # Rerank disabled: match the device index's
                        # asymmetric metric so filtered and unfiltered
                        # orderings agree.
                        from pixelbox_tpu.ops.int4 import cosine4a_distance_np

                        dists = cosine4a_distance_np(
                            np.asarray(sim.visual_hash)[None, :], db_rows
                        )
                    else:
                        dists = np.asarray(
                            cosine_distance(
                                jnp.asarray(sim.visual_hash)[None, :],
                                jnp.asarray(db_rows),
                            )
                        )
                order = np.argsort(dists, kind="stable")[:k]
                sel = rows[order]
                sel_dists = dists[order]
        else:
            sel = rows[:k]  # id order, dist 0.0 (engine.rs:291-293)
            sel_dists = np.zeros(len(sel), dtype=np.float32)

        self._cached_search_results = self._build_results(sel, sel_dists)
        print(f"{len(self._cached_search_results)} results", file=sys.stderr)

    def _query_text_filtered(self, parsed) -> None:
        """text: modality, honoring any catalog filters in the same query."""
        searcher = self.blip_searcher
        if searcher is None:
            self.last_query_error = (
                "text: search requires a BLIP index (Engine(blip=True))"
            )
            self._cached_search_results = []
            return
        if self._blip_store is None or self._blip_store.size == 0:
            self._cached_search_results = []
            return
        if parsed.has_filter:
            ids = self.catalog.filter_images(parsed.where_sql, parsed.params)
            rows = np.array(
                [self._blip_row_by_image[i] for i in ids if i in self._blip_row_by_image],
                dtype=np.int64,
            )
        else:
            rows = np.arange(len(self._blip_image_ids), dtype=np.int64)
        if not len(rows):
            self._cached_search_results = []
            return
        q_hash = searcher.text_hashes([parsed.text_query])[0]
        k = int(self.max_search_results)
        n_rows = len(self._blip_image_ids)
        if len(rows) > 16384 or len(rows) == n_rows:
            # Real device scan — blocked GEMM + streaming top-k over the
            # resident BLIP index (any catalog filter folds into the
            # validity mask).  No full-index host gather on this path.
            filtered = len(rows) != n_rows
            with timed("engine.text_to_image_scan"):
                if filtered:
                    # Masked exact scan (sharded under serve_on_mesh).
                    dists, idxs = self._masked_exact_topk(
                        jnp.asarray(q_hash), self._blip_store,
                        self._ensure_blip_sharded, rows, k, np.inf,
                    )
                else:
                    # Unfiltered: the shared core (row-sharded over the
                    # mesh under serve_on_mesh, auto single-chip else).
                    dists, idxs = self._blip_topk_rows(
                        jnp.asarray(q_hash), k
                    )
            dists = np.asarray(dists)
            idxs = np.asarray(idxs)
            keep = idxs >= 0
            sel = idxs[keep]
            sel_dists = dists[keep]
        else:
            # Narrow filter: gathering the few matching rows beats a full
            # index pass.
            db_rows = self._blip_store.get_rows(rows)
            with timed("engine.text_to_image_scan"):
                dists = np.asarray(
                    cosine_distance(
                        jnp.asarray(q_hash)[None, :], jnp.asarray(db_rows)
                    )
                )
            order = np.argsort(dists, kind="stable")[:k]
            sel = rows[order]
            sel_dists = dists[order]
        ids = [self._blip_image_ids[int(row)] for row in sel]
        results = self._results_from_image_ids(ids, sel_dists)
        self._cached_search_results = results
        print(f"{len(results)} results", file=sys.stderr)

    def _query_face_filtered(self, parsed) -> None:
        """``face:`` modality: rank images by their closest stored face
        to the largest face in the query image, honoring any catalog
        filters in the same query (reference roadmap README.md:33).

        Semantics mirror the image-similarity scan (engine.rs:375-383):
        strict ``dist < max_distance_from_query`` in the face metric,
        best ``max_search_results`` IMAGES (an image with several
        matching faces counts once, at its closest face's distance)."""
        if self.embedder is None:
            self.last_query_error = (
                "face: requires an embedder model (tags-only mode)"
            )
            self._cached_search_results = []
            return
        if self._face_store is None or self._face_store.size == 0:
            if not self.faces_enabled:
                self.last_query_error = (
                    "face: search requires a face index — index with "
                    "--faces / Engine(faces=True), or backfill via "
                    "index-faces"
                )
            self._cached_search_results = []
            return
        record = decode_image_file(parsed.face_path)
        if record is None:
            self.last_query_error = f"cannot decode image: {parsed.face_path}"
            self._cached_search_results = []
            return
        faces = self.detect_and_embed_faces(record.rgb)
        if not faces:
            self.last_query_error = (
                f"no face detected in query image: {parsed.face_path}"
            )
            self._cached_search_results = []
            return
        # Largest face wins (shared policy, faces/detect.largest_face).
        from pixelbox_tpu.faces.detect import largest_face

        (box, q_hash) = largest_face(faces)
        self.query_by_face_hash(q_hash, parsed=parsed)

    @_read_locked
    def query_by_face_from_file(self, path: str) -> None:
        """Direct face-similarity API (bypasses the query language)."""
        from pixelbox_tpu.query.parser import ParsedQuery

        self._cached_search_results = None
        self.last_query_error = None
        self._query_face_filtered(ParsedQuery(face_path=path))

    @_read_locked
    def query_by_face_hash(self, q_hash: np.ndarray, parsed=None) -> None:
        """Scan the face store with an embedded face hash; results are
        deduplicated to images (closest face per image, order preserved).

        Read-locked: serve.py's /api/face-similar calls this directly
        from request threads while a watcher thread may compact (the
        nested acquisition from the query() entry points is safe — the
        RWLock's reads are re-entrant)."""
        k = int(self.max_search_results)
        max_distance = float(self.max_distance_from_query)
        n_rows = len(self._face_image_ids)
        if parsed is None or not parsed.has_filter:
            # Unfiltered: the batched core (retry + image dedup; row-
            # sharded over the mesh under serve_on_mesh).
            if n_rows == 0:
                self._cached_search_results = []
                return
            with timed("engine.face_scan"):
                d, imgs = self._face_topk_images(q_hash, k, max_distance)
            keep = imgs[0] >= 0
            results = self._results_from_image_ids(
                [int(i) for i in imgs[0][keep]],
                d[0][keep].astype(np.float32),
            )
            self._cached_search_results = results
            print(f"{len(results)} results", file=sys.stderr)
            return
        ids = self.catalog.filter_images(parsed.where_sql, parsed.params)
        rows = np.array(
            [r for i in ids for r in self._face_rows_by_image.get(i, ())],
            dtype=np.int64,
        )
        if not len(rows):
            self._cached_search_results = []
            return
        if len(rows) > 16384:
            # Over-fetch faces so image-level dedup can still fill k
            # IMAGES (an image contributes all its matching faces to the
            # face top-k); multi-face libraries (group photos) can crowd
            # any fixed over-fetch, so retry with doubled k_faces until
            # k images fill or the candidate set is exhausted.  The
            # masked exact scan shards under serve_on_mesh.
            k_faces = min(4 * k + 16, len(rows))
            while True:
                with timed("engine.face_scan"):
                    dists, idxs = self._masked_exact_topk(
                        jnp.asarray(q_hash), self._face_store,
                        self._ensure_face_sharded, rows, k_faces,
                        max_distance,
                    )
                dists = np.asarray(dists)
                idxs = np.asarray(idxs)
                keep = idxs >= 0
                sel = idxs[keep]
                sel_dists = dists[keep]
                n_images = len({
                    self._face_image_ids[int(r)] for r in sel
                })
                # Exhausted = fewer faces matched than asked for (no
                # more rows under max_distance) or k_faces covers all.
                if (
                    n_images >= k
                    or len(sel) < k_faces
                    or k_faces >= len(rows)
                ):
                    break
                k_faces = min(2 * k_faces, len(rows))
        else:
            # Small filtered set: score every eligible face (no top-k
            # truncation, so dedup can never come up short).
            db_rows = self._face_store.get_rows(rows)
            with timed("engine.face_scan"):
                dists = np.asarray(
                    cosine_distance(
                        jnp.asarray(q_hash)[None, :], jnp.asarray(db_rows)
                    )
                )
            order = np.argsort(dists, kind="stable")
            order = order[dists[order] < max_distance]
            sel = rows[order]
            sel_dists = dists[order]
        # Dedupe to images: the scan is distance-ascending, so the first
        # hit per image is its closest face.
        ids, dedup_d, seen = [], [], set()
        for row, d in zip(sel, sel_dists):
            img = self._face_image_ids[int(row)]
            if img in seen:
                continue
            seen.add(img)
            ids.append(img)
            dedup_d.append(float(d))
            if len(ids) >= k:
                break
        results = self._results_from_image_ids(
            ids, np.asarray(dedup_d, dtype=np.float32)
        )
        self._cached_search_results = results
        print(f"{len(results)} results", file=sys.stderr)

    def index_faces(self, batch_size: int = 16) -> int:
        """Backfill face rows for indexed images that have none (decodes
        originals from disk).  Returns the number of FACES added.

        Detection runs per image on the host; embedding batches the
        crops of ``batch_size`` images into one device launch, padded to
        a power-of-two bucket so variable face counts don't mint a fresh
        jit shape each flush (the ingest writer's pattern)."""
        from pixelbox_tpu.faces.detect import crop_face
        from pixelbox_tpu.ops.preprocess import preprocess_host
        from pixelbox_tpu.ops.quantize import quantize_embedding

        if self.embedder is None:
            raise RuntimeError("face indexing requires an embedder model")
        self.faces_enabled = True
        self.catalog.set_setting("faces_enabled", "1")
        done = set(self._face_rows_by_image)
        conn = self.catalog._connect()
        todo = [
            (image_id, path)
            for image_id, path in conn.execute("SELECT id, path FROM images")
            if image_id not in done
        ]
        count = 0
        pending: list = []  # (image_id, [FaceBox], [preprocessed crop])

        def flush() -> None:
            nonlocal count
            if not pending:
                return
            crops = [c for _, _, cs in pending for c in cs]
            n = len(crops)
            bucket = 1
            while bucket < n:
                bucket *= 2
            batch = np.zeros(
                (bucket, self.embedder.input_size, self.embedder.input_size, 3),
                dtype=np.float32,
            )
            batch[:n] = np.stack(crops)
            latents = self.embedder.embed_preprocessed(jnp.asarray(batch))
            hashes = np.asarray(quantize_embedding(latents))[:n]
            i = 0
            for image_id, boxes, cs in pending:
                faces = [
                    ((b.x0, b.y0, b.x1, b.y1), hashes[i + j])
                    for j, b in enumerate(boxes)
                ]
                i += len(boxes)
                with self.index_rwlock.write_locked():
                    self._append_faces(image_id, faces)
                count += len(faces)
            pending.clear()

        for image_id, path in todo:
            decoded = decode_image_file(path)
            if decoded is None:
                continue
            boxes = self.face_detector(decoded.rgb)
            if not boxes:
                continue
            pending.append((
                image_id,
                boxes,
                [
                    preprocess_host(
                        crop_face(decoded.rgb, b), self.embedder.input_size
                    )
                    for b in boxes
                ],
            ))
            if len(pending) >= batch_size:
                flush()
        flush()
        return count

    def _get_face_scan_sample(self):
        from pixelbox_tpu.ops.scan import DEFAULT_BLOCK_ROWS, build_scan_sample

        index = self._face_store.device_index
        if index.capacity <= 4 * DEFAULT_BLOCK_ROWS:
            return None
        if (
            self._face_scan_sample is None
            or self._face_scan_sample_at_ver != self._face_store.version
        ):
            self._face_scan_sample = build_scan_sample(index)
            self._face_scan_sample_at_ver = self._face_store.version
        return self._face_scan_sample

    def _get_face_pallas_meta(self):
        from pixelbox_tpu.ops.pallas_scan import build_row_meta

        if (
            self._face_pallas_meta is None
            or self._face_pallas_meta_at_ver != self._face_store.version
        ):
            self._face_pallas_meta = build_row_meta(self._face_store.device_index)
            self._face_pallas_meta_at_ver = self._face_store.version
        return self._face_pallas_meta

    @_read_locked
    def query_by_text(self, text: str) -> None:
        """Direct text→image search API (bypasses the query language)."""
        from pixelbox_tpu.query.parser import ParsedQuery

        self._cached_search_results = None
        self._query_text_filtered(ParsedQuery(text_query=text))

    def index_blip_hashes(self, batch_size: int = 16) -> int:
        """Backfill BLIP latents for indexed images missing them (decodes
        originals from disk).  Returns the number embedded."""
        searcher = self.blip_searcher
        if searcher is None:
            raise RuntimeError("Engine(blip=True) required")
        from pixelbox_tpu.ingest.decode import decode_image_file

        done = set(self._blip_image_ids)
        todo = []
        conn = self.catalog._connect()
        for image_id, path in conn.execute("SELECT id, path FROM images"):
            if image_id not in done:
                todo.append((image_id, path))
        count = 0
        for start in range(0, len(todo), batch_size):
            chunk = todo[start : start + batch_size]
            decoded = [(i, decode_image_file(p)) for i, p in chunk]
            decoded = [(i, d) for i, d in decoded if d is not None]
            if not decoded:
                continue
            hashes = searcher.image_hashes([d.rgb for _, d in decoded])
            for (image_id, _), h in zip(decoded, hashes):
                self.catalog.ensure_aux_hash_table("blip_hashes")
                self.catalog.insert_hash("blip_hashes", image_id, h.tobytes())
                self._append_hashes(image_id, None, None, h)
                count += 1
        return count

    def serve_on_mesh(self, mesh=None, axis: str = "data") -> None:
        """Serve similarity queries from a row-sharded multi-chip index.

        Each chip holds 1/n of the packed index; queries scan all shards
        in parallel and merge k candidates per chip over ICI.  Re-sharding
        happens lazily after appends.
        """
        from pixelbox_tpu.parallel.mesh import make_mesh

        self.scan_mesh = mesh or make_mesh(axis_names=(axis,))
        self._sharded_index = None
        self._sharded_at_ver = -1
        self._sharded_struct_ver = -1
        self._ph_sharded = None
        self._ph_sharded_at_ver = -1
        self._ph_sharded_struct_ver = -1
        self._face_sharded = None
        self._face_sharded_at_ver = -1
        self._blip_sharded = None
        self._blip_sharded_at_ver = -1
        self._ivf_sharded = None
        self._ivf_sharded_at_ver = -1
        self._ivf_sharded_struct = -1
        self._ivf_sharded_packed_n = 0
        self._ivf_sharded_cfg = None
        self._ivf_sharded_gen = -1
        self._ivf_sharded_spill_ids = None

    def _get_sharded_index(self):
        """Row-sharded index mirror, synced lazily.

        In-capacity appends ship ONLY the delta rows into the existing
        sharded buffers (bucket-padded dynamic-update-slice — continuous
        ingest under serve_on_mesh stops re-transferring N×D bytes per
        batch); capacity growth / deletes / compaction trigger a full
        reshard.
        """
        from pixelbox_tpu.parallel.sharded_scan import (
            append_to_sharded_index,
            shard_semantic_index,
        )

        store = self._sem_store
        if store.version == self._sharded_at_ver and self._sharded_index is not None:
            return self._sharded_index
        if (
            self._sharded_index is not None
            and store.structural_version == self._sharded_struct_ver
            and store.n > self._sharded_synced_n
        ):
            # Append-only delta; pad back to a power-of-2 row count with
            # rows the mirror already holds (bounded compile shapes).
            end = store.n
            m = end - self._sharded_synced_n
            bucket = 1
            while bucket < m:
                bucket *= 2
            start = max(0, end - bucket)
            self._sharded_index = append_to_sharded_index(
                self._sharded_index,
                store._host_rows[start:end],
                store._host_valid[start:end],
                start,
                kind=store.kind,
            )
        else:
            self._sharded_index = shard_semantic_index(
                store.device_index, self.scan_mesh
            )
            self._sharded_full_reshards += 1
            self._sharded_struct_ver = store.structural_version
        self._sharded_at_ver = store.version
        self._sharded_synced_n = store.n
        return self._sharded_index

    def _get_pallas_meta(self):
        """Cached [2, N] row metadata for the Pallas kernels."""
        from pixelbox_tpu.ops.pallas_scan import build_row_meta

        if (
            self._pallas_meta is None
            or self._pallas_meta_at_ver != self._sem_store.version
        ):
            self._pallas_meta = build_row_meta(self._sem_store.device_index)
            self._pallas_meta_at_ver = self._sem_store.version
        return self._pallas_meta

    def _get_ivf(self):
        """Cached IVF clustered index over the semantic store.

        Pure appends (version bump, same ``structural_version``) extend
        the exact-scanned spill incrementally — O(spill+delta) instead of
        repacking all N rows per query during interleaved indexing; a
        full repack runs once the spill outgrows its threshold or the
        store mutates structurally (delete/compact/grow).  K-means
        retrains only when no centroids exist yet, the dim changed, the
        requested ``ivf_clusters`` differs from the trained count, or the
        live row count has more than doubled since the last training
        (stale centroids still route probes well — classic IVF practice).
        """
        from pixelbox_tpu.ops import ivf as ivf_ops

        store = self._sem_store
        if (
            self._ivf is not None
            and self._ivf_version == store.version
            and self._ivf_cfg == self._ivf_cfg_key()
            and self._ivf_gen == self._ivf_centroid_gen
        ):
            return self._ivf
        with self._ivf_build_lock:
            return self._build_ivf_locked(ivf_ops, store)

    def _ivf_cfg_key(self):
        """Knobs whose change must invalidate the cached IVF index
        (0 = auto cluster count)."""
        return (int(self.ivf_clusters or 0),)

    def _ensure_ivf_centroids(self, ivf_ops, rows, valid, n_live) -> bool:
        """Train or restore the shared k-means centroids (call under the
        build lock).  Returns True when a retrain happened — the
        centroid generation bump invalidates BOTH packed caches.

        Retrain keys on the REQUESTED ``ivf_clusters`` knob (0 = auto),
        not on its n_live-clamped value: a knob larger than the current
        live count would otherwise change its clamp on every append and
        force a full k-means + repack per query during interleaved
        indexing.  Growth toward a large knob is handled by the doubling
        rule (each doubling retrain uses the current clamp).
        """
        dim = rows.shape[1]
        if self._ivf_centroids is None:
            self._load_ivf_sidecar(dim)
        want_knob = int(self.ivf_clusters or 0)
        # Auto (knob 0) accepts whatever was trained — a flag-less
        # reopen of an explicitly-clustered library must not retrain.
        knob_mismatch = (
            want_knob != 0 and want_knob != self._ivf_trained_want
        )
        retrain = (
            self._ivf_centroids is None
            or self._ivf_centroids.shape[1] != dim
            or knob_mismatch
            or n_live > 2 * max(1, self._ivf_trained_n)
        )
        if retrain:
            c = (
                min(want_knob, n_live) if want_knob
                else ivf_ops.default_n_clusters(n_live)
            )
            with timed("engine.ivf_train"):
                self._ivf_centroids = ivf_ops.spherical_kmeans(
                    rows, valid, c, iters=10, seed=0
                )
            self._ivf_trained_n = n_live
            self._ivf_trained_want = want_knob
            self._ivf_centroid_gen += 1
            self._save_ivf_sidecar()
        return retrain

    def _build_ivf_locked(self, ivf_ops, store):
        # Double-check under the lock: a concurrent query may have just
        # finished the identical build.
        cfg = self._ivf_cfg_key()
        if (
            self._ivf is not None
            and self._ivf_version == store.version
            and self._ivf_cfg == cfg
            and self._ivf_gen == self._ivf_centroid_gen
        ):
            return self._ivf
        # Capture the store state BEFORE reading rows: stamping
        # store.version after a long build would mark a pack that missed
        # a mid-build append as current (the read lock normally prevents
        # concurrent mutation, but a submitter timing out of the batching
        # service can drop the lock while the collector still builds).
        ver = store.version
        struct = store.structural_version
        n_now = store.n
        rows = store._host_rows[:n_now]
        valid = store._host_valid[:n_now]
        n_live = int(valid.sum())
        if n_live == 0:
            return None
        retrained = self._ensure_ivf_centroids(ivf_ops, rows, valid, n_live)
        if (
            not retrained
            and self._ivf is not None
            and self._ivf_cfg == cfg
            and self._ivf_gen == self._ivf_centroid_gen
            and self._ivf_structural == struct
            and n_now >= self._ivf_packed_n
        ):
            # Pure appends since the last pack: extend the spill only.
            # The current spill may already hold earlier deltas, so the
            # base is only its pre-pack part — recomputing the full
            # appended range keeps repeated extends duplicate-free.
            delta = np.flatnonzero(valid[self._ivf_packed_n :]).astype(
                np.int64
            ) + self._ivf_packed_n
            old_spill = ivf_ops.live_spill_ids(self._ivf).astype(np.int64)
            base_spill = old_spill[old_spill < self._ivf_packed_n]
            total_spill = len(base_spill) + len(delta)
            # Spill is scanned exactly by every query; repack once it
            # stops being a rounding error next to the probed buckets.
            if total_spill <= max(8192, (self._ivf_packed_n // 16)):
                with timed("engine.ivf_extend"):
                    self._ivf = ivf_ops.rebuild_spill(
                        self._ivf, rows,
                        np.concatenate([base_spill, delta]),
                    )
                self._ivf_version = ver
                return self._ivf
        with timed("engine.ivf_build"):
            self._ivf = ivf_ops.build_ivf(
                rows, valid, self._ivf_centroids,
                precision=self.semantic_precision,
            )
        self._ivf_version = ver
        self._ivf_structural = struct
        self._ivf_packed_n = n_now
        self._ivf_cfg = cfg
        self._ivf_gen = self._ivf_centroid_gen
        return self._ivf

    def _get_ivf_sharded(self):
        """Row-sharded IVF mirror (serve_on_mesh + scan_mode == 'ivf').

        Shares the single-chip path's centroids/sidecar/retrain policy;
        each shard packs its contiguous store range into per-shard
        buckets with global row ids (parallel/sharded_ivf).  Pure appends
        extend the per-shard exact spills incrementally; structural
        changes full-rebuild.
        """
        from pixelbox_tpu.ops import ivf as ivf_ops
        from pixelbox_tpu.parallel import sharded_ivf as sivf_mod

        store = self._sem_store
        if (
            self._ivf_sharded is not None
            and self._ivf_sharded_at_ver == store.version
            and self._ivf_sharded_cfg == self._ivf_cfg_key()
            and self._ivf_sharded_gen == self._ivf_centroid_gen
        ):
            return self._ivf_sharded
        with self._ivf_build_lock:
            return self._build_ivf_sharded_locked(ivf_ops, sivf_mod, store)

    def _mesh_padded_mirror(self, store):
        """Host mirror padded to a mesh-divisible row count.  Compaction
        shrinks ``_host_rows`` to exactly n rows (index/store.py), which
        need not divide the mesh size — the flat sharded path is immune
        because it shards the block-padded device index, but the IVF
        builder packs from the host mirror.  Pad rows are invalid and
        never pack into buckets or spill."""
        rows = store._host_rows
        valid = store._host_valid
        n_shards = self.scan_mesh.shape["data"]
        n_pad = -(-rows.shape[0] // n_shards) * n_shards
        if n_pad != rows.shape[0]:
            rows = np.concatenate([
                rows,
                np.zeros((n_pad - rows.shape[0], rows.shape[1]),
                         dtype=rows.dtype),
            ])
            valid = np.concatenate([
                valid, np.zeros(n_pad - valid.shape[0], dtype=bool)
            ])
        return rows, valid

    def _build_ivf_sharded_locked(self, ivf_ops, sivf_mod, store):
        cfg = self._ivf_cfg_key()
        if (
            self._ivf_sharded is not None
            and self._ivf_sharded_at_ver == store.version
            and self._ivf_sharded_cfg == cfg
            and self._ivf_sharded_gen == self._ivf_centroid_gen
        ):
            return self._ivf_sharded
        # Capture BEFORE reading the mirror (see _build_ivf_locked).
        ver = store.version
        struct = store.structural_version
        n_now = store.n
        rows, valid = self._mesh_padded_mirror(store)
        n_live = int(valid[:n_now].sum())
        if n_live == 0:
            return None
        retrained = self._ensure_ivf_centroids(
            ivf_ops, rows[:n_now], valid[:n_now], n_live
        )
        if (
            not retrained
            and self._ivf_sharded is not None
            and self._ivf_sharded_cfg == cfg
            and self._ivf_sharded_gen == self._ivf_centroid_gen
            and self._ivf_sharded_struct == struct
            and n_now >= self._ivf_sharded_packed_n
        ):
            packed_n = self._ivf_sharded_packed_n
            local_rows = rows.shape[0] // self.scan_mesh.shape["data"]
            delta = np.flatnonzero(
                valid[packed_n:n_now]
            ).astype(np.int64) + packed_n
            bases = [
                b[b < packed_n] for b in self._ivf_sharded_spill_ids
            ]
            total_spill = sum(len(b) for b in bases) + len(delta)
            if total_spill <= max(8192, packed_n // 16):
                per_shard = [
                    np.concatenate([b, delta[(delta // local_rows) == s]])
                    for s, b in enumerate(bases)
                ]
                with timed("engine.ivf_extend"):
                    self._ivf_sharded = sivf_mod.rebuild_sharded_spill(
                        self._ivf_sharded, rows, per_shard, self.scan_mesh
                    )
                self._ivf_sharded_spill_ids = per_shard
                self._ivf_sharded_at_ver = ver
                return self._ivf_sharded
        with timed("engine.ivf_build"):
            self._ivf_sharded, spill_ids = sivf_mod.build_sharded_ivf(
                rows, valid, self._ivf_centroids, self.scan_mesh,
                precision=self.semantic_precision,
            )
        self._ivf_sharded_spill_ids = spill_ids
        self._ivf_sharded_at_ver = ver
        self._ivf_sharded_struct = struct
        self._ivf_sharded_packed_n = n_now
        self._ivf_sharded_cfg = cfg
        self._ivf_sharded_gen = self._ivf_centroid_gen
        return self._ivf_sharded

    def _ivf_sidecar_path(self) -> Optional[str]:
        if not self.db_path or self.db_path == ":memory:":
            return None
        return self.db_path + ".ivf.npz"

    def _library_uuid(self) -> str:
        """Stable per-library identity (persisted in pixelbox_settings),
        minted on first use.  Ties derived sidecar files to THIS library:
        a lib.db deleted and rebuilt in place gets a fresh uuid, so its
        stale lib.db.ivf.npz is rejected instead of silently steering
        probes with centroids trained on the old corpus."""
        u = self.catalog.get_setting("library_uuid")
        if not u:
            import uuid

            u = uuid.uuid4().hex
            self.catalog.set_setting("library_uuid", u)
        return u

    def _load_ivf_sidecar(self, dim: int) -> None:
        """Restore trained IVF centroids from the library sidecar, so a
        reopened library's first ivf query skips k-means (the bucket
        packing itself always rebuilds from the live store)."""
        path = self._ivf_sidecar_path()
        if path is None or not os.path.exists(path):
            return
        try:
            with np.load(path) as z:
                cents = np.asarray(z["centroids"], dtype=np.float32)
                trained_n = int(z["trained_n"])
                trained_want = (
                    int(z["trained_want"]) if "trained_want" in z else 0
                )
                lib_uuid = str(z["library_uuid"]) if "library_uuid" in z \
                    else ""
        except Exception as e:  # noqa: BLE001 — stale/corrupt: retrain
            print(f"ivf sidecar unreadable ({e}); retraining", file=sys.stderr)
            return
        if lib_uuid != self._library_uuid():
            print("ivf sidecar belongs to a different library; retraining",
                  file=sys.stderr)
            return
        if cents.ndim == 2 and cents.shape[1] == dim:
            self._ivf_centroids = cents
            self._ivf_trained_n = trained_n
            self._ivf_trained_want = trained_want

    def _save_ivf_sidecar(self) -> None:
        path = self._ivf_sidecar_path()
        if path is None or self._ivf_centroids is None:
            return
        try:
            np.savez(path, centroids=self._ivf_centroids,
                     trained_n=np.int64(self._ivf_trained_n),
                     trained_want=np.int64(self._ivf_trained_want),
                     library_uuid=self._library_uuid())
        except Exception as e:  # noqa: BLE001 — non-fatal cache
            print(f"ivf sidecar not saved: {e}", file=sys.stderr)

    def _get_scan_sample(self):
        """Cached θ-estimation subsample for the auto scan (ops.scan);
        None while the index is small enough that auto scans directly."""
        from pixelbox_tpu.ops.scan import DEFAULT_BLOCK_ROWS, build_scan_sample

        index = self._sem_store.device_index
        if index.capacity <= 4 * DEFAULT_BLOCK_ROWS:
            return None
        if (
            self._scan_sample is None
            or self._scan_sample_at_ver != self._sem_store.version
        ):
            self._scan_sample = build_scan_sample(index)
            self._scan_sample_at_ver = self._sem_store.version
        return self._scan_sample

    def _get_blip_scan_sample(self):
        """BLIP-store twin of :meth:`_get_scan_sample` (text: queries)."""
        from pixelbox_tpu.ops.scan import DEFAULT_BLOCK_ROWS, build_scan_sample

        index = self._blip_store.device_index
        if index.capacity <= 4 * DEFAULT_BLOCK_ROWS:
            return None
        if (
            self._blip_scan_sample is None
            or self._blip_scan_sample_at_ver != self._blip_store.version
        ):
            self._blip_scan_sample = build_scan_sample(index)
            self._blip_scan_sample_at_ver = self._blip_store.version
        return self._blip_scan_sample

    def _get_blip_pallas_meta(self):
        from pixelbox_tpu.ops.pallas_scan import build_row_meta

        if (
            self._blip_pallas_meta is None
            or self._blip_pallas_meta_at_ver != self._blip_store.version
        ):
            self._blip_pallas_meta = build_row_meta(self._blip_store.device_index)
            self._blip_pallas_meta_at_ver = self._blip_store.version
        return self._blip_pallas_meta

    # ------------------------------------------------------------------ #
    # Visual similarity query (engine.rs:352-396)

    def query_by_image_hash_from_file(self, path: str) -> None:
        self._cached_search_results = None
        if self.embedder is None:
            self.last_query_error = (
                "similarity search disabled: no embedder model "
                "(embedder='none'); tag/filename/phash search and "
                "similar-id on stored hashes remain available"
            )
            self._cached_search_results = []
            return
        t0 = time.perf_counter()
        record = self.load_image(path)
        print(f"Time to compute image hash: {time.perf_counter()-t0:.3f}s", file=sys.stderr)
        if record is None:
            self.last_query_error = f"cannot decode image: {path}"
            return
        self.query_by_image_hash_from_image(record)

    def _int4_single_chip_scan(
        self, record: IndexedImage, k: int,
        max_distance: Optional[float] = None,
    ):
        from pixelbox_tpu.ops.int4 import (
            cosine4_scan_topk_auto,
            cosine4a_scan_topk,
        )
        from pixelbox_tpu.ops.scan import (
            DEFAULT_BLOCK_ROWS,
            _default_backend_is_tpu,
        )

        if max_distance is None:
            max_distance = float(self.max_distance_from_query)
        index = self._sem_store.device_index
        if self.scan_mode == "exact":
            return cosine4a_scan_topk(
                jnp.asarray(record.visual_hash), index, k=k,
                max_distance=max_distance,
            )
        # auto / fast / pallas → the guaranteed-exact auto
        meta = None
        if (
            _default_backend_is_tpu()
            and index.capacity > 4 * DEFAULT_BLOCK_ROWS
        ):
            meta = self._get_pallas_meta()
        return cosine4_scan_topk_auto(
            record.visual_hash, index, k=k,
            max_distance=max_distance,
            sample=self._get_scan_sample(),
            meta=meta,
        )

    @_read_locked
    def query_by_image_hash_from_id(self, image_id: int) -> None:
        """Find-similar on an INDEXED image using its stored hash.

        The reference's per-result "Search for Similar" re-decodes and
        re-embeds the file (search.rs:100 → engine.rs:352-361); using the
        stored hash is faster (no decode/forward) and guarantees an exact
        self-match (re-embedding can drift by quantization ulps when
        ingest batched the forward — PERF.md).  File-based queries keep
        the reference's recompute semantics.
        """
        self._cached_search_results = None
        blob = self.catalog.get_hash("semantic_hashes", image_id)
        if blob is None:
            self.last_query_error = f"image {image_id} has no semantic hash"
            self._cached_search_results = []
            return
        info = self.catalog.get_image(image_id)
        record = IndexedImage(
            id=image_id,
            filename=info["filename"] if info else "",
            path=info["path"] if info else "",
            visual_hash=np.frombuffer(blob, dtype=np.uint8),
        )
        self.query_by_image_hash_from_image(record)

    @_read_locked
    def query_by_image_hash_from_image(self, record: IndexedImage) -> None:
        if record.visual_hash is None:
            print("TODO: IndexedImage is somehow missing a hash!", file=sys.stderr)
            return
        self._cached_search_results = None
        if self._sem_store is None or self._sem_store.size == 0:
            self._cached_search_results = []
            return
        t0 = time.perf_counter()
        k = int(self.max_search_results)
        with timed("engine.similarity_scan"):
            if self.scan_mode == "ivf":
                # Clustered ANN (opt-in): probe the nprobe nearest
                # clusters; candidate selection is approximate, returned
                # distances are exact (ops/ivf.py).  Buckets pack at the
                # library's precision: u8 (exact u8 reciprocal-cosine),
                # or int4 at half the bucket HBM (asymmetric cosine4a
                # candidates + the standard exact-u8 rerank, exactly
                # like the flat int4 flow).  Under serve_on_mesh the
                # probe runs row-sharded over the mesh
                # (parallel/sharded_ivf): N chips ≈ N× the ANN rate.
                dist, idx = self._ivf_query(
                    np.asarray(record.visual_hash, dtype=np.uint8), k
                )
            elif self.semantic_precision == "int4":
                # With rerank on (default): candidates-then-exact-u8-
                # rescore via the shared orchestration (ops.int4.
                # scan_with_u8_rerank — one place owns the scan_k /
                # UNBOUNDED / rescore dance).
                from pixelbox_tpu.ops.int4 import scan_with_u8_rerank

                if self.scan_mesh is not None:
                    from pixelbox_tpu.parallel.sharded_scan import (
                        sharded_cosine4_scan_topk,
                        sharded_cosine4_scan_topk_auto,
                    )

                    fn = (
                        sharded_cosine4_scan_topk
                        if self.scan_mode == "exact"
                        else sharded_cosine4_scan_topk_auto
                    )

                    def _scan(c, md):
                        return fn(
                            jnp.asarray(record.visual_hash),
                            self._get_sharded_index(),
                            self.scan_mesh,
                            k=c,
                            max_distance=md,
                        )

                    # Falls through to the shared result assembly below.
                else:
                    def _scan(c, md):
                        return self._int4_single_chip_scan(
                            record, c, max_distance=md
                        )

                if self.int4_rerank:
                    dist, idx = scan_with_u8_rerank(
                        _scan,
                        np.asarray(record.visual_hash, dtype=np.uint8),
                        self._sem_store._host_rows,
                        k=k,
                        max_distance=float(self.max_distance_from_query),
                    )
                else:
                    dist, idx = _scan(k, float(self.max_distance_from_query))
            elif self.scan_mesh is not None:
                from pixelbox_tpu.parallel.sharded_scan import (
                    sharded_cosine_scan_topk,
                    sharded_cosine_scan_topk_auto,
                )

                if self.scan_mode == "auto":
                    # Verified-threshold + repair, distributed (the same
                    # guaranteed-exact fast path as single-chip).
                    dist, idx = sharded_cosine_scan_topk_auto(
                        jnp.asarray(record.visual_hash),
                        self._get_sharded_index(),
                        self.scan_mesh,
                        k=k,
                        max_distance=float(self.max_distance_from_query),
                    )
                else:
                    # The fused Pallas kernel is single-chip; per-shard
                    # exact is the multi-chip equivalent (same results).
                    mode = "exact" if self.scan_mode == "pallas" else self.scan_mode
                    dist, idx = sharded_cosine_scan_topk(
                        jnp.asarray(record.visual_hash),
                        self._get_sharded_index(),
                        self.scan_mesh,
                        k=k,
                        max_distance=float(self.max_distance_from_query),
                        mode=mode,
                    )
            elif self.scan_mode == "pallas":
                from pixelbox_tpu.ops.scan import _default_backend_is_tpu

                index = self._sem_store.device_index
                if _default_backend_is_tpu() and index.capacity % 8 == 0:
                    from pixelbox_tpu.ops.pallas_scan import (
                        pallas_cosine_scan_topk,
                    )

                    self._get_pallas_meta()
                    tile = min(2048, index.capacity)
                    dist, idx = pallas_cosine_scan_topk(
                        jnp.asarray(record.visual_hash),
                        index,
                        self._pallas_meta,
                        k=k,
                        max_distance=float(self.max_distance_from_query),
                        tile_rows=tile,
                    )
                else:
                    # Mosaic kernels don't lower off-TPU — identical
                    # results via the exact XLA scan (same spec).
                    dist, idx = cosine_scan_topk(
                        jnp.asarray(record.visual_hash),
                        index,
                        k=k,
                        max_distance=float(self.max_distance_from_query),
                        block_rows=min(32768, index.capacity),
                        mode="exact",
                    )
            elif self.scan_mode == "auto":
                from pixelbox_tpu.ops.scan import (
                    DEFAULT_BLOCK_ROWS,
                    _default_backend_is_tpu,
                )

                index = self._sem_store.device_index
                meta = None
                if (
                    _default_backend_is_tpu()
                    and index.capacity > 4 * DEFAULT_BLOCK_ROWS
                ):
                    meta = self._get_pallas_meta()
                dist, idx = cosine_scan_topk_auto(
                    record.visual_hash,
                    index,
                    k=k,
                    max_distance=float(self.max_distance_from_query),
                    sample=self._get_scan_sample(),
                    row_meta=meta,
                )
            else:
                dist, idx = cosine_scan_topk(
                    jnp.asarray(record.visual_hash),
                    self._sem_store.device_index,
                    k=k,
                    max_distance=float(self.max_distance_from_query),
                    mode=self.scan_mode,
                )
        dist = np.asarray(dist)
        idx = np.asarray(idx)
        keep = idx >= 0
        self._cached_search_results = self._build_results(idx[keep], dist[keep])
        n = len(self._cached_search_results)
        print(f"Time to search DB: {time.perf_counter()-t0:.3f}s  Results: {n}", file=sys.stderr)

    @_read_locked
    def query_by_phash(self, phash_bytes: np.ndarray, k: Optional[int] = None) -> None:
        """Perceptual-hash (Hamming) search — the capability behind the
        reference's phash table + hamming UDF (engine.rs:594-663).

        Uniform-width indexes run on the MXU via the bit-unpacked ±1 GEMM
        formulation (ops.hamming_gemm), derived lazily from the packed
        store.  Mixed widths (aspect-preserving compat phashes) replicate
        the reference's zip-truncate semantics (engine.rs:594-604): rows
        are grouped by min(query_width, row_width) and each group scans
        with that byte limit + divisor; groups merge by (dist, row id).
        """
        self._cached_search_results = None
        if self._ph_store is None or self._ph_store.size == 0:
            self._cached_search_results = []
            return
        ph = np.asarray(phash_bytes, dtype=np.uint8).ravel()
        wq = len(ph)
        dim = self._ph_store.dim
        kk = int(k or self.max_search_results)
        md = float(self.max_distance_from_query)

        widths = np.asarray(self._ph_widths, dtype=np.int64)
        uniform = wq >= dim and bool(np.all(widths == dim))
        if uniform and self.scan_mesh is not None:
            # Row-sharded Hamming scan over the mesh (per-chip xor+popcount
            # top-k, ICI candidate merge) — same results as single-chip.
            dist, idx = self._phash_sharded_scan(ph[:dim], kk, md)
        elif uniform:
            dist, idx = self._phash_gemm_scan(ph[:dim], kk, md)
        else:
            # Mixed widths: grouped zip-truncate scans (single-chip; the
            # per-group masked validity would otherwise reshard per query).
            dist, idx = self._phash_mixed_scan(ph, wq, widths, kk, md)
        keep = idx >= 0
        ids = [self._ph_image_ids[int(row)] for row in idx[keep]]
        self._cached_search_results = self._results_from_image_ids(
            ids, dist[keep]
        )

    def _ensure_ph_gemm(self):
        """Lazy ±1 bit-unpacked GEMM index + θ sample + kernel meta for
        the packed phash store (cache keyed on the store version)."""
        from pixelbox_tpu.ops.hamming_gemm import (
            build_hamming_gemm_index,
            build_hamming_scan_sample,
        )

        if (
            getattr(self, "_ph_gemm", None) is None
            or self._ph_gemm_at_ver != self._ph_store.version
        ):
            from pixelbox_tpu.ops.pallas_scan import build_hamming_meta

            self._ph_gemm = build_hamming_gemm_index(self._ph_store.device_index)
            self._ph_gemm_sample = build_hamming_scan_sample(self._ph_gemm)
            self._ph_gemm_meta = build_hamming_meta(self._ph_gemm)
            self._ph_gemm_at_ver = self._ph_store.version

    def _phash_gemm_scan(self, q: np.ndarray, k: int, max_distance: float):
        from pixelbox_tpu.ops.hamming_gemm import (
            hamming_gemm_scan_topk,
            hamming_gemm_scan_topk_auto,
        )

        self._ensure_ph_gemm()
        if self.scan_mode == "fast":
            dist, idx = hamming_gemm_scan_topk(
                jnp.asarray(q), self._ph_gemm, k=k, max_distance=max_distance,
                mode="fast",
            )
        else:
            # Guaranteed-exact; TPU runs the fused threshold kernel.
            dist, idx = hamming_gemm_scan_topk_auto(
                jnp.asarray(q), self._ph_gemm, k=k, max_distance=max_distance,
                sample=self._ph_gemm_sample, meta=self._ph_gemm_meta,
            )
        return np.asarray(dist), np.asarray(idx)

    def _ensure_ph_sharded(self):
        """Row-sharded phash mirror, synced lazily with the same delta
        contract as :meth:`_get_sharded_index`: in-capacity appends ship
        only the bucket-padded delta rows; structural changes (capacity
        or width growth, deletes, compaction) full-reshard."""
        from pixelbox_tpu.parallel.sharded_scan import (
            append_to_sharded_hamming_index,
            shard_hamming_index,
        )

        store = self._ph_store
        if (
            self._ph_sharded is not None
            and self._ph_sharded_at_ver == store.version
        ):
            return self._ph_sharded
        if (
            self._ph_sharded is not None
            and store.structural_version == self._ph_sharded_struct_ver
            and store.n > self._ph_sharded_synced_n
        ):
            end = store.n
            m = end - self._ph_sharded_synced_n
            bucket = 1
            while bucket < m:
                bucket *= 2
            start = max(0, end - bucket)
            self._ph_sharded = append_to_sharded_hamming_index(
                self._ph_sharded,
                store._host_rows[start:end],
                store._host_valid[start:end],
                start,
            )
        else:
            self._ph_sharded = shard_hamming_index(
                store.device_index, self.scan_mesh
            )
            self._ph_sharded_full_reshards += 1
            self._ph_sharded_struct_ver = store.structural_version
        self._ph_sharded_at_ver = store.version
        self._ph_sharded_synced_n = store.n
        return self._ph_sharded

    def _phash_sharded_scan(self, q: np.ndarray, k: int, max_distance: float):
        from pixelbox_tpu.parallel.sharded_scan import sharded_hamming_scan_topk

        dist, idx = sharded_hamming_scan_topk(
            jnp.asarray(q), self._ensure_ph_sharded(), self.scan_mesh, k=k,
            max_distance=max_distance,
        )
        return np.asarray(dist), np.asarray(idx)

    # ------------------------------------------------------------------ #
    # Batched modality scans for the serving layer (BatchingScanService
    # coalesces concurrent phash and text: queries through these; rows
    # map back to image ids with the *_ids_for_rows helpers on the
    # request thread).

    def phash_scan_batched(self, queries: np.ndarray, k: int, max_distance: float):
        """Batched uniform-width Hamming scan: u8 [B, H] → (dist [B,k],
        device rows [B,k]).  Raises on a mixed-width (compat) store —
        those queries take the grouped zip-truncate path per query."""
        from pixelbox_tpu.ops.hamming_gemm import hamming_gemm_scan_topk_auto

        q = np.asarray(queries, dtype=np.uint8)
        dim = self._ph_store.dim
        widths = np.asarray(self._ph_widths, dtype=np.int64)
        if q.shape[1] < dim or not bool(np.all(widths == dim)):
            raise ValueError("mixed-width phash store: no batched path")
        self._ensure_ph_gemm()
        dist, idx = hamming_gemm_scan_topk_auto(
            jnp.asarray(q[:, :dim]), self._ph_gemm, k=k,
            max_distance=max_distance,
            sample=self._ph_gemm_sample, meta=self._ph_gemm_meta,
        )
        return np.asarray(dist), np.asarray(idx)

    def phash_ids_for_rows(self, rows) -> list:
        return [self._ph_image_ids[int(r)] for r in rows]

    def blip_scan_batched(self, hashes: np.ndarray, k: int, max_distance: float):
        """Batched text→image scan over the BLIP store: quantized text
        hashes u8 [B, D] → (dist [B,k], device rows [B,k]).  Row-sharded
        over the mesh under ``serve_on_mesh``, single-chip otherwise —
        the same guaranteed-exact auto scan either way."""
        dist, idx = self._blip_topk_rows(
            jnp.asarray(np.asarray(hashes, np.uint8)), k
        )
        return np.asarray(dist), np.asarray(idx)

    def _blip_topk_rows(self, q, k: int):
        """Unfiltered BLIP scan core (``text:`` has no distance threshold
        — engine.rs:294-315 orders the whole match set)."""
        if self.scan_mesh is not None:
            from pixelbox_tpu.parallel.sharded_scan import (
                sharded_cosine_scan_topk_auto,
            )

            return sharded_cosine_scan_topk_auto(
                q, self._ensure_blip_sharded(), self.scan_mesh,
                k=k, max_distance=np.inf,
            )
        return cosine_scan_topk_auto(
            q, self._blip_store.device_index, k=k, max_distance=np.inf,
            sample=self._get_blip_scan_sample(),
            row_meta=self._get_blip_pallas_meta(),
        )

    def _masked_exact_topk(self, q, store, ensure_sharded, rows, k,
                           max_distance):
        """Exact top-k over a row-masked u8 index (broad catalog filters).

        Single-chip: mask the resident index's validity.  Under
        ``serve_on_mesh``: fold the mask into the sharded mirror's
        validity so filtered scans scale with the mesh too.  Exact (not
        auto) — a filter-shrunk validity set breaks the θ sample's
        assumptions, so proofs would just fail into repairs."""
        if self.scan_mesh is not None:
            from pixelbox_tpu.parallel.sharded_scan import (
                sharded_cosine_scan_topk,
            )

            base = ensure_sharded()
            mask = jnp.zeros(base.capacity, dtype=bool).at[
                jnp.asarray(rows)
            ].set(True)
            masked = base._replace(
                valid=jnp.logical_and(base.valid, mask)
            )
            return sharded_cosine_scan_topk(
                q, masked, self.scan_mesh, k=k, max_distance=max_distance
            )
        index = store.device_index
        mask = jnp.zeros(index.capacity, dtype=bool).at[
            jnp.asarray(rows)
        ].set(True)
        masked = index._replace(valid=jnp.logical_and(index.valid, mask))
        return cosine_scan_topk(q, masked, k=k, max_distance=max_distance)

    def _ensure_blip_sharded(self):
        """Row-sharded BLIP-store mirror (serve_on_mesh).  Full reshard
        on version change, like the face mirror — BLIP stores grow one
        row per image and are far smaller than delta-sync would pay for."""
        from pixelbox_tpu.parallel.sharded_scan import shard_semantic_index

        if (
            self._blip_sharded is None
            or self._blip_sharded_at_ver != self._blip_store.version
        ):
            self._blip_sharded = shard_semantic_index(
                self._blip_store.device_index, self.scan_mesh
            )
            self._blip_sharded_at_ver = self._blip_store.version
        return self._blip_sharded

    def blip_ids_for_rows(self, rows) -> list:
        return [self._blip_image_ids[int(r)] for r in rows]

    def _ensure_face_sharded(self):
        """Row-sharded face-store mirror (serve_on_mesh).  Full reshard
        on version change — face stores are orders of magnitude smaller
        than the semantic index, so the delta-sync machinery isn't
        worth carrying here."""
        from pixelbox_tpu.parallel.sharded_scan import shard_semantic_index

        if (
            self._face_sharded is None
            or self._face_sharded_at_ver != self._face_store.version
        ):
            self._face_sharded = shard_semantic_index(
                self._face_store.device_index, self.scan_mesh
            )
            self._face_sharded_at_ver = self._face_store.version
        return self._face_sharded

    def _face_topk_images(self, q, k: int, max_distance: float):
        """Unfiltered batched face search core: u8 [B, D] (or [D]) face
        hashes → (dist [B, k] f32, IMAGE ids [B, k] i64, -1 padded).

        Results are image-deduped (faces map many device rows to one
        image; each image scores at its CLOSEST face), retrying with a
        doubled face over-fetch until every query fills k images or the
        candidate set under ``max_distance`` exhausts.  Row-sharded over
        the mesh under ``serve_on_mesh``; guaranteed-exact auto scan
        either way."""
        q = np.asarray(q, dtype=np.uint8)
        if q.ndim == 1:
            q = q[None]
        B = q.shape[0]
        imgs_arr = self._face_image_ids
        n_rows = len(imgs_arr)
        out_d = np.full((B, k), np.inf, np.float32)
        out_img = np.full((B, k), -1, np.int64)
        if n_rows == 0:
            return out_d, out_img
        k_faces = min(4 * k + 16, n_rows)
        while True:
            if self.scan_mesh is not None:
                from pixelbox_tpu.parallel.sharded_scan import (
                    sharded_cosine_scan_topk_auto,
                )

                d, r = sharded_cosine_scan_topk_auto(
                    jnp.asarray(q), self._ensure_face_sharded(),
                    self.scan_mesh, k=k_faces, max_distance=max_distance,
                )
            else:
                d, r = cosine_scan_topk_auto(
                    jnp.asarray(q), self._face_store.device_index,
                    k=k_faces, max_distance=max_distance,
                    sample=self._get_face_scan_sample(),
                    row_meta=self._get_face_pallas_meta(),
                )
            d = np.asarray(d).reshape(B, -1)
            r = np.asarray(r).reshape(B, -1)
            out_d.fill(np.inf)
            out_img.fill(-1)
            under = False
            for b in range(B):
                seen, m, matched = set(), 0, 0
                for dv, rv in zip(d[b], r[b]):
                    if rv < 0:
                        break
                    matched += 1
                    img = imgs_arr[int(rv)]
                    if img in seen:
                        continue
                    seen.add(img)
                    out_d[b, m] = dv
                    out_img[b, m] = img
                    m += 1
                    if m >= k:
                        break
                # Under-filled AND every fetched face was a real match →
                # more candidates may exist beyond the over-fetch.
                if m < k and matched == k_faces:
                    under = True
            if not under or k_faces >= n_rows:
                return out_d, out_img
            k_faces = min(2 * k_faces, n_rows)

    @_read_locked
    def face_scan_batched(self, hashes: np.ndarray, k: int, max_distance: float):
        """Batched face→image scan for the serving layer: u8 [B, D] face
        hashes → (dist [B, k], IMAGE ids [B, k], -1 padded).

        Unlike the row-returning phash/blip siblings this returns image
        ids directly: faces map many rows to one image, so image dedup
        (and its over-fetch retry) must happen inside the batched call —
        a fixed top-k of rows could under-fill after dedup.  Read-locked
        because the row→image mapping happens here on the service's
        collector thread."""
        return self._face_topk_images(hashes, k, max_distance)

    def attach_scan_service(self, service) -> None:
        """Register this engine's batched phash / text / face modalities
        on a BatchingScanService (serve.py calls this; concurrent phash,
        unfiltered ``text:``, and face queries then coalesce into device
        batches alongside semantic ones)."""
        if self._ph_store is not None:
            service.register_kind(
                "phash",
                lambda q, k, md: self.phash_scan_batched(q, k, md),
            )
        if self._blip_enabled:
            service.register_kind(
                "blip",
                lambda q, k, md: self.blip_scan_batched(q, k, md),
            )
        if self._face_store is not None and self._face_store.size > 0:
            service.register_kind(
                "face",
                lambda q, k, md: self.face_scan_batched(q, k, md),
            )
        # IVF coalesces too (used when scan_mode == "ivf"): the clustered
        # index builds lazily on first use, so registration is free.
        service.register_kind(
            "ivf",
            lambda q, k, md, n_real=None: self.ivf_scan_batched(
                q, k, md, n_real=n_real
            ),
        )

    def ivf_scan_batched(self, queries_u8, k: int, max_distance: float,
                         n_real: Optional[int] = None):
        """Batched IVF scan for the serving layer: u8 [B, D] queries →
        (dist [B, k], store row ids [B, k]).  Probes run row-sharded over
        the mesh under ``serve_on_mesh``, single-chip otherwise — the
        same dispatch (incl. the int4 exact-u8 rerank) as
        ``query_by_image_hash_from_image``'s ivf branch, without the
        per-request engine lock.  ``n_real`` (from the batching service)
        limits the int4 host rescore to the batch's real rows, not its
        zero-padded compile bucket."""
        return self._ivf_query(
            np.asarray(queries_u8, dtype=np.uint8), int(k),
            max_distance=float(max_distance), n_real=n_real,
        )

    def _ivf_query(self, q_u8: np.ndarray, k: int,
                   max_distance: Optional[float] = None,
                   n_real: Optional[int] = None):
        """Clustered-ANN scan at the library's precision.

        u8 libraries return exact u8 reciprocal-cosine distances over the
        probed set.  int4 libraries pack nibble buckets (half the bucket
        HBM); candidates retrieve in the asymmetric cosine4a metric and —
        with ``int4_rerank`` on (default) — rescore against the u8 host
        mirror via the shared ops.int4.scan_with_u8_rerank orchestration,
        so reported distances are true u8 values exactly like the flat
        int4 flow."""
        md = float(
            self.max_distance_from_query if max_distance is None
            else max_distance
        )
        if self.scan_mesh is not None:
            from pixelbox_tpu.parallel.sharded_ivf import (
                sharded_ivf_scan_topk,
            )

            sivf = self._get_ivf_sharded()

            def _scan(c, md_):
                return sharded_ivf_scan_topk(
                    q_u8, sivf, self.scan_mesh, k=c,
                    nprobe=self.ivf_nprobe, max_distance=md_,
                )
        else:
            from pixelbox_tpu.ops.ivf import ivf_scan_topk

            ivf = self._get_ivf()

            def _scan(c, md_):
                return ivf_scan_topk(
                    q_u8, ivf, k=c, nprobe=self.ivf_nprobe,
                    max_distance=md_,
                )

        if self.semantic_precision == "int4" and self.int4_rerank:
            from pixelbox_tpu.ops.int4 import scan_with_u8_rerank

            return scan_with_u8_rerank(
                _scan, q_u8, self._sem_store._host_rows,
                k=k, max_distance=md, n_real=n_real,
            )
        return _scan(k, md)

    def _phash_mixed_scan(
        self, ph: np.ndarray, wq: int, widths: np.ndarray, k: int,
        max_distance: float,
    ):
        """Zip-truncate Hamming scan over mixed-width rows: one masked
        device scan per distinct min(wq, row_width), merged by (dist, id).
        Under ``serve_on_mesh`` each group's scan runs row-sharded over
        the mesh (the group mask shards with the rows) — the compat
        default no longer drops to single-chip.
        """
        from pixelbox_tpu.ops.scan import hamming_scan_topk

        index = self._ph_store.device_index
        cap = index.capacity
        q = np.zeros(self._ph_store.dim, dtype=np.uint8)
        q[: min(wq, len(q))] = ph[: len(q)]
        limits = np.minimum(widths, wq)
        on_mesh = self.scan_mesh is not None
        if on_mesh:
            from pixelbox_tpu.parallel.sharded_scan import (
                sharded_hamming_scan_topk,
            )

            sharded = self._ensure_ph_sharded()
        cand = []
        for m in np.unique(limits):
            m = int(m)
            if m == 0:
                continue  # 0-length zip → 0/0 = NaN in the reference: excluded
            group = np.zeros(cap, dtype=bool)
            rows = np.nonzero(limits == m)[0]
            group[rows] = True
            if on_mesh:
                d, i = sharded_hamming_scan_topk(
                    jnp.asarray(q), sharded, self.scan_mesh, k=k,
                    max_distance=max_distance, byte_limit=m,
                    valid_mask=group,
                )
            else:
                masked = index._replace(
                    valid=jnp.logical_and(index.valid, jnp.asarray(group))
                )
                d, i = hamming_scan_topk(
                    jnp.asarray(q), masked, k=k, max_distance=max_distance,
                    byte_limit=m,
                )
            d, i = np.asarray(d), np.asarray(i)
            keep = i >= 0
            cand.append((d[keep], i[keep]))
        if not cand:
            return (
                np.full(k, np.inf, np.float32), np.full(k, -1, np.int32)
            )
        all_d = np.concatenate([d for d, _ in cand])
        all_i = np.concatenate([i for _, i in cand])
        order = np.lexsort((all_i, all_d))[:k]
        out_d = np.full(k, np.inf, np.float32)
        out_i = np.full(k, -1, np.int32)
        out_d[: len(order)] = all_d[order]
        out_i[: len(order)] = all_i[order]
        return out_d, out_i

    # ------------------------------------------------------------------ #
    # Duplicate finding (built on the batched device scans; the
    # reference's only dedup affordance is manual per-image
    # "find similar", search.rs:100)

    @_read_locked
    def find_duplicate_pairs(
        self,
        max_distance: float = 0.1,
        k: int = 8,
        batch: int = 256,
        by: str = "phash",
    ) -> List[tuple]:
        """All near-duplicate image pairs across the whole index.

        Scans the index against itself in query batches on device.
        ``by="phash"``: normalized Hamming over perceptual hashes with
        strict ``dist < max_distance`` (default 0.1 ≈ under 26 of 256
        bits differing).  ``by="semantic"``: reciprocal-cosine over the
        semantic index (guaranteed-exact auto scan; honors the
        library's int4 precision).

        Returns unique ``(id_a, id_b, dist)`` with ``id_a < id_b``,
        sorted by (dist, id_a, id_b).  Each image contributes at most
        ``k-1`` neighbors per direction (k includes the self-match) —
        raise ``k`` for heavily duplicated corpora.  Mixed-width compat
        phash libraries compare within same-true-width groups only
        (duplicate renders share geometry, so cross-aspect pairs are
        not duplicates).
        """
        assert by in ("phash", "semantic"), by
        if by == "phash":
            store, row_by_image, image_ids = (
                self._ph_store, self._ph_row_by_image, self._ph_image_ids,
            )
        else:
            store, row_by_image, image_ids = (
                self._sem_store, self._sem_row_by_image, self._sem_image_ids,
            )
        if store is None or store.size == 0:
            return []
        live_rows = np.asarray(sorted(row_by_image.values()), dtype=np.int64)

        # (group_rows, scan_fn(q_batch) -> (dist [B,k], idx [B,k]))
        groups = []
        if by == "phash":
            widths = np.asarray(self._ph_widths, dtype=np.int64)
            uniform = bool(np.all(widths[live_rows] == store.dim))
            if uniform and self.scan_mesh is not None:
                # Whole-index self-scan rides the mesh: each query batch
                # goes through the row-sharded hamming scan (8 chips ≈
                # 8× the single-chip pair-finding rate).
                def scan(qb):
                    return self._phash_sharded_scan(
                        np.asarray(qb), k, max_distance
                    )

                groups.append((live_rows, scan))
            elif uniform:
                from pixelbox_tpu.ops.hamming_gemm import (
                    hamming_gemm_scan_topk_auto,
                )

                self._ensure_ph_gemm()

                def scan(qb):
                    d, i = hamming_gemm_scan_topk_auto(
                        jnp.asarray(qb), self._ph_gemm, k=k,
                        max_distance=max_distance,
                        sample=self._ph_gemm_sample, meta=self._ph_gemm_meta,
                    )
                    return np.asarray(d), np.asarray(i)

                groups.append((live_rows, scan))
            else:
                from pixelbox_tpu.ops.scan import hamming_scan_topk

                index = self._ph_store.device_index
                for w in np.unique(widths[live_rows]):
                    w = int(w)
                    if w == 0:
                        continue
                    rows = live_rows[widths[live_rows] == w]
                    mask = np.zeros(index.capacity, dtype=bool)
                    mask[rows] = True
                    masked = index._replace(
                        valid=jnp.logical_and(index.valid, jnp.asarray(mask))
                    )

                    def scan(qb, masked=masked, w=w):
                        d, i = hamming_scan_topk(
                            jnp.asarray(qb), masked, k=k,
                            max_distance=max_distance, byte_limit=w,
                        )
                        return np.asarray(d), np.asarray(i)

                    groups.append((rows, scan))
        else:
            index = store.device_index
            if self.semantic_precision == "int4":
                from pixelbox_tpu.ops.int4 import cosine4_scan_topk_auto
                from pixelbox_tpu.ops.scan import (
                    DEFAULT_BLOCK_ROWS,
                    _default_backend_is_tpu,
                )

                meta = (
                    self._get_pallas_meta()
                    if _default_backend_is_tpu()
                    and index.capacity > 4 * DEFAULT_BLOCK_ROWS
                    else None
                )

                if self.scan_mesh is not None:
                    from pixelbox_tpu.parallel.sharded_scan import (
                        sharded_cosine4_scan_topk_auto,
                    )

                    def base_scan(qb, c, md):
                        return sharded_cosine4_scan_topk_auto(
                            jnp.asarray(qb), self._get_sharded_index(),
                            self.scan_mesh, k=c, max_distance=md,
                        )
                else:
                    def base_scan(qb, c, md):
                        return cosine4_scan_topk_auto(
                            jnp.asarray(qb), index, k=c, max_distance=md,
                            sample=self._get_scan_sample(), meta=meta,
                        )

                if self.int4_rerank:
                    # Candidates in the int4 metric (unbounded), pair
                    # distances in the exact u8 metric — duplicate pairs
                    # then carry the same distances int8 mode reports.
                    from pixelbox_tpu.ops.int4 import scan_with_u8_rerank

                    def scan(qb):
                        return scan_with_u8_rerank(
                            lambda c, md: base_scan(qb, c, md),
                            qb,
                            self._sem_store._host_rows,
                            k=k, max_distance=max_distance,
                        )
                else:
                    def scan(qb):
                        d, i = base_scan(qb, k, max_distance)
                        return np.asarray(d), np.asarray(i)
            elif self.scan_mesh is not None:
                from pixelbox_tpu.parallel.sharded_scan import (
                    sharded_cosine_scan_topk_auto,
                )

                def scan(qb):
                    d, i = sharded_cosine_scan_topk_auto(
                        jnp.asarray(qb), self._get_sharded_index(),
                        self.scan_mesh, k=k, max_distance=max_distance,
                    )
                    return np.asarray(d), np.asarray(i)
            else:
                def scan(qb):
                    d, i = cosine_scan_topk_auto(
                        jnp.asarray(qb), index, k=k,
                        max_distance=max_distance,
                        sample=self._get_scan_sample(),
                        row_meta=self._get_pallas_meta(),
                    )
                    return np.asarray(d), np.asarray(i)

            groups.append((live_rows, scan))

        seen = set()
        out = []
        with timed("engine.duplicate_scan"):
            for rows, scan in groups:
                qrows = store.get_rows(rows)
                for s in range(0, len(rows), batch):
                    qb = qrows[s : s + batch]
                    dists, idxs = scan(qb)
                    for qi in range(len(qb)):
                        a = image_ids[int(rows[s + qi])]
                        for d, r in zip(dists[qi], idxs[qi]):
                            if r < 0:
                                break  # hits are sorted; -1 padding follows
                            b = image_ids[int(r)]
                            if b == a:
                                continue
                            key = (min(a, b), max(a, b))
                            if key in seen:
                                continue
                            seen.add(key)
                            out.append((key[0], key[1], float(d)))
        out.sort(key=lambda p: (p[2], p[0], p[1]))
        return out

    def find_duplicate_groups(self, **kwargs) -> List[List[int]]:
        """Connected components of :meth:`find_duplicate_pairs` — each
        group is a sorted list of mutually-near-duplicate image ids
        (transitively: A~B and B~C group A,B,C even if A,C are just
        past the cutoff).  Groups sorted by size desc, then first id."""
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, _ in self.find_duplicate_pairs(**kwargs):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups: dict = {}
        for x in parent:
            groups.setdefault(find(x), []).append(x)
        out = [sorted(g) for g in groups.values()]
        out.sort(key=lambda g: (-len(g), g[0]))
        return out

    # ------------------------------------------------------------------ #
    # Results (engine.rs:398-402)

    def get_query_results(self) -> Optional[List[IndexedImage]]:
        return self._cached_search_results

    def clear_query_results(self) -> None:
        self._cached_search_results = None

    def _build_results(self, rows, dists) -> List[IndexedImage]:
        ids = [self._sem_image_ids[int(row)] for row in rows]
        infos = self.catalog.get_images_with_tags(ids)
        out = []
        for row, image_id, d in zip(rows, ids, dists):
            info = infos.get(image_id)
            if info is None:
                continue
            rec = self._record_from_info(info)
            rec.visual_hash = self._sem_store.get_rows([int(row)])[0]
            rec.distance_from_query = float(d)
            out.append(rec)
        return out

    def _results_from_image_ids(self, ids, dists) -> List[IndexedImage]:
        """Batched catalog assembly for non-semantic result paths
        (phash / BLIP): one IN-list query pair instead of 2 per hit."""
        infos = self.catalog.get_images_with_tags(ids)
        out = []
        for image_id, d in zip(ids, dists):
            info = infos.get(image_id)
            if info is None:
                continue
            rec = self._record_from_info(info)
            rec.distance_from_query = float(d)
            out.append(rec)
        return out

    @staticmethod
    def _record_from_info(info: dict) -> IndexedImage:
        return IndexedImage(
            id=info["id"],
            filename=info["filename"],
            path=info["path"],
            resolution=info["resolution"],
            thumbnail=info["thumbnail"],
            tags=info["tags"],
        )

    def _record_from_catalog(self, image_id: int) -> Optional[IndexedImage]:
        info = self.catalog.get_image(image_id)
        if info is None:
            return None
        info["tags"] = self.catalog.get_tags(image_id)
        return self._record_from_info(info)

    # ------------------------------------------------------------------ #

    def close(self) -> None:
        self.stop_watching()
        self.stop_indexing()
        self.catalog.close()
