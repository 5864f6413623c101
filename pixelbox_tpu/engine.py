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
from pixelbox_tpu.ops.scan import cosine_scan_topk
from pixelbox_tpu.query import parse_query
from pixelbox_tpu.serving import (
    BlipServing,
    DuplicateFinding,
    FaceServing,
    IvfServing,
    PhashServing,
    SemanticServing,
    WatchMixin,
)
from pixelbox_tpu.serving.common import _read_locked
from pixelbox_tpu.records import IndexedImage
from pixelbox_tpu.utils.timing import timed

DEFAULT_MAX_QUERY_DISTANCE = 1e3  # engine.rs:23
DEFAULT_MAX_SEARCH_RESULTS = 100  # engine.rs:24
RECENT_IMAGES_TO_SHOW = 10        # engine.rs:25


class Engine(
    SemanticServing,
    PhashServing,
    BlipServing,
    FaceServing,
    IvfServing,
    DuplicateFinding,
    WatchMixin,
):
    """Index + query engine over a catalog DB and device vector stores.

    Lifecycle, catalog, locking, ingest writes, and the query-language
    dispatcher live here; each modality's serving paths (single-chip
    and mesh-sharded) live in pixelbox_tpu/serving/, one module per
    modality."""

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
        # semantic_precision is already resolved against the persisted
        # setting above, so it alone decides the warning.
        if not self.int4_rerank and self.semantic_precision == "int4":
            # Mirror the RANDOM-INIT BLIP warning: raw int4-metric
            # selection is quietly bad (recall@10 vs u8 measured 0.52
            # asym / 0.42 sym on the structured bench) and nothing else
            # tells the user what turning the rerank off bought them.
            print(
                "WARNING: int4 library with int4_rerank disabled — "
                "results are raw int4-metric (measured recall@10 vs the "
                "u8 ground truth ~0.5 on the structured bench, vs 1.0 "
                "with the default exact-u8 rerank); distances are NOT "
                "comparable with int8 libraries.  See PERF.md 'int4'.",
                file=sys.stderr,
            )
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
        #: serve_on_mesh (parallel/sharded_ivf).  ``ivf_nprobe=None`` =
        #: the recall-governed default (2% of clusters, floor 8 —
        #: ops.ivf.default_nprobe); a fixed nprobe=8 measured recall@10
        #: 0.972 at 1M/4000 clusters on TPU (BENCH_DETAIL r4), the
        #: scaling default holds >= 0.99.
        self.ivf_nprobe: Optional[int] = None
        #: Opt-in MEASURED nprobe (the stronger alternative to the 2%
        #: policy): when set (e.g. 0.99) and ivf_nprobe is unset, each
        #: full repack tunes nprobe on held-out noisy copies of store
        #: rows until recall@10 vs the exact scan meets the target
        #: (ops.ivf_build.tune_nprobe; a few probe compiles per repack).
        self.ivf_target_recall: Optional[float] = None
        self._ivf_tuned_nprobe: Optional[int] = None
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
            if getattr(self._blip_searcher, "random_init", False):
                print(
                    "WARNING: blip text towers are RANDOM-INIT — `text:` "
                    "results will be noise until you train "
                    "(training/blip_train.py) or "
                    "import weights (params_from_hf_state_dict); see "
                    "PERF.md 'text: retrieval quality'.",
                    file=sys.stderr,
                )
            self.catalog.ensure_aux_hash_table("blip_hashes")
        return self._blip_searcher

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

    def set_embed_batch_size(self, batch_size: int) -> None:
        """Record the ingest embed batch size (in-process AND persisted).

        The exact-self-match guarantee depends on queries replaying the
        SAME padded batch shape ingest used; persisting it in the catalog
        keeps the guarantee when a library ingested at a non-default
        batch size is reopened in a new process (ADVICE r4)."""
        batch_size = int(batch_size)
        self._embed_batch_size = batch_size
        if self.catalog.get_setting("embed_batch_size") != str(batch_size):
            self.catalog.set_setting("embed_batch_size", str(batch_size))

    def _embed_query_ingest_exact(
        self, rgb: np.ndarray, frame: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Quantized semantic hash through the EXACT ingest batch path.

        The reference recomputes a query image's hash through its one and
        only embed path, so a re-dropped copy of an indexed image scores
        exactly 0 (engine.rs:352-361 → efficientnet.rs:31-42).  A batched
        ingest embed and a single-query embed are different XLA programs
        whose f32 outputs can drift by ulps and flip a u8 bin; routing the
        query through the same padded batch shape and the same jitted
        functions the ingest writer uses makes the two bit-identical
        (asserted in tests/test_selfmatch.py).  The batch size is read
        from the library when not set in-process (set_embed_batch_size).

        Caveat (documented, not guarded): the MESH state is not
        persisted — a library ingested under a data-parallel mesh and
        queried without one (or vice versa) routes through a different
        XLA program, where ulp drift can flip a u8 bin.  Attach the same
        mesh for bit-exact self-matches of mesh-ingested libraries.
        """
        from pixelbox_tpu.ingest.pipeline import (
            DEFAULT_BATCH_SIZE,
            _normalize_frames,
        )
        from pixelbox_tpu.ops.preprocess import fill_resize_u8
        from pixelbox_tpu.ops.quantize import quantize_embedding

        b = getattr(self, "_embed_batch_size", None)
        if b is None:
            stored = self.catalog.get_setting("embed_batch_size")
            b = int(stored) if stored else DEFAULT_BATCH_SIZE
            self._embed_batch_size = b
        if frame is None:
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
        # Share the embed frame's pre-crop cover image as the thumbnail
        # source (one full-res resample, same as the ingest pipeline).
        frame = big = None
        if self.embedder is not None:
            from pixelbox_tpu.ops.preprocess import fill_resize_u8_with_big

            frame, big = fill_resize_u8_with_big(
                decoded.rgb, self.embedder.input_size
            )
        thumb = qoi_encode(make_thumbnail(decoded.rgb, prescaled=big))
        ph = phash_ops.phash(decoded.rgb, aspect_preserving=self.phash_compat)
        vh = (
            None
            if self.embedder is None
            else self._embed_query_ingest_exact(decoded.rgb, frame=frame)
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
