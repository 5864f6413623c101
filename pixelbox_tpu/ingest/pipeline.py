"""Batched ingest pipeline: crawl → decode pool → device embed → append.

The reference's ingest (src/crawler.rs + engine.rs:173-216) is a 3-stage
CPU pipeline: glob thread → 4 decode workers (each doing a full per-image
ONNX forward on CPU) → DB-writer thread, joined by channels with a
bounded(128) buffer.

The TPU-native shape keeps the host topology but moves embedding to the
device in batches:

    [walker thread]   glob walk + extension filter + already-indexed skip
          │ path queue (unbounded, like crawler.rs:27)
    [decode pool xN]  decode → EXIF → QOI thumbnail → phash → 224² preprocess
          │ item queue (bounded 128, backpressure like crawler.rs:8,28)
    [device thread]   stack batch → jitted embed → quantize → append to
                      catalog + packed stores (single writer, engine.rs:186)

The device thread is the lone writer (same discipline as the reference's
single DB-writer thread), so stores/catalog need no extra synchronization.
Stopping mid-run is safe: inserts are idempotent by path, so a re-index
resumes where it left off (engine.rs:231 semantics).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ingest.crawler import crawl
from pixelbox_tpu.ingest.decode import decode_image_file, stringify_filepath
from pixelbox_tpu.ingest.thumbnail import make_thumbnail, qoi_encode
from pixelbox_tpu.ops import phash as phash_ops
from pixelbox_tpu.ops.preprocess import (
    fill_resize_u8_with_big,
    preprocess_host,
)
from pixelbox_tpu.ops.quantize import quantize_embedding
from pixelbox_tpu.records import IndexedImage
from pixelbox_tpu.utils.timing import timed

PARALLEL_FILE_PROCESSORS = 4  # engine.rs:22
MAX_PENDING_TX = 128          # crawler.rs:8
DEFAULT_BATCH_SIZE = 64
_SENTINEL = None


@jax.jit
def _normalize_frames(frames_u8):
    return frames_u8.astype(jnp.float32) / jnp.float32(255.0)


@dataclass
class _Item:
    record: IndexedImage
    preprocessed: np.ndarray  # f32 [S,S,3] (classic) or u8 frame (turbo)
    preprocessed_blip: Optional[np.ndarray] = None  # f32 [Sb, Sb, 3]
    #: faces mode: (normalized boxes, preprocessed f32 crops) per image
    faces: Optional[tuple] = None


class IngestPipeline:
    def __init__(
        self,
        engine,
        folders: List[str],
        num_workers: Optional[int] = None,
        batch_size: int = DEFAULT_BATCH_SIZE,
        turbo: Optional[bool] = None,
    ):
        self.engine = engine
        self.folders = list(folders)
        self.num_workers = num_workers or PARALLEL_FILE_PROCESSORS
        self.batch_size = batch_size
        # Query embeds replay this exact batch shape for bit-identical
        # self-matches (engine._embed_query_ingest_exact).  Persisted so
        # a library ingested at a non-default batch size keeps the exact
        # self-match guarantee across process restarts (ADVICE r4).
        engine.set_embed_batch_size(batch_size)
        # Turbo: one host resize per image; phash (square mode) + embed
        # preprocessing run batched on device.  Requires compat-off phash
        # (the aspect-preserving variable-length hash is host-only) and an
        # embedder (tags-only mode has no device frames to hash from).
        self.turbo = (
            turbo if turbo is not None else not getattr(engine, "phash_compat", True)
        ) and engine.embedder is not None
        self._stop = threading.Event()
        self._path_q: "queue.Queue" = queue.Queue()
        self._item_q: "queue.Queue" = queue.Queue(maxsize=MAX_PENDING_TX)
        self._threads: List[threading.Thread] = []
        self._writer: Optional[threading.Thread] = None
        self.images_indexed = 0
        self.images_skipped = 0
        self.images_failed = 0
        self._started_at: Optional[float] = None

    # ------------------------------------------------------------------ #

    def start(self) -> None:
        self._started_at = time.perf_counter()
        walker = threading.Thread(target=self._walk, name="pixelbox-walker", daemon=True)
        walker.start()
        self._threads.append(walker)
        for i in range(self.num_workers):
            t = threading.Thread(
                target=self._decode_worker, name=f"pixelbox-decode-{i}", daemon=True
            )
            t.start()
            self._threads.append(t)
        self._writer = threading.Thread(
            target=self._device_writer, name="pixelbox-writer", daemon=True
        )
        self._writer.start()

    def stop(self) -> None:
        """Stop like dropping the crawler channel (engine.rs:207-212)."""
        self._stop.set()

    def is_active(self) -> bool:
        return self._writer is not None and self._writer.is_alive()

    def join(self, timeout: Optional[float] = None) -> bool:
        if self._writer is None:
            return True
        self._writer.join(timeout)
        return not self._writer.is_alive()

    # ------------------------------------------------------------------ #

    def _walk(self) -> None:
        try:
            for path in crawl(self.folders):
                if self._stop.is_set():
                    break
                self._path_q.put(path)
        finally:
            for _ in range(self.num_workers):
                self._path_q.put(_SENTINEL)

    def _decode_worker(self) -> None:
        engine = self.engine
        while not self._stop.is_set():
            try:
                path = self._path_q.get(timeout=0.1)
            except queue.Empty:
                continue
            if path is _SENTINEL:
                break
            try:
                if engine.catalog.has_path(stringify_filepath(path)):
                    # INSERT OR IGNORE semantics, checked BEFORE decode so
                    # a re-index (or a watch pass) over an already-indexed
                    # library costs one catalog lookup per file, not a
                    # full decode (decoded.path is stringify_filepath(path),
                    # so the keys match exactly).
                    self.images_skipped += 1
                    continue
                decoded = decode_image_file(path)
                if decoded is None:
                    self.images_failed += 1
                    continue
                # Embed input always ships to the device as a u8 frame
                # (4x less host->device transfer than f32; /255 happens on
                # device).  Turbo additionally moves phash to the device.
                # Tags-only mode (embedder None) skips the frame entirely.
                # The frame's pre-crop cover image doubles as the
                # thumbnail source: ONE full-res resample per image.
                pre, big = (
                    (None, None)
                    if engine.embedder is None
                    else fill_resize_u8_with_big(
                        decoded.rgb, engine.embedder.input_size
                    )
                )
                thumb = qoi_encode(make_thumbnail(decoded.rgb, prescaled=big))
                ph = (
                    None
                    if self.turbo
                    else phash_ops.phash(
                        decoded.rgb, aspect_preserving=engine.phash_compat
                    )
                )
                blip = getattr(engine, "blip_searcher", None)
                pre_blip = (
                    preprocess_host(decoded.rgb, blip.input_size)
                    if blip is not None
                    else None
                )
                face_dets = None
                if (
                    getattr(engine, "faces_enabled", False)
                    and engine.embedder is not None
                ):
                    # Detection runs here in the decode pool (host CPU,
                    # parallel across workers); the crops embed on device
                    # in the writer's batch.
                    from pixelbox_tpu.faces.detect import crop_face

                    try:
                        boxes = engine.face_detector(decoded.rgb)
                    except Exception:
                        boxes = []
                    if boxes:
                        face_dets = (
                            [(b.x0, b.y0, b.x1, b.y1) for b in boxes],
                            [
                                preprocess_host(
                                    crop_face(decoded.rgb, b),
                                    engine.embedder.input_size,
                                )
                                for b in boxes
                            ],
                        )
                tags = decoded.tags
                if getattr(engine, "ocr_enabled", False):
                    from pixelbox_tpu.ocr import OCR_TAG, recognize_text
                    from pixelbox_tpu.ocr.glyphs import fold_text

                    try:
                        text = recognize_text(decoded.rgb)
                    except Exception:
                        text = ""
                    if text:
                        tags = dict(tags)
                        tags[OCR_TAG] = text
                        tags[OCR_TAG + "_fold"] = fold_text(text)
                record = IndexedImage(
                    filename=decoded.filename,
                    path=decoded.path,
                    resolution=decoded.resolution,
                    thumbnail=thumb,
                    tags=tags,
                    phash=ph,
                )
                item = _Item(
                    record=record,
                    preprocessed=pre,
                    preprocessed_blip=pre_blip,
                    faces=face_dets,
                )
                while not self._stop.is_set():
                    try:
                        self._item_q.put(item, timeout=0.25)
                        break
                    except queue.Full:
                        continue
            except Exception:
                self.images_failed += 1
        # Each worker signals drain-completion to the writer.
        self._item_q.put(_SENTINEL)

    def _device_writer(self) -> None:
        engine = self.engine
        workers_done = 0
        batch: List[_Item] = []
        while True:
            flush = False
            try:
                item = self._item_q.get(timeout=0.25)
                if item is _SENTINEL:
                    workers_done += 1
                    if workers_done == self.num_workers:
                        flush = True
                else:
                    batch.append(item)
                    if len(batch) >= self.batch_size:
                        flush = True
            except queue.Empty:
                # Idle — flush a partial batch so small folders finish fast.
                flush = bool(batch)
            if self._stop.is_set():
                flush = bool(batch)
            if flush and batch:
                self._embed_and_insert(batch)
                batch = []
            if workers_done == self.num_workers or (
                self._stop.is_set() and not batch
            ):
                break
        if self._started_at is not None:
            dt = time.perf_counter() - self._started_at
            print(f"Indexing took {dt:.1f} seconds.")

    def _pad_batch(self, arr: np.ndarray) -> np.ndarray:
        """Pad to the fixed batch size: partial flushes must not create new
        jit shapes (each distinct shape is a fresh compile)."""
        m = arr.shape[0]
        if m == self.batch_size:
            return arr
        pad = np.zeros((self.batch_size - m,) + arr.shape[1:], dtype=arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    def _embed_and_insert(self, batch: List[_Item]) -> None:
        m = len(batch)
        if self.engine.embedder is None:
            hashes = [None] * m  # tags-only mode: no semantic hashes
        else:
            with timed("ingest.embed_batch"):
                frames_u8 = jnp.asarray(
                    self._pad_batch(np.stack([it.preprocessed for it in batch]))
                )  # u8 [B, S, S, 3]
                if self.turbo:
                    phashes = np.asarray(phash_ops.phash_batch_tpu(frames_u8))[:m]
                    for it, ph in zip(batch, phashes):
                        it.record.phash = ph
                stacked = _normalize_frames(frames_u8)
                mesh = getattr(self.engine, "mesh", None)
                if mesh is not None:
                    from pixelbox_tpu.parallel.data_parallel import (
                        embed_batch_sharded,
                    )

                    latents = jnp.asarray(
                        embed_batch_sharded(
                            self.engine.embedder, np.asarray(stacked), mesh
                        )
                    )
                else:
                    latents = self.engine.embedder.embed_preprocessed(stacked)
                hashes = np.asarray(quantize_embedding(latents))[:m]
        blip = getattr(self.engine, "blip_searcher", None)
        if blip is not None and all(it.preprocessed_blip is not None for it in batch):
            with timed("ingest.blip_embed_batch"):
                stacked_b = jnp.asarray(
                    self._pad_batch(
                        np.stack([it.preprocessed_blip for it in batch])
                    )
                )
                blip_hashes = np.asarray(
                    quantize_embedding(blip.embed_image_batch(stacked_b))
                )[: len(batch)]
            for it, bh in zip(batch, blip_hashes):
                it.record.blip_hash = bh
        for it, vh in zip(batch, hashes):
            it.record.visual_hash = vh
        # Face crops: one device embed for ALL the batch's faces, padded
        # to a power-of-two bucket (variable face counts must not mint a
        # fresh jit shape per flush).
        crops: List[np.ndarray] = []
        owners: List[tuple] = []
        for it in batch:
            if it.faces:
                for box, crop in zip(*it.faces):
                    crops.append(crop)
                    owners.append((it, box))
        if crops and self.engine.embedder is not None:
            with timed("ingest.face_embed_batch"):
                n = len(crops)
                bucket = 1
                while bucket < n:
                    bucket *= 2
                arr = np.stack(crops)
                if bucket > n:
                    arr = np.concatenate(
                        [arr, np.zeros((bucket - n,) + arr.shape[1:], arr.dtype)]
                    )
                face_latents = self.engine.embedder.embed_preprocessed(
                    jnp.asarray(arr)
                )
                face_hashes = np.asarray(quantize_embedding(face_latents))[:n]
            for (it, box), h in zip(owners, face_hashes):
                if it.record.faces is None:
                    it.record.faces = []
                it.record.faces.append((box, h))
        ids = self.engine.insert_records_batch([it.record for it in batch])
        for i in ids:
            if i is not None:
                self.images_indexed += 1
            else:
                self.images_skipped += 1
