"""Face search serving (the ``face:`` operator; reference roadmap
README.md:33).

Owns detection + crop embedding, the image-deduped top-k core with its
over-fetch retry, filtered and unfiltered query flows, the batched
serving-layer scan, the sharded mirror, and the backfill indexer.
Mixed into :class:`pixelbox_tpu.engine.Engine`.
"""

from __future__ import annotations

from typing import List

import sys

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ingest.decode import decode_image_file
from pixelbox_tpu.ops.distances import cosine_distance
from pixelbox_tpu.ops.scan import cosine_scan_topk_auto
from pixelbox_tpu.serving.common import _read_locked
from pixelbox_tpu.utils.timing import timed


class FaceServing:
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
