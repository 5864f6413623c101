"""Semantic (visual-similarity) serving — the engine's hot query path.

Owns the single-chip AND mesh-sharded flows for the u8/int4 semantic
index (reference engine.rs:352-396): scan-mode dispatch
(auto/exact/fast/pallas/ivf), the sharded-mirror delta sync, the cached
theta sample / Pallas row metadata, and the masked-exact scan core that
broad catalog filters (and the blip/face mixins) fold into.

Mixed into :class:`pixelbox_tpu.engine.Engine`; state lives on the
engine (stores, caches, locks) — this module owns behavior only.
"""

from __future__ import annotations

from typing import Optional

import sys
import time

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.scan import cosine_scan_topk, cosine_scan_topk_auto
from pixelbox_tpu.records import IndexedImage
from pixelbox_tpu.serving.common import _read_locked
from pixelbox_tpu.utils.timing import timed


class SemanticServing:
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
