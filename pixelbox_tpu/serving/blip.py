"""BLIP text->image serving (the ``text:`` operator).

Semantic text search over the BLIP latent index (reference roadmap
README.md:35; the reference staged models/blip-config.json but never
wired it).  Owns the filtered/unfiltered query flows, the batched
serving-layer scan, the sharded mirror, and the backfill indexer.
Mixed into :class:`pixelbox_tpu.engine.Engine`.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.distances import cosine_distance
from pixelbox_tpu.ops.scan import cosine_scan_topk_auto
from pixelbox_tpu.serving.common import _read_locked
from pixelbox_tpu.utils.timing import timed


class BlipServing:
    def enable_blip(self, **blip_kwargs) -> None:
        self._blip_enabled = True
        self.catalog.set_setting("blip_enabled", "1")
        if blip_kwargs:
            self._blip_kwargs = dict(blip_kwargs)
            self._blip_searcher = None

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
