"""Perceptual-hash (Hamming) serving — single-chip and mesh-sharded.

The capability behind the reference's phash table + hamming UDF
(engine.rs:594-663): uniform-width indexes ride the bit-unpacked +-1
GEMM formulation on the MXU; mixed widths (aspect-preserving compat
phashes) replicate the reference's zip-truncate semantics per
width group.  Mixed into :class:`pixelbox_tpu.engine.Engine`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.serving.common import _read_locked


class PhashServing:
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
