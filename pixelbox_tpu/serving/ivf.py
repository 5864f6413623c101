"""IVF (clustered-ANN) index management and serving.

The >10M-row / lowest-latency rung (ops/ivf.py): k-means centroids with
a persistence sidecar, incremental spill extension on pure appends,
full repack on structural change, the mesh-sharded mirror, and the
batched serving-layer probe (u8 exact distances; int4 buckets with the
standard exact-u8 rerank).  Mixed into
:class:`pixelbox_tpu.engine.Engine`; the engine owns the caches/locks.
"""

from __future__ import annotations

from typing import Optional

import os
import sys

import numpy as np

from pixelbox_tpu.utils.timing import timed


class IvfServing:
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
        (0 = auto cluster count).  ivf_target_recall is included so
        setting it AFTER an index is cached triggers a rebuild + tune —
        otherwise the knob silently does nothing until an unrelated
        structural repack."""
        return (
            int(self.ivf_clusters or 0),
            float(self.ivf_target_recall or 0.0),
        )

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
        # Opt-in measured nprobe: tune against the freshly packed index
        # (the tuned value is index-specific, so it re-derives on every
        # full repack; spill-only extends keep it).
        self._ivf_tuned_nprobe = None
        if self.ivf_nprobe is None and self.ivf_target_recall:
            from pixelbox_tpu.ops.ivf_build import tune_nprobe

            with timed("engine.ivf_tune_nprobe"):
                tuned, rec = tune_nprobe(
                    self._ivf, rows,
                    target_recall=float(self.ivf_target_recall),
                    valid=valid,
                )
            self._ivf_tuned_nprobe = tuned
            print(
                f"ivf: tuned nprobe={tuned} (measured recall@10 "
                f"{rec:.4f} vs target {self.ivf_target_recall})",
                file=sys.stderr,
            )
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
        # Tuned nprobe is index-specific: drop any value derived from a
        # different (e.g. single-chip) pack and re-tune against THIS
        # sharded index through its real scan path.
        self._ivf_tuned_nprobe = None
        if self.ivf_nprobe is None and self.ivf_target_recall:
            from pixelbox_tpu.ops.ivf_build import tune_nprobe

            sivf = self._ivf_sharded
            mesh = self.scan_mesh
            if self.semantic_precision == "int4" and self.int4_rerank:
                from pixelbox_tpu.ops.int4 import scan_with_u8_rerank

                def _scan(qs, nprobe):
                    return scan_with_u8_rerank(
                        lambda c_, md_: sivf_mod.sharded_ivf_scan_topk(
                            qs, sivf, mesh, k=c_, nprobe=nprobe,
                            max_distance=md_,
                        ),
                        qs, self._sem_store._host_rows, k=10,
                        max_distance=1e3,
                    )
            else:
                def _scan(qs, nprobe):
                    return sivf_mod.sharded_ivf_scan_topk(
                        qs, sivf, mesh, k=10, nprobe=nprobe,
                    )

            with timed("engine.ivf_tune_nprobe"):
                tuned, rec = tune_nprobe(
                    sivf, rows,
                    target_recall=float(self.ivf_target_recall),
                    valid=valid, scan_fn=_scan,
                )
            self._ivf_tuned_nprobe = tuned
            print(
                f"ivf (sharded): tuned nprobe={tuned} (measured "
                f"recall@10 {rec:.4f} vs target "
                f"{self.ivf_target_recall})",
                file=sys.stderr,
            )
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
            # Explicit knob > build-time tuned value > 2% auto policy.
            nprobe = self.ivf_nprobe or self._ivf_tuned_nprobe

            def _scan(c, md_):
                return sharded_ivf_scan_topk(
                    q_u8, sivf, self.scan_mesh, k=c,
                    nprobe=nprobe, max_distance=md_,
                )
        else:
            from pixelbox_tpu.ops.ivf import ivf_scan_topk

            ivf = self._get_ivf()
            nprobe = self.ivf_nprobe or self._ivf_tuned_nprobe

            def _scan(c, md_):
                return ivf_scan_topk(
                    q_u8, ivf, k=c, nprobe=nprobe,
                    max_distance=md_,
                )

        if self.semantic_precision == "int4" and self.int4_rerank:
            from pixelbox_tpu.ops.int4 import scan_with_u8_rerank

            return scan_with_u8_rerank(
                _scan, q_u8, self._sem_store._host_rows,
                k=k, max_distance=md, n_real=n_real,
            )
        return _scan(k, md)
