"""Near-duplicate finding over the whole index.

Batched index-vs-itself device scans (the reference's only dedup
affordance is manual per-image "find similar", search.rs:100): unique
near pairs under a strict distance cutoff, plus transitive groups.
Mixed into :class:`pixelbox_tpu.engine.Engine`.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.scan import cosine_scan_topk_auto
from pixelbox_tpu.serving.common import _read_locked
from pixelbox_tpu.utils.timing import timed


class DuplicateFinding:
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
