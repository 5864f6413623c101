"""Micro-batching scan service — production query serving.

The scan is far more efficient batched (one 256-query pass costs barely
more than one 1-query pass — see PERF.md), but interactive clients arrive
one query at a time.  This service coalesces concurrent requests into
device batches: callers block on :meth:`submit`; a collector thread drains
the queue up to ``max_batch`` (or ``max_wait_ms``), groups requests by
MODALITY (semantic / phash / blip-text — each has its own index and
distance kind), pads each group to a bucketed batch shape (bounded compile
cache), runs ONE scan per group, and distributes per-query results.

The reference has no serving story at all (single-user desktop app); this
is the piece that makes the engine deployable behind a fleet of frontends.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from pixelbox_tpu.ops.scan import cosine_scan_topk, cosine_scan_topk_auto
from pixelbox_tpu.utils.timing import timed

_BUCKETS = (1, 8, 32, 128, 256)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


@dataclass
class _Request:
    query: np.ndarray
    kind: str = "semantic"
    event: threading.Event = field(default_factory=threading.Event)
    dist: Optional[np.ndarray] = None
    idx: Optional[np.ndarray] = None
    error: Optional[Exception] = None


class BatchingScanService:
    """Coalesces concurrent similarity queries into single device scans.

    ``kind="semantic"`` scans run through the built-in index logic
    (``index_provider`` + mode).  Additional modalities register batched
    scan callables via ``scan_fns`` / :meth:`register_kind` — e.g. the
    engine's batched phash and BLIP text scans — and their requests
    coalesce exactly the same way (grouped per kind within a drained
    batch, so a mixed burst costs one device pass per modality).
    """

    def __init__(
        self,
        index_provider,
        k: int = 100,
        max_distance: float = 1e3,
        max_batch: int = 256,
        max_wait_ms: float = 2.0,
        mode: str = "auto",
        scan_fns: Optional[Dict[str, Callable]] = None,
        rerank_rows_provider: Optional[Callable] = None,
    ):
        """``index_provider``: zero-arg callable returning the current
        PackedSemanticIndex (so appends are picked up between batches).
        ``scan_fns``: {kind: fn(queries_u8_2d, k, max_distance) ->
        (dist [B,k], idx [B,k])} for non-semantic modalities.
        ``rerank_rows_provider``: zero-arg callable returning the u8 host
        mirror [N, D] — when set and the index is int4, batched scans
        retrieve top-C int4 candidates and rescore them with the exact u8
        metric (engine.int4_rerank semantics; serve.py wires the engine's
        store mirror)."""
        self._provider = (
            index_provider if callable(index_provider) else (lambda: index_provider)
        )
        self._rerank_rows = rerank_rows_provider
        self.k = k
        self.max_distance = max_distance
        self.max_batch = min(max_batch, _BUCKETS[-1])
        self.max_wait_s = max_wait_ms / 1e3
        self.mode = mode
        self._scan_fns: Dict[str, Callable] = dict(scan_fns or {})
        self._scan_n_real: Dict[str, bool] = {}
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # Derived scan inputs (θ sample, pallas row meta), cached per
        # index buffer identity — rebuilding them per batch would put a
        # full-index pass on the hot path the batching exists to shrink.
        self._scan_aux_key = None
        self._scan_sample = None
        self._scan_meta = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._collector, name="pixelbox-scan-batcher", daemon=True
        )
        self._thread.start()
        self.batches_run = 0
        self.queries_served = 0

    # ------------------------------------------------------------------ #

    def warmup(self, dim: int, buckets=(1, 8, 32), kinds=("semantic",)) -> None:
        """Pre-compile the scan for the given batch-size buckets so the
        first real queries don't pay cold XLA compiles mid-traffic (each
        bucket shape is its own compile; serve.py calls this at startup
        for the semantic path).  Uses zero queries — results discarded."""
        for kind in kinds:
            for b in buckets:
                queries = np.zeros((b, dim), dtype=np.uint8)
                try:
                    if kind == "semantic":
                        self._semantic_scan(queries)
                    else:
                        self._scan_fns[kind](queries, self.k, self.max_distance)
                except Exception:
                    pass  # empty store etc. — warm later organically

    def register_kind(self, kind: str, fn: Callable) -> None:
        """Register a batched scan callable for a modality:
        ``fn(queries_u8 [B, D], k, max_distance) -> (dist, idx)``.

        Callables that also accept an ``n_real`` keyword get the real
        request count of the zero-padded compile bucket — scans with a
        host rescore stage (ivf on an int4 library) use it to skip
        rescoring the padding, like the built-in semantic int4 path.
        """
        import inspect

        try:
            takes_n_real = "n_real" in inspect.signature(fn).parameters
        except (TypeError, ValueError):  # builtins/partials w/o signature
            takes_n_real = False
        self._scan_fns[kind] = fn
        self._scan_n_real[kind] = takes_n_real

    @property
    def kinds(self) -> Tuple[str, ...]:
        return ("semantic",) + tuple(sorted(self._scan_fns))

    def submit(
        self,
        query_u8: np.ndarray,
        timeout: Optional[float] = 60.0,
        kind: str = "semantic",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking query: u8 [D] → (dist [k], idx [k])."""
        if kind != "semantic" and kind not in self._scan_fns:
            raise KeyError(f"no scan fn registered for kind {kind!r}")
        req = _Request(query=np.asarray(query_u8, dtype=np.uint8), kind=kind)
        self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("scan service timed out")
        if req.error is not None:
            raise req.error
        return req.dist, req.idx

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------ #

    def _collector(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch: List[_Request] = [first]
            deadline = self.max_wait_s
            import time as _time

            t0 = _time.monotonic()
            while len(batch) < self.max_batch:
                remaining = deadline - (_time.monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            # One device pass per (kind, query width) group; widths can
            # differ for compat phashes and must not be zero-padded into
            # one another.
            groups: Dict[Tuple[str, int], List[_Request]] = {}
            for r in batch:
                groups.setdefault((r.kind, r.query.shape[0]), []).append(r)
            for (kind, _w), grp in groups.items():
                self._run_group(kind, grp)

    def _scan_aux(self, index):
        key = id(index.data)
        if self._scan_aux_key != key:
            from pixelbox_tpu.ops.scan import (
                DEFAULT_BLOCK_ROWS,
                _default_backend_is_tpu,
                build_scan_sample,
            )

            sample = meta = None
            if index.capacity > 4 * DEFAULT_BLOCK_ROWS:
                sample = build_scan_sample(index)
                if _default_backend_is_tpu():
                    from pixelbox_tpu.ops.pallas_scan import build_row_meta

                    meta = build_row_meta(index)
            self._scan_sample = sample
            self._scan_meta = meta
            self._scan_aux_key = key
        return self._scan_sample, self._scan_meta

    def _run_group(self, kind: str, batch: List[_Request]) -> None:
        try:
            m = len(batch)
            d = batch[0].query.shape[0]
            b = _bucket(m)
            queries = np.zeros((b, d), dtype=np.uint8)
            for i, r in enumerate(batch):
                queries[i] = r.query
            with timed(f"serving.batched_scan.{kind}"):
                if kind == "semantic":
                    dist, idx = self._semantic_scan(queries, n_real=m)
                elif self._scan_n_real.get(kind):
                    dist, idx = self._scan_fns[kind](
                        queries, self.k, self.max_distance, n_real=m
                    )
                else:
                    dist, idx = self._scan_fns[kind](
                        queries, self.k, self.max_distance
                    )
            dist = np.asarray(dist)
            idx = np.asarray(idx)
            for i, r in enumerate(batch):
                r.dist = dist[i]
                r.idx = idx[i]
                r.event.set()
            self.batches_run += 1
            self.queries_served += m
        except Exception as e:  # noqa: BLE001
            for r in batch:
                r.error = e
                r.event.set()

    def _semantic_scan(self, queries: np.ndarray, n_real: int | None = None):
        index = self._provider()
        from pixelbox_tpu.ops.int4 import PackedSemantic4Index

        int4 = isinstance(index, PackedSemantic4Index)
        if int4:
            # Rerank (engine.int4_rerank semantics) via the shared
            # orchestration in ops.int4.scan_with_u8_rerank: top-C
            # candidates in the int4 metric (unbounded — WHERE dist <
            # max applies in u8 space after rescoring), exact-u8 rescore
            # from the host mirror, trimmed to the batch's n_real rows
            # (the device scan runs on the padded compile bucket; the
            # host rescore must not).  Falls back to raw int4 results
            # when no mirror is wired.
            from pixelbox_tpu.ops.int4 import (
                cosine4_scan_topk_auto,
                cosine4a_scan_topk,
                scan_with_u8_rerank,
            )

            def _scan(c, md):
                if self.mode != "auto":
                    # Honor an explicitly requested execution strategy —
                    # with the same (asymmetric) metric every other int4
                    # path uses; mode picks HOW to scan, never what
                    # distance ranks by.
                    return cosine4a_scan_topk(
                        jnp.asarray(queries), index, k=c, max_distance=md
                    )
                sample, meta = self._scan_aux(index)
                return cosine4_scan_topk_auto(
                    queries, index, k=c, max_distance=md,
                    sample=sample, meta=meta,
                )

            rows = self._rerank_rows() if self._rerank_rows else None
            if rows is None:
                return _scan(self.k, self.max_distance)
            return scan_with_u8_rerank(
                _scan, queries, rows,
                k=self.k, max_distance=self.max_distance, n_real=n_real,
            )
        if self.mode == "auto":
            sample, meta = self._scan_aux(index)
            return cosine_scan_topk_auto(
                queries, index, k=self.k, max_distance=self.max_distance,
                sample=sample, row_meta=meta,
            )
        return cosine_scan_topk(
            jnp.asarray(queries), index, k=self.k,
            max_distance=self.max_distance, mode=self.mode,
        )
