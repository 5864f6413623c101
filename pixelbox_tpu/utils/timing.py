"""Structured timing + profiling.

The reference's only instrumentation is ad-hoc stderr wall-clock prints
(src/engine.rs:355-358, 391-395, 201-202).  Here timings are structured:
every scope records into a process-wide registry that can be dumped as
JSON, and ``trace`` can wrap a scope in a ``jax.profiler`` trace for TPU
timeline capture.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict, deque
from typing import Dict, Optional

_LOCK = threading.Lock()
_TIMINGS: Dict[str, deque] = defaultdict(lambda: deque(maxlen=1024))


@contextlib.contextmanager
def timed(name: str, echo: bool = False):
    """Record wall-clock seconds for a named scope."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            _TIMINGS[name].append(dt)
        if echo:
            print(f"[pixelbox_tpu] {name}: {dt*1e3:.2f} ms")


@contextlib.contextmanager
def trace(name: str, profiler_dir: Optional[str] = None):
    """Timed scope that also emits a jax.profiler TraceAnnotation.

    Pass ``profiler_dir`` to capture a full device trace for this scope
    (viewable in TensorBoard / xprof).
    """
    import jax

    if profiler_dir:
        jax.profiler.start_trace(profiler_dir)
    try:
        with jax.profiler.TraceAnnotation(name), timed(name):
            yield
    finally:
        if profiler_dir:
            jax.profiler.stop_trace()


def get_stats() -> Dict[str, dict]:
    """Summary stats {name: {count, total_s, mean_ms, last_ms}}."""
    out = {}
    with _LOCK:
        for name, samples in _TIMINGS.items():
            if not samples:
                continue
            total = sum(samples)
            out[name] = {
                "count": len(samples),
                "total_s": total,
                "mean_ms": total / len(samples) * 1e3,
                "last_ms": samples[-1] * 1e3,
            }
    return out


def dump_stats() -> str:
    return json.dumps(get_stats(), indent=2, sort_keys=True)


def reset_stats() -> None:
    with _LOCK:
        _TIMINGS.clear()
