"""Benchmark harness — headline: u8 cosine-scan throughput on one chip.

Measures the BASELINE.json configs on the hot path the reference bottlenecks
on (SQLite per-row UDF scan, reference src/engine.rs:375-383): batched
top-k cosine search over a 1M×128-d u8 index resident in HBM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured dot-products/s divided by the 1e9/s north star
(BASELINE.md), i.e. >1.0 beats the target.
"""

import json
from functools import partial
import sys
import time

import numpy as np


def bench_scan(n=1_000_000, d=128, q=256, k=100, iters=10, block_rows=2**17):
    import jax
    import jax.numpy as jnp

    from pixelbox_tpu.ops.packed import PackedSemanticIndex, semantic_rows_from_u8
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = np.random.default_rng(0)
    n_pad = -(-n // block_rows) * block_rows
    db = rng.integers(0, 256, size=(n_pad, d), dtype=np.uint8)
    data, row_sum, row_mag2 = semantic_rows_from_u8(db)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    index = PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(row_sum), jnp.asarray(row_mag2),
        jnp.asarray(valid),
    )
    # Timing methodology: host↔device roundtrips (or async-dispatch
    # semantics on tunneled platforms) can dominate or fabricate numbers,
    # so all `iters` scans run back-to-back ON DEVICE inside one jitted
    # lax.scan over DISTINCT query batches, with a single tiny
    # device→host fetch as the barrier.  Device time = total / iters.
    all_queries = jnp.asarray(
        rng.integers(0, 256, size=(iters, q, d), dtype=np.uint8)
    )

    @partial(jax.jit, static_argnames=())
    def multi_scan(qs, index):
        def body(carry, qi):
            dist, idx = cosine_scan_topk(qi, index, k=k, block_rows=block_rows)
            # Consume results so nothing is dead-code-eliminated.
            return carry + jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), qs)
        return acc

    # Warmup (compile + one full pass).
    float(np.asarray(multi_scan(all_queries, index)))

    t0 = time.perf_counter()
    sink = float(np.asarray(multi_scan(all_queries, index)))
    dt = (time.perf_counter() - t0) / iters

    dots_per_sec = n * q / dt
    qps = q / dt

    # Single-query scan, same methodology.
    q1 = all_queries[:, :1, :]
    float(np.asarray(multi_scan(q1, index)))
    t0 = time.perf_counter()
    sink += float(np.asarray(multi_scan(q1, index)))
    lat_ms = (time.perf_counter() - t0) / iters * 1e3

    return {
        "dots_per_sec": dots_per_sec,
        "qps_batch": qps,
        "batch_q": q,
        "n": n,
        "d": d,
        "scan_ms_per_batch": dt * 1e3,
        "single_query_ms": lat_ms,
        "checksum": sink,
    }


def main():
    res = bench_scan()
    out = {
        "metric": "u8_cosine_scan_dot_products_per_sec_1Mx128",
        "value": res["dots_per_sec"],
        "unit": "dot-products/s/chip",
        "vs_baseline": res["dots_per_sec"] / 1e9,
        "detail": res,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
