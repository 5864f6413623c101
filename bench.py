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
    # Distinct query batches per iteration: identical dispatches can be
    # merged/cached by the runtime, which fabricates impossible numbers.
    query_sets = [
        jnp.asarray(rng.integers(0, 256, size=(q, d), dtype=np.uint8))
        for _ in range(iters)
    ]

    # Warmup (compile).
    dist, idx = cosine_scan_topk(query_sets[0], index, k=k, block_rows=block_rows)
    jax.block_until_ready((dist, idx))

    # Blocking per call (honest per-batch latency).  block_until_ready is
    # not a reliable barrier on tunneled platforms — force a device→host
    # fetch of a tiny slice instead.
    t0 = time.perf_counter()
    sink = 0.0
    for i in range(iters):
        dist, idx = cosine_scan_topk(query_sets[i], index, k=k, block_rows=block_rows)
        sink += float(np.asarray(dist[0, 0]))
    dt_block = (time.perf_counter() - t0) / iters

    # Pipelined (submit all, sync once at the end) — throughput upper bound.
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(
            cosine_scan_topk(query_sets[i], index, k=k, block_rows=block_rows)
        )
    sink += sum(float(np.asarray(d[0, 0])) for d, _ in outs)
    dt_pipe = (time.perf_counter() - t0) / iters

    # Headline uses the conservative blocking number.
    dt = dt_block
    dots_per_sec = n * q / dt
    qps = q / dt

    # Single-query latency (blocking).
    q1 = query_sets[0][:1]
    d1, i1 = cosine_scan_topk(q1, index, k=k, block_rows=block_rows)
    jax.block_until_ready((d1, i1))
    t0 = time.perf_counter()
    for i in range(iters):
        d1, i1 = cosine_scan_topk(query_sets[i][:1], index, k=k, block_rows=block_rows)
        sink += float(np.asarray(d1[0, 0]))
    lat_ms = (time.perf_counter() - t0) / iters * 1e3

    return {
        "dots_per_sec": dots_per_sec,
        "qps_batch": qps,
        "batch_q": q,
        "n": n,
        "d": d,
        "scan_ms_per_batch_blocking": dt_block * 1e3,
        "scan_ms_per_batch_pipelined": dt_pipe * 1e3,
        "single_query_ms": lat_ms,
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
