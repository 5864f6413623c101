"""Measure the sampled-threshold scan on the attached TPU.

Methodology per PERF.md: iterations run back-to-back on device inside one
jitted lax.scan; one tiny fetch as the barrier.  Run detached (fresh
compiles over the tunnel take minutes):

    setsid nohup python scripts/measure_threshold.py > /tmp/thresh.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pixelbox_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import _device_loop, build_semantic_index
from pixelbox_tpu.ops.scan import (
    build_scan_sample,
    cosine_scan_topk_auto,
    cosine_scan_topk_threshold,
)

N, D, K = 1_000_000, 128, 100
BLOCK = 2 ** 17
ITERS = 10

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
_, index = build_semantic_index(N, D, rng, BLOCK)
sample = build_scan_sample(index)
print("sample rows:", sample.data.shape, flush=True)

results = {}

for q in (256, 1024):
    qs = jnp.asarray(rng.integers(0, 256, size=(ITERS, q, D), dtype=np.uint8))
    for chunk, budget, blk in (
        (512, 6, 2 ** 17),
        (1024, 8, 2 ** 17),
        (2048, 8, 2 ** 17),
        (512, 6, 2 ** 15),
        (1024, 8, 2 ** 16),
    ):
        def one(qi, index, sample):
            d, i, exact = cosine_scan_topk_threshold(
                qi, index, sample, k=K, block_rows=blk, budget=budget,
                chunk=chunk, method="topk",
            )
            return (
                jnp.sum(d[:, 0]) + jnp.sum(i[:, 0])
                + jnp.sum(exact.astype(jnp.float32))
            )

        t0 = time.time()
        dt, _ = _device_loop(one, qs, ITERS, index, sample)
        key = f"threshold_q{q}_c{chunk}_r{budget}_b{blk}"
        results[key] = {
            "ms_per_batch": dt * 1e3,
            "gdots_per_sec": N * q / dt / 1e9,
            "compile_s": time.time() - t0 - ITERS * dt,
        }
        print(key, json.dumps(results[key]), flush=True)

    # Exactness rate over fresh batches.
    _, _, exact = cosine_scan_topk_threshold(
        qs[0], index, sample, k=K, block_rows=BLOCK
    )
    rate = float(np.asarray(exact).mean())
    results[f"exact_rate_q{q}"] = rate
    print(f"exact_rate_q{q}", rate, flush=True)

# End-to-end host-level auto (cached sample), Q=256, wall-clock.
q = 256
qnp = rng.integers(0, 256, size=(q, D), dtype=np.uint8)
cosine_scan_topk_auto(qnp, index, k=K, block_rows=BLOCK, sample=sample)  # warm
times = []
for it in range(8):
    qi = rng.integers(0, 256, size=(q, D), dtype=np.uint8)
    t0 = time.perf_counter()
    d, i = cosine_scan_topk_auto(qi, index, k=K, block_rows=BLOCK, sample=sample)
    _ = float(np.asarray(d[0, 0]))
    times.append(time.perf_counter() - t0)
results["auto_e2e_wall_ms_median_q256"] = float(np.median(times) * 1e3)
results["auto_e2e_gdots_median"] = N * q / np.median(times) / 1e9
print(json.dumps(results, indent=1), flush=True)
print("DONE", flush=True)
