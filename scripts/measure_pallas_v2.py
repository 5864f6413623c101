"""Measure threshold kernel v2 (running sorted top-k) vs v1 on the TPU.

    setsid nohup python scripts/measure_pallas_v2.py > /tmp/pv2.log 2>&1 &
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
from pixelbox_tpu.ops.pallas_scan import (
    build_row_meta,
    pallas_threshold_scan_topk,
    pallas_threshold_scan_topk_v2,
)
from pixelbox_tpu.ops.scan import build_scan_sample

N, D, K = 1_000_000, 128, 100
ITERS = 10

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
_, index = build_semantic_index(N, D, rng, 2 ** 17)
sample = build_scan_sample(index)
meta = build_row_meta(index)

results = {}
for q in (256, 1024, 64):
    qs = jnp.asarray(rng.integers(0, 256, size=(ITERS, q, D), dtype=np.uint8))
    for name, fn, kws in (
        ("v2_t2048", pallas_threshold_scan_topk_v2, {"tile_rows": 2048}),
        ("v2_t4096", pallas_threshold_scan_topk_v2, {"tile_rows": 4096}),
        ("v1_t2048", pallas_threshold_scan_topk, {"tile_rows": 2048}),
    ):
        def one(qi, index, meta, sample):
            d, i, exact = fn(qi, index, meta, sample, k=K, **kws)
            return (
                jnp.sum(d[:, 0]) + jnp.sum(i[:, 0])
                + jnp.sum(exact.astype(jnp.float32))
            )

        t0 = time.time()
        try:
            dt, _ = _device_loop(one, qs, ITERS, index, meta, sample)
        except Exception as e:
            print(f"{name}_q{q} ERROR {str(e)[:300]}", flush=True)
            continue
        key = f"{name}_q{q}"
        results[key] = {
            "ms": dt * 1e3, "gdots": N * q / dt / 1e9,
            "compile_s": time.time() - t0 - ITERS * dt,
        }
        print(key, json.dumps(results[key]), flush=True)
    _, _, exact = pallas_threshold_scan_topk_v2(
        qs[0], index, meta, sample, k=K, tile_rows=2048
    )
    print(f"v2_exact_rate_q{q}", float(np.asarray(exact).mean()), flush=True)

print(json.dumps(results, indent=1), flush=True)
print("DONE", flush=True)
