"""Measure the v3 threshold-kernel optimizations (min-carry rounds +
count-free proof) against PERF.md's recorded v2 numbers (11.5 ms /
22.2 Gdots/s at Q=256, tile 2048), plus a target_count / tile sweep.

    timeout 580 python scripts/measure_v3.py
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
for q in (256, 64, 1):
    qs = jnp.asarray(rng.integers(0, 256, size=(ITERS, q, D), dtype=np.uint8))
    for name, kws in (
        ("t2048_tc400", {"tile_rows": 2048}),
        ("t2048_tc224", {"tile_rows": 2048, "target_count": 224}),
        ("t4096_tc400", {"tile_rows": 4096}),
    ):
        def one(qi, index, meta, sample):
            d, i, exact = pallas_threshold_scan_topk_v2(
                qi, index, meta, sample, k=K, **kws
            )
            return (
                jnp.sum(d[:, 0]) + jnp.sum(i[:, 0])
                + jnp.sum(exact.astype(jnp.float32))
            )

        t0 = time.time()
        try:
            dt, _ = _device_loop(one, qs, ITERS, index, meta, sample)
        except Exception as e:
            print(f"v3_{name}_q{q} ERROR {str(e)[:300]}", flush=True)
            continue
        _, _, exact = pallas_threshold_scan_topk_v2(
            qs[0], index, meta, sample, k=K, **kws
        )
        key = f"v3_{name}_q{q}"
        results[key] = {
            "ms": dt * 1e3,
            "gdots": N * q / dt / 1e9,
            "proof_rate": float(np.asarray(exact).mean()),
            "compile_s": time.time() - t0,
        }
        print(key, json.dumps(results[key]), flush=True)

print(json.dumps(results, indent=1))
