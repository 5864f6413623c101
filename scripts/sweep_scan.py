"""Block-size / batch sweep for the cosine scan on the real chip."""

import itertools
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pixelbox_tpu.ops.packed import PackedSemanticIndex, semantic_rows_from_u8
from pixelbox_tpu.ops.scan import cosine_scan_topk
from pixelbox_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()


def build_index(n_pad, d, rng):
    db = rng.integers(0, 256, size=(n_pad, d), dtype=np.uint8)
    data, row_sum, row_mag2 = semantic_rows_from_u8(db)
    return PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(row_sum), jnp.asarray(row_mag2),
        jnp.ones(n_pad, dtype=bool),
    )


def time_scan(index, qs, k, block_rows, iters=8):
    @jax.jit
    def multi(qs, index):
        def body(c, qi):
            dist, idx = cosine_scan_topk(qi, index, k=k, block_rows=block_rows)
            return c + jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), qs)
        return acc

    float(np.asarray(multi(qs, index)))  # warmup
    t0 = time.perf_counter()
    float(np.asarray(multi(qs, index)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    n, d, k = 2**20, 128, 100
    iters = 8
    index = build_index(n, d, rng)
    for q in (256,):
        qs = jnp.asarray(rng.integers(0, 256, (iters, q, d), dtype=np.uint8))
        for br in (4096, 16384, 65536):
            dt = time_scan(index, qs, k, br, iters)
            dots = n * q / dt
            print(
                f"q={q:5d} block={br:6d}  {dt*1e3:8.2f} ms/batch  "
                f"{dots/1e9:8.2f} Gdots/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
