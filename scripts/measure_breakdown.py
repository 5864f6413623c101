"""Per-stage breakdown of the batched threshold scan on the real chip.

Ablation ladder at Q=256, 1M x 128, k=100 (i20, one barrier fetch):

  gemm_only        : pallas kernel doing ONLY the int8 GEMM per tile
  gemm_epilogue    : + the reciprocal-cosine epilogue + theta filter + m0
  full_kernel      : + the extraction loop (max_rounds normal) [no theta stage]
  theta_stage      : the two-stage theta estimate alone
  v2_total         : the shipping pallas_threshold_scan_topk_v2 wrapper

Differences between consecutive rows isolate each stage's cost.

    timeout 580 python scripts/measure_breakdown.py
"""

import json
import sys
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

from pixelbox_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _device_loop, build_semantic_index
from pixelbox_tpu.ops.packed import query_moments_from_u8
from pixelbox_tpu.ops.pallas_scan import (
    _pallas_sample_theta,
    build_row_meta,
    pallas_threshold_scan_topk_v2,
)
from pixelbox_tpu.ops.scan import build_scan_sample

N, D, K, Q = 1_000_000, 128, 100, 256
TILE = 8192
ITERS = 20

_INF = np.float32(np.inf)
_COSINE_FLOOR = np.float32(1e-6)
_RECIP_65025 = np.float32(1.0 / (255.0 * 255.0))


def _ablate_kernel(q_ref, data_ref, meta_ref, out_ref, *, tile_rows, dim, stage):
    t = pl.program_id(0)
    qn = q_ref.shape[0]

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros((qn, 128), jnp.float32)

    q_i8 = q_ref[:]
    dot8 = lax.dot_general(
        q_i8, data_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if stage == "gemm":
        out_ref[:] = out_ref[:] + dot8[:, :128].astype(jnp.float32)
        return
    # SHIPPING epilogue (spec v2: precomputed rsqrt in meta, one divide)
    q_i32 = q_i8.astype(jnp.int32)
    q_sum = jnp.sum(q_i32, axis=1, keepdims=True)
    qc = 2 * q_i32 + 1
    q_mag2_f = jnp.sum(qc * qc, axis=1, keepdims=True).astype(jnp.float32)
    row_sum = meta_ref[0, :][None, :]
    row_mag2 = meta_ref[1, :][None, :]
    dot_c = 4 * dot8 + 2 * (q_sum + row_sum) + jnp.int32(dim)
    rr = pltpu.bitcast(meta_ref[2:3, :], jnp.float32)
    qr = jnp.float32(1e-3)  # stand-in [scalar] for qmeta lane
    inv = qr * rr
    dot_f = dot_c.astype(jnp.float32)
    cos = dot_f * inv
    if stage == "coskey":
        dist = jnp.where((row_mag2 > 0) & (-cos < np.float32(-0.5)), -cos, _INF)
    else:
        dist = np.float32(1.0) / jnp.maximum(cos, _COSINE_FLOOR) - np.float32(1.0)
        dist = jnp.maximum(dist, np.float32(0.0))
        row_mag2_f = row_mag2.astype(jnp.float32)
        ident = (dot_f == q_mag2_f) & (q_mag2_f == row_mag2_f)
        dist = jnp.where(ident, np.float32(0.0), dist)
        theta = np.float32(0.02)
        dist = jnp.where((row_mag2 > 0) & (dist < theta), dist, _INF)
    if stage in ("epilogue", "coskey"):
        m0 = jnp.min(dist, axis=1, keepdims=True)
        out_ref[:] = out_ref[:] + jnp.where(
            lax.broadcasted_iota(jnp.int32, (qn, 128), 1) == 0, m0, 0.0
        )
        return
    # stage == "chain": depth-2 lane-class summary build (no extraction)
    n_regs = tile_rows // 128
    lane128 = lax.broadcasted_iota(jnp.int32, (qn, 128), 1)
    lmin = jnp.full((qn, 128), _INF, jnp.float32)
    lreg = jnp.zeros((qn, 128), jnp.int32)
    l2min = jnp.full((qn, 128), _INF, jnp.float32)
    l2reg = jnp.zeros((qn, 128), jnp.int32)
    lcnt = jnp.zeros((qn, 128), jnp.int32)
    for r in range(n_regs):
        v = dist[:, r * 128 : (r + 1) * 128]
        lcnt = lcnt + (v < _INF).astype(jnp.int32)
        upd1 = v < lmin
        d_val = jnp.where(upd1, lmin, v)
        d_reg = jnp.where(upd1, lreg, r)
        lmin = jnp.where(upd1, v, lmin)
        lreg = jnp.where(upd1, r, lreg)
        upd2 = d_val < l2min
        l2min = jnp.where(upd2, d_val, l2min)
        l2reg = jnp.where(upd2, d_reg, l2reg)
    out_ref[:] = out_ref[:] + lmin + l2min.astype(jnp.float32)         + lcnt.astype(jnp.float32) + lreg.astype(jnp.float32)         + l2reg.astype(jnp.float32)


def run_ablation(stage, qs, index, meta):
    qn = Q
    kernel = partial(_ablate_kernel, tile_rows=TILE, dim=D, stage=stage)

    @jax.jit
    def one(qi, index, meta):
        q_i8, _, _ = query_moments_from_u8(qi)
        out = pl.pallas_call(
            kernel,
            grid=(index.capacity // TILE,),
            in_specs=[
                pl.BlockSpec((qn, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (qn, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((qn, 128), jnp.float32),
        )(q_i8, index.data, meta)
        return jnp.sum(out[:, 0])

    dt, _ = _device_loop(one, qs, ITERS, index, meta)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    _, index = build_semantic_index(N, D, rng, 2 ** 17)
    sample = build_scan_sample(index)
    meta = build_row_meta(index)
    qs = jnp.asarray(rng.integers(0, 256, size=(ITERS, Q, D), dtype=np.uint8))

    results = {}

    # Null floor.
    nul = jnp.zeros((ITERS, 8, 8), jnp.float32)
    dt, _ = _device_loop(lambda x: jnp.sum(x), nul, ITERS)
    results["null_floor_ms"] = dt * 1e3
    print("null floor", dt * 1e3, flush=True)

    for stage in ("gemm", "coskey", "epilogue", "chain"):
        dt = run_ablation(stage, qs, index, meta)
        results[f"{stage}_ms"] = dt * 1e3
        print(stage, dt * 1e3, flush=True)

    # Theta stage alone.
    from pixelbox_tpu.ops.pallas_scan import _prep_cosine, _sample_meta4

    md = jnp.float32(1e3)
    smeta = _sample_meta4(sample)

    @jax.jit
    def theta_one(qi, sd, smeta):
        q_codes, qr = _prep_cosine(qi)
        th = _pallas_sample_theta(
            "cosine", q_codes, qr, sd, smeta, md, 21, dim=D, tile_rows=TILE
        )
        return jnp.sum(th)

    dt, _ = _device_loop(theta_one, qs, ITERS, sample.data, smeta)
    results["theta_stage_ms"] = dt * 1e3
    print("theta", dt * 1e3, flush=True)

    # Shipping v2 wrapper.
    def v2_one(qi, index, meta, sample):
        d, i, exact = pallas_threshold_scan_topk_v2(
            qi, index, meta, sample, k=K, tile_rows=TILE
        )
        return jnp.sum(d[:, 0]) + jnp.sum(exact.astype(jnp.float32))

    dt, _ = _device_loop(v2_one, qs, ITERS, index, meta, sample)
    results["v2_total_ms"] = dt * 1e3
    print("v2 total", dt * 1e3, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
