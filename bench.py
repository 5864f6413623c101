"""Benchmark harness — the five BASELINE.json configs.

Headline (always printed as the final JSON line): batched u8 cosine-scan
throughput over a 1M×128 index — the hot path the reference bottlenecks on
(SQLite per-row UDF scan, reference src/engine.rs:375-383).

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = measured dot-products/s ÷ the 1e9/s north star (BASELINE.md);
>1.0 beats the target.

Default run: configs 1+2 (cosine scan w/ recall@10 parity check, hamming
scan).  ``--full`` adds 3 (EfficientNet embedding), 4 (end-to-end
drag-drop @1M), 5 (BLIP text→image) — each pays a first-time jit compile.

Timing methodology: host↔device roundtrips (or async-dispatch semantics on
tunneled platforms) can dominate or fabricate numbers, so iterations run
back-to-back ON DEVICE inside one jitted lax.scan over distinct inputs,
with a single tiny device→host fetch as the barrier.  The fetch itself
costs one tunnel round-trip (~34 ms on the test attachment) amortized
over the iterations — scan configs run 50 iterations (~0.7 ms residual
per batch; the headline auto-scan runs 100 → ~0.35 ms residual and
25.6k proof trials), and the measured null-body floor is reported as
``null_floor_ms_per_iter`` so readers can bound the residual; nothing is
subtracted.
"""

import json
import os
import sys
import time
import numpy as np

NORTH_STAR_DOTS_PER_SEC = 1e9
NORTH_STAR_INGEST_PER_SEC = 5e3


def _device_loop(fn, inputs, iters, *consts):
    """Time `fn(x, *consts)` over `iters` stacked inputs entirely on device.

    ``fn`` may return a scalar or a small vector (e.g. [timing_sink,
    success_count]); the accumulator sums it across iterations and the
    whole accumulated value is returned alongside the per-iteration time.

    Large arrays (the index) MUST be passed via ``consts``, not closed
    over: closed-over device arrays are embedded as literal constants in
    the compiled program (hundreds of MB shipped per compile — remote
    compile services reject them outright).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def multi(xs, *cs):
        def body(c, x):
            return c + fn(x, *cs), None

        init = jnp.zeros(
            jax.eval_shape(fn, jax.tree.map(lambda a: a[0], xs), *cs).shape,
            jnp.float32,
        )
        acc, _ = jax.lax.scan(body, init, xs)
        return acc

    np.asarray(multi(inputs, *consts))  # warmup/compile
    t0 = time.perf_counter()
    sink = np.asarray(multi(inputs, *consts))
    dt = (time.perf_counter() - t0) / iters
    return dt, (float(sink) if sink.ndim == 0 else sink)


def build_semantic_index(n, d, rng, block_rows):
    import jax.numpy as jnp

    from pixelbox_tpu.ops.packed import PackedSemanticIndex, semantic_rows_from_u8

    n_pad = -(-n // block_rows) * block_rows
    db = rng.integers(0, 256, size=(n_pad, d), dtype=np.uint8)
    data, row_sum, row_mag2 = semantic_rows_from_u8(db)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    index = PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(row_sum), jnp.asarray(row_mag2),
        jnp.asarray(valid),
    )
    return db[:n], index


def bench_cosine_scan(n=1_000_000, d=128, q=256, k=100, iters=50,
                      block_rows=2**17, rng=None):
    """Config 1 scaled to 1M (headline) — batched scan throughput."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(0)
    _, index = build_semantic_index(n, d, rng, block_rows)
    qs = jnp.asarray(rng.integers(0, 256, size=(iters, q, d), dtype=np.uint8))

    def one(qi, index):
        dist, idx = cosine_scan_topk(qi, index, k=k, block_rows=block_rows)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

    dt, _ = _device_loop(one, qs, iters, index)
    q1 = qs[:, :1, :]
    dt1, _ = _device_loop(one, q1, iters, index)
    return {
        "dots_per_sec": n * q / dt,
        "qps_batch": q / dt,
        "batch_q": q,
        "n": n,
        "d": d,
        "scan_ms_per_batch": dt * 1e3,
        "single_query_ms": dt1 * 1e3,
    }


def bench_auto_scan(n=1_000_000, d=128, q=256, k=100, iters=100,
                    block_rows=2**17, rng=None):
    """Guaranteed-exact threshold scan (the engine's default auto mode).

    The main pass is the fused Pallas kernel on TPU (XLA threshold scan on
    CPU); unproven queries are re-scanned exactly.  Reported throughput
    amortizes the measured repair cost at the measured per-query proof
    rate."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.pallas_scan import (
        build_row_meta,
        pallas_threshold_scan_topk,
        pallas_threshold_scan_topk_v2,
    )
    from pixelbox_tpu.ops.scan import (
        _default_backend_is_tpu,
        build_scan_sample,
        cosine_scan_topk,
        cosine_scan_topk_threshold,
    )

    rng = rng or np.random.default_rng(0)
    _, index = build_semantic_index(n, d, rng, block_rows)
    qs = jnp.asarray(rng.integers(0, 256, size=(iters, q, d), dtype=np.uint8))
    sample = build_scan_sample(index)
    use_pallas = _default_backend_is_tpu() and d % 128 == 0

    if use_pallas:
        meta = build_row_meta(index)
        # Mirror the auto mode's kernel choice (v2 fits VMEM up to Q≈512).
        kernel = (
            pallas_threshold_scan_topk_v2 if q <= 512
            else pallas_threshold_scan_topk
        )

        from pixelbox_tpu.ops.scan import _pick_tile_rows

        tile = _pick_tile_rows(q, index.capacity)

        def one(qi, index, meta, sample):
            dist, idx, exact = kernel(
                qi, index, meta, sample, k=k, tile_rows=tile
            )
            return jnp.stack(
                [jnp.sum(dist[:, 0]), jnp.sum(exact.astype(jnp.float32))]
            )

        dt, sink = _device_loop(one, qs, iters, index, meta, sample)
    else:
        def one(qi, index, sample):
            dist, idx, exact = cosine_scan_topk_threshold(
                qi, index, sample, k=k, block_rows=block_rows
            )
            return jnp.stack(
                [jnp.sum(dist[:, 0]), jnp.sum(exact.astype(jnp.float32))]
            )

        dt, sink = _device_loop(one, qs, iters, index, sample)
    # Proof rate over EVERY query of every timed iteration (the warmup
    # run's accumulator is discarded; n_trials = iters·q), not one batch.
    n_trials = iters * q
    failures = n_trials - int(round(float(sink[1])))
    rate = 1.0 - failures / n_trials
    # 95% Clopper-Pearson upper bound on the per-query failure
    # probability — the statistical guard the amortized headline uses
    # (a single-batch estimate at q=256 cannot see rates below ~4e-3).
    from scipy.stats import beta as _beta  # scipy ships in the image

    p_fail_ub = float(_beta.ppf(0.95, failures + 1, n_trials - failures))

    # Repair cost: a bucketed exact re-scan of the failing queries,
    # through the SAME path the auto wrapper uses (the sample-free fused
    # kernel on TPU).  Measured on device.
    repair_q = 32

    if use_pallas:
        from pixelbox_tpu.ops.pallas_scan import pallas_cosine_scan_topk

        def repair_one(qi, index, meta):
            dd, ii = pallas_cosine_scan_topk(
                qi[:repair_q], index, meta, k=k
            )
            return jnp.sum(dd[:, 0]) + jnp.sum(ii[:, 0])

        dt_repair, _ = _device_loop(repair_one, qs, iters, index, meta)
    else:
        def repair_one(qi, index):
            dd, ii = cosine_scan_topk(
                qi[:repair_q], index, k=k, block_rows=block_rows,
                mode="exact", gate=False,
            )
            return jnp.sum(dd[:, 0]) + jnp.sum(ii[:, 0])

        dt_repair, _ = _device_loop(repair_one, qs, iters, index)
    # Amortized exact-guaranteed throughput at the 95% UPPER-confidence
    # failure rate: main pass + the repair scan whenever ANY query in the
    # batch fails its proof.  Robust to failure rates the point estimate
    # cannot resolve; the point-estimate amortization is reported too.
    p_batch_repair_ub = 1.0 - (1.0 - p_fail_ub) ** q
    p_batch_repair_point = 1.0 - rate ** q
    dt_total = dt + p_batch_repair_ub * dt_repair
    dt_total_point = dt + p_batch_repair_point * dt_repair

    return {
        "dots_per_sec_exact_guaranteed": n * q / dt_total,
        "dots_per_sec_at_point_estimate": n * q / dt_total_point,
        "dots_per_sec_device_main_pass": n * q / dt,
        "qps_batch": q / dt_total,
        "scan_ms_per_batch_main": dt * 1e3,
        "scan_ms_repair": dt_repair * 1e3,
        "proof_rate_per_query": rate,
        "proof_trials": n_trials,
        "p_fail_per_query_ub95": p_fail_ub,
        "repair_probability_per_batch_ub95": p_batch_repair_ub,
        "main_pass": "pallas_threshold" if use_pallas else "xla_threshold",
        "batch_q": q,
        "n": n,
        "d": d,
    }


def bench_fast_scan(n=1_000_000, d=128, q=256, k=100, iters=50,
                    block_rows=2**17, rng=None):
    """Fast-mode (approx_min_k) batched scan + recall vs the exact C++ oracle."""
    import ctypes

    import jax.numpy as jnp

    from pixelbox_tpu.native import load_native
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(0)
    db, index = build_semantic_index(n, d, rng, block_rows)
    qs = jnp.asarray(rng.integers(0, 256, size=(iters, q, d), dtype=np.uint8))

    def one(qi, index):
        dist, idx = cosine_scan_topk(
            qi, index, k=k, block_rows=block_rows, mode="fast"
        )
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

    dt, _ = _device_loop(one, qs, iters, index)
    out = {
        "dots_per_sec": n * q / dt,
        "qps_batch": q / dt,
        "scan_ms_per_batch": dt * 1e3,
    }

    lib = load_native()
    if lib is not None:
        nq = min(16, q)  # the batch only holds q queries
        queries = np.asarray(qs[0][:nq])
        _, got_i = cosine_scan_topk(
            jnp.asarray(queries), index, k=k, block_rows=block_rows, mode="fast"
        )
        got_i = np.asarray(got_i)
        exp_d = np.empty((nq, k), np.float32)
        exp_i = np.empty((nq, k), np.int32)
        lib.cpu_cosine_scan_topk(
            db.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, d,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nq, k,
            1e3, 8,
            exp_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            exp_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        out["recall_at_100"] = float(
            np.mean([len(set(got_i[i]) & set(exp_i[i])) / k for i in range(nq)])
        )
        out["recall_at_10"] = float(
            np.mean(
                [len(set(got_i[i][:10]) & set(exp_i[i][:10])) / 10 for i in range(nq)]
            )
        )
    return out


def bench_int4_scan(n=1_000_000, d=128, q=256, k=100, iters=50, rng=None):
    """Half-byte index option: 2x rows per HBM byte; exact vs the int4
    oracle via the fused threshold kernel (XLA exact path on CPU)."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.int4 import (
        build_semantic4_index,
        build_semantic4_meta,
        cosine4_scan_topk,
        pallas_threshold4_scan_topk,
    )
    from pixelbox_tpu.ops.scan import _default_backend_is_tpu, build_scan_sample

    rng = rng or np.random.default_rng(7)
    db = rng.integers(0, 256, size=(n, d), dtype=np.uint8)
    index = build_semantic4_index(db, block_rows=2**17)
    qs = jnp.asarray(rng.integers(0, 256, size=(iters, q, d), dtype=np.uint8))

    if _default_backend_is_tpu() and d % 128 == 0:
        sample = build_scan_sample(index)
        meta = build_semantic4_meta(index)

        from pixelbox_tpu.ops.scan import _pick_tile_rows

        tile4 = _pick_tile_rows(q, index.capacity)

        def one(qi, index, meta, sample):
            dist, idx, exact = pallas_threshold4_scan_topk(
                qi, index, meta, sample, k=k, tile_rows=tile4
            )
            return jnp.sum(dist[:, 0]) + jnp.sum(exact.astype(jnp.float32))

        dt, _ = _device_loop(one, qs, iters, index, meta, sample)
        _, _, exact = pallas_threshold4_scan_topk(qs[0], index, meta, sample, k=k)
        rate = float(np.asarray(exact).mean())
        main = "pallas_threshold4"
    else:
        def one(qi, index):
            dist, idx = cosine4_scan_topk(qi, index, k=k, block_rows=2**17)
            return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

        dt, _ = _device_loop(one, qs, iters, index)
        rate = 1.0
        main = "xla_exact4"
    out = {
        "dots_per_sec": n * q / dt,
        "scan_ms_per_batch": dt * 1e3,
        "proof_rate": rate,
        "index_bytes_per_row": d // 2,
        "main_pass": main,
        "batch_q": q,
        "n": n,
    }
    out.update(bench_int4_recall_vs_u8(d=d, rng=rng))
    return out


def structured_embeddings(rng, n, d, q, n_clusters=256):
    """Structured latents shared by the recall benches: 256 clusters,
    decaying spectrum (anisotropic), tanh-bounded like the trained
    embedder head (train.py:30-46); queries are corruption-pair
    neighbors (noisy copies) of indexed items — the
    drag-drop-a-similar-photo workload.  Returns (db_u8 [n,d], q_u8
    [q,d])."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.quantize import quantize_embedding

    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    spectrum = (1.0 / np.sqrt(1.0 + np.arange(d))).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    z = centers[assign] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)
    z = np.tanh(z * spectrum[None, :])
    db_u8 = np.asarray(quantize_embedding(jnp.asarray(z)))

    pick = rng.integers(0, n, size=q)
    zq = np.tanh(
        (centers[assign[pick]]
         + 0.35 * rng.standard_normal((q, d)).astype(np.float32)
         + 0.15 * rng.standard_normal((q, d)).astype(np.float32))
        * spectrum[None, :]
    )
    q_u8 = np.asarray(quantize_embedding(jnp.asarray(zq)))
    return db_u8, q_u8


def bench_int4_recall_vs_u8(n=200_000, d=128, q=64, rng=None):
    """Retrieval quality of the int4 index vs the U8 ground truth on
    STRUCTURED embeddings (not uniform random): clustered anisotropic
    latents + tanh bounding + u8 quantization — the geometry real
    embedder outputs have — with queries that are corruption-pair
    neighbors (noisy copies) of indexed items.  The int4 proof rate
    elsewhere certifies exactness vs the int4 metric; THIS measures
    whether the coarser metric still finds the same neighbors."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.int4 import build_semantic4_index, cosine4_scan_topk
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(13)
    db_u8, q_u8 = structured_embeddings(rng, n, d, q)

    from pixelbox_tpu.ops.int4 import cosine4a_scan_topk

    _, u8_index = build_semantic_index_from_rows(db_u8)
    i4_index = build_semantic4_index(db_u8, block_rows=2048)
    _, exp_i = cosine_scan_topk(
        jnp.asarray(q_u8), u8_index, k=100, block_rows=2048
    )
    exp_i = np.asarray(exp_i)

    def _recalls(got_i):
        got_i = np.asarray(got_i)
        r10 = float(np.mean(
            [len(set(got_i[i][:10]) & set(exp_i[i][:10])) / 10
             for i in range(q)]
        ))
        r100 = float(np.mean(
            [len(set(got_i[i]) & set(exp_i[i])) / 100 for i in range(q)]
        ))
        return r10, r100

    _, asym_i = cosine4a_scan_topk(
        jnp.asarray(q_u8), i4_index, k=100, block_rows=2048
    )
    _, sym_i = cosine4_scan_topk(
        jnp.asarray(q_u8), i4_index, k=100, block_rows=2048
    )
    a10, a100 = _recalls(asym_i)
    s10, s100 = _recalls(sym_i)

    # The DEFAULT engine path (engine.int4_rerank): top-C asymmetric
    # candidates rescored with the exact u8 metric from the host mirror.
    from pixelbox_tpu.ops.int4 import (
        UNBOUNDED_DISTANCE,
        default_rerank_candidates,
        rerank_candidates_u8,
    )

    cand_k = default_rerank_candidates(100)
    _, cand_i = cosine4a_scan_topk(
        jnp.asarray(q_u8), i4_index, k=cand_k, block_rows=2048,
        max_distance=UNBOUNDED_DISTANCE,
    )
    _, rer_i = rerank_candidates_u8(
        q_u8, np.asarray(cand_i), db_u8, k=100,
        max_distance=UNBOUNDED_DISTANCE,
    )
    r10, r100 = _recalls(rer_i)
    return {
        # What engine int4 queries actually get (asymmetric candidates +
        # exact-u8 rerank, the default).
        "recall_at_10_vs_u8": r10,
        "recall_at_100_vs_u8": r100,
        # Raw int4-metric recalls (int4_rerank=False / no host mirror).
        "recall_at_10_vs_u8_raw_asym": a10,
        "recall_at_100_vs_u8_raw_asym": a100,
        "recall_at_10_vs_u8_raw_sym": s10,
        "recall_at_100_vs_u8_raw_sym": s100,
        "rerank_candidates": cand_k,
        "recall_eval": {
            "n": n, "queries": q,
            "data": "clustered anisotropic tanh latents, corruption-pair queries",
        },
    }


def bench_ivf_scan(n=1_000_000, d=128, q=64, k=100, nprobe=8, iters=50,
                   rng=None):
    """Opt-in IVF clustered index (ops/ivf.py): single-query latency and
    recall vs the exact flat scan on structured embeddings.  IVF probes
    nprobe/n_clusters of the index per query — the >10M-row capacity and
    interactive-latency option; the flat guaranteed-exact scan stays the
    default."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops import ivf as ivf_ops
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(29)
    db_u8, q_u8 = structured_embeddings(rng, n, d, q)
    valid = np.ones(n, dtype=bool)

    t0 = time.perf_counter()
    n_clusters = ivf_ops.default_n_clusters(n)
    cents = ivf_ops.spherical_kmeans(db_u8, valid, n_clusters, iters=10)
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    index = ivf_ops.build_ivf(db_u8, valid, cents)
    build_s = time.perf_counter() - t0

    # Ground truth: exact flat scan (one pass, not timed here).
    _, u8_index = build_semantic_index_from_rows(db_u8, block_rows=2**15)
    _, exp_i = cosine_scan_topk(
        jnp.asarray(q_u8), u8_index, k=k, block_rows=2**15
    )
    exp_i = np.asarray(exp_i)

    _, got_i = ivf_ops.ivf_scan_topk(q_u8, index, k=k, nprobe=nprobe)
    got_i = np.asarray(got_i)
    r10 = float(np.mean(
        [len(set(got_i[i][:10]) & set(exp_i[i][:10])) / 10 for i in range(q)]
    ))
    r100 = float(np.mean(
        [len(set(got_i[i]) & set(exp_i[i][exp_i[i] >= 0]))
         / max(1, int((exp_i[i] >= 0).sum())) for i in range(q)]
    ))

    # Latency: single query and a small batch, on-device loop.
    def one(qi, ivf):
        dist, idx = ivf_ops.ivf_scan_topk(qi, ivf, k=k, nprobe=nprobe)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0]).astype(jnp.float32)

    q1 = jnp.asarray(
        rng.integers(0, 256, size=(iters, 1, d), dtype=np.uint8)
    )
    dt1, _ = _device_loop(one, q1, iters, index)
    q16 = jnp.asarray(
        rng.integers(0, 256, size=(iters, 16, d), dtype=np.uint8)
    )
    dt16, _ = _device_loop(one, q16, iters, index)

    # int4 bucket variant (same centroids): half the bucket bytes,
    # asymmetric cosine4a candidates + exact-u8 rerank (the engine's
    # int4-library flow).  Recall measured against the same u8 oracle.
    from pixelbox_tpu.ops.int4 import scan_with_u8_rerank

    index4 = ivf_ops.build_ivf(db_u8, valid, cents, precision="int4")
    _, got4_i = scan_with_u8_rerank(
        lambda c, md: ivf_ops.ivf_scan_topk(
            q_u8, index4, k=c, nprobe=nprobe, max_distance=md
        ),
        q_u8, db_u8, k=k, max_distance=1e3,
    )
    got4_i = np.asarray(got4_i)
    r10_4 = float(np.mean(
        [len(set(got4_i[i][:10]) & set(exp_i[i][:10])) / 10
         for i in range(q)]
    ))
    q1_4 = jnp.asarray(
        rng.integers(0, 256, size=(iters, 1, d), dtype=np.uint8)
    )
    dt1_4, _ = _device_loop(one, q1_4, iters, index4)

    cap = index.bucket_cap
    return {
        "ivf_q1_ms": dt1 * 1e3,
        "ivf_q16_ms_per_batch": dt16 * 1e3,
        "qps_q16": 16.0 / dt16,
        "recall_at_10_vs_exact": r10,
        "recall_at_100_vs_exact": r100,
        "n": n, "d": d, "n_clusters": int(n_clusters), "nprobe": nprobe,
        "bucket_cap": int(cap),
        "rows_probed_frac": nprobe * cap / float(n),
        "spill_rows": int(len(ivf_ops.live_spill_ids(index))),
        "train_s": train_s, "pack_s": build_s,
        "index_bytes": int(index.bucket_data.size
                           + index.spill.data.size),
        # int4 buckets: capacity mode composed with the ANN mode.
        "int4_index_bytes": int(index4.bucket_data.size
                                + index4.spill.data.size),
        "int4_recall_at_10_vs_exact_reranked": r10_4,
        "int4_ivf_q1_ms_no_rerank": dt1_4 * 1e3,
    }


def clustered_u8(rng, n, d, q, n_clusters=4096, chunk=2_000_000,
                 noise=18, q_noise=12):
    """Clustered u8 corpus at capacity scale: integer cluster centers +
    integer noise, generated in chunks.  ~20x faster on the host than the
    randn+tanh structured generator (which dominated the 10M capacity
    row's wall clock) while keeping the property IVF cares about: rows
    concentrate around cluster centers, queries land near their cluster.
    """
    centers = rng.integers(0, 256, size=(n_clusters, d), dtype=np.int16)
    assign = rng.integers(0, n_clusters, size=n)
    db = np.empty((n, d), dtype=np.uint8)
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        block = centers[assign[lo:hi]]
        block += rng.integers(-noise, noise + 1, size=(hi - lo, d),
                              dtype=np.int16)
        np.clip(block, 0, 255, out=block)
        db[lo:hi] = block.astype(np.uint8)
    pick = rng.integers(0, n, size=q)
    qs = centers[assign[pick]] + rng.integers(
        -q_noise, q_noise + 1, size=(q, d), dtype=np.int16
    )
    return db, np.clip(qs, 0, 255).astype(np.uint8)


def bench_ivf_capacity(n=10_000_000, d=128, q=32, k=100, nprobe=8,
                       iters=20, rng=None):
    """The regime IVF exists for (ops/ivf.py:4-7): a ≥10M×128 int4-IVF
    single-chip capacity run.  Buckets pack int4 nibbles (half the HBM);
    candidates rerank with the exact u8 metric from the host mirror (the
    engine's int4-library flow).  Reports probe latency, build time, and
    recall@10/@100 vs the exact flat scan at the same N."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops import ivf as ivf_ops
    from pixelbox_tpu.ops.int4 import scan_with_u8_rerank
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(31)
    n = int(os.environ.get("PIXELBOX_BENCH_CAPACITY_N", n))
    t0 = time.perf_counter()
    db_u8, q_u8 = clustered_u8(rng, n, d, q)
    gen_s = time.perf_counter() - t0
    valid = np.ones(n, dtype=bool)

    t0 = time.perf_counter()
    n_clusters = ivf_ops.default_n_clusters(n)
    cents = ivf_ops.spherical_kmeans(db_u8, valid, n_clusters, iters=6)
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    index4 = ivf_ops.build_ivf(db_u8, valid, cents, precision="int4")
    pack_s = time.perf_counter() - t0

    # Ground truth: exact flat u8 scan at the same N (also the flat-scan
    # latency at 10M for the crossover picture).
    _, u8_index = build_semantic_index_from_rows(db_u8, block_rows=2**17)
    t0 = time.perf_counter()
    _, exp_i = cosine_scan_topk(
        jnp.asarray(q_u8), u8_index, k=k, block_rows=2**17
    )
    exp_i = np.asarray(exp_i)
    flat_batch_s = time.perf_counter() - t0

    _, got_i = scan_with_u8_rerank(
        lambda c, md: ivf_ops.ivf_scan_topk(
            q_u8, index4, k=c, nprobe=nprobe, max_distance=md
        ),
        q_u8, db_u8, k=k, max_distance=1e3,
    )
    got_i = np.asarray(got_i)
    r10 = float(np.mean(
        [len(set(got_i[i][:10]) & set(exp_i[i][:10])) / 10 for i in range(q)]
    ))
    r100 = float(np.mean(
        [len(set(got_i[i]) & set(exp_i[i][exp_i[i] >= 0]))
         / max(1, int((exp_i[i] >= 0).sum())) for i in range(q)]
    ))

    def one(qi, ivf):
        dist, idx = ivf_ops.ivf_scan_topk(qi, ivf, k=k, nprobe=nprobe)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0]).astype(jnp.float32)

    q1 = jnp.asarray(rng.integers(0, 256, size=(iters, 1, d), dtype=np.uint8))
    dt1, _ = _device_loop(one, q1, iters, index4)

    # Flat exact single-query latency at the same N (crossover anchor).
    def one_flat(qi, index):
        dist, idx = cosine_scan_topk(qi, index, k=k, block_rows=2**17)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

    dt1_flat, _ = _device_loop(one_flat, q1, iters, u8_index)

    cap = index4.bucket_cap
    return {
        "n": n, "d": d, "precision": "int4",
        "n_clusters": int(n_clusters), "nprobe": nprobe,
        "bucket_cap": int(cap),
        "rows_probed_frac": nprobe * cap / float(n),
        "spill_rows": int(len(ivf_ops.live_spill_ids(index4))),
        "ivf_q1_ms_no_rerank": dt1 * 1e3,
        "flat_exact_q1_ms": dt1_flat * 1e3,
        "speedup_q1_vs_flat": dt1_flat / dt1,
        "recall_at_10_vs_exact_reranked": r10,
        "recall_at_100_vs_exact_reranked": r100,
        "train_s": train_s, "pack_s": pack_s, "datagen_s": gen_s,
        "flat_scan_ms_per_q_batch": flat_batch_s / 1 * 1e3,
        "index_bytes": int(index4.bucket_data.size + index4.spill.data.size),
    }


def bench_ivf_crossover(d=128, k=100, nprobe=8, iters=20,
                        sizes=(65_536, 262_144, 1_048_576), rng=None):
    """Measured flat-vs-IVF single-query crossover: at which N does the
    IVF probe (approximately constant-latency) beat the O(N) exact flat
    scan?  Reports per-N latencies and the interpolated crossover."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops import ivf as ivf_ops
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(37)
    points = {}
    crossover = None
    prev = None
    for n in sizes:
        db_u8, _ = clustered_u8(rng, n, d, 4)
        valid = np.ones(n, dtype=bool)
        cents = ivf_ops.spherical_kmeans(
            db_u8, valid, ivf_ops.default_n_clusters(n), iters=6
        )
        index = ivf_ops.build_ivf(db_u8, valid, cents)
        _, flat = build_semantic_index_from_rows(db_u8, block_rows=2**15)

        def one_ivf(qi, ivf):
            dist, idx = ivf_ops.ivf_scan_topk(qi, ivf, k=k, nprobe=nprobe)
            return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0]).astype(jnp.float32)

        def one_flat(qi, index):
            dist, idx = cosine_scan_topk(qi, index, k=k, block_rows=2**15)
            return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

        q1 = jnp.asarray(
            rng.integers(0, 256, size=(iters, 1, d), dtype=np.uint8)
        )
        dt_ivf, _ = _device_loop(one_ivf, q1, iters, index)
        dt_flat, _ = _device_loop(one_flat, q1, iters, flat)
        points[str(n)] = {
            "ivf_q1_ms": dt_ivf * 1e3,
            "flat_q1_ms": dt_flat * 1e3,
        }
        if crossover is None and dt_ivf < dt_flat:
            if prev is None:
                crossover = n
            else:
                # Linear interpolation of (flat − ivf) between the two N.
                pn, pgap = prev
                gap = dt_flat - dt_ivf
                crossover = int(pn + (n - pn) * (-pgap) / (gap - pgap))
        prev = (n, (dt_flat - dt_ivf))
    return {"points": points, "crossover_n": crossover, "d": d,
            "nprobe": nprobe}


def build_semantic_index_from_rows(db_u8, block_rows=2048):
    import jax.numpy as jnp

    from pixelbox_tpu.ops.packed import PackedSemanticIndex, semantic_rows_from_u8

    n = db_u8.shape[0]
    n_pad = -(-n // block_rows) * block_rows
    padded = np.zeros((n_pad, db_u8.shape[1]), dtype=np.uint8)
    padded[:n] = db_u8
    data, row_sum, row_mag2 = semantic_rows_from_u8(padded)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    return padded, PackedSemanticIndex(
        jnp.asarray(data), jnp.asarray(row_sum), jnp.asarray(row_mag2),
        jnp.asarray(valid),
    )


def bench_recall_parity(n=10_000, d=128, q=16, k=10, rng=None):
    """Config 1 exact form: top-10 parity vs the exact CPU oracle at 10k."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.oracle import cosine_scan_topk_np
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(1)
    db, index = build_semantic_index(n, d, rng, block_rows=2048)
    queries = rng.integers(0, 256, size=(q, d), dtype=np.uint8)
    dist, idx = cosine_scan_topk(jnp.asarray(queries), index, k=k, block_rows=2048)
    idx = np.asarray(idx)
    exp_d, exp_i = cosine_scan_topk_np(queries, db, k=k)
    hits = sum(
        len(set(idx[i]) & set(exp_i[i])) / k for i in range(q)
    ) / q
    return {"recall_at_10_vs_oracle": hits, "n": n, "queries": q}


def bench_hamming(n=1_000_000, h=32, q=256, k=100, iters=50,
                  block_rows=2**16, rng=None):
    """Config 2: perceptual-hash Hamming search."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops.packed import PackedHammingIndex
    from pixelbox_tpu.ops.scan import hamming_scan_topk

    rng = rng or np.random.default_rng(2)
    n_pad = -(-n // block_rows) * block_rows
    db = rng.integers(0, 256, size=(n_pad, h), dtype=np.uint8)
    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    index = PackedHammingIndex(jnp.asarray(db), jnp.asarray(valid))
    qs = jnp.asarray(rng.integers(0, 256, size=(iters, q, h), dtype=np.uint8))

    def one(qi, index):
        dist, idx = hamming_scan_topk(qi, index, k=k, block_rows=block_rows)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

    dt, _ = _device_loop(one, qs, iters, index)

    # MXU GEMM formulation (bit-unpacked ±1), fast selection.
    from pixelbox_tpu.ops.hamming_gemm import (
        build_hamming_gemm_index,
        hamming_gemm_scan_topk,
    )

    gidx = build_hamming_gemm_index(index)

    def one_gemm(qi, gidx):
        dist, idx = hamming_gemm_scan_topk(
            qi, gidx, k=k, block_rows=block_rows, mode="fast"
        )
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

    dt_g, _ = _device_loop(one_gemm, qs, iters, gidx)
    out = {
        "hashes_per_sec_xor_exact": n * q / dt,
        "hashes_per_sec_gemm_fast": n * q / dt_g,
        "qps_batch_gemm_fast": q / dt_g,
        "n": n,
        "hash_bytes": h,
        "scan_ms_xor_exact": dt * 1e3,
        "scan_ms_gemm_fast": dt_g * 1e3,
    }

    # Guaranteed-exact threshold scan (Pallas on TPU).
    from pixelbox_tpu.ops.scan import _default_backend_is_tpu

    if _default_backend_is_tpu() and gidx.capacity % 2048 == 0:
        from pixelbox_tpu.ops.hamming_gemm import build_hamming_scan_sample
        from pixelbox_tpu.ops.pallas_scan import (
            build_hamming_meta,
            pallas_hamming_threshold_scan_topk_v2,
        )

        sample = build_hamming_scan_sample(gidx)
        meta = build_hamming_meta(gidx)

        from pixelbox_tpu.ops.scan import _pick_tile_rows

        tile_h = _pick_tile_rows(q, gidx.capacity)

        def one_thresh(qi, gidx, meta, sd, sv):
            dist, idx, exact = pallas_hamming_threshold_scan_topk_v2(
                qi, gidx, meta, sd, sv, k=k, tile_rows=tile_h
            )
            return jnp.sum(dist[:, 0]) + jnp.sum(exact.astype(jnp.float32))

        dt_t, _ = _device_loop(
            one_thresh, qs, iters, gidx, meta, sample.data, sample.valid
        )
        _, _, exact = pallas_hamming_threshold_scan_topk_v2(
            qs[0], gidx, meta, sample.data, sample.valid, k=k
        )
        out["hashes_per_sec_threshold_exact"] = n * q / dt_t
        out["scan_ms_threshold_exact"] = dt_t * 1e3
        out["threshold_proof_rate"] = float(np.asarray(exact).mean())
    return out


def bench_embedding(batch=64, iters=8, size=224, dim=128, rng=None):
    """Config 3: batched EfficientNet embedding extraction (images/s)."""
    import jax.numpy as jnp

    from pixelbox_tpu.models import get_embedder
    from pixelbox_tpu.ops.quantize import quantize_embedding

    rng = rng or np.random.default_rng(3)
    emb = get_embedder("efficientnet", dim=dim, input_size=size)
    xs = jnp.asarray(
        rng.uniform(0, 1, size=(iters, batch, size, size, 3)).astype(np.float32)
    )

    def one(x):
        z = emb.embed_preprocessed(x)
        return jnp.sum(quantize_embedding(z).astype(jnp.float32))

    dt, _ = _device_loop(one, xs, iters)
    return {
        "images_per_sec": batch / dt,
        "batch": batch,
        "input_size": size,
        "latent_dim": dim,
        "ms_per_batch": dt * 1e3,
        "vs_ingest_north_star": batch / dt / NORTH_STAR_INGEST_PER_SEC,
    }


def bench_e2e_dragdrop(n=1_000_000, d=128, iters=5, rng=None):
    """Config 4: end-to-end drag-drop query at 1M vectors:
    decode → preprocess → embed → quantize → top-k (wall clock)."""
    import io

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pixelbox_tpu.models import get_embedder
    from pixelbox_tpu.ops.preprocess import preprocess_host
    from pixelbox_tpu.ops.quantize import quantize_embedding
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(4)
    _, index = build_semantic_index(n, d, rng, block_rows=2**17)
    emb = get_embedder("efficientnet", dim=d, input_size=224)

    # A realistic on-disk JPEG to decode each iteration.
    img = (rng.uniform(0, 255, size=(960, 1280, 3))).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    jpeg_bytes = buf.getvalue()

    def query_once(noise):
        t0 = time.perf_counter()
        decoded = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
        decoded = np.clip(decoded.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        pre = preprocess_host(decoded, 224)
        z = emb.embed_preprocessed(jnp.asarray(pre[None]))
        hq = quantize_embedding(z)
        dist, idx = cosine_scan_topk(hq[0], index, k=100, block_rows=2**17)
        _ = float(np.asarray(dist[0]))
        return time.perf_counter() - t0

    query_once(0)  # compile
    times = [query_once(i + 1) for i in range(iters)]
    return {
        "e2e_ms_median": float(np.median(times) * 1e3),
        "e2e_ms_best": float(np.min(times) * 1e3),
        "n": n,
    }


def bench_ingest(n_images=200, workers=8, rng=None):
    """Ingest pipeline end-to-end: crawl → decode → thumbnail/phash →
    device embed/quantize → append (images/s vs the 5k/s north star)."""
    import shutil
    import tempfile

    from PIL import Image

    from pixelbox_tpu.engine import Engine

    rng = rng or np.random.default_rng(6)
    tmp = tempfile.mkdtemp(prefix="pxbench_")
    try:
        photo_dir = f"{tmp}/photos"
        import os

        os.makedirs(photo_dir)
        warm_dir = f"{tmp}/warm"
        os.makedirs(warm_dir)
        base = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize((1280, 960), Image.BILINEAR))
        for i in range(n_images):
            jig = np.clip(img.astype(np.int16) + int(i % 17) - 8, 0, 255).astype(
                np.uint8
            )
            Image.fromarray(jig).save(f"{photo_dir}/img{i:04d}.jpg", quality=88)
        # Small warmup set: absorbs the embed-batch jit compile so the
        # timed run measures pipeline throughput, not compilation.
        for i in range(2):
            Image.fromarray(img).save(f"{warm_dir}/w{i}.jpg", quality=88)

        eng = Engine.new(
            f"{tmp}/bench.db", embedder="stub", embedder_kwargs={"dim": 128}
        )
        eng.add_tracked_folder(warm_dir)
        eng.start_indexing(num_workers=workers)
        eng.wait_for_indexing()
        eng.remove_tracked_folder(warm_dir)

        eng.add_tracked_folder(photo_dir)
        t0 = time.perf_counter()
        eng.start_indexing(num_workers=workers)
        eng.wait_for_indexing()
        dt = time.perf_counter() - t0
        count = eng.get_num_indexed_images() - 2
        eng.close()
        return {
            "images_per_sec": count / dt,
            "images": count,
            "workers": workers,
            "total_s": dt,
            "vs_ingest_north_star": count / dt / NORTH_STAR_INGEST_PER_SEC,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_ingest_scaling(n_images=120, workers=(1, 2, 4, 8), rng=None):
    """Measured (not extrapolated) ingest scaling: images/s vs decode
    workers on THIS host, plus the single-image host floor per stage.
    On a 1-core VM the worker curve shows contention behavior, not
    speedup — the per-core floor is the honest scaling basis and is
    reported alongside (PERF.md 'Host ingest stages')."""
    import io
    import os
    import shutil
    import tempfile

    from PIL import Image

    rng = rng or np.random.default_rng(6)
    out = {"host": {"nproc": os.cpu_count()}}

    # Single-image stage floor (measured on the bench image).
    base = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
    img = np.asarray(Image.fromarray(base).resize((1280, 960), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    data = buf.getvalue()

    from pixelbox_tpu.ingest.decode import decode_image_bytes
    from pixelbox_tpu.ingest.thumbnail import make_thumbnail, qoi_encode
    from pixelbox_tpu.ops import phash as phash_ops
    from pixelbox_tpu.ops.preprocess import fill_resize_u8_with_big

    def _t(fn, reps=5, inner=8):
        """min-of-reps over inner-averaged runs: the MIN is the robust
        floor estimator on a contended host (a single mean-of-40 swung
        ±25-40% between rounds and could hide a real 20% regression)."""
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                fn()
            best = min(best, (time.perf_counter() - t0) / inner)
        return best * 1e3

    dec = decode_image_bytes(data, "x.jpg", "/x.jpg")
    # The pipeline pays ONE full-res resample per image: the embed
    # frame's pre-crop cover image is re-used as the thumbnail source
    # (ingest/pipeline.py decode worker).  Stage set mirrors that.
    _, big = fill_resize_u8_with_big(dec.rgb, 224)
    t_thumb_shared = _t(lambda: make_thumbnail(dec.rgb, prescaled=big))
    thumb = make_thumbnail(dec.rgb, prescaled=big)
    stages = {
        "decode_exif_ms": _t(lambda: decode_image_bytes(data, "x.jpg", "/x.jpg")),
        "embed_frame_ms": _t(lambda: fill_resize_u8_with_big(dec.rgb, 224)),
        "thumbnail_from_frame_ms": t_thumb_shared,
        "qoi_ms": _t(lambda: qoi_encode(thumb)),
        "phash_compat_ms": _t(
            lambda: phash_ops.phash(dec.rgb, aspect_preserving=True)
        ),
    }
    stages["total_per_core_ms"] = sum(max(v, 0.0) for v in stages.values())
    # Turbo mode (phash on device from the embed frame) drops the host
    # phash stage entirely.
    stages["total_per_core_turbo_ms"] = (
        stages["total_per_core_ms"] - max(stages["phash_compat_ms"], 0.0)
    )
    out["stage_floor"] = stages
    out["per_core_images_per_sec"] = 1e3 / stages["total_per_core_ms"]
    out["cores_to_reach_north_star"] = (
        NORTH_STAR_INGEST_PER_SEC / out["per_core_images_per_sec"]
    )

    # Worker scaling curve (end-to-end pipeline, stub embedder).
    from pixelbox_tpu.engine import Engine

    tmp = tempfile.mkdtemp(prefix="pxscale_")
    try:
        photo_dir = f"{tmp}/photos"
        os.makedirs(photo_dir)
        for i in range(n_images):
            jig = np.clip(
                img.astype(np.int16) + int(i % 17) - 8, 0, 255
            ).astype(np.uint8)
            Image.fromarray(jig).save(f"{photo_dir}/img{i:04d}.jpg", quality=88)
        curve = {}
        for w in workers:
            eng = Engine.new(
                f"{tmp}/scale_w{w}.db", embedder="stub",
                embedder_kwargs={"dim": 128},
            )
            eng.add_tracked_folder(photo_dir)
            # Warm the embed-batch compile on two images first.
            warm = f"{tmp}/warm{w}"
            os.makedirs(warm, exist_ok=True)
            for i in range(2):
                Image.fromarray(img).save(f"{warm}/w{i}.jpg", quality=88)
            eng.add_tracked_folder(warm)
            eng.start_indexing(num_workers=w)
            eng.wait_for_indexing()
            # Timed run over a fresh library (skip-check makes re-index a no-op).
            eng.close()
            eng = Engine.new(
                f"{tmp}/scale2_w{w}.db", embedder="stub",
                embedder_kwargs={"dim": 128},
            )
            eng.add_tracked_folder(photo_dir)
            t0 = time.perf_counter()
            eng.start_indexing(num_workers=w)
            eng.wait_for_indexing()
            dt = time.perf_counter() - t0
            count = eng.get_num_indexed_images()
            eng.close()
            curve[str(w)] = {
                "images_per_sec": count / dt,
                "images": count,
                "total_s": dt,
            }
        out["workers_curve"] = curve
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bench_serve_e2e(n_images=300, clients=8, reqs_per_client=6, rng=None):
    """End-to-end serving: HTTP upload → decode → embed → batched scan →
    catalog assembly → JSON, with CONCURRENT clients through the
    BatchingScanService.  This is the user-visible query metric (the
    device-scan qps elsewhere excludes result assembly and HTTP)."""
    import http.client
    import io
    import os
    import shutil
    import tempfile
    import threading

    from PIL import Image

    from pixelbox_tpu.engine import Engine
    from pixelbox_tpu.serve import make_handler
    from pixelbox_tpu.serving import BatchingScanService

    rng = rng or np.random.default_rng(11)
    tmp = tempfile.mkdtemp(prefix="pxserve_")
    server = None
    svc = None
    try:
        photo_dir = f"{tmp}/photos"
        os.makedirs(photo_dir)
        base = rng.integers(0, 255, size=(24, 32, 3)).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize((640, 480), Image.BILINEAR))
        for i in range(n_images):
            jig = np.clip(img.astype(np.int16) + int(i % 13) - 6, 0, 255).astype(
                np.uint8
            )
            Image.fromarray(jig).save(f"{photo_dir}/img{i:04d}.jpg", quality=85)
        eng = Engine.new(
            f"{tmp}/serve.db", embedder="stub", embedder_kwargs={"dim": 128}
        )
        eng.add_tracked_folder(photo_dir)
        eng.start_indexing(num_workers=2)
        eng.wait_for_indexing()

        from http.server import ThreadingHTTPServer

        lock = threading.Lock()
        svc = BatchingScanService(
            lambda: eng._sem_store.device_index,
            k=eng.max_search_results,
            max_distance=eng.max_distance_from_query,
        )
        eng.attach_scan_service(svc)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(eng, lock, svc)
        )
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=85)
        jpeg = buf.getvalue()

        # Warm the scan compile with one request.
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        c.request("POST", "/api/similar", body=jpeg)
        c.getresponse().read()
        c.close()

        lat = []
        lat_lock = threading.Lock()

        def client():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            for _ in range(reqs_per_client):
                t0 = time.perf_counter()
                conn.request("POST", "/api/similar", body=jpeg)
                r = conn.getresponse()
                body = r.read()
                assert r.status == 200, body[:200]
                with lat_lock:
                    lat.append(time.perf_counter() - t0)
            conn.close()

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        total = clients * reqs_per_client

        # Text-search path (filename query through the catalog).
        t1 = time.perf_counter()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for _ in range(10):
            conn.request("GET", "/api/search?q=img")
            conn.getresponse().read()
        search_ms = (time.perf_counter() - t1) / 10 * 1e3
        conn.close()

        return {
            "serve_e2e_qps": total / wall,
            "e2e_latency_ms_median": float(np.median(lat) * 1e3),
            "e2e_latency_ms_p90": float(np.quantile(lat, 0.9) * 1e3),
            "clients": clients,
            "requests": total,
            "scan_batches": svc.batches_run,
            "scan_queries": svc.queries_served,
            "indexed_images": eng.get_num_indexed_images(),
            "text_search_ms": search_ms,
        }
    finally:
        if server is not None:
            server.shutdown()
        if svc is not None:
            svc.close()
        shutil.rmtree(tmp, ignore_errors=True)


def bench_blip_text(n=1_000_000, iters=8, q=32, rng=None):
    """Config 5: BLIP text→image search (text embed + 1M×256 scan)."""
    import jax.numpy as jnp

    from pixelbox_tpu.models.blip import BlipConfig, BlipSearcher
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(5)
    searcher = BlipSearcher(cfg=BlipConfig(), max_text_len=32)
    d = searcher.dim
    _, index = build_semantic_index(n, d, rng, block_rows=2**16)

    texts = ["a photo of a %s on a %s" % (a, b)
             for a in ("cat", "dog", "car", "tree")
             for b in ("beach", "street", "table", "hill")][:q]
    q = len(texts)
    t0 = time.perf_counter()
    hashes = searcher.text_hashes(texts)  # includes compile
    compile_and_embed_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    hashes = searcher.text_hashes(texts)
    text_embed_s = time.perf_counter() - t0

    qs = jnp.asarray(np.broadcast_to(hashes, (iters, q, d)).copy())

    # Measure the path the engine actually serves text: queries on — the
    # guaranteed-exact auto threshold scan with cached θ-sample/meta
    # (engine._query_text_filtered), falling back to the direct exact
    # scan off-TPU.
    from pixelbox_tpu.ops.scan import (
        _default_backend_is_tpu,
        build_scan_sample,
    )

    if _default_backend_is_tpu() and d % 128 == 0:
        from pixelbox_tpu.ops.pallas_scan import (
            build_row_meta,
            pallas_threshold_scan_topk_v2,
        )

        sample = build_scan_sample(index)
        meta = build_row_meta(index)

        def one(qi, index, meta, sample):
            dist, idx, exact = pallas_threshold_scan_topk_v2(
                qi, index, meta, sample, k=100, max_distance=np.inf
            )
            return jnp.sum(dist[:, 0]) + jnp.sum(exact.astype(jnp.float32))

        dt, _ = _device_loop(one, qs, iters, index, meta, sample)
        scan_path = "pallas_threshold_auto"
    else:
        def one(qi, index):
            dist, idx = cosine_scan_topk(qi, index, k=100, block_rows=2**16)
            return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

        dt, _ = _device_loop(one, qs, iters, index)
        scan_path = "xla_exact"
    return {
        "text_embed_ms_per_batch": text_embed_s * 1e3,
        "texts_per_sec": q / text_embed_s,
        "scan_qps": q / dt,
        "scan_path": scan_path,
        "n": n,
        "proj_dim": d,
        "first_call_s": compile_and_embed_s,
    }


def bench_train_step(iters=20, rng=None):
    """Offline-trainer throughput (SURVEY L0): one contrastive step =
    EfficientNet-B0 forward×2 + backward + Adam (training/train.py,
    mirroring /root/reference/resources/train.py:118-160).  Reported as
    images/sec/chip at the reference's shipped config (latent 8, 224²,
    batch 32, f32 — train.py:178-191) and at a TPU-native config
    (batch 256, bf16 compute on the MXU)."""
    import jax
    import jax.numpy as jnp

    from pixelbox_tpu.parallel.mesh import make_mesh
    from pixelbox_tpu.training.train import (
        TrainConfig,
        init_train_state,
        make_sharded_train_step,
    )

    rng = rng or np.random.default_rng(5)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, axis_names=("data", "model"), shape=(n_dev, 1))
    out = {}
    for name, cfg in (
        ("ref_b32_f32", TrainConfig(latent_dim=8, batch_size=32)),
        (
            "tpu_b256_bf16",
            TrainConfig(latent_dim=8, batch_size=256, dtype=jnp.bfloat16),
        ),
    ):
        state = init_train_state(cfg, mesh)
        step = make_sharded_train_step(cfg, mesh)
        b = cfg.batch_size
        shape = (b, cfg.input_size, cfg.input_size, 3)
        left = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        right = jnp.asarray(
            np.clip(
                np.asarray(left) + rng.normal(0, 0.05, shape), 0, 1
            ).astype(np.float32)
        )
        labels = jnp.asarray(
            np.where(rng.uniform(size=b) < 0.5, 1.0, -1.0).astype(np.float32)
        )
        t0 = time.perf_counter()
        state, loss = step(state, left, right, labels)  # compile
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, left, right, labels)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters
        out[f"train_{name}_images_per_s"] = 2 * b / dt  # a pair = 2 images
        out[f"train_{name}_step_ms"] = dt * 1e3
        out[f"train_{name}_first_call_s"] = compile_s
        out[f"train_{name}_loss_finite"] = bool(
            np.isfinite(np.asarray(loss, dtype=np.float32))
        )
    return out


def _probe_platform():
    """Verify the default JAX platform actually initializes.

    A half-up accelerator tunnel can make backend init hang *forever*
    (observed on the axon attachment), which would leave the whole bench
    silent — worse than a slow CPU number.  Probe `jax.devices()` in a
    subprocess with a hard timeout; on hang/failure, fall back to CPU so
    the headline JSON line is always emitted.  Respects a caller-pinned
    JAX_PLATFORMS.
    """
    import os
    import subprocess

    pinned = os.environ.get("JAX_PLATFORMS", "")
    if pinned == "cpu":
        # Explicit CPU pin — nothing to probe, CPU init can't hang.
        return {"platform": "cpu", "pinned": True}
    timeout_s = float(os.environ.get("PIXELBOX_BENCH_PROBE_TIMEOUT_S", "240"))
    attempts = int(os.environ.get("PIXELBOX_BENCH_PROBE_ATTEMPTS", "2"))
    reason = "unprobed"
    for attempt in range(max(1, attempts)):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=timeout_s,
            )
            lines = r.stdout.strip().splitlines()
            if r.returncode == 0 and lines:
                return {"platform": lines[-1]}
            if r.returncode == 0:
                reason = "probe printed nothing to stdout"
            else:
                err = (r.stderr or "").strip().splitlines()
                reason = err[-1] if err else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            # A transient tunnel flap can heal between attempts; retry
            # once before committing to the CPU fallback.
            reason = f"device init hung >{timeout_s:.0f}s (tunnel down?)"
    os.environ["JAX_PLATFORMS"] = "cpu"
    return {
        "platform": "cpu",
        "fallback_reason": reason,
        # The CPU numbers below are honest but NOT the chip's: point the
        # reader at the last verified on-TPU measurements (methodology
        # and full tables in PERF.md).
        "last_tpu_full_bench": (
            "round-3 on the attached TPU v5 lite (i100, 25.6k proof "
            "trials): 60.4 Gdots/s guaranteed-exact cosine at Q=256 "
            "(4.18 ms/batch), hamming 83.6 G compares/s, int4 asym "
            "49.1 Gdots/s — see PERF.md"
        ),
    }


def main():
    full = "--full" in sys.argv
    platform_info = _probe_platform()
    if "fallback_reason" in platform_info:
        # The env-var override alone can lose to a force-set JAX_PLATFORMS
        # read before ours lands; jax.config.update always wins.
        import jax

        jax.config.update("jax_platforms", "cpu")
    from pixelbox_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    # Overall deadline: first-time jit compiles over a TPU tunnel can take
    # minutes per config; always emit the headline JSON line even if later
    # configs must be skipped (they hit the persistent compile cache on
    # the next run).
    import os

    deadline = time.monotonic() + float(
        os.environ.get("PIXELBOX_BENCH_DEADLINE_S", "1200")
    )

    detail = {"platform": platform_info}
    rng = np.random.default_rng(0)

    # Measurement floor: a null body through the same device loop — one
    # tunnel round-trip amortized over the iterations.  Reported, never
    # subtracted.
    try:
        import jax.numpy as jnp

        _null_in = jnp.zeros((50, 8, 8), jnp.float32)
        _dt, _ = _device_loop(lambda x: jnp.sum(x), _null_in, 50)
        detail["measurement_floor"] = {"null_floor_ms_per_iter": _dt * 1e3}
    except Exception as e:  # noqa: BLE001
        detail["measurement_floor"] = {"error": str(e)}

    # Headline: the engine's default guaranteed-exact scan (verified-fast
    # with per-query exact repair).  End-to-end number, exact semantics.
    # On an emergency CPU fallback (accelerator tunnel down) shrink the
    # problem so the headline line still emits in minutes, not hours —
    # the number is then an honest CPU measurement, flagged via
    # detail.platform.fallback_reason.
    def _progress(msg):
        print(f"[bench +{time.monotonic() - _t_start:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    _t_start = time.monotonic()
    _progress(f"platform={platform_info.get('platform')}")

    def _shape_name(base, res):
        """Rows are named by the shape they ACTUALLY ran (VERDICT r3:
        the shrunk CPU-fallback rows were mislabeled 1Mx128)."""
        if not isinstance(res, dict):
            return base
        n = res.get("n")
        d = res.get("d") or res.get("hash_bytes")
        if not n:
            return base

        def fmt(x):
            if x % 1_000_000 == 0:
                return f"{x // 1_000_000}M"
            if x % 1_000 == 0:
                return f"{x // 1_000}k"
            return str(x)

        return f"{base}_{fmt(n)}x{d}" if d else f"{base}_{fmt(n)}"

    emergency_cpu = "fallback_reason" in platform_info
    _progress("headline cosine_scan_auto start")
    if emergency_cpu:
        auto = bench_auto_scan(n=100_000, q=32, iters=5,
                               block_rows=2**15, rng=rng)
    else:
        auto = bench_auto_scan(rng=rng)
    _progress("headline done")
    detail[_shape_name("cosine_scan_auto", auto)] = auto
    headline = auto["dots_per_sec_exact_guaranteed"]
    metric_name = _shape_name("u8_cosine_scan_exact_dot_products_per_sec",
                              auto)
    # Early scoreboard line: if a later row stalls past an outer kill,
    # the last COMPLETE output line is still a parseable headline (the
    # final compact line below supersedes it on a clean finish).
    print(json.dumps({
        "metric": metric_name,
        "value": headline,
        "unit": "dot-products/s/chip",
        "vs_baseline": headline / NORTH_STAR_DOTS_PER_SEC,
        "partial": True,
    }), flush=True)

    shrink = (
        {
            "cosine_scan_direct_exact": dict(
                n=100_000, q=32, iters=5, block_rows=2**15),
            "cosine_scan_fast_mode": dict(
                n=100_000, q=32, iters=5, block_rows=2**15),
            "hamming_scan": dict(n=100_000, q=32, iters=5,
                                 block_rows=2**15),
            "int4_scan": dict(n=100_000, q=32, iters=5),
            "ivf_scan": dict(n=50_000, q=16, iters=5),
            # --full rows shrink too: each would otherwise stall the
            # whole run for many minutes on one CPU core (the deadline
            # is only checked BETWEEN rows).
            "efficientnet_embedding": dict(batch=8, iters=2, size=96,
                                           dim=32),
            "ingest_pipeline": dict(n_images=40, workers=2),
            "ingest_scaling": dict(n_images=24, workers=(1, 2)),
            "serve_e2e": dict(n_images=40, clients=4, reqs_per_client=3),
            "e2e_dragdrop": dict(n=100_000, iters=2),
        }
        if emergency_cpu
        else {}
    )
    # Rows NOT meaningful on an emergency-CPU fallback at any size: a
    # ViT-L text tower / B0 train steps / a 10M-row capacity build on one
    # core are stalls, not measurements.
    cpu_skip = (
        {"blip_text_search", "train_step", "ivf_capacity", "ivf_crossover"}
        if emergency_cpu
        else set()
    )
    for name, fn in [
        ("cosine_scan_direct_exact", bench_cosine_scan),
        ("cosine_scan_fast_mode", bench_fast_scan),
        ("recall_parity", bench_recall_parity),
        ("hamming_scan", bench_hamming),
        ("int4_scan", bench_int4_scan),
        ("ivf_scan", bench_ivf_scan),
        ("ivf_capacity", bench_ivf_capacity),
        ("ivf_crossover", bench_ivf_crossover),
    ] + (
        [
            ("efficientnet_embedding", bench_embedding),
            ("ingest_pipeline", bench_ingest),
            ("ingest_scaling", bench_ingest_scaling),
            ("serve_e2e", bench_serve_e2e),
            ("e2e_dragdrop", bench_e2e_dragdrop),
            ("blip_text_search", bench_blip_text),
            ("train_step", bench_train_step),
        ]
        if full
        else []
    ):
        only = os.environ.get("PIXELBOX_BENCH_ONLY")
        if only and name not in only.split(","):
            continue
        if name in cpu_skip:
            detail[name] = {
                "skipped": "emergency CPU fallback — not measurable on "
                "one core (see last_tpu_full_bench / PERF.md)"
            }
            continue
        # Budget-aware scheduling: a row whose ESTIMATE doesn't fit the
        # remaining deadline is skipped up front (the deadline is only
        # checked between rows, so starting a half-hour capacity build
        # with two minutes left would stall the whole run — VERDICT r3).
        est_s = {"ivf_capacity": 900, "ivf_crossover": 240,
                 "ivf_scan": 300, "blip_text_search": 240,
                 "train_step": 180}.get(name, 90)
        if time.monotonic() + est_s > deadline:
            detail[name] = {
                "skipped": f"remaining deadline < est {est_s}s "
                "(raise PIXELBOX_BENCH_DEADLINE_S to include this row)"
            }
            continue
        _progress(f"{name} start")
        try:
            res = fn(**shrink.get(name, {}))
            detail[_shape_name(name, res)] = res
        except Exception as e:  # noqa: BLE001
            detail[name] = {"error": f"{type(e).__name__}: {e}"}
        # Incremental detail flush: a kill mid-run still leaves every
        # completed row on disk.
        try:
            with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_DETAIL.json",
            ), "w") as f:
                json.dump(detail, f, indent=1)
        except OSError:
            pass

    # Full detail goes to a FILE; the printed line stays compact.  Round 3
    # lost its scoreboard row because the detail dict grew past the
    # driver's 2,000-char output-tail capture and truncated the line's
    # head ("parsed: null" in BENCH_r03.json) — never again.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as e:
        detail_path = f"unwritable: {e}"

    def _pick(prefix, key):
        for row, v in detail.items():
            if row.startswith(prefix) and isinstance(v, dict) and key in v:
                return round(v[key], 4)
        return None

    summary = {
        "platform": platform_info.get("platform"),
        "fallback": platform_info.get("fallback_reason"),
        "proof_rate": _pick("cosine_scan_auto", "proof_rate_per_query"),
        "hamming_gdots": _pick("hamming_scan",
                               "hashes_per_sec_threshold_exact"),
        "int4_gdots": _pick("int4_scan", "dots_per_sec"),
        "ivf_q1_ms": _pick("ivf_scan", "ivf_q1_ms"),
        "ivf10M_q1_ms": _pick("ivf_capacity", "ivf_q1_ms_no_rerank"),
        "ivf10M_recall10": _pick("ivf_capacity",
                                 "recall_at_10_vs_exact_reranked"),
        "recall10_vs_oracle": _pick("recall_parity",
                                    "recall_at_10_vs_oracle"),
    }
    summary = {k: v for k, v in summary.items() if v is not None}
    out = {
        "metric": metric_name,
        "value": headline,
        "unit": "dot-products/s/chip",
        "vs_baseline": headline / NORTH_STAR_DOTS_PER_SEC,
        "summary": summary,
        "detail_file": detail_path,
    }
    line = json.dumps(out)
    if len(line) > 1800:  # belt-and-braces: never outgrow the tail capture
        out.pop("summary", None)
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
