"""Clustered-ANN (IVF) benchmark rows.

All builds are DEVICE-side (ops/ivf_build.py): round-4 measured the
host packer at 96 s for 1M x 128 int4 on the 1-core bench VM (88 s of
numpy quantize/moments) and the host datagen at 151 s — which starved
the >=10M capacity row out of two consecutive driver runs.  Corpus
generation, k-means, assignment, packing, ground truth, and the exact-u8
rerank all stay on device; only scalar timings and small candidate ids
cross the link.

Reference anchor: src/engine.rs:375-383 — the O(N)-per-query exact scan
whose latency IVF relaxes at capacity scale.
"""

import os
import time

import numpy as np

from benchmarks.util import (
    device_loop as _device_loop,
    recall_at,
    structured_embeddings_device,
)


def _index_nbytes(index) -> int:
    """True byte size of the packed bucket + spill data (ADVICE r4:
    ``.size`` is an element count, correct only while dtypes are 1-byte)."""
    return int(index.bucket_data.nbytes + index.spill.data.nbytes)


def bench_ivf_scan(n=1_000_000, d=128, q=64, k=100, nprobe=None, iters=50,
                   rng=None):
    """Opt-in IVF clustered index (ops/ivf.py): single-query latency and
    recall vs the exact flat scan on structured embeddings.  ``nprobe``
    None = the engine's recall-governed default (2% of clusters, floor
    8); the fixed nprobe=8 recall is reported alongside for the scaling
    story.  The flat guaranteed-exact scan stays the engine default."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops import ivf as ivf_ops
    from pixelbox_tpu.ops import ivf_build
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(29)
    db_dev, q_dev = structured_embeddings_device(29, n, d, q)
    q_u8 = np.asarray(q_dev)

    t0 = time.perf_counter()
    n_clusters = ivf_ops.default_n_clusters(n)
    # 6 Lloyd iterations, same as the capacity row: recall@10 measured
    # 1.0 at the auto nprobe either way, and 10 iters cost ~35 s more
    # of the driver's deadline at 1M.
    cents = ivf_build.kmeans_device(
        db_dev, n_clusters, iters=6, seed=0,
        train_sample=min(n, 2_000_000),
    )
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    index = ivf_build.build_ivf_device(db_dev, None, cents)
    np.asarray(index.bucket_rows[0, 0])  # build barrier
    build_s = time.perf_counter() - t0

    # Ground truth: exact flat scan (one pass, not timed here).
    u8_index = ivf_build.flat_semantic_index_device(db_dev,
                                                    block_rows=2**15)
    _, exp_i = cosine_scan_topk(q_dev, u8_index, k=k, block_rows=2**15)
    exp_i = np.asarray(exp_i)

    nprobe_eff = (
        int(nprobe) if nprobe else ivf_ops.default_nprobe(index.n_clusters)
    )
    _, got_i = ivf_ops.ivf_scan_topk(q_u8, index, k=k, nprobe=nprobe_eff)
    got_i = np.asarray(got_i)
    r10 = recall_at(got_i, exp_i, 10)
    r100 = float(np.mean(
        [len(set(got_i[i]) & set(exp_i[i][exp_i[i] >= 0]))
         / max(1, int((exp_i[i] >= 0).sum())) for i in range(q)]
    ))
    # The old fixed default, for the scaling narrative (VERDICT r4: 8
    # probes = 0.2% of clusters at 1M measured recall@10 0.972).
    _, got8_i = ivf_ops.ivf_scan_topk(q_u8, index, k=k, nprobe=8)
    r10_fixed8 = recall_at(np.asarray(got8_i), exp_i, 10)

    # Latency: single query and a small batch, on-device loop.
    def one(qi, ivf):
        dist, idx = ivf_ops.ivf_scan_topk(qi, ivf, k=k, nprobe=nprobe_eff)
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
    index4 = ivf_build.build_ivf_device(db_dev, None, cents,
                                        precision="int4")
    _, got4_i = ivf_build.scan_with_u8_rerank_device(
        lambda c, md: ivf_ops.ivf_scan_topk(
            q_u8, index4, k=c, nprobe=nprobe_eff, max_distance=md
        ),
        q_dev, db_dev, k=k, max_distance=1e3,
    )
    r10_4 = recall_at(np.asarray(got4_i), exp_i, 10)
    # No-rerank quality next to the no-rerank latency (VERDICT r4 ask
    # #6: every latency carries its recall) — raw cosine4a selection,
    # the engine's int4_rerank=False path.
    _, raw4_i = ivf_ops.ivf_scan_topk(q_u8, index4, k=k, nprobe=nprobe_eff)
    r10_4_raw = recall_at(np.asarray(raw4_i), exp_i, 10)
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
        "recall_at_10_fixed_nprobe8": r10_fixed8,
        "n": n, "d": d, "n_clusters": int(index.n_clusters),
        "nprobe": nprobe_eff,
        "nprobe_policy": "explicit" if nprobe else "auto (2% of clusters)",
        "bucket_cap": int(cap),
        "rows_probed_frac": nprobe_eff * cap / float(n),
        "spill_rows": int(len(ivf_ops.live_spill_ids(index))),
        "train_s": train_s, "pack_s": build_s,
        "index_bytes": _index_nbytes(index),
        # int4 buckets: capacity mode composed with the ANN mode.
        "int4_index_bytes": _index_nbytes(index4),
        "int4_recall_at_10_vs_exact_reranked": r10_4,
        "int4_ivf_q1_ms_no_rerank": dt1_4 * 1e3,
        "int4_ivf_recall_at_10_no_rerank": r10_4_raw,
    }


def bench_ivf_capacity(n=10_000_000, d=128, q=32, k=100, nprobe=None,
                       iters=20, rng=None):
    """The regime IVF exists for (ops/ivf.py:4-7): a >=10M x 128
    int4-IVF single-chip capacity run, built and evaluated entirely on
    device.  Buckets pack int4 nibbles (half the HBM); candidates rerank
    with the exact u8 metric against the device row mirror (the engine's
    int4-library flow).  Reports probe latency, build time, and
    recall@10/@100 vs the exact flat scan at the same N."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops import ivf as ivf_ops
    from pixelbox_tpu.ops import ivf_build
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(31)
    n = int(os.environ.get("PIXELBOX_BENCH_CAPACITY_N", n))
    t0 = time.perf_counter()
    db_dev, q_dev = ivf_build.device_clustered_corpus(31, n, d, q)
    np.asarray(q_dev)  # barrier
    gen_s = time.perf_counter() - t0
    q_u8 = np.asarray(q_dev)

    t0 = time.perf_counter()
    n_clusters = ivf_ops.default_n_clusters(n)
    cents = ivf_build.kmeans_device(
        db_dev, n_clusters, iters=6, seed=0,
        train_sample=min(n, 2_000_000),
    )
    np.asarray(cents[0, 0])
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    index4 = ivf_build.build_ivf_device(db_dev, None, cents,
                                        precision="int4")
    np.asarray(index4.bucket_rows[0, 0])  # build barrier
    pack_s = time.perf_counter() - t0

    # Ground truth: exact flat u8 scan at the same N (also the flat-scan
    # latency at 10M for the crossover picture).  Warm the compile first
    # so flat_scan_ms is a run, not a 14s tunnel compile (measured r5).
    u8_index = ivf_build.flat_semantic_index_device(db_dev,
                                                    block_rows=2**17)
    _, exp_i = cosine_scan_topk(q_dev, u8_index, k=k, block_rows=2**17)
    exp_i.block_until_ready()
    t0 = time.perf_counter()
    _, exp_i = cosine_scan_topk(q_dev, u8_index, k=k, block_rows=2**17)
    exp_i = np.asarray(exp_i)
    flat_batch_s = time.perf_counter() - t0

    nprobe_eff = (
        int(nprobe) if nprobe else ivf_ops.default_nprobe(n_clusters)
    )
    _, got_i = ivf_build.scan_with_u8_rerank_device(
        lambda c, md: ivf_ops.ivf_scan_topk(
            q_u8, index4, k=c, nprobe=nprobe_eff, max_distance=md
        ),
        q_dev, db_dev, k=k, max_distance=1e3,
    )
    got_i = np.asarray(got_i)
    r10 = recall_at(got_i, exp_i, 10)
    r100 = float(np.mean(
        [len(set(got_i[i]) & set(exp_i[i][exp_i[i] >= 0]))
         / max(1, int((exp_i[i] >= 0).sum())) for i in range(q)]
    ))
    # No-rerank quality beside the no-rerank latency (VERDICT r4 #6).
    _, raw_i = ivf_ops.ivf_scan_topk(q_u8, index4, k=k, nprobe=nprobe_eff)
    r10_raw = recall_at(np.asarray(raw_i), exp_i, 10)

    def one(qi, ivf):
        dist, idx = ivf_ops.ivf_scan_topk(qi, ivf, k=k, nprobe=nprobe_eff)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0]).astype(jnp.float32)

    q1 = jnp.asarray(
        rng.integers(0, 256, size=(iters, 1, d), dtype=np.uint8)
    )
    dt1, _ = _device_loop(one, q1, iters, index4)
    # Batched serving throughput at capacity scale (the coalesced
    # serving path's shape).
    q16 = jnp.asarray(
        rng.integers(0, 256, size=(iters, 16, d), dtype=np.uint8)
    )
    dt16, _ = _device_loop(one, q16, iters, index4)

    # Flat exact single-query latency at the same N (crossover anchor).
    def one_flat(qi, index):
        dist, idx = cosine_scan_topk(qi, index, k=k, block_rows=2**17)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 0])

    dt1_flat, _ = _device_loop(one_flat, q1, iters, u8_index)

    cap = index4.bucket_cap
    return {
        "n": n, "d": d, "precision": "int4",
        "n_clusters": int(n_clusters), "nprobe": nprobe_eff,
        "nprobe_policy": "explicit" if nprobe else "auto (2% of clusters)",
        "bucket_cap": int(cap),
        "rows_probed_frac": nprobe_eff * cap / float(n),
        "spill_rows": int(len(ivf_ops.live_spill_ids(index4))),
        "ivf_q1_ms_no_rerank": dt1 * 1e3,
        "ivf_q16_ms_per_batch_no_rerank": dt16 * 1e3,
        "ivf_qps_q16_no_rerank": 16.0 / dt16,
        "recall_at_10_no_rerank": r10_raw,
        "flat_exact_q1_ms": dt1_flat * 1e3,
        "speedup_q1_vs_flat": dt1_flat / dt1,
        "recall_at_10_vs_exact_reranked": r10,
        "recall_at_100_vs_exact_reranked": r100,
        "train_s": train_s, "pack_s": pack_s, "datagen_s": gen_s,
        "flat_scan_ms_per_q_batch": flat_batch_s * 1e3,
        "index_bytes": _index_nbytes(index4),
        "build": "device (ops/ivf_build.py; corpus, k-means, pack, "
                 "ground truth and rerank never leave HBM)",
    }


def bench_ivf_crossover(d=128, k=100, nprobe=None, iters=20,
                        sizes=(65_536, 262_144, 1_048_576), rng=None):
    """Measured flat-vs-IVF single-query crossover: at which N does the
    IVF probe (approximately constant-latency) beat the O(N) exact flat
    scan?  Reports per-N latencies and the interpolated crossover.
    Recall at the probe settings is reported per point (VERDICT r4 #6:
    no latency without its recall)."""
    import jax.numpy as jnp

    from pixelbox_tpu.ops import ivf as ivf_ops
    from pixelbox_tpu.ops import ivf_build
    from pixelbox_tpu.ops.scan import cosine_scan_topk

    rng = rng or np.random.default_rng(37)
    points = {}
    crossover = None
    prev = None
    for n in sizes:
        db_dev, q_dev = ivf_build.device_clustered_corpus(
            37 + n, n, d, 16
        )
        cents = ivf_build.kmeans_device(
            db_dev, ivf_ops.default_n_clusters(n), iters=6, seed=0,
            train_sample=min(n, 2_000_000),
        )
        index = ivf_build.build_ivf_device(db_dev, None, cents)
        flat = ivf_build.flat_semantic_index_device(db_dev,
                                                    block_rows=2**15)
        nprobe_eff = (
            int(nprobe) if nprobe
            else ivf_ops.default_nprobe(index.n_clusters)
        )

        _, exp_i = cosine_scan_topk(q_dev, flat, k=10, block_rows=2**15)
        _, got_i = ivf_ops.ivf_scan_topk(
            np.asarray(q_dev), index, k=10, nprobe=nprobe_eff
        )
        r10 = recall_at(np.asarray(got_i), np.asarray(exp_i), 10)

        def one_ivf(qi, ivf):
            dist, idx = ivf_ops.ivf_scan_topk(
                qi, ivf, k=k, nprobe=nprobe_eff
            )
            return (jnp.sum(dist[:, 0])
                    + jnp.sum(idx[:, 0]).astype(jnp.float32))

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
            "nprobe": nprobe_eff,
            "recall_at_10": r10,
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
            "nprobe_policy": "explicit" if nprobe else
            "auto (2% of clusters)"}
