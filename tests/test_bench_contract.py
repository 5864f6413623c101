"""bench.py contract: importable, and the driver-facing JSON shape holds.

Runs the real bench functions at miniature sizes on CPU (the driver runs
full sizes on TPU) and checks the output schema the driver records.
"""

import numpy as np


def test_bench_cosine_scan_miniature(rng):
    import bench

    res = bench.bench_cosine_scan(n=2048, d=32, q=8, k=10, iters=2,
                                  block_rows=1024, rng=rng)
    assert res["dots_per_sec"] > 0
    assert res["n"] == 2048


def test_bench_auto_scan_miniature(rng):
    import bench

    res = bench.bench_auto_scan(n=2048, d=32, q=8, k=10, iters=2,
                                block_rows=1024, rng=rng)
    assert res["dots_per_sec_exact_guaranteed"] > 0
    assert 0.0 <= res["proof_rate_per_query"] <= 1.0


def test_bench_int4_miniature(rng):
    import bench

    res = bench.bench_int4_scan(n=2048, d=32, q=4, k=5, iters=2, rng=rng)
    assert res["dots_per_sec"] > 0
    assert res["index_bytes_per_row"] == 16


def test_bench_recall_parity_miniature(rng):
    import bench

    res = bench.bench_recall_parity(n=512, d=32, q=4, k=5, rng=rng)
    assert res["recall_at_10_vs_oracle"] == 1.0


def test_bench_hamming_miniature(rng):
    import bench

    res = bench.bench_hamming(n=1024, h=32, q=8, k=10, iters=2,
                              block_rows=512, rng=rng)
    assert res["hashes_per_sec_xor_exact"] > 0
    assert res["hashes_per_sec_gemm_fast"] > 0


def test_headline_json_schema():
    """The driver parses exactly these top-level fields."""
    import bench

    # Mirror main()'s output construction without running full sizes.
    out = {
        "metric": "u8_cosine_scan_exact_dot_products_per_sec_1Mx128",
        "value": 1.0,
        "unit": "dot-products/s/chip",
        "vs_baseline": 1.0 / bench.NORTH_STAR_DOTS_PER_SEC * 1e9,
        "detail": {},
    }
    assert set(out) == {"metric", "value", "unit", "vs_baseline", "detail"}


def test_probe_platform_empty_stdout_falls_back(monkeypatch):
    """An rc==0 probe that prints nothing must fall back to CPU, not
    crash with IndexError before the headline JSON is emitted."""
    import subprocess
    import bench

    class R:
        returncode = 0
        stdout = ""
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **kw: R())
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    info = bench._probe_platform()
    assert info["platform"] == "cpu"
    assert "fallback_reason" in info


def test_bench_ivf_miniature(rng):
    import bench

    res = bench.bench_ivf_scan(n=3000, d=32, q=8, k=10, nprobe=4,
                               iters=2, rng=rng)
    assert res["ivf_q1_ms"] > 0
    assert 0.0 <= res["recall_at_10_vs_exact"] <= 1.0
    assert res["n_clusters"] >= 4
    assert res["rows_probed_frac"] <= 1.0
    # int4 bucket variant: half-ish the bytes, rerank keeps recall.
    assert res["int4_index_bytes"] < res["index_bytes"]
    assert 0.0 <= res["int4_recall_at_10_vs_exact_reranked"] <= 1.0
    assert res["int4_ivf_q1_ms_no_rerank"] > 0


def test_bench_fast_scan_miniature(rng):
    import bench

    res = bench.bench_fast_scan(n=2048, d=32, q=8, k=10, iters=2,
                                block_rows=1024, rng=rng)
    assert res["dots_per_sec"] > 0


def test_bench_int4_recall_miniature(rng):
    import bench

    res = bench.bench_int4_recall_vs_u8(n=2000, d=32, q=8, rng=rng)
    vals = [v for k, v in res.items() if k.startswith("recall_at")]
    assert vals and all(0.0 <= v <= 1.0 for v in vals)


def test_bench_embedding_miniature(rng):
    import bench

    res = bench.bench_embedding(batch=2, iters=2, size=32, dim=8, rng=rng)
    assert res["images_per_sec"] > 0


def test_bench_e2e_dragdrop_miniature(rng):
    import bench

    res = bench.bench_e2e_dragdrop(n=2048, d=8, iters=2, rng=rng)
    vals = [v for v in res.values() if isinstance(v, (int, float))]
    assert any(v > 0 for v in vals)


def test_bench_ingest_miniature(rng):
    import bench

    res = bench.bench_ingest(n_images=6, workers=2, rng=rng)
    assert res["images_per_sec"] > 0


def test_bench_serve_e2e_miniature(rng):
    import bench

    res = bench.bench_serve_e2e(n_images=6, clients=2, reqs_per_client=2,
                                rng=rng)
    vals = [v for v in res.values() if isinstance(v, (int, float))]
    assert any(v > 0 for v in vals)


def test_bench_ivf_capacity_tiny(rng, monkeypatch):
    """The headline capacity row stays runnable at toy scale: every key
    the summary/table reads must exist, with a recall beside every
    latency (VERDICT r4 #6)."""
    import bench

    monkeypatch.setenv("PIXELBOX_BENCH_CAPACITY_N", "4000")
    res = bench.bench_ivf_capacity(d=32, q=8, iters=2, rng=rng)
    for key in (
        "ivf_q1_ms_no_rerank", "recall_at_10_no_rerank",
        "ivf_q16_ms_per_batch_no_rerank", "ivf_qps_q16_no_rerank",
        "flat_exact_q1_ms", "speedup_q1_vs_flat",
        "recall_at_10_vs_exact_reranked",
        "recall_at_100_vs_exact_reranked",
        "train_s", "pack_s", "datagen_s", "index_bytes",
        "nprobe", "rows_probed_frac",
    ):
        assert key in res, key
    assert res["n"] == 4000 and res["precision"] == "int4"
    assert 0.0 <= res["recall_at_10_vs_exact_reranked"] <= 1.0


def test_bench_ivf_crossover_tiny(rng):
    import bench

    res = bench.bench_ivf_crossover(d=32, iters=2, sizes=(1024, 4096),
                                    rng=rng)
    assert set(res["points"]) == {"1024", "4096"}
    for p in res["points"].values():
        assert {"ivf_q1_ms", "flat_q1_ms", "nprobe", "recall_at_10"} <= \
            set(p)
