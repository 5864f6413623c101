"""Benchmark harness — the five BASELINE.json configs.

Headline (always printed as the final JSON line): batched u8 cosine-scan
throughput over a 1M×128 index — the hot path the reference bottlenecks
on (SQLite per-row UDF scan, reference src/engine.rs:375-383).

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = measured dot-products/s ÷ the 1e9/s north star (BASELINE.md);
>1.0 beats the target.

Default run: the scan rows (cosine auto/exact/fast, hamming, int4,
recall parity) plus the IVF rows — including the >=10M capacity run and
the flat-vs-IVF crossover, which run FIRST after the headline.
``--full`` adds the end-to-end rows (EfficientNet embedding, drag-drop
@1M, ingest, serve, BLIP text→image, train step).

This file is a thin facade over the ``benchmarks/`` package (rows,
scheduling, reporting — see benchmarks/__init__.py for the layout); the
``bench.bench_*`` names below are the stable surface the contract tests
pin (tests/test_bench_contract.py).  Timing methodology: see
benchmarks/util.device_loop — iterations run back-to-back ON DEVICE in
one jitted lax.scan; the measured null-body floor is reported as
``null_floor_ms_per_iter`` and nothing is subtracted.
"""

from benchmarks.util import (  # noqa: F401
    NORTH_STAR_DOTS_PER_SEC,
    NORTH_STAR_INGEST_PER_SEC,
    _device_loop,
    build_semantic_index,
    build_semantic_index_from_rows,
    clustered_u8,
    structured_embeddings,
    structured_embeddings_device,
)
from benchmarks.rows_scan import (  # noqa: F401
    bench_auto_scan,
    bench_cosine_scan,
    bench_fast_scan,
    bench_hamming,
    bench_int4_recall_vs_u8,
    bench_int4_scan,
    bench_recall_parity,
)
from benchmarks.rows_ivf import (  # noqa: F401
    bench_ivf_capacity,
    bench_ivf_crossover,
    bench_ivf_scan,
)
from benchmarks.rows_e2e import (  # noqa: F401
    bench_blip_text,
    bench_e2e_dragdrop,
    bench_embedding,
    bench_ingest,
    bench_ingest_scaling,
    bench_serve_e2e,
    bench_train_step,
)
from benchmarks.runner import _probe_platform, main  # noqa: F401

if __name__ == "__main__":
    main()
