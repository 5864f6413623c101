"""Benchmark rows + runner for the repo-root ``bench.py`` entry point.

Layout (VERDICT r4 ask #8 — the 1,628-line bench.py monolith split):

- ``util.py``   — on-device timing loop, index builders, datagens
- ``rows_scan.py`` — flat-scan rows (cosine auto/exact/fast, hamming,
  int4, recall parity)
- ``rows_ivf.py``  — clustered-ANN rows (1M latency/recall, the >=10M
  capacity run, the flat-vs-IVF crossover) — device-side builds
- ``rows_e2e.py``  — end-to-end rows (embedding, drag-drop, ingest,
  serve, BLIP text, train step)
- ``runner.py``    — scheduling (measurement-derived row estimates from
  the previous BENCH_DETAIL, not hardcoded constants), reporting, and
  the compact driver-facing JSON line (contract unchanged)
"""
