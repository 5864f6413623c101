"""scripts/gen_perf_table.py: the at-a-glance table regenerates from
BENCH_DETAIL.json between markers (VERDICT r4 #3 — front-page numbers
must not be able to drift from the measured artifact)."""

import importlib.util
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "gen_perf_table", os.path.join(_REPO, "scripts", "gen_perf_table.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_render_from_detail():
    mod = _load()
    detail = {
        "platform": {"platform": "tpu"},
        "measurement_floor": {"null_floor_ms_per_iter": 0.53},
        "cosine_scan_auto_1Mx128": {
            "dots_per_sec_exact_guaranteed": 6.07e10,
            "scan_ms_per_batch_main": 4.16,
            "proof_rate_per_query": 1.0, "proof_trials": 25600,
            "batch_q": 256, "n": 1_000_000, "d": 128,
        },
        "ivf_capacity_10Mx128": {
            "n": 10_000_000, "index_bytes": 1_299_082_240,
            "ivf_q1_ms_no_rerank": 3.82, "flat_exact_q1_ms": 11.9,
            "speedup_q1_vs_flat": 3.12,
            "recall_at_10_vs_exact_reranked": 1.0,
            "recall_at_100_vs_exact_reranked": 0.9875,
            "train_s": 7.0, "pack_s": 6.4, "datagen_s": 40.0,
        },
        "ivf_crossover": {
            "points": {"65536": {"ivf_q1_ms": 1.62, "flat_q1_ms": 1.63,
                                 "recall_at_10": 1.0}},
            "crossover_n": 65536,
        },
        "ivf_scan": {"skipped": "x"},  # skipped rows must be ignored
    }
    out = mod.render(detail)
    assert mod.BEGIN in out and mod.END in out
    assert "60.7 G" in out
    assert "**3.1×**" in out and "recall@10 reranked **1**" in out
    assert "N ≈ 65,536" in out
    assert "skipped" not in out


def test_rewrites_between_markers(tmp_path):
    mod = _load()
    detail = {"platform": {"platform": "cpu"}}
    dpath = tmp_path / "d.json"
    dpath.write_text(json.dumps(detail))
    perf = tmp_path / "PERF.md"
    perf.write_text(
        f"# head\n\n{mod.BEGIN}\nOLD CONTENT\n{mod.END}\n\ntail stays\n"
    )
    mod.main(str(dpath), str(perf))
    text = perf.read_text()
    assert "OLD CONTENT" not in text
    assert "tail stays" in text
    assert text.count(mod.BEGIN) == 1 and text.count(mod.END) == 1
    # Idempotent: a second run keeps exactly one block.
    mod.main(str(dpath), str(perf))
    assert perf.read_text().count(mod.BEGIN) == 1


def test_runner_estimates_prefer_measured_priors(tmp_path, monkeypatch):
    from benchmarks import runner

    assert runner._estimate_s("ivf_capacity", {}) == 420  # first-run fallback
    priors = {"ivf_capacity_10Mx128": 300.0, "ivf_capacity": 300.0}
    assert runner._estimate_s("ivf_capacity", priors) == 300.0 * 1.4
    # Shape-suffixed keys match their base row name.
    assert runner._estimate_s("hamming_scan",
                              {"hamming_scan_1Mx32": 50.0}) == 70.0
