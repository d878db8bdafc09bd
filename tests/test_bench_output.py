"""The bench's LAST stdout line must parse inside the recorder's tail.

The external recorder keeps only the final ~2000 chars of bench stdout;
rounds 4 and 5 both recorded ``"parsed": null`` because the single
full-size JSON line (4-5 KB at 150 queries) was head-truncated inside
that window. compact_summary() is the guarantee that can never happen
again — these tests pin its contract without needing Spark."""

import json

from bench import compact_summary


def _fake_summary(n_queries: int) -> dict:
    return {
        "metric": "total_query_wall_sec",
        "value": 123.456,
        "unit": "sec",
        "queries": {
            f"q_some_quite_long_query_name_{i:04d}": round(0.1 + i * 0.037, 3)
            for i in range(n_queries)
        },
        "sf": 0.1,
    }


def test_compact_line_fits_tail_window():
    for n in (0, 1, 50, 150, 500):
        line = json.dumps(compact_summary(_fake_summary(n)))
        assert len(line) <= 2000, (n, len(line))
        parsed = json.loads(line)  # the actual recorder operation
        assert parsed["value"] == 123.456
        assert parsed["n_queries"] == n


def test_compact_keeps_slowest_queries_and_totals():
    s = _fake_summary(300)
    c = compact_summary(s)
    assert c["metric"] == s["metric"] and c["unit"] == "sec" and c["sf"] == 0.1
    assert c["full"] == "BENCH_FULL.json"
    kept = set(c["queries"])
    assert kept  # some per-query detail always fits at this name length
    # every kept query is >= every dropped query (slowest-first policy)
    dropped_max = max(v for k, v in s["queries"].items() if k not in kept)
    assert min(c["queries"].values()) >= dropped_max


def test_compact_counts_errors():
    s = _fake_summary(3)
    s["errors"] = {"q_broken": "AnalysisException: boom"}
    assert compact_summary(s)["n_errors"] == 1


def test_isolate_rejects_unknown_query_before_spark():
    """bench.py --isolate validates names against the registry and exits 2
    BEFORE creating a SparkSession — a typo'd adjudication run fails in
    seconds, not after a JVM launch + warmup."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "bench.py", "--isolate", "q_no_such_query"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 2
    assert "unknown queries" in out.stderr
    assert "Spark" not in out.stderr.split("unknown queries")[0]


def test_isolate_usage_error():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "bench.py", "--isolate"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert out.returncode == 2 and "usage:" in out.stderr


# ---- bench_compare: the mechanized >2x gate (round 9) ----------------------


def test_bench_compare_applies_corrections():
    """The q_agg_stats class of flag: a corrected baseline cell must stop
    the gate from firing on the honest ratio, while uncorrected cells
    still trip it."""
    import pytest

    from tools.bench_compare import compare, corrected_baseline

    baseline = {"queries": {"q_a": 0.5, "q_b": 1.0}}
    corrections = {
        "q_a": {"recorded": 0.5, "corrected": 1.2, "reason": "pruned-plan cell"}
    }
    current = {"queries": {"q_a": 1.3, "q_b": 2.5}}
    r = compare(current, baseline, corrections)
    # q_a: 1.3 / 1.2 = 1.08 (corrected, under gate); q_b: 2.5x (over).
    assert list(r["cells_over_gate"]) == ["q_b"]
    assert r["corrections_applied"] == ["q_a"]
    # A correction whose `recorded` drifted from the live baseline is an
    # ERROR, never a silent override.
    bad = {"q_a": {"recorded": 0.4, "corrected": 1.2, "reason": "stale"}}
    with pytest.raises(SystemExit):
        corrected_baseline(baseline["queries"], bad)


def test_bench_compare_live_files_apply_agg_stats_correction():
    """The repo's own records through the mechanized gate: the
    BENCH_CORRECTIONS row must match the live BENCH.json cell (the
    drift guard) and must clear q_agg_stats specifically — the cell the
    gate re-flagged every round until this methodology row existed.
    Deliberately NOT asserted: zero over-gate cells overall, because
    BENCH_FULL.json is rewritten by every bench run and the receipted
    burstable-VM throttling can push unrelated cells over 2x
    environmentally (adjudicated via bench.py --isolate, per
    BASELINE.md) — a suite red on weather would recreate the structural
    red test_window_policy just shed."""
    import json as _json
    import os as _os

    from tools.bench_compare import compare

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    current = _json.load(open(_os.path.join(repo, "BENCH_FULL.json")))
    baseline = _json.load(open(_os.path.join(repo, "BENCH.json")))
    corrections = _json.load(open(_os.path.join(repo, "BENCH_CORRECTIONS.json")))
    r = compare(current, baseline, corrections)  # raises on drifted correction
    # Round 10 expanded the baseline to the full r9 calm-box board, so the
    # gate must cover (nearly) every cell, not just the r4-era common 90 —
    # queries newer than the expansion are the only permissible gap.
    assert r["n_common"] >= 170
    assert "q_agg_stats" in r["corrections_applied"]
    assert "q_agg_stats" not in r["cells_over_gate"], r["cells_over_gate"]
    assert "q_sim_ivf_recall" in r["corrections_applied"]
    assert "q_sim_ivf_recall" not in r["cells_over_gate"], r["cells_over_gate"]


def test_compact_summary_preserves_from_store_provenance():
    """A --from-store board's compact tail line must carry its provenance
    markers — without them the recorder's window shows a JSON line
    indistinguishable from a default board."""
    from bench import compact_summary

    s = {
        "metric": "total_query_wall_sec",
        "value": 10.0,
        "unit": "sec",
        "queries": {"q_a": 1.0},
        "sf": 0.1,
        "mode": "from_store",
        "store_build_sec": 20.3,
    }
    c = compact_summary(s)
    assert c["mode"] == "from_store"
    assert c["store_build_sec"] == 20.3
    # and a default board stays unchanged: no spurious keys
    del s["mode"], s["store_build_sec"]
    assert "mode" not in compact_summary(s)


def test_bench_compare_gates_cpu_cells_independently():
    """The second gated metric (r14): a CPU-metered cell whose wall sits
    comfortably under its (headroom-carrying) baseline but whose
    executor CPU regressed past 2x must flag — and a cell missing the
    cpu row on either side must not be cpu-gated at all (best-effort
    meter)."""
    from tools.bench_compare import compare

    baseline = {
        "queries": {"q_a": 6.0, "q_b": 1.0},
        "queries_cpu": {"q_a": 1.0},
    }
    current = {
        "queries": {"q_a": 3.0, "q_b": 1.1},  # wall fine everywhere
        "queries_cpu": {"q_a": 2.5},          # cpu regressed 2.5x
    }
    out = compare(current, baseline, {})
    assert out["n_cpu_gated"] == 1
    assert "q_a [cpu]" in out["cells_over_gate"]
    assert out["cells_over_gate"]["q_a [cpu]"]["ratio"] == 2.5
    assert "q_a" not in out["cells_over_gate"]  # wall itself under gate

    # no cpu row on the current side -> nothing cpu-gated, no crash
    out2 = compare({"queries": {"q_a": 3.0}}, baseline, {})
    assert out2["n_cpu_gated"] == 0
    assert not [k for k in out2["cells_over_gate"] if k.endswith("[cpu]")]

    # baseline_kind threads through (ADVICE r13)
    out3 = compare(current, baseline, {}, baseline_kind="from_store")
    assert out3["baseline_kind"] == "from_store"
