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
