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
