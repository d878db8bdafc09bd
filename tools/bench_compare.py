"""Mechanized bench-vs-baseline gate: the >2x-cell check as code.

Compares a bench run's per-query cells against the recorded baseline
(BENCH.json), applying the documented measurement-methodology corrections
from BENCH_CORRECTIONS.json (each correction keeps the original recorded
cell for auditability and carries the forensic reason + a BASELINE.md
pointer). Prints one JSON line and exits non-zero iff any common cell
exceeds the 2x gate after corrections — so the gate verdict is a command,
not prose adjudication (round-9 task; the q_agg_stats cell was re-flagged
every round until its correction row existed somewhere the math reads).

From-store boards (``mode: "from_store"`` in the summary, produced by
``bench.py --from-store``) are gated against their OWN baseline —
BENCH_STORE_BASELINE.json, adopted from the first calm from-store board
(round 13) per the standing calm-boards-only precedent — because served
cells structurally skip the index builds the cold baseline charges, so
gating them against BENCH.json would hide serve-path regressions behind
the build-time headroom. Methodology corrections apply to the cold
baseline only (both standing rows concern cold-path build charging).

Usage:
    python tools/bench_compare.py [current.json]   # default BENCH_FULL.json
    python tools/bench_compare.py BENCH_STORE.json # auto-routes to the
                                                   # from-store baseline
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = 2.0


def corrected_baseline(
    baseline: dict[str, float], corrections: dict[str, dict]
) -> dict[str, float]:
    """Baseline cells with methodology corrections applied. A correction
    is honored only if its ``recorded`` value matches the live baseline
    cell — a corrections row that drifted from the file it corrects is an
    error, not a silent override."""
    out = dict(baseline)
    for name, c in corrections.items():
        if name not in out:
            # A correction naming a query absent from the baseline is the
            # rename/removal drift this guard exists for — error, never a
            # silent skip.
            raise SystemExit(
                f"correction for {name} has no baseline cell — the query was "
                f"renamed or removed; fix BENCH_CORRECTIONS.json"
            )
        if abs(out[name] - c["recorded"]) > 1e-9:
            raise SystemExit(
                f"correction for {name} records {c['recorded']} but baseline "
                f"cell is {out[name]} — fix BENCH_CORRECTIONS.json"
            )
        out[name] = c["corrected"]
    return out


def compare(
    current: dict, baseline: dict, corrections: dict, baseline_kind: str = "cold"
) -> dict:
    base = corrected_baseline(baseline.get("queries", {}), corrections)
    cur = current.get("queries", {})
    common = sorted(set(base) & {k for k, v in cur.items() if v is not None})
    # A non-positive baseline cell with real current cost is an INFINITE
    # ratio, not a skip — silently dropping it would be the exact class
    # of omission the isolate null-recording change was written against.
    def over_gate(n: str) -> bool:
        if base[n] > 0:
            return cur[n] / base[n] > GATE
        return cur[n] > 0.05  # any non-noise cost over a zero cell

    cells_over = {
        n: {
            "baseline": base[n],
            "current": cur[n],
            "ratio": round(cur[n] / base[n], 2) if base[n] > 0 else None,
        }
        for n in common
        if over_gate(n)
    }
    # Second gated metric for CPU-metered cells (VERDICT r13 task 7):
    # wall baselines for pool-latency-dominated cells carry documented
    # headroom (the probe's re-adopted 5.906 s), so a genuine 2x plan
    # regression could hide under the wall gate. Executor CPU is
    # pool-independent — gate it separately wherever BOTH boards carry
    # a cpu row. Missing on either side = not gated (best-effort meter).
    base_cpu = baseline.get("queries_cpu", {})
    cur_cpu = current.get("queries_cpu", {})
    for n in sorted(set(base_cpu) & set(cur_cpu)):
        if base_cpu[n] > 0 and cur_cpu[n] / base_cpu[n] > GATE:
            cells_over[f"{n} [cpu]"] = {
                "baseline": base_cpu[n],
                "current": cur_cpu[n],
                "ratio": round(cur_cpu[n] / base_cpu[n], 2),
            }
    tot_base = sum(base[n] for n in common)
    tot_cur = sum(cur[n] for n in common)
    return {
        "metric": "bench_gate_vs_baseline",
        "baseline_kind": baseline_kind,
        "gate": GATE,
        "n_common": len(common),
        "n_cpu_gated": len(set(base_cpu) & set(cur_cpu)),
        "total_baseline_sec": round(tot_base, 3),
        "total_current_sec": round(tot_cur, 3),
        "total_ratio": round(tot_cur / tot_base, 3) if tot_base else None,
        "corrections_applied": sorted(set(corrections) & set(base)),
        "cells_over_gate": cells_over,
    }


def main() -> None:
    cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_FULL.json")
    current = json.load(open(cur_path))
    if "queries" not in current and isinstance(current.get("parsed"), dict):
        # A driver-recorded BENCH_rN.json: the bench summary lives under
        # "parsed" (and is the COMPACT form — slowest cells only; pass
        # BENCH_FULL.json for full-board cells).
        current = current["parsed"]
    if current.get("mode") != "from_store" and current.get("sf") == 1:
        # sf1 full-board mode (VERDICT r14 task 6): gated against the
        # adopted sf1 baseline board — the 2x gate now runs at BOTH
        # scales, so a regression that only bites at 10x data (a skewed
        # shuffle, a probe-width blowup) is caught mechanically too.
        sf1_base = os.path.join(REPO, "BENCH_SF1_BASELINE.json")
        if not os.path.exists(sf1_base):
            raise SystemExit(
                "sf1 board but no BENCH_SF1_BASELINE.json — adopt the "
                "first calm sf1 board as the baseline first"
            )
        baseline = json.load(open(sf1_base))
        corrections = {}  # corrections are sf0.1 cold-path methodology rows
        kind = "sf1"
    elif current.get("mode") == "from_store":
        if current.get("sf") == 1:
            # no sf1 from-store baseline exists; silently gating a 10x
            # board against the sf0.1 store baseline would flag nearly
            # every cell as a spurious cross-scale failure (r15
            # self-review) — fail with the actual reason instead
            raise SystemExit(
                "sf1 from-store board but no sf1 store baseline is "
                "recorded — adopt one (BENCH_SF1_STORE_BASELINE.json + "
                "a compare branch) before gating this mode/scale"
            )
        store_base = os.path.join(REPO, "BENCH_STORE_BASELINE.json")
        if not os.path.exists(store_base):
            raise SystemExit(
                "from-store board but no BENCH_STORE_BASELINE.json — adopt "
                "the first calm from-store board as the baseline first"
            )
        baseline = json.load(open(store_base))
        corrections: dict = {}  # corrections are cold-path methodology rows
        kind = "from_store"
    else:
        baseline = json.load(open(os.path.join(REPO, "BENCH.json")))
        corr_path = os.path.join(REPO, "BENCH_CORRECTIONS.json")
        corrections = json.load(open(corr_path)) if os.path.exists(corr_path) else {}
        kind = "cold"
    result = compare(current, baseline, corrections, baseline_kind=kind)
    print(json.dumps(result, indent=1))
    sys.exit(1 if result["cells_over_gate"] else 0)


if __name__ == "__main__":
    main()
