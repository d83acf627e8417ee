#!/usr/bin/env python
"""Per-query bench delta gate (round-11 verdict #3).

Round 11's +35% total drift was adjudicated as machine noise + added
work, but nothing in the repo RECORDED the noise band — this tool does.
It diffs two bench records (the BENCH_LOCAL.json format bench.py writes:
``{"queries": {name: min_sec}, "value": total, ...}``) and FAILS on any
query that got more than ``--threshold`` (default 1.5×) slower, unless
the mover is explained:

- ``--allow name[,name...]``: queries whose WORKLOAD changed this round
  (more commits in a lifecycle, a new stage) — each must be listed with
  a reason in the commit that changes it;
- queries faster than ``--floor`` seconds (default 0.5 s) in BOTH runs
  are reported but never fail: sub-second timings at sf0.1 sit inside
  the measured scheduler-noise band (SCALE.md §10d — an UNCHANGED plan
  moved 3.73× vs 2.20× run-to-run at this size).

New/removed queries are reported informationally. The full report is
written to ``tools/bench_delta_last.json`` and a summary printed; exit
code 1 iff an unexplained regression above threshold+floor exists.

Usage:
    python tools/bench_delta.py OLD.json NEW.json \
        [--threshold 1.5] [--floor 0.5] [--allow q_a,q_b]
"""

from __future__ import annotations

import argparse
import json
import os

# Measured per-query cost floors at sf0.1 on this box (round 14 probes):
# a bare Spark job round-trip is ~86 ms and every query pays at least one;
# a DSv2-Python save costs ~0.9 s of framework round-trips (NOOP Python
# DataSource control). The floor-adjusted column subtracts the job floor
# so optimization targets are ranked by REAL headroom, not raw seconds —
# a 0.9 s query that is 0.8 s floor has less to win than a 1.2 s query
# that is one 86 ms job plus 1.1 s of compute (round-14 verdict #8).
JOB_FLOOR_SEC = 0.086
DSV2_SAVE_FLOOR_SEC = 0.9
DSV2_SAVE_QUERIES = {"q_table_native_write": 3}  # saves per query


def _floor_adjusted(name: str, sec: float) -> float:
    base = JOB_FLOOR_SEC + DSV2_SAVE_FLOOR_SEC * DSV2_SAVE_QUERIES.get(name, 0)
    return round(max(0.0, sec - base), 3)


def compare(old: dict, new: dict, threshold: float, floor: float,
            allow: set[str]) -> dict:
    oq, nq = old.get("queries", {}), new.get("queries", {})
    report: dict = {
        "old_total": old.get("value"),
        "new_total": new.get("value"),
        "total_ratio": (
            round(new["value"] / old["value"], 3)
            if old.get("value") and new.get("value") else None
        ),
        "threshold": threshold,
        "floor_sec": floor,
        "allowed": sorted(allow),
        "regressions": [],       # unexplained, above threshold+floor: FAIL
        "allowed_movers": [],    # above threshold but workload-explained
        "noise_floor_movers": [],  # above threshold but both runs < floor
        "improvements": [],      # >threshold faster (informational)
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
    }
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        rec = {"query": name, "old_sec": a, "new_sec": b,
               "ratio": round(ratio, 3),
               "new_floor_adjusted_sec": _floor_adjusted(name, b)}
        if ratio > threshold:
            if name in allow:
                report["allowed_movers"].append(rec)
            elif max(a, b) < floor:
                report["noise_floor_movers"].append(rec)
            else:
                report["regressions"].append(rec)
        elif ratio < 1.0 / threshold:
            report["improvements"].append(rec)
    report["regressions"].sort(key=lambda r: -r["ratio"])
    # headroom ranking: where the remaining optimization budget actually
    # is, with the measured per-query floors subtracted
    report["top_headroom"] = sorted(
        (
            {
                "query": n,
                "new_sec": nq[n],
                "floor_adjusted_sec": _floor_adjusted(n, nq[n]),
            }
            for n in nq
            if isinstance(nq[n], (int, float)) and nq[n] > 0
        ),
        key=lambda r: -r["floor_adjusted_sec"],
    )[:15]
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5)
    ap.add_argument("--allow", default="",
                    help="comma-separated workload-changed queries")
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    allow = {n for n in args.allow.split(",") if n}
    report = compare(old, new, args.threshold, args.floor, allow)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_delta_last.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"total: {report['old_total']} -> {report['new_total']} "
          f"(x{report['total_ratio']})")
    for key in ("regressions", "allowed_movers", "noise_floor_movers",
                "improvements"):
        for r in report[key]:
            print(f"  [{key[:-1]}] {r['query']}: {r['old_sec']} -> "
                  f"{r['new_sec']} (x{r['ratio']})")
    if report["added"]:
        print(f"  added: {', '.join(report['added'])}")
    if report["removed"]:
        print(f"  removed: {', '.join(report['removed'])}")
    if report["regressions"]:
        print(f"FAIL: {len(report['regressions'])} unexplained >x"
              f"{args.threshold} regression(s); report at {out}")
        return 1
    print(f"OK; report at {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
