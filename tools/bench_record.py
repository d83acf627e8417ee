#!/usr/bin/env python
"""Record-time bench protocol (round-13 verdict #4): the committed
record must be one the driver can REPRODUCE, not the best of N cherry-
picked runs. This script runs the full bench TWICE back-to-back and

- accepts the record only if the two totals agree within 5% (otherwise
  the box is loaded — exit 1, re-run later);
- keeps the SECOND run's full record in BENCH_LOCAL.json (steady-state,
  no cherry-picking) and stamps BOTH totals into it under
  ``replicate_totals`` so the spread is part of the committed record.

Usage: python tools/bench_record.py  (≈2× bench wall time)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCAL = os.path.join(HERE, "BENCH_LOCAL.json")


def run_once(tag: str) -> dict:
    print(f"[bench-record] run {tag} starting", flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench run {tag} failed rc={out.returncode}")
    with open(LOCAL) as f:
        rec = json.load(f)
    print(f"[bench-record] run {tag}: min {rec['value']}s / "
          f"median {rec['value_median']}s", flush=True)
    return rec


def main() -> None:
    r1 = run_once("A")
    r2 = run_once("B")
    t1, t2 = r1["value"], r2["value"]
    spread = abs(t1 - t2) / min(t1, t2)
    print(f"[bench-record] totals {t1}s / {t2}s, spread {spread:.1%}")
    r2["replicate_totals"] = [t1, t2]
    r2["replicate_medians"] = [r1["value_median"], r2["value_median"]]
    with open(LOCAL, "w") as f:
        json.dump(r2, f, separators=(",", ":"))
    if spread > 0.05:
        print("[bench-record] REJECT: runs disagree by >5% — the box is "
              "loaded; re-run before committing this record")
        raise SystemExit(1)
    print("[bench-record] ACCEPT: BENCH_LOCAL.json is the run-B record "
          "with both totals stamped")


if __name__ == "__main__":
    main()
