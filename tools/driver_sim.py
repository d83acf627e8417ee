#!/usr/bin/env python
"""Local replica of the DRIVER's correctness loop.

Differences from tests/test_oracle_parity.py, on purpose:
- builds a VANILLA SparkSession (no rpa_etl_spark.session confs) so any
  correctness dependence on our own session configuration is caught here
  before the driver sees it (the round-1/2 TIMESTAMP_NTZ bug was exactly
  such a dependence);
- runs at sf0.01 (the driver's correctness scale), not the suite's sf0.001;
- iterates queries() in export (priority) order and reports wall time per
  query so we can predict how far the driver's ~50-query budget reaches.

Usage: python tools/driver_sim.py [sf_dir] [first_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod  # noqa: E402

    # driver's t1 smoke: entry() must run and yield rows with a schema
    entry_rows = entry_mod.entry(spark).collect()
    print(f"[t1] entry(): {len(entry_rows)} rows", flush=True)
    assert entry_rows, "entry() returned no rows"

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    from tests.oracle import assert_matches_oracle  # noqa: E402

    results: dict[str, dict] = {}
    t_total = time.perf_counter()
    for i, (name, fn) in enumerate(queries.items()):
        if i >= first_n:
            break
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, oracles[name], sf_dir, name=name)
                verdict = "pass"
            else:
                n = df.count()
                verdict = f"rows_only({n})"
            err = None
        except Exception as e:  # noqa: BLE001
            verdict = "FAIL"
            err = f"{type(e).__name__}: {e}"[:400]
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"verdict": verdict, "sec": dt, "err": err}
        print(f"[{i + 1:3d}] {name:28s} {verdict:14s} {dt:7.2f}s", flush=True)
        if err:
            print(f"      {err}", flush=True)

    total = round(time.perf_counter() - t_total, 1)
    n_fail = sum(1 for r in results.values() if r["verdict"] == "FAIL")
    print(f"\ntotal {total}s over {len(results)} queries; {n_fail} FAIL", flush=True)
    with open(os.path.join(HERE, "tools", "driver_sim_last.json"), "w") as f:
        json.dump({"total_sec": total, "results": results}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
