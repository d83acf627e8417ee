#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query to plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [only_prefix...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default r15; suffix = before|after).

Plan capture only — no noop execution — so it is cheap; queries whose
*call* performs eager work (table-format lifecycles, trained ANN) still
pay that work once.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from rpa_etl_spark import registry  # noqa: E402
from rpa_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    registry.load_all_plans()
    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    spark = get_spark("rpa-etl-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(HERE, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))
    os.makedirs(outdir, exist_ok=True)
    names = sorted(registry.QUERIES)
    if only:
        names = [n for n in names if any(n.startswith(p) for p in only)]
    for name in names:
        try:
            df = registry.QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
