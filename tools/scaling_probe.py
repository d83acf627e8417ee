#!/usr/bin/env python
"""Measured scaling curve (round 6, SCALE.md §7 evidence).

Derives a 5x dataset from sf0.1 by deterministic replication (key-shifted
copies, FK-consistent: o_custkey/c_custkey and l_orderkey/o_orderkey shift
together; dimension tables stay single-copy), then times the
shuffle-heaviest declared queries at both scales into the noop sink
(steady-state best-of-2, same protocol as bench.py) and prints the
time ratio next to the 5.0x data ratio.

Usage: python tools/scaling_probe.py [--regen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpa_etl_spark import registry  # noqa: E402
from rpa_etl_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 5
SHIFT = 100_000_000
DERIVED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse",
    f"scale_{COPIES}x",
)

# key columns shifted per replicated fact table (FK partners shift together)
REPLICATED: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "events": ["event_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["nation", "region", "part", "supplier"]

# shuffle-heaviest families: multi-join TPC-H shapes, skew join, NDV
# Expand, banded dedups, gram/token corpus aggregations, plus (round 7)
# the two iterative training jobs — the IVF trainer after its broadcast
# hint removal (the cell join now shuffles; this measures that choice at
# 5x) and the distributed BPE trainer (cost should be dominated by
# per-round job overhead, i.e. nearly size-flat at these scales)
PROBE_QUERIES = [
    "q_tpch_q5_shape",
    "q_tpch_q10_shape",
    "q_tpch_q21_shape",
    "q_join_skew_salted",
    "q_profile_stats",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_ngram_novelty",
    "q_unigram_logprob",
    "q_bm25",
    "q_ann_ivf_trained",
    "q_bpe_train_distributed",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DERIVED, exist_ok=True)
    for name, keys in REPLICATED.items():
        src = spark.read.parquet(f"{BASE}/{name}.parquet")
        parts = []
        for k in range(COPIES):
            d = src
            for col in keys:
                d = d.withColumn(col, F.col(col) + F.lit(k * SHIFT))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DERIVED}/{name}.parquet")
        print(f"  replicated {name}: {src.count()} -> {out.count()} rows")
    for name in DIMS:
        spark.read.parquet(f"{BASE}/{name}.parquet").write.mode("overwrite").parquet(
            f"{DERIVED}/{name}.parquet"
        )
        print(f"  copied dim {name}")


def run_query(spark, qname: str, sf_dir: str) -> float:
    fn = registry.QUERIES[qname]
    best = None
    for _ in range(2):  # steady-state best-of-2 (bench.py protocol)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    registry.load_all_plans()
    spark = get_spark("rpa-etl-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--regen" in sys.argv or not os.path.exists(f"{DERIVED}/lineitem.parquet"):
        print(f"generating {COPIES}x dataset under {DERIVED}")
        generate(spark)

    results = {}
    for q in PROBE_QUERIES:
        run_query(spark, q, BASE)  # warm-up pass at base scale
        t1 = run_query(spark, q, BASE)
        run_query(spark, q, DERIVED)
        t5 = run_query(spark, q, DERIVED)
        results[q] = (t1, t5, t5 / t1 if t1 > 0 else float("nan"))
        print(f"{q:24s}  sf0.1 {t1:6.2f}s   {COPIES}x {t5:6.2f}s   ratio {t5/t1:5.2f}")

    ratios = sorted(r for _, _, r in results.values())
    med = ratios[len(ratios) // 2]
    print(
        json.dumps(
            {
                "data_ratio": float(COPIES),
                "median_time_ratio": round(med, 2),
                "queries": {q: [round(a, 2), round(b, 2), round(r, 2)] for q, (a, b, r) in results.items()},
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
