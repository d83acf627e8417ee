#!/usr/bin/env python
"""Measure the round-12 table-format additions at 10x (SCALE.md §10g).

Two claims to price on the sf0.1 → sf1 REAL-distribution pair:

1. FILE SKIPPING: a selective predicate over a range-clustered table
   should open a constant FRACTION of files (the overlapping ones), so
   the pruned scan's cost tracks the selected volume, not table size.
   Measured: files opened vs snapshot total, and warm wall time of the
   pruned read vs the same predicate over the full file list.

2. CHANGE FEED: read_changes(v, v) reads only commit v's new files, so
   consuming one appended micro-batch costs the batch, not the table.
   Measured: warm wall time of a one-version feed read vs a full
   snapshot scan of the same table.

3. DELETION VECTORS vs COW: a selective delete in dv mode writes
   positions (delete-sized), a COW delete rewrites the affected files
   (file-sized). Measured: wall time of the same ~2% delete both ways,
   plus the dv-read tax (snapshot scan before vs after the vector).

Usage: python tools/skip_probe.py  (writes JSON to stdout)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PAIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(HERE, "spark-warehouse", "sf1")),
]


def timed(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from rpa_etl_spark.operators import tablefmt as TF
    from rpa_etl_spark.session import get_spark

    spark = get_spark("skip-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for label, sf_dir in PAIRS:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n = docs.count()
        hi = docs.agg(F.max("doc_id")).collect()[0][0]
        pred = f"doc_id >= 0 AND doc_id < {hi // 20}"  # ~5% of id space
        path = tempfile.mkdtemp(prefix="skip_probe_") + "/t"
        try:
            TF.create_table(docs.repartitionByRange(16, "doc_id"), path)
            kept, total = TF.pruned_file_counts(path, 0, pred)
            t_pruned = timed(
                lambda: TF.snapshot_read(spark, path, where=pred)
                .agg(F.count(F.lit(1)), F.sum("n_chars")).collect()
            )
            t_full = timed(
                lambda: TF.snapshot_read(spark, path).where(pred)
                .agg(F.count(F.lit(1)), F.sum("n_chars")).collect()
            )
            # change feed: one appended micro-batch vs a snapshot scan
            TF.append(docs.limit(500).select(docs.columns), path)
            head = TF.current_version(path)
            t_feed = timed(
                lambda: TF.read_changes(spark, path, head, head)
                .agg(F.count(F.lit(1))).collect()
            )
            t_snap = timed(
                lambda: TF.snapshot_read(spark, path)
                .agg(F.count(F.lit(1))).collect()
            )
            out[label] = {
                "rows": n,
                "files_opened": kept,
                "files_total": total,
                "pruned_read_sec": t_pruned,
                "full_filter_sec": t_full,
                "feed_one_version_sec": t_feed,
                "snapshot_scan_sec": t_snap,
            }
            # dv vs cow: the same ~2% delete both ways on twin tables
            del_pred = f"doc_id % 50 = 7"  # noqa: F541
            twins = {}
            for mode in ("dv", "cow"):
                tp = path + "_" + mode
                TF.create_table(docs.repartitionByRange(16, "doc_id"), tp)
                t0 = time.perf_counter()
                TF.delete_where(spark, tp, del_pred, mode=mode)
                twins[mode] = round(time.perf_counter() - t0, 3)
                twins[f"{mode}_read_sec"] = timed(
                    lambda tp=tp: TF.snapshot_read(spark, tp)
                    .agg(F.count(F.lit(1))).collect()
                )
                shutil.rmtree(tp, ignore_errors=True)
            out[label]["delete_dv_sec"] = twins["dv"]
            out[label]["delete_cow_sec"] = twins["cow"]
            out[label]["read_after_dv_sec"] = twins["dv_read_sec"]
            out[label]["read_after_cow_sec"] = twins["cow_read_sec"]

            # round 13: TIMESTAMP pruning (typed stats) — a 1-day window
            # over the 30-day ts-clustered events table (~3% of range)
            events = spark.read.parquet(os.path.join(sf_dir,
                                                     "events.parquet"))
            ep = os.path.dirname(path) + "/ev"
            TF.create_table(events.repartitionByRange(16, "ts"), ep)
            ts_pred = ("ts >= TIMESTAMP '2024-01-10 00:00:00' "
                       "AND ts < TIMESTAMP '2024-01-11 00:00:00'")
            ts_kept, ts_total = TF.pruned_file_counts(ep, 0, ts_pred)
            out[label]["ts_rows"] = events.count()
            out[label]["ts_files_opened"] = ts_kept
            out[label]["ts_files_total"] = ts_total
            out[label]["ts_pruned_read_sec"] = timed(
                lambda: TF.snapshot_read(spark, ep, where=ts_pred)
                .agg(F.count(F.lit(1)), F.sum("user_id")).collect()
            )
            out[label]["ts_full_filter_sec"] = timed(
                lambda: TF.snapshot_read(spark, ep).where(ts_pred)
                .agg(F.count(F.lit(1)), F.sum("user_id")).collect()
            )
        finally:
            shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
