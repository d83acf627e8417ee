#!/usr/bin/env python
"""Lakehouse-surface example: the commit-log table format end to end.

What a user coming from the reference pipeline gets beyond the one-shot
CSV/JSON sinks (main.py:27-30): a versioned, snapshot-isolated table over
plain parquet with the full write surface — create → append (with schema
evolution) → row-level copy-on-write DELETE → MERGE/upsert → time travel →
OPTIMIZE compaction → VACUUM retention GC. Everything here is `operators/tablefmt.py`; the data
files stay ordinary parquet, so any Spark reader (and Catalyst pushdown)
works on a snapshot's file list.

    python examples/lakehouse.py [table_dir]

Defaults to a temp directory and the sf0.001 test corpus so it runs out
of the box and prints each version's state as it goes.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rpa_etl_spark.operators import tablefmt as TF  # noqa: E402
from rpa_etl_spark.session import get_spark  # noqa: E402


def show(spark, path: str, label: str) -> None:
    v = TF.current_version(path)
    df = TF.snapshot_read(spark, path)
    n = df.count()
    print(f"v{v} after {label:9s}: {n:4d} rows, schema {df.schema.simpleString()}")


def main() -> None:
    table = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lakehouse_")
    spark = get_spark("rpa-etl-lakehouse-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )

    # v0 — create
    TF.create_table(docs.where(F.col("doc_id") < 300), table)
    show(spark, table, "create")

    # v1 — append WITH schema evolution (new column `source`)
    TF.append(
        docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
        .withColumn("source", F.lit("batch-2")),
        table,
    )
    show(spark, table, "append")

    # v2 — copy-on-write DELETE (only files containing matches rewrite)
    TF.delete_where(spark, table, "n_chars < 50")
    show(spark, table, "delete")

    # v3 — MERGE/upsert: re-grade 50 docs' lang, insert 5 synthetic ones
    updates = (
        TF.snapshot_read(spark, table)
        .where(F.col("doc_id") % 7 == 0)
        .withColumn("lang", F.lit("und"))
    )
    inserts = spark.createDataFrame(
        [(10_000 + i, "new", 42, "merge-demo") for i in range(5)],
        "doc_id long, lang string, n_chars int, source string",
    ).withColumn("n_chars", F.col("n_chars").cast("long"))
    TF.merge_into(spark, table, updates.unionByName(inserts), on=["doc_id"])
    show(spark, table, "merge")

    # time travel: every retained version is readable by number
    print("history:", [(h["version"], h["kind"]) for h in TF.history(table)])
    print(
        "time travel v0 rows:",
        TF.snapshot_read(spark, table, version=0).count(),
        "| v0 through the v1 schema has columns:",
        TF.snapshot_read(spark, table, version=0, schema_version=1).columns,
    )

    # v4 — OPTIMIZE ... ZORDER BY: compact the COW fragments along the
    # 2-D Morton curve (bounds come from the manifest's per-file stats)
    n_before = len(TF.read_manifest(table, TF.current_version(table))["files"])
    TF.optimize(spark, table, target_bytes=3 * 1024,
                cluster_by=["doc_id", "n_chars"])
    n_after = len(TF.read_manifest(table, TF.current_version(table))["files"])
    print(f"optimize+zorder: {n_before} files -> {n_after}")
    show(spark, table, "optimize")

    # round 12 — merge-on-read DELETE (deletion vectors): positions
    # sidecar, zero data-file rewrites; and RESTORE: undo it with a
    # pure-metadata commit (history stays time-travelable)
    before_files = {e["path"] for e in
                    TF.read_manifest(table, TF.current_version(table))["files"]}
    TF.delete_where(spark, table, "n_chars > 500", mode="dv",
                    dv_rewrite_fraction=1.0)  # pure merge-on-read demo
    after = TF.read_manifest(table, TF.current_version(table))
    print(f"dv delete: rewrote 0 files (added={after['added']}, "
          f"same files: {({e['path'] for e in after['files']}) <= before_files}), "
          f"now {TF.row_count(table)} rows")
    TF.restore(table, TF.current_version(table) - 1)
    print(f"restore: back to {TF.row_count(table)} rows, history kinds:",
          [h["kind"] for h in TF.history(table)][-3:])

    # round 12 — stats-based FILE SKIPPING: a selective predicate opens
    # only the overlapping files (the manifest's min/max prove the rest
    # can't match); the result is still exact
    pred = "doc_id < 15 AND n_chars < 300"
    pruned = TF.snapshot_read(spark, table, where=pred)
    kept, total = TF.pruned_file_counts(table, where=pred)
    print(f"pruned scan '{pred}': opens {kept}/{total} files, "
          f"{pruned.count()} rows")
    print("metadata-only count(*):", TF.row_count(table), "rows, zero jobs")

    # round 12 — CHANGE FEED: every row each commit ADDED, and one-call
    # exactly-once sync into a downstream table (the destination's own
    # txn map is the watermark — re-running is always safe)
    feed = TF.read_changes(spark, table, 0)
    print("change feed rows per version:",
          sorted((r["_commit_version"], r["n"]) for r in
                 feed.groupBy("_commit_version").agg(
                     F.count(F.lit(1)).alias("n")).collect()))
    dst = table + "_mirror"
    print("sync_changes applied", TF.sync_changes(spark, table, dst, "demo"),
          "versions;", "replay applies",
          TF.sync_changes(spark, table, dst, "demo"),
          f"(mirror rows: {TF.row_count(dst)})")

    # round 13 — column-level UPDATE and selective overwrite
    # (replaceWhere): the two write verbs between "append" and "rewrite
    # the table"; both COW at file granularity over the stats-pruned
    # discovery, both change-feed'd (UPDATE emits pre/post images)
    TF.update_where(spark, table, "lang = 'und'",
                    {"lang": "'unknown'", "n_chars": "n_chars + 1"})
    print("update_where: re-graded",
          TF.snapshot_read(spark, table).where("lang = 'unknown'").count(),
          "docs (pre/post images in the change feed)")
    region = TF.snapshot_read(spark, table).where("doc_id < 10") \
        .withColumn("source", F.lit("re-ingest"))
    TF.overwrite(region, table, where="doc_id < 10")
    print("replaceWhere doc_id < 10: region re-ingested atomically,",
          TF.row_count(table), "rows total")

    # round 13 — logical conflict detection: maintenance survives a
    # concurrent (disjoint) append instead of losing the race
    base = TF.current_version(table)
    TF.append(
        spark.createDataFrame([(90_000, "new", 7, "late")],
                              "doc_id long, lang string, n_chars long, "
                              "source string"), table)
    v = TF.delete_where(spark, table, "doc_id BETWEEN 20 AND 29",
                        base_version=base)  # stale base, provably disjoint
    print(f"stale-base delete REBASED onto v{v} (appended row survives:",
          TF.snapshot_read(spark, table).where("doc_id = 90000").count() == 1,
          ")")

    # round 13 — timestamp time travel (Delta's timestampAsOf)
    import time as _time

    print("version_at_time(now):", TF.version_at_time(table, _time.time()))

    # round 13 — Spark-NATIVE reads: no tablefmt import needed by the
    # consumer; Catalyst's pushed filters drive the file skipping
    from rpa_etl_spark.streaming import table_source as TS

    TS.register(spark)
    native = spark.read.format("tablefmt").option("path", table).load()
    print("spark.read.format('tablefmt'):", native.count(), "rows,",
          "filtered:", native.where("doc_id < 10").count())

    # round 14 — SQL text: a snapshot-pinned temp view; plain spark.sql
    TS.register_table(spark, "lake_docs", table)
    print("spark.sql over the view:",
          spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT lang) AS langs "
                    "FROM lake_docs").collect()[0].asDict())

    # round 14 — first-class partition columns: hive-style lang=… layout,
    # whole partitions pruned in O(partitions) before any per-file stats
    ptable = table + "_by_lang"
    TF.create_table(
        TF.snapshot_read(spark, table).repartition("lang"),
        ptable, partition_by=["lang"])
    m = TF.read_manifest(ptable, 0)
    kept, total = TF.pruned_file_counts(ptable, where="lang = 'en'")
    print(f"partitioned table: {len(m['files'])} files in "
          f"{len({e['pv']['lang'] for e in m['files']})} lang partitions; "
          f"lang='en' opens {kept}/{total} files")

    # round 14 — native WRITE against a CHECK constraint: validated in
    # the executor write task, refused before any shard lands
    TF.add_constraint(spark, ptable, "nonneg", "n_chars >= 0")
    spark.createDataFrame([(77_000, "en", 10, "native")],
                          "doc_id long, lang string, n_chars long, "
                          "source string") \
        .write.format("tablefmt").option("path", ptable) \
        .mode("append").save()
    try:
        spark.createDataFrame([(77_001, "en", -1, "bad")],
                              "doc_id long, lang string, n_chars long, "
                              "source string") \
            .write.format("tablefmt").option("path", ptable) \
            .mode("append").save()
    except Exception:
        print("native write: valid row appended; violating row refused "
              f"in the write task ({TF.row_count(ptable)} rows)")

    # VACUUM: keep the last 2 versions; reclaim files only they reference
    out = TF.vacuum(table, keep_last=2)
    print(
        f"vacuum: dropped versions {out['dropped_versions']}, "
        f"deleted {out['deleted_files']} files, {out['deleted_dirs']} dirs"
    )
    show(spark, table, "vacuum")
    print(f"table at {table}")


if __name__ == "__main__":
    main()
