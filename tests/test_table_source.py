"""Spark-native data sources over the table format
(rpa_etl_spark/streaming/table_source.py): batch snapshot reads with
pushed-filter file skipping, and the change feed as a REAL Structured
Streaming source checkpointed by Spark's own offset log."""

from __future__ import annotations

import os

import pytest

from rpa_etl_spark.operators import tablefmt as TF
from rpa_etl_spark.streaming import table_source as TS


def test_batch_source_matches_snapshot_read(spark, tmp_path):
    """spark.read.format('tablefmt') equals snapshot_read across schema
    evolution, a dv delete, and a rename; option('version') time
    travels."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    TF.create_table(
        spark.range(0, 40).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 2).alias("v")), p
    )
    TF.append(
        spark.range(40, 60).select(
            F.col("id").cast("long").alias("id"),
            (F.col("id") * 2).alias("v"),
            F.lit("x").alias("tag")), p
    )  # widens id, adds tag
    TF.delete_where(spark, p, "id % 7 = 0", mode="dv",
                    dv_rewrite_fraction=1.0)
    TF.rename_column(p, "v", "score")

    TS.register(spark)
    got = spark.read.format("tablefmt").option("path", p).load()
    want = TF.snapshot_read(spark, p)
    assert got.schema.simpleString() == want.schema.simpleString()
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    # time travel by version
    got0 = spark.read.format("tablefmt").option("path", p) \
        .option("version", 0).load()
    assert got0.count() == 40 and got0.columns == ["id", "v"]
    # empty snapshot reads zero rows, not an error
    TF.delete_where(spark, p, "id >= 0")
    assert spark.read.format("tablefmt").option("path", p).load().count() == 0


def test_batch_source_pushed_filters_prune_files(spark, tmp_path):
    """Catalyst's pushed filters drive manifest-level file skipping
    inside the source: a selective predicate plans only the overlapping
    files (partition count), while every filter is re-applied by Spark
    so results stay exact."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    p = str(tmp_path / "t")
    TF.create_table(
        spark.range(0, 800).select("id", (F.col("id") % 9).alias("g"))
        .repartitionByRange(8, "id"), p
    )
    TS.register(spark)
    # planner-level evidence: the reader sees the filters and prunes
    r = TS._SnapshotReader({"path": p})
    unsupported = list(r.pushFilters([
        GreaterThanOrEqual(("id",), 100), LessThan(("id",), 200),
    ]))
    assert len(unsupported) == 2  # all filters re-applied by Spark
    pruned = len(r.partitions())
    r_full = TS._SnapshotReader({"path": p})
    total = len(r_full.partitions())
    assert total == 8 and pruned < total, (pruned, total)
    # end-to-end exactness through the same path
    got = (
        spark.read.format("tablefmt").option("path", p).load()
        .where("id >= 100 AND id < 200").agg(
            F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (100, sum(range(100, 200)))


def test_streaming_source_exactly_once_with_restart(spark, tmp_path):
    """The change feed as a real readStream source: each micro-batch
    serves the new commits' rows; Spark's checkpoint replays exactly
    the unprocessed versions across a stop/restart; merge sidecars
    stream with their change kinds."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink.parquet")
    ckpt = str(tmp_path / "ckpt")
    TF.create_table(spark.range(0, 10).select("id"), src)
    TF.append(spark.range(10, 20).select("id"), src)
    TS.register(spark)

    def run_available():
        q = (
            spark.readStream.format("tablefmt_changes")
            .option("path", src).load()
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_available()
    got = spark.read.parquet(sink)
    assert got.count() == 20
    assert set(got.columns) == {"id", "_commit_version", "_change_kind"}

    # more commits while the stream is DOWN: delete feeds nothing, merge
    # feeds inserts + update images
    TF.delete_where(spark, src, "id % 2 = 0")
    TF.merge_into(spark, src, spark.range(4, 6).select("id"), on=["id"])
    run_available()  # restart from the checkpoint
    got = spark.read.parquet(sink)
    per = {
        (r["_commit_version"], r["_change_kind"]): r["n"]
        for r in got.groupBy("_commit_version", "_change_kind")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # v0/v1 exactly once despite the restart; v3 merge: id 4 re-inserts
    # (deleted), id 5 matched -> pre+post images
    assert per == {
        (0, "insert"): 10, (1, "insert"): 10,
        (3, "insert"): 1,
        (3, "update_preimage"): 1, (3, "update_postimage"): 1,
    }, per
    # a third run with nothing new appends nothing
    run_available()
    assert spark.read.parquet(sink).count() == 23


def test_streaming_source_restore_guard(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F401

    src = str(tmp_path / "src")
    TF.create_table(spark.range(0, 5).select("id"), src)
    TF.append(spark.range(5, 8).select("id"), src)
    TF.restore(src, 0)
    TS.register(spark)
    r = TS._ChangesStreamReader({"path": src})
    with pytest.raises(ValueError, match="ignoreRestores"):
        r.partitions({"version": 0}, {"version": 3})
    r2 = TS._ChangesStreamReader({"path": src,
                                  "ignorerestores": "true"})
    parts = [p for p in r2.partitions({"version": 0}, {"version": 3})
             if p.file]
    # restore itself contributes nothing when ignored
    assert all(p.version in (0, 1) for p in parts)


def test_streaming_source_rename_streams_new_name(spark, tmp_path):
    """Metadata commits stream as empty batches, and files written
    BEFORE a rename stream their rows under the stream's (current)
    schema via field ids."""
    src = str(tmp_path / "src")
    from pyspark.sql import functions as F

    TF.create_table(
        spark.range(0, 6).select("id", (F.col("id") * 3).alias("v")), src
    )
    TF.rename_column(src, "v", "w")
    TS.register(spark)
    df = (
        spark.readStream.format("tablefmt_changes")
        .option("path", src).load()
    )
    assert "w" in df.columns and "v" not in df.columns
    sink = str(tmp_path / "s.parquet")
    q = (
        df.writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["id"]: r["w"] for r in spark.read.parquet(sink).collect()}
    assert rows == {i: i * 3 for i in range(6)}


def test_worker_partition_reader_is_self_contained(tmp_path):
    """The executor-side reader needs only pyarrow: dv positions drop by
    row index, absent columns null, _ck column maps to the kind."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = str(tmp_path / "part.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3, 4], "b": ["w", "x", "y", "z"]}), f)
    dv = str(tmp_path / "dv.parquet")
    pq.write_table(
        pa.table({"file": ["part.parquet", "other"], "pos": [1, 2]}), dv
    )
    part = TS._FilePartition(
        file=f, cols=["b", None, "a"], dv_files=[dv],
        basename="part.parquet",
    )
    rows = list(TS._read_file_partition(part))
    assert rows == [("w", None, 1), ("y", None, 3), ("z", None, 4)]


def test_native_batch_writer_append_and_overwrite(spark, tmp_path):
    """df.write.format('tablefmt'): append commits shards with footer
    stats into the log; overwrite replaces atomically; CHECK constraints
    refuse the whole write and leave no shards behind."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    TF.create_table(spark.range(0, 10).select("id"), p)
    TS.register(spark)

    spark.range(10, 20).select("id").write.format("tablefmt") \
        .option("path", p).mode("append").save()
    assert TF.row_count(p) == 20
    assert sorted(r["id"] for r in TF.snapshot_read(spark, p).collect()) \
        == list(range(20))
    # entries carry footer stats -> pruning works on natively written files
    m = TF.read_manifest(p, TF.current_version(p))
    new_e = [e for e in m["files"] if e["path"] in m["added"]]
    assert new_e and all("stats" in e and e["stats"]["id"]["min"] >= 10
                         for e in new_e)
    # overwrite
    spark.range(100, 103).select("id").write.format("tablefmt") \
        .option("path", p).mode("overwrite").save()
    assert sorted(r["id"] for r in TF.snapshot_read(spark, p).collect()) \
        == [100, 101, 102]
    # constraints bind the native path too
    TF.add_constraint(spark, p, "small", "id < 1000")
    data_before = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(os.path.join(p, "data")) for f in fn
    )
    with pytest.raises(Exception, match="small"):
        spark.range(5000, 5002).select("id").write.format("tablefmt") \
            .option("path", p).mode("append").save()
    data_after = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(os.path.join(p, "data")) for f in fn
    )
    assert data_after == data_before  # no orphan shards
    assert TF.row_count(p) == 3


def test_native_writer_validates_in_the_write_task(spark, tmp_path):
    """Round-13 verdict #1: CHECK validation and footer-stats collection
    run INSIDE write() (the executor task), not in the driver commit
    hook — a violating batch refuses BEFORE its shard lands, and the
    commit message already carries ready-made manifest entries."""
    import pyarrow.parquet as pq

    p = str(tmp_path / "t")
    TF.create_table(spark.range(0, 5).select("id"), p)
    TF.add_constraint(spark, p, "small", "id < 100")
    TS.register(spark)

    import pyarrow as pa

    def _batch(*ids):  # the Arrow-writer task contract: RecordBatches in
        return pa.record_batch([pa.array(list(ids), pa.int64())], ["id"])

    w = TS._TableBatchWriter({"path": p}, TF.table_schema(p), False)
    assert w.cons == {"small": "id < 100"}  # plan-time, one read
    # a clean task returns entries WITH footer stats (no driver re-read)
    msg = w.write(iter([_batch(7, 8)]))
    (e,) = msg.entries
    assert e["rows"] == 2 and e["stats"]["id"]["min"] == 7 \
        and e["stats"]["id"]["max"] == 8
    shard = os.path.join(p, e["path"])
    assert pq.read_table(shard).num_rows == 2
    os.unlink(shard)  # don't leave the uncommitted probe shard behind
    # a violating task raises IN write() and leaves no file behind
    before = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(os.path.join(p, "data")) for f in fn
    )
    with pytest.raises(TF.ConstraintViolation, match="small"):
        w.write(iter([_batch(7, 500)]))
    after = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(os.path.join(p, "data")) for f in fn
    )
    assert after == before
    # the commit hook itself never reads data: feed it entries whose
    # shard file is unreadable garbage — metadata-only commit succeeds
    rel = os.path.join("data", "fake", "part-xyz.parquet")
    os.makedirs(os.path.join(p, "data", "fake"), exist_ok=True)
    with open(os.path.join(p, rel), "wb") as f:
        f.write(b"not parquet")
    fake = TS._ShardCommit([{
        "path": rel, "rows": 1,
        "stats": {"id": {"min": 42, "max": 42, "nulls": 0}},
    }])
    w2 = TS._TableBatchWriter({"path": p}, TF.table_schema(p), False)
    w2.commit([fake])
    m = TF.read_manifest(p, TF.current_version(p))
    assert any(e2["path"] == rel for e2 in m["files"])
    TF.restore(p, 1)  # put the table back on real data for sanity
    assert sorted(r["id"] for r in TF.snapshot_read(spark, p).collect()) \
        == list(range(5))


def test_native_writer_plan_time_constraint_set_conflicts(spark, tmp_path):
    """The constraint set reads ONCE at plan time; a constraint added
    between plan and commit flips the commit into CommitConflict (the
    race can tighten, never loosen, enforcement)."""
    p = str(tmp_path / "t")
    TF.create_table(spark.range(0, 5).select("id"), p)
    TS.register(spark)
    before = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(os.path.join(p, "data")) for f in fn
    )
    import pyarrow as pa

    w = TS._TableBatchWriter({"path": p}, TF.table_schema(p), False)
    msg = w.write(iter([pa.record_batch(
        [pa.array([7], pa.int64())], ["id"])]))
    TF.add_constraint(spark, p, "late", "id < 1000")  # lands mid-flight
    with pytest.raises(TF.CommitConflict):
        w.commit([msg])
    # the conflicting commit cleaned its shard up: no new files remain
    after = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(os.path.join(p, "data")) for f in fn
    )
    assert after == before


def test_native_batch_writer_typed_columns_roundtrip(spark, tmp_path):
    """Timestamps (session-tz naive -> UTC micros), dates, and decimals
    survive the native writer bit-exactly, and the written footers give
    typed stats (a time-range predicate prunes natively written files)."""
    import datetime as _dt
    import decimal as _dec

    from pyspark.sql import functions as F  # noqa: F401

    p = str(tmp_path / "t")
    rows = [
        (i,
         _dt.datetime(2024, 1, 1 + i, 12, 0, 0, 250000),
         _dt.date(2024, 2, 1 + i),
         _dec.Decimal(f"{i}.25"))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "id long, ts timestamp, d date, amt decimal(10,2)")
    TF.create_table(df.where("id < 0"), p)  # empty, fixes the schema
    TS.register(spark)
    df.repartitionByRange(3, "ts").write.format("tablefmt") \
        .option("path", p).mode("append").save()
    got = sorted(map(tuple, TF.snapshot_read(spark, p).collect()))
    assert got == sorted(rows)
    opened, total = TF.pruned_file_counts(
        p, where="ts < TIMESTAMP '2024-01-02 00:00:00'")
    assert total == 3 and opened < total, (opened, total)


def test_native_stream_writer_exactly_once(spark, tmp_path):
    """writeStream.format('tablefmt'): micro-batches land as txn-stamped
    appends — a replay of an already-applied batch id is a no-op that
    also removes its duplicate shards."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "in")
    dst = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    TF.create_table(spark.createDataFrame([], "id long"), dst)
    TS.register(spark)
    spark.range(0, 5).select("id").write.mode("overwrite").parquet(src)

    q = (
        spark.readStream.schema("id long").parquet(src)
        .writeStream.format("tablefmt")
        .option("path", dst).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert sorted(r["id"] for r in TF.snapshot_read(spark, dst).collect()) \
        == list(range(5))
    head = TF.current_version(dst)
    # restart with NO new input: no new versions, no leftovers
    q = (
        spark.readStream.schema("id long").parquet(src)
        .writeStream.format("tablefmt")
        .option("path", dst).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert TF.current_version(dst) == head
    # direct replay of batch 0 through the writer: txn guard drops it
    # and removes the duplicate shards
    import pyarrow as pa

    w = TS._TableStreamWriter(
        {"path": dst}, TF.table_schema(dst), False)
    msg = w.write(iter([pa.record_batch(
        [pa.array([999], pa.int64())], ["id"])]))
    w.commit([msg], batchId=0)  # batch 0 already applied by the stream
    assert TF.current_version(dst) == head
    assert sorted(r["id"] for r in TF.snapshot_read(spark, dst).collect()) \
        == list(range(5))
    leftovers = [
        f for dp, _dn, fn in os.walk(os.path.join(dst, "data"))
        for f in fn if "part-" in f
    ]
    live = {os.path.basename(e["path"])
            for e in TF.read_manifest(dst, head)["files"]}
    assert set(leftovers) <= live | {
        os.path.basename(e) for e in ()
    } or all(os.path.basename(f) in live for f in leftovers)


def test_native_writer_schema_evolution_and_rename(spark, tmp_path):
    """The native append evolves the schema like tablefmt.append (new
    column, widened type) and writes correctly into a RENAMED table
    (ids inherited by current name)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    TF.create_table(
        spark.range(0, 5).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 2).alias("v")), p
    )
    TS.register(spark)
    spark.range(5, 8).select(
        F.col("id").cast("long").alias("id"),   # widens int -> long
        (F.col("id") * 2).alias("v"),
        F.lit("n").alias("tag"),                # evolves: new column
    ).write.format("tablefmt").option("path", p).mode("append").save()
    snap = TF.snapshot_read(spark, p)
    assert snap.schema.simpleString() == \
        "struct<id:bigint,v:bigint,tag:string>"
    assert snap.where("tag IS NULL").count() == 5
    TF.rename_column(p, "v", "w")
    spark.range(8, 10).select(
        "id", (F.col("id") * 2).alias("w"), F.lit("m").alias("tag")
    ).write.format("tablefmt").option("path", p).mode("append").save()
    got = {r["id"]: r["w"] for r in TF.snapshot_read(spark, p).collect()}
    assert got == {i: i * 2 for i in range(10)}


def test_native_reader_splits_large_files_by_row_group(spark, tmp_path):
    """Round-13 verdict #3: a file above splitFileBytes splits into one
    task per ROW GROUP (externally-written big files parallelize), each
    group pruned by its own stats, deletion vectors still addressing
    file-level row indexes."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F  # noqa: F401

    p = str(tmp_path / "t")
    TF.create_table(spark.range(0, 100).select("id").repartition(1), p)
    (entry,) = TF.read_manifest(p, 0)["files"]
    full = os.path.join(p, entry["path"])
    # simulate an externally-written multi-row-group file: same rows,
    # same order, 4 row groups of 25
    t = pq.read_table(full)
    pq.write_table(t, full, row_group_size=25)
    crc = os.path.join(os.path.dirname(full),
                       "." + os.path.basename(full) + ".crc")
    if os.path.exists(crc):  # stale Hadoop checksum from the first write
        os.unlink(crc)
    # dv-delete every 10th row (positions are file row indexes)
    TF.delete_where(spark, p, "id % 10 = 0", mode="dv",
                    dv_rewrite_fraction=1.0)
    TS.register(spark)

    r = TS._SnapshotReader({"path": p, "splitfilebytes": "1"})
    parts = r.partitions()
    assert len(parts) == 4 and all(
        pt.row_group is not None for pt in parts)  # split beat file count
    got = spark.read.format("tablefmt").option("path", p) \
        .option("splitFileBytes", "1").load()
    want = [i for i in range(100) if i % 10 != 0]
    assert sorted(x["id"] for x in got.collect()) == want
    # pushed filters prune whole row groups by their own stats
    from pyspark.sql.datasource import LessThan

    r2 = TS._SnapshotReader({"path": p, "splitfilebytes": "1"})
    list(r2.pushFilters([LessThan(("id",), 25)]))
    assert len(r2.partitions()) == 1
    # default threshold: small files pass through whole
    r3 = TS._SnapshotReader({"path": p})
    assert [pt.row_group for pt in r3.partitions()] == [None]


def test_register_table_sql_text_snapshot_isolation(spark, tmp_path):
    """register_table: plain spark.sql over the view, pinned at the
    registration-time version (later commits invisible until
    re-registration); version= gives a time-travel view; pushed SQL
    WHERE still prunes files."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "t")
    TF.create_table(
        spark.range(0, 100).select("id", (F.col("id") % 5).alias("g"))
        .repartitionByRange(4, "id"), p)
    TF.append(spark.range(100, 120).select(
        "id", (F.col("id") % 5).alias("g")), p)
    TS.register_table(spark, "tsql_t", p)
    got = spark.sql(
        "SELECT g, COUNT(*) AS n, SUM(id) AS s FROM tsql_t "
        "GROUP BY g ORDER BY g").collect()
    assert [(r["g"], r["n"], r["s"]) for r in got] == [
        (g, sum(1 for i in range(120) if i % 5 == g),
         sum(i for i in range(120) if i % 5 == g)) for g in range(5)]
    # snapshot isolation: a commit AFTER registration is invisible
    TF.append(spark.range(1000, 1010).select(
        "id", (F.col("id") % 5).alias("g")), p)
    assert spark.sql("SELECT COUNT(*) AS n FROM tsql_t").collect()[0]["n"] \
        == 120
    # re-registration advances; time-travel view pins v0
    TS.register_table(spark, "tsql_t", p)
    assert spark.sql("SELECT COUNT(*) AS n FROM tsql_t").collect()[0]["n"] \
        == 130
    TS.register_table(spark, "tsql_t0", p, version=0)
    assert spark.sql("SELECT COUNT(*) AS n FROM tsql_t0").collect()[0]["n"] \
        == 100
    # the SQL WHERE reaches the source's pushed-filter pruning
    pruned = spark.sql("SELECT id FROM tsql_t0 WHERE id < 25")
    assert sorted(r["id"] for r in pruned.collect()) == list(range(25))
    spark.catalog.dropTempView("tsql_t")
    spark.catalog.dropTempView("tsql_t0")
