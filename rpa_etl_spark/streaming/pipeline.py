"""Structured Streaming pipelines (SURVEY.md §2.2 streaming rows).

The reference builds its audit-event list in memory, one document at a time
(orchestrator.py:118-298, O4); Redis/Celery are declared but unused. Here
the event flow is a real stream: file source → watermark → windowed /
stateful operators → foreachBatch sinks.

Every transformation is written against a plain DataFrame so the same
function serves (a) the batch declared queries the DuckDB oracle checks and
(b) the streaming tests that run it through ``readStream`` with an
availableNow trigger. ``withWatermark`` is applied only on streaming input.

Scale notes: windowed aggregations shuffle on (window, key) — state store
size is bounded by the watermark horizon; dedup state is likewise
watermark-bounded. Session windows use Spark's native ``session_window``
(merging state per key), not a custom stateful op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def events_file_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream of events (json lines per file)."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).json(directory)


def _maybe_watermark(df: DataFrame, col: str, delay: str) -> DataFrame:
    return df.withWatermark(col, delay) if df.isStreaming else df


def tumbling_counts(df: DataFrame, size: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts/sums per event type (batch-equivalent of the
    reference's per-stage metrics aggregation, O4/O5)."""
    df = _maybe_watermark(df, "ts", watermark)
    return (
        df.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(df: DataFrame, size: str = "10 minutes", slide: str = "5 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    """Sliding-window event counts (each event lands in size/slide windows)."""
    df = _maybe_watermark(df, "ts", watermark)
    return (
        df.groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionize(df: DataFrame, gap: str = "5 minutes",
               watermark: str = "10 minutes") -> DataFrame:
    """Session windows per user (dynamic gap-merged state). The reference's
    analog is execution_id grouping a processing session."""
    df = _maybe_watermark(df, "ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def dedup_events(df: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once by event_id (idempotence requirement,
    test_pipeline_robustez.py:48-68). Streaming: state bounded by the
    watermark; batch: plain dropDuplicates."""
    if df.isStreaming:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return df.dropDuplicates(["event_id"])


def enrich_with_dim(stream_df: DataFrame, dim_df: DataFrame,
                    key: str = "user_id") -> DataFrame:
    """Stream-static join: each micro-batch hash-joins against the static
    dim (re-read per batch, so slowly-changing dims pick up updates). No
    stream-side state at all. Join strategy is left to the optimizer —
    AQE broadcasts the dim when it fits under the threshold; a forced
    broadcast hint here would OOM callers with large dims."""
    return stream_df.join(dim_df, key, "left")


def join_clicks_to_purchases(events: DataFrame,
                             watermark: str = "10 minutes",
                             horizon: str = "30 minutes",
                             left_type: str = "click",
                             right_type: str = "purchase") -> DataFrame:
    """Stream-stream inner join: click → following purchase within a time
    horizon. Both sides carry watermarks and the join condition bounds
    purchase_ts to [click_ts, click_ts + horizon], so Spark can expire
    buffered state — an UNBOUNDED stream-stream join would grow state
    forever (the interval condition is what makes it production-safe)."""
    clicks = (
        events.where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    clicks = _maybe_watermark(clicks, "click_ts", watermark)
    purchases = (
        events.where(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    purchases = _maybe_watermark(purchases, "purchase_ts", watermark)
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"interval {horizon}")),
        "inner",
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


def stage_events(df: DataFrame) -> DataFrame:
    """O4 — derive an OrchestratorEvent-shaped audit row per input event
    (orchestrator_models.py:12-22 schema: stage/status/details)."""
    return df.select(
        F.col("ts").alias("timestamp"),
        F.when(F.col("event_type") == "error", F.lit("VALIDATE"))
        .otherwise(F.lit("READ"))
        .alias("stage"),
        F.when(F.col("event_type") == "error", F.lit("FAILURE"))
        .otherwise(F.lit("SUCCESS"))
        .alias("status"),
        F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias("details"),
        F.when(F.col("event_type") == "error", F.lit("ABORT"))
        .otherwise(F.lit("CONTINUE"))
        .alias("error_policy"),
    )


def run_foreach_batch_audit(stream_df: DataFrame, out_dir: str, checkpoint: str):
    """K2-style audit sink via foreachBatch (lets one sink fan out to
    several targets transactionally per batch). Replay-safe by default: a
    plain append sink would duplicate rows when a batch is replayed after a
    failure/restart (foreachBatch is at-least-once), so this delegates to
    the idempotent batch-id-partitioned writer."""
    return run_foreach_batch_audit_idempotent(stream_df, out_dir, checkpoint)


def idempotent_batch_sink(out_dir: str):
    """Exactly-once foreachBatch writer: each micro-batch lands in a
    batch-id-keyed partition directory with dynamic partition overwrite, so
    a REPLAYED batch (at-least-once delivery after a failure/restart)
    overwrites its own previous output instead of appending duplicates.
    This is the standard idempotent-sink recipe when the target store has
    no transactions — the reference's idempotence contract
    (tests/e2e/test_pipeline_robustez.py:48-68) applied to streaming.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            stage_events(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return sink


def run_foreach_batch_audit_idempotent(
    stream_df: DataFrame, out_dir: str, checkpoint: str
):
    """K2 audit sink with replay-safe (exactly-once) output."""
    return (
        stream_df.writeStream.foreachBatch(idempotent_batch_sink(out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
