"""Stream-stream OUTER join (round-10 continuation).

Separate module from streaming/pipeline.py so the rotation policy's
file-granular kernel mapping re-queues ONLY q_stream_outer_join when
this evolves, not every streaming consumer of pipeline.py.

The inner interval join (pipeline.join_clicks_to_purchases) emits only
matches; production attribution also needs the clicks that never
converted. An UNBOUNDED outer join over streams is impossible (you can
never prove a match won't arrive); the watermark is what makes it
well-defined: Spark holds an unmatched click in state until
watermark > click_ts + horizon, then emits it with NULL purchase
columns — bounded state AND an eventually-complete result. Batch mode
degrades to the plain left join (the DuckDB-oracle form), so the same
function serves both the declared query and the wall-clock streaming
test (tests/test_streaming.py asserts the exact evicted-null set
implied by the final watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rpa_etl_spark.streaming.pipeline import _maybe_watermark


def join_clicks_to_purchases_outer(events: DataFrame,
                                   watermark: str = "10 minutes",
                                   horizon: str = "30 minutes",
                                   left_type: str = "click",
                                   right_type: str = "purchase") -> DataFrame:
    """LEFT OUTER interval join: every click emits, matched to following
    purchases within the horizon or with NULL purchase columns once the
    watermark proves no match can still arrive."""
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
        "left_outer",
    ).select(
        "click_id",
        "user_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        F.col("purchase_id").isNotNull().alias("matched"),
    )
