"""M5 — streaming declared queries (batch-equivalent forms).

Each query runs the *same transformation function* the streaming pipelines
use (streaming/pipeline.py), in batch mode over the events table, so the
DuckDB oracle can hash-check the windowing semantics. The streaming-mode
execution of the identical functions is covered by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rpa_etl_spark.registry import query
from rpa_etl_spark.streaming import pipeline as SP
from rpa_etl_spark.tables import load


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts)                    AS window_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SP.tumbling_counts(load(spark, sf_dir, "events"))


@query(
    "q_stream_sliding",
    oracle="""
    WITH both_windows AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' FROM events
    )
    SELECT window_start, COUNT(*) AS n_events
    FROM both_windows
    GROUP BY 1
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 — every event falls in exactly two
    windows, which the oracle reproduces by unioning the two bucket
    assignments."""
    return SP.sliding_counts(load(spark, sf_dir, "events"))


@query(
    "q_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '5 minutes'
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        -- event_id tiebreak must match the LAG windows above: without it,
        -- duplicate-ts rows at a session boundary are visited in
        -- unspecified order and the cumulative flag can split them
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    )
    SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window vs an independent SQL sessionization (lag +
    cumulative new-session flags) — a strong cross-check of gap semantics."""
    return SP.sessionize(load(spark, sf_dir, "events"))


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM (
        SELECT DISTINCT ON (event_id) event_id, event_type
        FROM (SELECT event_id, event_type FROM events
              UNION ALL
              SELECT event_id, event_type FROM events)
    )
    GROUP BY event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by event_id over a deliberately duplicated input
    (idempotence: same input twice ⇒ same output once)."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    doubled = ev.unionByName(ev)
    from pyspark.sql import functions as F

    return (
        SP.dedup_events(doubled.withColumn("value", F.lit(0.0))
                        .withColumn("user_id", F.lit(0))
                        .withColumn("props", F.lit("{}")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "q_stream_interval_join",
    oracle="""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
        FROM events WHERE event_type = 'view'
    )
    SELECT c.click_id, c.user_id, c.click_ts,
           v.purchase_id, v.purchase_ts, v.purchase_value
    FROM clicks c JOIN views v
      ON c.user_id = v.user_id
     AND v.purchase_ts >= c.click_ts
     AND v.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream interval join
    (streaming/pipeline.py::join_clicks_to_purchases) — the SAME function
    serves the streaming test and this oracle-checked batch run, so the
    join semantics are pinned from both sides. Click → following view
    within a 30-minute horizon per user."""
    ev = load(spark, sf_dir, "events")
    return SP.join_clicks_to_purchases(ev, right_type="view")


@query(
    "q_stream_outer_join",
    oracle="""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
        FROM events WHERE event_type = 'view'
    )
    SELECT c.click_id, c.user_id, c.click_ts,
           v.purchase_id, v.purchase_ts, v.purchase_value,
           v.purchase_id IS NOT NULL AS matched
    FROM clicks c LEFT JOIN views v
      ON c.user_id = v.user_id
     AND v.purchase_ts >= c.click_ts
     AND v.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
    """,
)
def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream LEFT OUTER interval
    join (streaming/joins.py::join_clicks_to_purchases_outer): clicks
    with no following view inside the horizon surface with NULL purchase
    columns. In streaming mode those null rows are emitted by watermark
    eviction (state held until watermark > click_ts + horizon, then
    released — bounded state, eventually-complete result), which
    tests/test_streaming.py::test_stream_stream_outer_join_emits_evicted_nulls
    verifies against this same function on wall-clock watermarks."""
    from rpa_etl_spark.streaming.joins import join_clicks_to_purchases_outer

    ev = load(spark, sf_dir, "events")
    return join_clicks_to_purchases_outer(ev, right_type="view")


@query(
    "q_user_totals_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def q_user_totals_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the custom stateful streaming operators
    (streaming/stateful.py::running_user_totals via applyInPandasWithState
    and the transformWithStateInPandas profile variant): the FINAL state
    both converge to is this per-user (count, decimal-exact sum). The
    streaming tests assert stream-vs-batch equality on the same inputs;
    this declared query gives that semantic a driver-checked oracle row.
    One shuffle on the high-cardinality user key; state in the streaming
    form is bounded by |active users| via processing-time timeouts.
    """
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "q_stream_session_ttl",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL '5 minutes'
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def q_stream_session_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the EXPIRING-SESSION stateful operators (round-9
    verdict stretch #8 — state TTL + timers): the set of sessions the
    streaming forms emit as their state is EVICTED BY EVENT-TIME TIMER
    (streaming/stateful.py::expiring_user_sessions via
    applyInPandasWithState EventTimeTimeout — runnable here and
    wall-clock-eviction-tested in tests/test_streaming.py — and
    streaming/stateful_v2.py::ExpiringUserSessions via
    transformWithStateInPandas registerTimer/handleExpiredTimer +
    ttlDurationMs, env-gated on protobuf). Once every watermark has
    passed, those emissions converge to exactly this batch gap
    sessionization — native session_window aggregation, with the oracle
    re-deriving sessions INDEPENDENTLY via lag + cumulative new-session
    flags. One shuffle on (user_id, session assignment); streaming state
    is bounded by |open sessions|, the property TTL eviction exists to
    guarantee."""
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
