"""M8 — event-analytics + corpus-quality declared queries (round 3).

The analytics patterns a product/ML team runs on the `events` stream and
the quality gates a 100 TB corpus pipeline applies before training, each
with a DuckDB oracle:

- q_funnel: ordered conversion funnel (view -> click -> purchase) per user.
- q_retention_cohort: weekly cohort retention matrix.
- q_quality_cascade: Gopher-style document-quality rule cascade
  (Rae et al. 2021, "Scaling Language Models", Appendix A heuristics).
- q_window_value_funcs: first_value / last_value / nth_value frames.
- q_merge_upsert: CDC MERGE (update-matched / insert-new) as a relational
  full-outer combine of a snapshot with a change batch.
- q_outlier_zscore: per-group z-score anomaly detection with decimal-exact
  moment sums (order-independent across engines).

Reference parity: the reference engine (see SURVEY.md section 2.2) routes
documents through threshold + confidence gates (robot/orchestrator.py
routing semantics); the cascade here is the corpus-scale generalization of
that per-document gate pattern. Scale notes live in each docstring; no
Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rpa_etl_spark.registry import query
from rpa_etl_spark.tables import load, spread

# ---------------------------------------------------------------------------
# q_funnel
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
             + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END)
           AS funnel_stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
"""


@query("q_funnel", oracle=_FUNNEL_SQL)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: per user, the first `view`, the first
    `click` strictly after that view, and the first `purchase` strictly
    after that click; funnel_stage = how deep the user got (1..3).

    Shape: the oracle states it as three aggregations + two joins, but the
    Spark plan is ONE shuffle — three chained unbounded window minima over
    the same user_id partitioning (each conditional on the previous stage's
    timestamp), then a groupBy(user_id) that reuses the exchange. At 100 TB
    this is the floor for any per-entity ordered-sequence analysis: one
    hash partition of the events fact by user, no sort needed (unordered
    frames), no self-joins, no skew (users are high-cardinality).
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    t = F.col("ts")
    typ = F.col("event_type")
    staged = (
        ev.withColumn("t_view", F.min(F.when(typ == "view", t)).over(w))
        .withColumn(
            "t_click",
            F.min(F.when((typ == "click") & (t > F.col("t_view")), t)).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(F.when((typ == "purchase") & (t > F.col("t_click")), t)).over(w),
        )
    )
    return (
        staged.where(F.col("t_view").isNotNull())
        .groupBy("user_id")
        .agg(
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
            F.first("t_purchase").alias("t_purchase"),
        )
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("funnel_stage"),
        )
    )


# ---------------------------------------------------------------------------
# q_retention_cohort
# ---------------------------------------------------------------------------

_COHORT_ANCHOR = "2024-01-01"

_RETENTION_SQL = f"""
    WITH firsts AS (
        SELECT user_id,
               CAST(FLOOR(date_diff('day', DATE '{_COHORT_ANCHOR}',
                                    MIN(CAST(ts AS DATE))) / 7.0) AS INTEGER)
               AS cohort_week,
               MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT f.user_id, f.cohort_week,
               CAST(FLOOR(date_diff('day', f.first_day,
                                    CAST(e.ts AS DATE)) / 7.0) AS INTEGER)
               AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM activity
    GROUP BY cohort_week, week_offset
"""


@query("q_retention_cohort", oracle=_RETENTION_SQL)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week
    (weeks counted from a fixed anchor date, engine-neutral), counted in
    each subsequent week-offset they were active.

    Shape: one groupBy(user_id) for first-seen, one join back on user_id
    (the second shuffle reuses the same key — AQE/Catalyst co-partitions),
    an in-row distinct projection, then a low-cardinality groupBy on
    (cohort_week, week_offset) with map-side partial aggregation. At
    100 TB the per-user first-touch is the canonical two-pass pattern; the
    final matrix is tiny (weeks x offsets) so the last shuffle is bytes.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    firsts = firsts.select(
        "user_id",
        "first_day",
        F.floor(F.datediff("first_day", F.lit(_COHORT_ANCHOR).cast("date")) / 7.0)
        .cast("int")
        .alias("cohort_week"),
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff("day", "first_day") / 7.0).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# q_quality_cascade
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Engine-neutral text metrics. Both sides compute on the SAME definitions:
#   n_words        = |split(text, \s+)|
#   mean_word_len  = len(text without whitespace) / n_words
#   hash_ratio     = '#' occurrences / n_words
#   ellipsis_ratio = '...' occurrences / n_words
#   stop_hits      = how many of 8 English stopwords appear as whole words
#                    (space-padded containment over a lowercased,
#                    punctuation-collapsed copy)
_STOP_HITS_SQL = " + ".join(
    f"(CASE WHEN strpos(_norm, ' {w} ') > 0 THEN 1 ELSE 0 END)" for w in _STOPWORDS
)

_QUALITY_SQL = f"""
    WITH m AS (
        SELECT doc_id, lang,
               len(string_split_regex(text, '\\s+')) AS n_words,
               len(regexp_replace(text, '\\s+', '', 'g')) AS n_word_chars,
               len(text) - len(replace(text, '#', '')) AS n_hash,
               (len(text) - len(replace(text, '...', ''))) / 3 AS n_ellipsis,
               ' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') || ' '
                   AS _norm
        FROM documents
    )
    SELECT doc_id, lang, n_words,
           ROUND(n_word_chars / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
           ({_STOP_HITS_SQL}) AS stop_hits,
           (n_words BETWEEN 50 AND 100000) AS r_word_count,
           (n_word_chars / CAST(n_words AS DOUBLE) BETWEEN 3 AND 10) AS r_mean_len,
           (n_hash / CAST(n_words AS DOUBLE) < 0.1) AS r_hash_ratio,
           (n_ellipsis / CAST(n_words AS DOUBLE) < 0.1) AS r_ellipsis_ratio,
           (({_STOP_HITS_SQL}) >= 2) AS r_stopwords,
           ((n_words BETWEEN 50 AND 100000)
            AND (n_word_chars / CAST(n_words AS DOUBLE) BETWEEN 3 AND 10)
            AND (n_hash / CAST(n_words AS DOUBLE) < 0.1)
            AND (n_ellipsis / CAST(n_words AS DOUBLE) < 0.1)
            AND (({_STOP_HITS_SQL}) >= 2)) AS keep
    FROM m
"""


@query("q_quality_cascade", oracle=_QUALITY_SQL)
def q_quality_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus-quality rule cascade (Rae et al. 2021, App. A):
    per-document word count bounds, mean-word-length band, symbol ('#')
    and ellipsis ratios, and a minimum stopword presence; `keep` is the
    conjunction — the pre-training filter gate.

    Shape: a single narrow projection — every metric is a JVM string
    expression over one row, no shuffle at all, so at 100 TB this runs at
    scan speed and Catalyst pushes the needed-columns pruning into the
    parquet reader. The downstream `WHERE keep` filter composes with
    partition pruning. This is the per-document generalization of the
    reference's threshold/confidence routing gates (robot/orchestrator.py).
    """
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    n_words = F.size(F.split(text, r"\s+")).cast("long")
    n_word_chars = F.length(F.regexp_replace(text, r"\s+", "")).cast("long")
    n_hash = (F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))).cast(
        "long"
    )
    n_ellipsis = (
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    norm = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "), F.lit(" ")
    )
    stop_hits = None
    for w in _STOPWORDS:
        hit = (F.instr(norm, f" {w} ") > 0).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit

    mean_len = n_word_chars / n_words.cast("double")
    r_word_count = n_words.between(50, 100000)
    r_mean_len = mean_len.between(3, 10)
    r_hash = n_hash / n_words.cast("double") < 0.1
    r_ellipsis = n_ellipsis / n_words.cast("double") < 0.1

    base = docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        stop_hits.alias("stop_hits"),
        r_word_count.alias("r_word_count"),
        r_mean_len.alias("r_mean_len"),
        r_hash.alias("r_hash_ratio"),
        r_ellipsis.alias("r_ellipsis_ratio"),
        (stop_hits >= 2).alias("r_stopwords"),
    )
    return base.withColumn(
        "keep",
        F.col("r_word_count")
        & F.col("r_mean_len")
        & F.col("r_hash_ratio")
        & F.col("r_ellipsis_ratio")
        & F.col("r_stopwords"),
    )


# ---------------------------------------------------------------------------
# q_window_value_funcs
# ---------------------------------------------------------------------------

_VALUE_FUNCS_SQL = """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING)
               AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING)
               AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("q_window_value_funcs", oracle=_VALUE_FUNCS_SQL)
def q_window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions: each order annotated with the customer's
    first, last, and second order key in o_orderdate order (deterministic
    o_orderkey tiebreak; last/nth use an explicit unbounded frame — the
    default frame would stop at CURRENT ROW).

    Shape: all three functions share one (o_custkey) partitioning and one
    (o_orderdate, o_orderkey) sort — Catalyst plans a single exchange +
    sort with one Window operator. The standard per-entity
    "first/latest/nth touch" attribution pattern; scales as one shuffle
    of the fact table on a high-cardinality key.
    """
    orders = load(spark, sf_dir, "orders")
    w_default = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_default.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("totalprice"),
        F.first("o_orderkey").over(w_default).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


# ---------------------------------------------------------------------------
# q_merge_upsert
# ---------------------------------------------------------------------------

_MERGE_CUTOFF = "2024-01-15"

_MERGE_SQL = f"""
    WITH ranked AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(value AS DECIMAL(18,2)) AS value_dec,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts < TIMESTAMP '{_MERGE_CUTOFF}'
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               ts < TIMESTAMP '{_MERGE_CUTOFF}' AS is_base
        FROM events
    ),
    target AS (
        SELECT user_id, event_type AS last_type, value_dec AS last_value
        FROM ranked WHERE is_base AND rn = 1
    ),
    source AS (
        SELECT user_id, event_type AS last_type, value_dec AS last_value
        FROM ranked WHERE NOT is_base AND rn = 1
    )
    SELECT COALESCE(s.user_id, t.user_id) AS user_id,
           COALESCE(s.last_type, t.last_type) AS last_type,
           CAST(COALESCE(s.last_value, t.last_value) AS DOUBLE) AS last_value,
           CASE WHEN t.user_id IS NULL THEN 'inserted'
                WHEN s.user_id IS NULL THEN 'kept'
                ELSE 'updated' END AS merge_action
    FROM target t FULL OUTER JOIN source s ON t.user_id = s.user_id
"""


@query("q_merge_upsert", oracle=_MERGE_SQL)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE / upsert: a per-user profile snapshot (latest event before
    a cutoff) merged with a change batch (latest event after it) — matched
    keys take the source row ('updated'), unmatched source keys are
    'inserted', unmatched target keys are 'kept'. The relational core of
    Delta/Iceberg MERGE INTO, expressed engine-neutrally.

    Shape: one window over (user_id, side) to pick each side's latest row
    (single shuffle of the fact), then a full-outer hash join on user_id
    that AQE co-partitions with the window exchange. At 100 TB the standard
    refinement is partition-pruning the target to only files containing
    touched keys (what a lakehouse MERGE does with min/max stats); the
    join-and-coalesce semantics below are unchanged by that pruning.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
        (F.col("ts") < F.lit(_MERGE_CUTOFF).cast("timestamp")).alias("is_base"),
    )
    w = Window.partitionBy("user_id", "is_base").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    target = latest.where("is_base").select(
        "user_id", F.col("event_type").alias("last_type"), F.col("value_dec").alias("last_value")
    )
    source = latest.where(~F.col("is_base")).select(
        "user_id", F.col("event_type").alias("last_type"), F.col("value_dec").alias("last_value")
    )
    t, s = target.alias("t"), source.alias("s")
    return t.join(s, F.col("t.user_id") == F.col("s.user_id"), "full_outer").select(
        F.coalesce("s.user_id", "t.user_id").alias("user_id"),
        F.coalesce("s.last_type", "t.last_type").alias("last_type"),
        F.coalesce("s.last_value", "t.last_value").cast("double").alias("last_value"),
        F.when(F.col("t.user_id").isNull(), "inserted")
        .when(F.col("s.user_id").isNull(), "kept")
        .otherwise("updated")
        .alias("merge_action"),
    )


# ---------------------------------------------------------------------------
# q_outlier_zscore
# ---------------------------------------------------------------------------

_Z_THRESHOLD = 2.5

_ZSCORE_SQL = f"""
    WITH moments AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value AS DECIMAL(18,4))
                        * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s2
        FROM events GROUP BY event_type
    ),
    stats AS (
        SELECT event_type, s1 / n AS mean,
               sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
        FROM moments
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - st.mean) / st.sd, 6) AS zscore
    FROM events e JOIN stats st ON e.event_type = st.event_type
    WHERE ABS((e.value - st.mean) / st.sd) > {_Z_THRESHOLD}
"""


@query("q_outlier_zscore", oracle=_ZSCORE_SQL)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection: events whose `value` deviates
    more than {2.5} sample standard deviations from their event_type mean.

    Determinism across engines: double summation is order-dependent, so
    both sides accumulate the first two moments in EXACT decimal
    arithmetic (sum and sum-of-squares of DECIMAL(18,4)) and only then
    convert to double — mean/sd are bit-identical regardless of partition
    or aggregation order. Shape: one low-cardinality groupBy (map-side
    partial agg, tiny result broadcast back onto the fact scan) + one
    broadcast join — at 100 TB the fact table is read twice but never
    shuffled; the classic two-pass standardization.
    """
    ev = load(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,4)")
    moments = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vdec).cast("double").alias("s1"),
        F.sum(vdec * vdec).cast("double").alias("s2"),
    )
    stats = moments.select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias("sd"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > _Z_THRESHOLD)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("zscore"))
    )


# ---------------------------------------------------------------------------
# q_profile_stats
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderdate",
    "o_orderpriority",
    "o_totalprice",
)

_PROFILE_SQL = """
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority,
               CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        FROM orders
    ),
    s AS (
        SELECT COUNT(*) AS n_rows,
               {stats}
        FROM base
    )
    {unions}
"""


def _profile_oracle() -> str:
    stats = ",\n               ".join(
        f"COUNT({c}) AS cnt_{c}, COUNT(DISTINCT {c}) AS nd_{c}, "
        f"CAST(MIN({c}) AS VARCHAR) AS min_{c}, CAST(MAX({c}) AS VARCHAR) AS max_{c}"
        for c in _PROFILE_COLS
    )
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS column_name, n_rows, n_rows - cnt_{c} AS n_nulls, "
        f"nd_{c} AS n_distinct, min_{c} AS min_value, max_{c} AS max_value FROM s"
        for c in _PROFILE_COLS
    )
    return _PROFILE_SQL.format(stats=stats, unions=unions)


@query("q_profile_stats", oracle=_profile_oracle())
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling / ANALYZE statistics: one row per profiled column of
    `orders` with row count, null count, exact distinct count, and min/max
    (rendered as strings so the stats table has one schema for all column
    types; money is profiled at DECIMAL(18,2) so both engines print the
    same digits).

    Shape: ONE aggregation pass over the table computes every column's
    stats (Catalyst expands the multi-DISTINCT into a single grouping-id
    expand — n_cols partial aggregates over one scan), then an in-row
    `stack` unpivots the single stats row into the per-column table. At
    100 TB the exact COUNT(DISTINCT) expand is the cost driver; the
    documented scale path swaps it for approx_count_distinct (HLL, one
    pass, no expand) — same plan shape, bounded error, as exercised by
    q_approx_count_distinct.
    """
    # rebalance before the multi-DISTINCT expand: the expand multiplies
    # every input row by n_cols+1 BEFORE the partial aggregate, so its
    # parallelism must track CPU, not input splits (a single-row-group
    # scan is one task and would run the whole expand on one core)
    base = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        )
        .transform(spread)
    )
    # STRING min/max buffers are variable-length, which disqualifies
    # HashAggregate — keeping them in the multi-DISTINCT aggregate forced
    # the whole ×(n_cols+1) Expand through SortAggregate (two full sorts
    # of the expanded rows; measured as the query's dominant cost, r14).
    # Fixed-buffer aggregates (counts + min/max over long/timestamp/
    # decimal) stay in the expand agg as HashAggregate; the one string
    # column's min/max runs as a keyless agg over a 1-column pruned scan
    # and joins back as a 1-row broadcast. Same values, same one-pass
    # scan for everything that expands.
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
        ]
        if c != "o_orderpriority":
            aggs += [
                F.min(c).cast("string").alias(f"min_{c}"),
                F.max(c).cast("string").alias(f"max_{c}"),
            ]
    mm = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .agg(
            F.min("o_orderpriority").cast("string")
            .alias("min_o_orderpriority"),
            F.max("o_orderpriority").cast("string")
            .alias("max_o_orderpriority"),
        )
    )
    one = base.agg(*aggs).crossJoin(F.broadcast(mm))
    stack_args = ", ".join(
        f"'{c}', n_rows - cnt_{c}, nd_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


# ---------------------------------------------------------------------------
# q_array_agg
# ---------------------------------------------------------------------------

_ARRAY_AGG_SQL = """
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderpriority)), '|') AS priorities,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|')
               AS distinct_priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
"""


@query("q_array_agg", oracle=_ARRAY_AGG_SQL)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per customer, the full list and the distinct set
    of order priorities. collect_list/collect_set accumulate in partition
    order, which is nondeterministic — `sort_array` canonicalizes both so
    the result is identical at any parallelism (and hash-matches DuckDB's
    list_sort). Shape: one groupBy(o_custkey) shuffle with map-side
    partial collect; per-group arrays are bounded by orders-per-customer,
    so no group materializes unbounded state. At 100 TB a hot entity with
    millions of rows would need a cap (slice after sort) or a sketch —
    the priorities domain here is 5 values, so the distinct set is tiny.
    """
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            # serialized (not array<string>): the driver's canonicalizer
            # cannot hash list cells — scalar output columns only
            F.array_join(
                F.sort_array(F.collect_list("o_orderpriority")), "|"
            ).alias("priorities"),
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), "|"
            ).alias("distinct_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# q_hll_sketch_merge
# ---------------------------------------------------------------------------

_HLL_MERGE_SQL = """
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_10pct
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__all__' AS event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_10pct
    FROM events
"""


@query("q_hll_sketch_merge", oracle=_HLL_MERGE_SQL)
def q_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches): per-event-type user
    sketches, then the GLOBAL distinct estimated by UNIONING the group
    sketches — never re-reading the raw data. Mergeability is the scale
    property: at 100 TB, per-partition/per-day sketches roll up to any
    coarser grain as register-wise maxima (bytes, not rows), which is how
    distinct counts survive re-aggregation in a lakehouse.

    The estimates are sketch-internal, so (as in q_approx_count_distinct)
    the query gates them against exact counts — HLL register state is
    update-order-independent, so the gate is deterministic at any
    parallelism — and the oracle asserts the gates hold. The total row is
    built by union + single-row re-aggregation, not a join (no cartesian
    anywhere).
    """
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    g = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    per_group = g.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
            <= F.col("exact_users") * 0.10
        ).alias("within_10pct"),
    )
    merged_est = g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    overall_exact = ev.agg(F.count_distinct("user_id").alias("exact_users"))
    total = (
        merged_est.unionByName(overall_exact, allowMissingColumns=True)
        .agg(F.max("est").alias("est"), F.max("exact_users").alias("exact_users"))
        .select(
            F.lit("__all__").alias("event_type"),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.col("exact_users") * 0.10
            ).alias("within_10pct"),
        )
    )
    return per_group.unionByName(total)


# ---------------------------------------------------------------------------
# q_window_rank_ties
# ---------------------------------------------------------------------------

_RANK_TIES_SQL = """
    SELECT *
    FROM (
        SELECT o_orderpriority, o_orderdate, o_orderkey,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate)
    )
    WHERE drnk <= 2
"""


@query("q_window_rank_ties", oracle=_RANK_TIES_SQL)
def q_window_rank_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() vs dense_rank() under real ties: all orders on each
    priority's two earliest order DATES (many orders share a date, so
    rank gaps vs dense compaction actually differ). Deterministic despite
    the tie-ordered window: tied rows share the same rank value, so the
    dense_rank <= 2 row SET is order-independent — the safe way to write
    keep-the-earliest logic (row_number over a tied sort would be
    nondeterministic; q_window_rank uses a keyed tiebreak for that).
    One (priority)-partitioned window — single exchange + sort.
    """
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderdate",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("drnk") <= 2)
    )


# ---------------------------------------------------------------------------
# q_explode_outer
# ---------------------------------------------------------------------------

_EXPLODE_OUTER_SQL = """
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents
    ),
    arr AS (
        SELECT doc_id, list_filter(toks, t -> len(t) > 9) AS longs
        FROM tok
    )
    SELECT a.doc_id, len(a.longs) AS n_longs, u.long_tok
    FROM arr a
    LEFT JOIN (SELECT doc_id, UNNEST(longs) AS long_tok FROM arr) u
      ON a.doc_id = u.doc_id
"""


@query("q_explode_outer", oracle=_EXPLODE_OUTER_SQL)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer null semantics: fan out each document's long tokens
    (> 9 chars) but KEEP documents whose filtered array is empty as a
    single null row — the row-preserving lateral that plain explode
    silently drops (losing rows in a fan-out is a classic silent-data-loss
    bug in ETL). DuckDB expresses the same semantics as a LEFT JOIN
    against the UNNEST. Narrow 1→N projection, no shuffle.
    """
    from rpa_etl_spark.operators import textstats as TS

    toks = TS.tokens(F.col("text"))
    longs = F.filter(toks, lambda t: F.length(t) > 9)
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", longs.alias("longs"))
        .select(
            "doc_id",
            F.size("longs").alias("n_longs"),
            F.explode_outer("longs").alias("long_tok"),
        )
    )


# ---------------------------------------------------------------------------
# q_histogram
# ---------------------------------------------------------------------------

_HIST_BINS = 20
_HIST_WIDTH = 30.0  # events.value spans [0, ~560]

_HISTOGRAM_SQL = f"""
    SELECT event_type,
           CAST(LEAST(FLOOR(value / {_HIST_WIDTH}), {_HIST_BINS - 1}) AS INTEGER)
               AS bucket,
           CAST(LEAST(FLOOR(value / {_HIST_WIDTH}), {_HIST_BINS - 1}) * {_HIST_WIDTH}
               AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
"""


@query("q_histogram", oracle=_HISTOGRAM_SQL)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type — the data-profiling primitive
    behind every distribution dashboard. Binning is plain arithmetic
    (floor of one IEEE division, top bin clamped) rather than an
    engine-specific width_bucket, so both engines bin identically at any
    value, including exact bin edges. One low-cardinality groupBy with
    map-side partial aggregation — at 100 TB the shuffle carries
    |types| x {_HIST_BINS} partial counts per mapper, not rows.
    """
    ev = load(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / _HIST_WIDTH), F.lit(_HIST_BINS - 1)
    ).cast("int")
    return (
        ev.select("event_type", bucket.alias("bucket"))
        .withColumn("bucket_lo", (F.col("bucket") * _HIST_WIDTH).cast("double"))
        .groupBy("event_type", "bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# q_corr_stats
# ---------------------------------------------------------------------------

_CORR_SQL = """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
               AS pearson_r
    FROM m
"""


@query("q_corr_stats", oracle=_CORR_SQL)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (quantity vs extended price per return flag)
    with order-independent determinism: the five moment sums accumulate
    in EXACT decimal arithmetic and only the final closed-form r is IEEE
    double — `F.corr` would give a partition-order-dependent float at the
    9th decimal, which a hash comparison rejects. Same two-pass-free
    shape as q_outlier_zscore's moments: one low-cardinality groupBy,
    map-side partials, shuffle volume in partial aggregates.
    """
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    r = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    )
    return m.select("l_returnflag", "n", F.round(r, 6).alias("pearson_r"))


# ---------------------------------------------------------------------------
# q_url_parse
# ---------------------------------------------------------------------------

_URL_PARSE_SQL = """
    SELECT doc_id,
           source || '.example.com' AS host,
           '/corpus/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param,
           'https' AS scheme
    FROM documents
"""


@query("q_url_parse", oracle=_URL_PARSE_SQL)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (host / path / query parameter / scheme) via
    Spark's parse_url over URLs synthesized deterministically from table
    columns — the crawl-pipeline primitive behind domain filtering and
    URL-keyed dedup. The oracle is the INVERSE construction: it rebuilds
    each component directly from the source columns, so parse_url must
    exactly invert the synthesis (a wrong component boundary —
    query-string bleed into path, port into host — mismatches). Narrow
    per-row expressions, scan-speed at any scale; the natural 100 TB
    follow-on (groupBy host for per-domain quotas) is one
    low-cardinality shuffle.
    """
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/corpus/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("scheme"),
    )


# ---------------------------------------------------------------------------
# q_argmax
# ---------------------------------------------------------------------------

_ARGMAX_SQL = """
    WITH ranked AS (
        SELECT event_type, event_id, user_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) * 10000000 + event_id AS vrank
        FROM events
    )
    SELECT event_type,
           arg_max(event_id, vrank) AS top_event,
           arg_max(user_id, vrank) AS top_user,
           arg_min(event_id, ts)   AS first_event
    FROM ranked
    GROUP BY event_type
"""


@query("q_argmax", oracle=_ARGMAX_SQL)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max / arg-min aggregation (max_by/min_by): per event type, the
    event and user carrying the highest value and the earliest event —
    "whole-row-at-extremum" without a self-join or window. Determinism
    under ties: value is ranked through an integer composite
    (round(value*100), event_id) so two rows never compare equal — raw
    max_by on a tied double would return an arbitrary winner per run,
    which a hash comparison rejects. ts is unique per event in this data
    (min_by on it is safe). One low-cardinality groupBy, map-side
    partials; the classic replacement for the per-group top-1 window at
    100 TB (no sort, no window state).
    """
    ev = load(spark, sf_dir, "events")
    vrank = (
        F.round(F.col("value") * 100).cast("long") * 10000000 + F.col("event_id")
    )
    ranked = ev.select("event_type", "event_id", "user_id", "ts", vrank.alias("vrank"))
    return ranked.groupBy("event_type").agg(
        F.max_by("event_id", "vrank").alias("top_event"),
        F.max_by("user_id", "vrank").alias("top_user"),
        F.min_by("event_id", "ts").alias("first_event"),
    )


# ---------------------------------------------------------------------------
# q_time_weighted_avg
# ---------------------------------------------------------------------------

_TWA_SQL = """
    WITH seg AS (
        SELECT user_id,
               CAST(value AS DECIMAL(18,4)) AS v,
               date_diff('millisecond', ts,
                         LEAD(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) AS dur_ms
        FROM events
    )
    SELECT user_id,
           COUNT(dur_ms) AS n_segments,
           CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
           ROUND(CAST(SUM(v * dur_ms) AS DOUBLE) / SUM(dur_ms), 6)
               AS time_weighted_avg
    FROM seg
    WHERE dur_ms IS NOT NULL
    GROUP BY user_id
"""


@query("q_time_weighted_avg", oracle=_TWA_SQL)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average: each event's value is held until the user's
    next event, so the mean weights values by how long they were current
    — the correct aggregate for sampled gauges/sensor state, where a
    plain AVG over-counts bursts. Weights are integer milliseconds and
    value·duration accumulates in exact decimal, so the result is
    order-independent (one IEEE division at the end). Shape: one window
    and one groupBy sharing the user_id partitioning — a single shuffle
    of the fact, the per-entity floor.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,4)").alias("v"),
        (
            F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")
        ).alias("dur_ms"),
    ).where(F.col("dur_ms").isNotNull())
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dur_ms").alias("total_ms"),
        F.round(
            F.sum(F.col("v") * F.col("dur_ms")).cast("double") / F.sum("dur_ms"), 6
        ).alias("time_weighted_avg"),
    )


# ---------------------------------------------------------------------------
# q_zorder_code
# ---------------------------------------------------------------------------

_Z_BITS = 16
_Z_INTERLEAVE = " + ".join(
    f"(((a >> {i}) & 1) * {1 << (2 * i)}) + (((b >> {i}) & 1) * {1 << (2 * i + 1)})"
    for i in range(_Z_BITS)
)

_ZORDER_SQL = f"""
    WITH scaled AS (
        SELECT event_id,
               LEAST(CAST(FLOOR(GREATEST(LEAST(user_id / 200.0, 1.0), 0.0)
                                * {1 << _Z_BITS}) AS BIGINT), {(1 << _Z_BITS) - 1}) AS a,
               LEAST(CAST(FLOOR(GREATEST(LEAST(value / 600.0, 1.0), 0.0)
                                * {1 << _Z_BITS}) AS BIGINT), {(1 << _Z_BITS) - 1}) AS b
        FROM events
    )
    SELECT event_id, a, b, {_Z_INTERLEAVE} AS z
    FROM scaled
"""


@query("q_zorder_code", oracle=_ZORDER_SQL)
def q_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) curve codes for (user_id, value) — the clustering
    key behind `operators/zorder.py::write_zordered` (whose file-skipping
    payoff is measured in tests/test_zorder.py), here oracle-checked
    bit-for-bit: DuckDB re-derives the 2x16-bit interleave with explicit
    shift/mask arithmetic over the same scaled inputs. Scaling floors
    (never rounds) in both engines so boundary values land in the same
    bucket. Pure bit expressions, no shuffle.
    """
    from rpa_etl_spark.operators.zorder import morton2

    ev = load(spark, sf_dir, "events")
    from rpa_etl_spark.operators.zorder import _scale_to_bits

    a = _scale_to_bits(F.col("user_id"), F.lit(0.0), F.lit(200.0), _Z_BITS)
    b = _scale_to_bits(F.col("value"), F.lit(0.0), F.lit(600.0), _Z_BITS)
    return ev.select(
        "event_id",
        a.alias("a"),
        b.alias("b"),
        morton2(F.col("user_id"), 0.0, 200.0, F.col("value"), 0.0, 600.0).alias("z"),
    )


# ---------------------------------------------------------------------------
# q_wordcount
# ---------------------------------------------------------------------------

_WORDCOUNT_SQL = """
    WITH tok AS (
        SELECT UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
    ),
    counts AS (
        SELECT word, COUNT(*) AS n FROM tok WHERE word <> '' GROUP BY word
    )
    SELECT word, n FROM counts
    ORDER BY n DESC, word
    LIMIT 20
"""


@query("q_wordcount", oracle=_WORDCOUNT_SQL)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical distributed aggregation: corpus-wide token counts,
    top-20 (count-desc, word tiebreak so the cut is deterministic).
    explode → groupBy(word) with map-side partial counts → TakeOrdered
    top-k (no global sort — the limit pushes into the shuffle read). At
    100 TB this is the vocabulary-building pass of a tokenizer pipeline;
    the groupBy key is Zipf-skewed, which is exactly what partial
    aggregation absorbs (hot words combine per mapper before the
    exchange).
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q_mode
# ---------------------------------------------------------------------------

_MODE_SQL = """
    WITH counts AS (
        SELECT lang, source, COUNT(*) AS n
        FROM documents GROUP BY lang, source
    ),
    ranked AS (
        SELECT lang, source, n,
               n * 1000 + (100 - CAST(SUBSTRING(source, 4) AS BIGINT)) AS tiebreak
        FROM counts
    )
    SELECT lang,
           arg_max(source, tiebreak) AS modal_source,
           MAX(n) AS modal_count
    FROM ranked
    GROUP BY lang
"""


@query("q_mode", oracle=_MODE_SQL)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent categorical value) per group: each language's
    most common source, via two-level aggregation — count per (lang,
    source), then arg-max over counts with a deterministic tiebreak
    (lowest source number wins on equal counts; a bare mode() call would
    pick an arbitrary winner under ties and fail hash comparison). Two
    cheap shuffles, both on low-cardinality keys with map-side partials —
    no window, no sort of the fact.
    """
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    src_num = F.substring("source", 4, 10).cast("long")
    ranked = counts.withColumn("tiebreak", F.col("n") * 1000 + (100 - src_num))
    return ranked.groupBy("lang").agg(
        F.max_by("source", "tiebreak").alias("modal_source"),
        F.max("n").alias("modal_count"),
    )


# ---------------------------------------------------------------------------
# q_event_sequence
# ---------------------------------------------------------------------------

_SEQUENCE_SQL = """
    WITH seq AS (
        SELECT user_id,
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS s
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           length(s) AS n_events,
           CAST((length(s) - length(replace(s, 'vcp', ''))) / 3 AS BIGINT)
               AS n_direct_conversions,
           substring(s, 1, 10) AS first_10
    FROM seq
"""


@query("q_event_sequence", oracle=_SEQUENCE_SQL)
def q_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-sequence pattern matching (the batch core of
    MATCH_RECOGNIZE): each user's history collapses to a string of
    event-type initials in (ts, event_id) order — initials are unique
    across the five types — and patterns become string operations
    (here: count of immediate view→click→purchase triples, plus the
    opening 10 events). Spark orders in-row (array_sort over collected
    structs: one groupBy shuffle, no window sort); DuckDB uses its
    ordered string_agg. Per-user strings are bounded by events-per-user;
    at 100 TB a hot entity would cap the collect (slice after sort),
    same as q_array_agg's documented escape.
    """
    ev = load(spark, sf_dir, "events")
    item = F.struct(
        F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("i")
    )
    seq = (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(item)).alias("items"))
        .select(
            "user_id",
            F.concat_ws("", F.transform(F.col("items"), lambda x: x["i"])).alias("s"),
        )
    )
    s = F.col("s")
    return seq.select(
        "user_id",
        F.length(s).alias("n_events"),
        ((F.length(s) - F.length(F.replace(s, F.lit("vcp"), F.lit("")))) / 3)
        .cast("long")
        .alias("n_direct_conversions"),
        F.substring(s, 1, 10).alias("first_10"),
    )


# ---------------------------------------------------------------------------
# q_entropy
# ---------------------------------------------------------------------------

_ENTROPY_SQL = """
    WITH counts AS (
        SELECT lang, source, COUNT(*) AS n
        FROM documents GROUP BY lang, source
    ),
    tot AS (
        SELECT lang, SUM(n) AS total, COUNT(*) AS n_sources FROM counts GROUP BY lang
    )
    SELECT c.lang,
           t.n_sources,
           ROUND(-SUM((n / CAST(total AS DOUBLE))
                      * ln(n / CAST(total AS DOUBLE))), 6) AS entropy,
           ROUND(-SUM((n / CAST(total AS DOUBLE))
                      * ln(n / CAST(total AS DOUBLE))) / ln(t.n_sources), 6)
               AS normalized_entropy
    FROM counts c JOIN tot t ON c.lang = t.lang
    GROUP BY c.lang, t.n_sources
"""


@query("q_entropy", oracle=_ENTROPY_SQL)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the source distribution per language — the
    corpus-diversity diagnostic (a language fed by one crawler scores 0,
    a uniform mix scores ln(k); normalized to [0,1] by ln(n_sources)).
    Ratios derive from exact integer counts, so the per-term values are
    identical across engines; the final sum is a handful of doubles whose
    ordering noise sits ~1e-15, far inside the round(6) tolerance. Two
    low-cardinality aggregations + one tiny join — nothing scales with
    row count past the first partial-aggregated shuffle.
    """
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("lang").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_sources")
    )
    p = F.col("n") / F.col("total").cast("double")
    joined = counts.join(tot, "lang")
    return joined.groupBy("lang", "n_sources").agg(
        F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        F.round(
            -F.sum(p * F.log(p)) / F.log(F.col("n_sources").cast("double")), 6
        ).alias("normalized_entropy"),
    )


# ---------------------------------------------------------------------------
# q_set_ops_all
# ---------------------------------------------------------------------------

_SET_ALL_SQL = """
    WITH a AS (
        SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem WHERE l_returnflag = 'R'
    ),
    b AS (
        SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem WHERE l_returnflag = 'A'
    )
    SELECT 'intersect_all' AS tag, q, COUNT(*) AS n
    FROM (SELECT q FROM a INTERSECT ALL SELECT q FROM b) GROUP BY q
    UNION ALL
    SELECT 'except_all' AS tag, q, COUNT(*) AS n
    FROM (SELECT q FROM a EXCEPT ALL SELECT q FROM b) GROUP BY q
"""


@query("q_set_ops_all", oracle=_SET_ALL_SQL)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations: INTERSECT ALL keeps min(m, n)
    copies of each value and EXCEPT ALL keeps max(m − n, 0) — the
    duplicate-preserving semantics the DISTINCT variants (q_set_ops)
    erase, and the ones reconciliation jobs actually need ("how many
    shipments remain unmatched", not "which values appear"). Catalyst
    plans both as aggregate-count + generate (no sort); the trailing
    per-value counts keep the declared output compact. One shuffle per
    side on the value key.
    """
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long").alias("q")
    a = li.where(F.col("l_returnflag") == "R").select(q)
    b = li.where(F.col("l_returnflag") == "A").select(q)
    inter = (
        a.intersectAll(b)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("tag"), "q", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("tag"), "q", "n")
    )
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# q_try_arith
# ---------------------------------------------------------------------------

_TRY_ARITH_SQL = """
    SELECT o_orderkey,
           CASE WHEN CAST(o_orderkey AS HUGEINT) * 4611686018427387904
                     BETWEEN -9223372036854775808 AND 9223372036854775807
                THEN o_orderkey * 4611686018427387904
                ELSE NULL END AS big_product,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_orderkey // (o_orderkey % 7) END AS guarded_div,
           TRY_CAST('x' || CAST(o_orderkey AS VARCHAR) AS BIGINT) AS bad_cast
    FROM orders
    WHERE o_orderkey <= 100
"""


@query("q_try_arith", oracle=_TRY_ARITH_SQL)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-tolerant arithmetic: this engine runs with ANSI ON
    (overflow and bad casts THROW), so dirty-data paths must use the
    try_* family — try_multiply nulls an int64 overflow, try_divide nulls
    division by zero, try_cast nulls an unparseable string. DuckDB has no
    try_multiply, so the oracle proves the semantics independently:
    it computes the product in HUGEINT and nulls results outside the
    int64 range, and guards the zero divisor with CASE. Narrow
    expressions; the point is semantic, not planar.
    """
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        F.try_multiply(k, F.lit(4611686018427387904).cast("long")).alias("big_product"),
        F.try_divide(k, k % 7).cast("long").alias("guarded_div"),
        F.try_to_number(
            F.concat(F.lit("x"), k.cast("string")), F.lit("999999")
        ).cast("bigint").alias("bad_cast"),
    )


# ---------------------------------------------------------------------------
# q_not_in_null_semantics
# ---------------------------------------------------------------------------

_NOT_IN_SQL = """
    WITH probe AS (
        SELECT c_custkey FROM customer
    ),
    sub_with_null AS (
        SELECT o_custkey FROM orders WHERE o_orderkey <= 1000
        UNION ALL
        SELECT NULL
    )
    SELECT 'not_in' AS formulation,
           (SELECT COUNT(*) FROM probe
            WHERE c_custkey NOT IN (SELECT o_custkey FROM sub_with_null)) AS n
    UNION ALL
    SELECT 'not_exists' AS formulation,
           (SELECT COUNT(*) FROM probe p
            WHERE NOT EXISTS (SELECT 1 FROM sub_with_null s
                              WHERE s.o_custkey = p.c_custkey)) AS n
"""


@query("q_not_in_null_semantics", oracle=_NOT_IN_SQL)
def q_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic three-valued-logic trap, engine-checked: NOT IN
    against a subquery containing a NULL returns ZERO rows (every
    comparison is UNKNOWN), while NOT EXISTS with an equality correlate
    returns the real anti-join count. Both formulations run as SQL text
    so Catalyst's null-aware anti-join machinery is exercised; the oracle
    runs the identical text on DuckDB, so both engines must agree on both
    counts. Operationally this is why every anti-join in this repo uses
    left_anti (NOT EXISTS semantics), never NOT IN on nullable keys.
    """
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_NOT_IN_SQL)


# ---------------------------------------------------------------------------
# q_daily_kpis
# ---------------------------------------------------------------------------

_DAILY_KPIS_SQL = """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS dau,
           CAST(ROUND(SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(value AS DECIMAL(18,2))
                               ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
               AS revenue,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 / CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS DOUBLE), 6) AS purchase_per_view
    FROM events
    GROUP BY CAST(ts AS DATE)
"""


@query("q_daily_kpis", oracle=_DAILY_KPIS_SQL)
def q_daily_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical daily dashboard rollup in ONE pass: event volume,
    DAU (exact distinct), decimal-exact purchase revenue, error count,
    and purchase-per-view ratio — five conditional aggregates sharing a
    single groupBy(day) scan instead of five separate queries. At 100 TB
    the only non-trivial member is the exact DAU (distinct shuffle); the
    documented swap is approx_count_distinct or the mergeable HLL
    sketches of q_hll_sketch_merge when the rollup must re-aggregate to
    weeks/months without rescans.
    """
    ev = load(spark, sf_dir, "events")
    typ = F.col("event_type")
    zero = F.lit(0).cast("decimal(18,2)")
    purchase_val = F.when(typ == "purchase", F.col("value").cast("decimal(18,2)")).otherwise(zero)
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("dau"),
            F.round(F.sum(purchase_val), 2).cast("double").alias("revenue"),
            F.sum((typ == "error").cast("int")).alias("n_errors"),
            F.round(
                F.sum((typ == "purchase").cast("int"))
                / F.sum((typ == "view").cast("int")).cast("double"),
                6,
            ).alias("purchase_per_view"),
        )
    )


# ---------------------------------------------------------------------------
# q_percentile_disc
# ---------------------------------------------------------------------------

_PCT_DISC_SQL = """
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90
    FROM events
    GROUP BY event_type
"""


@query("q_percentile_disc", oracle=_PCT_DISC_SQL)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles: the smallest actual data value whose
    cumulative fraction reaches p — always a real observation, never the
    interpolated midpoint the continuous variant (q_quantiles) returns.
    The distinction matters whenever the value must exist (an actual
    latency sample, an actual price). Spark has no percentile_disc
    aggregate, so the standard formulation is cume_dist over a
    per-group-ordered window, then the min value at or past each
    threshold — one partitioned sort, three thresholds from the same
    pass; DuckDB's native quantile_disc is the independent check.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    cd = ev.withColumn("cd", F.cume_dist().over(w))
    aggs = [
        F.min(F.when(F.col("cd") >= p, F.col("value"))).alias(name)
        for p, name in ((0.25, "p25"), (0.50, "p50"), (0.90, "p90"))
    ]
    return cd.groupBy("event_type").agg(*aggs)


@query(
    "q_table_time_travel",
    oracle="""
    SELECT CAST(0 AS INT) AS version, 'create' AS kind,
           COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents WHERE doc_id < 50
    UNION ALL
    SELECT CAST(1 AS INT), 'append', COUNT(*), CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id < 80
    UNION ALL
    SELECT CAST(2 AS INT), 'overwrite', COUNT(*), CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id < 80 AND doc_id % 3 <> 0
    UNION ALL
    SELECT CAST(3 AS INT), 'delete', COUNT(*), CAST(SUM(doc_id) AS BIGINT)
    FROM documents
    WHERE doc_id < 80 AND doc_id % 3 <> 0 AND doc_id % 5 <> 0
    UNION ALL
    SELECT CAST(4 AS INT), 'merge', COUNT(*), CAST(SUM(doc_id) AS BIGINT)
    FROM documents
    WHERE (doc_id < 80 AND doc_id % 3 <> 0 AND doc_id % 5 <> 0)
       OR doc_id < 20
    """,
)
def q_table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAKEHOUSE SEMANTICS under the external oracle (round-8 verdict
    stretch #8): a snapshot-isolated commit-log table format over plain
    parquet (operators/tablefmt.py — full-manifest log, link(2)-atomic
    commit arbitration, optimistic concurrency, time travel). The query
    runs a real five-commit lifecycle — create (docs < 50), append
    (50..79), an atomic OVERWRITE dropping every doc_id % 3 == 0, then
    (round 11) a row-level copy-on-write DELETE of doc_id % 5 == 0 and
    a MERGE upserting doc_id < 20 (matched ids whole-row replace;
    delete-removed ids under 20 re-INSERT, which is what makes the
    merge observable on a single-column table) — and reads ALL FIVE
    snapshots back BY VERSION through ``snapshot_read``; the oracle
    states each snapshot's row count and id sum from the source table.
    A torn commit, a non-isolated read, a lost append, wrong
    time-travel resolution, or a DELETE/MERGE that touches the wrong
    rows/files changes a version's aggregate and hash-mismatches.
    (Concurrent-writer serialization and the file-granular COW property
    are gated in tests/test_tablefmt.py — multi-process races are not
    expressible as a deterministic declared query.) Plan: five tiny
    parquet writes + five explicit-file-list scans — Catalyst sees
    plain multi-file parquet scans, pushdown intact; the delete's
    affected-file scan and the merge's key semi-join are themselves
    pushdown-eligible."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select("doc_id")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_")
    try:
        TF.create_table(docs.where(F.col("doc_id") < 50), path)
        TF.append(
            docs.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 80)), path
        )
        TF.overwrite(
            docs.where((F.col("doc_id") < 80) & (F.col("doc_id") % 3 != 0)),
            path,
        )
        TF.delete_where(spark, path, "doc_id % 5 = 0")
        TF.merge_into(
            spark, path, docs.where(F.col("doc_id") < 20).select("doc_id"),
            on=["doc_id"],
        )
        hist = {h["version"]: h["kind"] for h in TF.history(path)}
        # the per-version aggregates are BOUNDED BY CONSTRUCTION (one row
        # per snapshot): collect them eagerly so the temp table can be
        # removed here rather than leaking a directory per invocation
        # (round-9 review) — the snapshot scans themselves still run
        # distributed; only five aggregate rows reach the driver.
        # Round 14 (guide §2.6): the five snapshots aggregate in ONE
        # job — a union of single-row aggregates — instead of five
        # sequential collect round-trips; the five explicit-file-list
        # scans now overlap on the executors.
        from functools import reduce

        per_v = [
            TF.snapshot_read(spark, path, version=v)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("doc_id").alias("sum_doc_id"),
            )
            .select(F.lit(v).alias("v"), "n_docs", "sum_doc_id")
            for v in (0, 1, 2, 3, 4)
        ]
        got = {
            r["v"]: r
            for r in reduce(lambda a, b: a.unionByName(b), per_v).collect()
        }
        rows = [
            (v, hist[v], got[v]["n_docs"], got[v]["sum_doc_id"])
            for v in (0, 1, 2, 3, 4)
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "version int, kind string, n_docs bigint, sum_doc_id bigint"
    )


@query(
    "q_table_schema_evolution",
    oracle="""
    SELECT CAST(0 AS INT) AS version, 'own' AS read_through,
           'struct<doc_id:int,score:float>' AS schema_str,
           COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(doc_id % 100) AS BIGINT) AS sum_score,
           CAST(0 AS BIGINT) AS n_lang
    FROM documents WHERE doc_id < 40
    UNION ALL
    SELECT CAST(0 AS INT), 'evolved',
           'struct<doc_id:bigint,score:double,lang:string>',
           COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(SUM(doc_id % 100) AS BIGINT), CAST(0 AS BIGINT)
    FROM documents WHERE doc_id < 40
    UNION ALL
    SELECT CAST(1 AS INT), 'evolved',
           'struct<doc_id:bigint,score:double,lang:string>',
           COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(SUM(doc_id % 100) AS BIGINT),
           CAST(SUM(CASE WHEN doc_id >= 40 THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents WHERE doc_id < 70
    UNION ALL
    SELECT CAST(2 AS INT), 'renamed',
           'struct<doc_id:bigint,quality:double,lang:string>',
           COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(SUM(doc_id % 100) AS BIGINT),
           CAST(SUM(CASE WHEN doc_id >= 40 THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents WHERE doc_id < 70
    UNION ALL
    SELECT CAST(3 AS INT), 'dropped',
           'struct<doc_id:bigint,quality:double>',
           COUNT(*), CAST(SUM(doc_id) AS BIGINT),
           CAST(SUM(doc_id % 100) AS BIGINT), CAST(0 AS BIGINT)
    FROM documents WHERE doc_id < 70
    """,
)
def q_table_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on the commit-log table format under the external
    oracle (round-9 verdict ask #5): version 0 is created narrow
    (doc_id INT, score FLOAT); version 1 appends with doc_id widened to
    BIGINT, score widened to DOUBLE, and a NEW lang column. The query
    reads back three ways — v0 in its own schema, v0 THROUGH the evolved
    schema (added column null, widened types cast up), and the evolved
    head (whose files span BOTH write-time schemas, so the read must
    group files by schema id, scan each group with the schema it was
    written under, and align) — and emits each read's schema string plus
    exact aggregates. A wrong merge (narrowing, column loss), a stale
    schema on the through-read, a misaligned union, or a broken
    old-snapshot read changes schema_str or an aggregate and
    hash-mismatches. Widening legality itself is gated in
    tests/test_tablefmt.py (cross-family changes raise
    SchemaEvolutionError).

    Round 13 extends the lifecycle with the METADATA-ONLY schema verbs:
    v2 RENAMES score to quality and v3 DROPS lang — both pure-metadata
    commits over stable field ids (no data rewrite; reads align files
    by id, so BOTH write-time schemas' files serve the renamed column,
    and the dropped column disappears at head while old snapshots keep
    it). Wrong id plumbing surfaces as a schema_str or aggregate
    mismatch. Aggregates are bounded by construction (one
    row per read); collected eagerly so the temp table is removed, as
    q_table_time_travel does."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_evo_")
    try:
        TF.create_table(
            docs.where(F.col("doc_id") < 40).select(
                F.col("doc_id").cast("int").alias("doc_id"),
                (F.col("doc_id") % 100).cast("float").alias("score"),
            ),
            path,
        )
        TF.append(
            docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 70)).select(
                F.col("doc_id"),
                (F.col("doc_id") % 100).cast("double").alias("score"),
                F.col("lang"),
            ),
            path,
        )
        # round 13: RENAME then DROP without rewriting a byte — pure
        # metadata commits over stable field ids; the renamed read must
        # serve BOTH write-time schemas' files under the new name, and
        # the drop must hide lang everywhere at head
        TF.rename_column(path, "score", "quality")
        TF.drop_column(path, "lang")
        reads = [
            (0, "own", TF.snapshot_read(spark, path, 0)),
            (0, "evolved", TF.snapshot_read(spark, path, 0, schema_version=1)),
            (1, "evolved", TF.snapshot_read(spark, path, 1)),
            (2, "renamed", TF.snapshot_read(spark, path, 2)),
            (3, "dropped", TF.snapshot_read(spark, path, 3)),
        ]
        # Round 14 (guide §2.6): the five per-read aggregates run in ONE
        # union-of-aggregates job instead of five sequential collect
        # round-trips (a lang-less read contributes a literal 0 n_lang,
        # exactly the value the loop form emitted for it); schema_str
        # stays driver-side plan metadata.
        from functools import reduce

        per_read = []
        for idx, (version, through, df) in enumerate(reads):
            scol = "quality" if "quality" in df.columns else "score"
            aggs = [
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("doc_id").cast("long")).alias("sum_doc_id"),
                F.sum(F.col(scol).cast("long")).alias("sum_score"),
            ]
            if "lang" in df.columns:
                aggs.append(F.count("lang").alias("n_lang"))
            agg_df = df.agg(*aggs)
            if "lang" not in df.columns:
                agg_df = agg_df.withColumn(
                    "n_lang", F.lit(0).cast("long"))
            per_read.append(agg_df.select(
                F.lit(idx).alias("i"),
                "n_docs", "sum_doc_id", "sum_score", "n_lang"))
        got = {
            r["i"]: r
            for r in reduce(lambda a, b: a.unionByName(b), per_read).collect()
        }
        rows = [
            (
                version,
                through,
                df.schema.simpleString(),
                got[idx]["n_docs"],
                got[idx]["sum_doc_id"],
                got[idx]["sum_score"],
                got[idx]["n_lang"],
            )
            for idx, (version, through, df) in enumerate(reads)
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "version int, read_through string, schema_str string, "
        "n_docs bigint, sum_doc_id bigint, sum_score bigint, n_lang bigint",
    )


@query(
    "q_table_pruned_scan",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(4 AS INT) AS files_total,
           TRUE AS pruned
    FROM documents WHERE doc_id < 10
    """,
)
def q_table_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST-LEVEL FILE SKIPPING under the external oracle (round-11
    verdict #1): the table format records per-file min/max/null-count
    statistics in every manifest entry (operators/fileskip.py, footer
    -derived at write time), and ``snapshot_read(where=...)`` prunes
    non-overlapping files BEFORE building the Spark scan. The query
    writes the documents table range-clustered into 4 files
    (repartitionByRange on doc_id — each file owns a quarter of the id
    space), runs a selective predicate through the pruned read, and
    emits the aggregates PLUS the skipping evidence: ``files_total``
    from the manifest and ``pruned`` = the Spark scan actually opened
    fewer files than the snapshot holds (df.inputFiles() — the physical
    file list Catalyst was handed, not a claim). Wrong stats, a wrong
    interval evaluation (a file skipped that held matching rows), or
    pruning that never fires changes an aggregate or the flag and
    hash-mismatches. The exact open-file count is additionally gated in
    tests/test_tablefmt.py (pruned_file_counts == len(inputFiles())).

    Scale shape: skipping is driver-side arithmetic over the manifest —
    at 100 TB a selective scan on a clustered column opens the
    overlapping handful of files instead of handing Catalyst the whole
    snapshot's file list; parquet row-group pruning then works WITHIN
    the survivors. This is the stats layer zorder.py presupposes
    (bounds "from table stats")."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_prune_")
    try:
        TF.create_table(docs.repartitionByRange(4, "doc_id"), path)
        pred = "doc_id < 10"
        pruned = TF.snapshot_read(spark, path, where=pred)
        files_scanned = len(pruned.inputFiles())
        files_total = len(TF.read_manifest(path, 0)["files"])
        agg = pruned.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_n_chars"),
        ).collect()[0]
        row = (
            agg["n_docs"], agg["sum_n_chars"], files_total,
            bool(files_scanned < files_total),
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        [row],
        "n_docs bigint, sum_n_chars bigint, files_total int, pruned boolean",
    )


@query(
    "q_table_time_pruned_scan",
    oracle="""
    SELECT COUNT(*) AS n_events,
           CAST(COALESCE(SUM(user_id), 0) AS BIGINT) AS sum_user,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(8 AS INT) AS files_total,
           TRUE AS pruned
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-08 00:00:00'
    """,
)
def q_table_time_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE FILE SKIPPING under the external oracle (round-12
    verdict #1): per-file statistics now cover TIMESTAMP columns —
    stored as order-faithful epoch-micros int64 read from the parquet
    footer's raw encoding (operators/fileskip.py `_typed_bounds`; the
    write path pins TIMESTAMP_MICROS because Spark's default INT96
    carries no stats at all, tablefmt.py `_write_data_files`) — so the
    dominant selective predicate on a 100 TB event table, a time-range
    filter, prunes files before the Spark scan is built. TIMESTAMP
    literals are canonicalized at parse time in the session time zone
    (non-padded parts, optional offsets, DST-ambiguous wall times
    degrade to keep — never a wrong skip).

    The query writes the events table range-clustered on ``ts`` into 8
    files (each owns ~3.75 days of the 30-day range), reads a 3-day
    window through ``snapshot_read(where=...)``, and emits the window's
    aggregates PLUS the skipping evidence: ``files_total`` from the
    manifest and ``pruned`` = the Spark scan actually opened fewer
    files than the snapshot holds (``df.inputFiles()`` — the physical
    list Catalyst was handed, not a claim). Wrong micros encoding, a
    time-zone slip, or pruning that never fires changes an aggregate or
    the flag and hash-mismatches against DuckDB evaluating the same
    TIMESTAMP literals. Decimal/date pruning of the same machinery is
    matrix- and fuzz-gated in tests/test_fileskip.py.

    Scale shape: skipping is driver-side arithmetic over the manifest —
    a 3-day dashboard query on a year-partitioned 100 TB events table
    opens the overlapping handful of files, not the snapshot; parquet
    row-group pruning then works WITHIN the survivors."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    events = load(spark, sf_dir, "events").select("ts", "user_id",
                                                  "event_type")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_timeprune_")
    try:
        TF.create_table(events.repartitionByRange(8, "ts"), path)
        pred = ("ts >= TIMESTAMP '2024-01-05 00:00:00' "
                "AND ts < TIMESTAMP '2024-01-08 00:00:00'")
        pruned = TF.snapshot_read(spark, path, where=pred)
        files_scanned = len(pruned.inputFiles())
        files_total = len(TF.read_manifest(path, 0)["files"])
        agg = pruned.agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_id").alias("sum_user"),
            F.countDistinct("event_type").alias("n_types"),
        ).collect()[0]
        row = (
            agg["n_events"], agg["sum_user"], agg["n_types"], files_total,
            bool(files_scanned < files_total),
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        [row],
        "n_events bigint, sum_user bigint, n_types bigint, "
        "files_total int, pruned boolean",
    )


@query(
    "q_table_update",
    oracle="""
    WITH upd AS (
        SELECT doc_id, lang,
               CASE WHEN lang = 'de' THEN n_chars + 1000 ELSE n_chars END
                   AS n_chars
        FROM documents
    ),
    fin AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id < 50 THEN 0 ELSE n_chars END AS n_chars
        FROM upd
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           (SELECT COUNT(*) FROM documents WHERE lang = 'de') AS n_upd,
           (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
            FROM documents WHERE lang = 'de') AS sum_pre,
           (SELECT CAST(COALESCE(SUM(n_chars + 1000), 0) AS BIGINT)
            FROM documents WHERE lang = 'de') AS sum_post,
           (SELECT COUNT(*) FROM documents WHERE doc_id < 50) AS n_replaced
    FROM fin GROUP BY lang
    """,
)
def q_table_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-LEVEL UPDATE + SELECTIVE OVERWRITE under the external
    oracle (round-12 verdict #4 — the two write verbs a lakehouse user
    still couldn't express): ``update_where(path, predicate, SET)``
    rewrites only the files containing matching rows, applying the SET
    expressions to exactly those rows (SQL UPDATE semantics — NULL
    predicate keeps, assignments see old values), and
    ``overwrite(df, where=...)`` (Delta's ``replaceWhere``) atomically
    replaces exactly the predicate's rows with the frame's — both COW
    at file granularity over the fileskip-pruned discovery scan.

    Lifecycle: create documents(doc_id, lang, n_chars); UPDATE SET
    n_chars = n_chars + 1000 WHERE lang = 'de'; replaceWhere
    doc_id < 50 with the same ids at n_chars = 0. Emits the FINAL
    per-lang aggregates plus change-feed evidence (same on every row):
    the update's pre-/post-image counts and sums from the v1 sidecar
    (round-12 verdict #6) and the replace's insert count from the v2
    sidecar. A wrong row updated, a SET leaking outside the predicate,
    a replace touching rows outside its region, or missing/wrong
    update images changes a value and hash-mismatches against DuckDB
    recomputing the lifecycle with CASE expressions.

    Scale shape: both verbs discover affected files via manifest
    statistics first (a clustered predicate opens only overlapping
    files), rewrite by explicit file list, and write change sidecars
    sized by the CHANGE, not the table."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang",
                                                   "n_chars")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_upd_")
    try:
        TF.create_table(docs, path)
        TF.update_where(spark, path, "lang = 'de'",
                        {"n_chars": "n_chars + 1000"})
        replacement = docs.where(F.col("doc_id") < 50).withColumn(
            "n_chars", F.lit(0).cast("long")
        )
        TF.overwrite(replacement, path, where="doc_id < 50")

        # Round 14 (guide §2.6): the three sequential read jobs (v1
        # change-feed aggregate, v2 insert count, final per-lang
        # aggregate) fuse into ONE job — the two single-row change-feed
        # aggregates join onto the per-lang rows as 1-row broadcasts,
        # the distributed rendering of the oracle's scalar subqueries.
        ev1 = TF.read_changes(spark, path, 1, 1).agg(
            F.coalesce(
                F.sum(F.when(F.col("_change_kind") == "update_preimage",
                             F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).alias("n_upd"),
            F.coalesce(
                F.sum(F.when(F.col("_change_kind") == "update_preimage",
                             F.col("n_chars"))), F.lit(0)
            ).alias("sum_pre"),
            F.coalesce(
                F.sum(F.when(F.col("_change_kind") == "update_postimage",
                             F.col("n_chars"))), F.lit(0)
            ).alias("sum_post"),
        )
        ev2 = TF.read_changes(spark, path, 2, 2).agg(
            F.coalesce(
                F.sum(F.when(F.col("_change_kind") == "insert",
                             F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).cast("long").alias("n_replaced")
        )
        final = (
            TF.snapshot_read(spark, path)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_n_chars"),
            )
            .crossJoin(F.broadcast(ev1))
            .crossJoin(F.broadcast(ev2))
            .collect()
        )
        rows = [
            (r["lang"], r["n_docs"], r["sum_n_chars"],
             r["n_upd"], r["sum_pre"], r["sum_post"], r["n_replaced"])
            for r in final
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "lang string, n_docs bigint, sum_n_chars bigint, n_upd bigint, "
        "sum_pre bigint, sum_post bigint, n_replaced bigint",
    )


@query(
    "q_table_changes",
    oracle="""
    SELECT CAST(0 AS INT) AS version, 'create' AS kind,
           COUNT(*) AS n_ins,
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS sum_ins,
           CAST(0 AS BIGINT) AS n_upd_pre,
           CAST(0 AS BIGINT) AS sum_upd_pre,
           CAST(0 AS BIGINT) AS n_upd_post,
           CAST(0 AS BIGINT) AS sum_upd_post
    FROM documents WHERE doc_id < 50
    UNION ALL
    SELECT CAST(1 AS INT), 'append', COUNT(*),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT),
           0, 0, 0, 0
    FROM documents WHERE doc_id >= 50 AND doc_id < 80
    UNION ALL
    SELECT CAST(2 AS INT), 'delete', COUNT(*),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT),
           0, 0, 0, 0
    FROM documents WHERE FALSE
    UNION ALL
    SELECT CAST(3 AS INT), 'merge', COUNT(*),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT),
           (SELECT COUNT(*) FROM documents
            WHERE doc_id < 20 AND doc_id % 5 <> 0),
           (SELECT CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM documents
            WHERE doc_id < 20 AND doc_id % 5 <> 0),
           (SELECT COUNT(*) FROM documents
            WHERE doc_id < 20 AND doc_id % 5 <> 0),
           (SELECT CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM documents
            WHERE doc_id < 20 AND doc_id % 5 <> 0)
    FROM documents WHERE doc_id < 20 AND doc_id % 5 = 0
    """,
)
def q_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE-FEED (incremental) READ under the external oracle
    (round-11 verdict #4): ``read_changes`` serves every row ADDED in a
    version range — create/append new files straight from the commit
    log's ``added`` record, merge INSERTS from the change sidecar
    ``merge_into`` writes — the Delta CDF essence, and the read side
    pairing the exactly-once ``streaming_append_sink``. The query runs
    a four-commit lifecycle on the documents table (create docs<50,
    append 50..79, COW-delete doc_id%5=0, merge docs<20) and emits ONE
    row per version with the feed's per-change-kind row counts and id
    sums: the create/append feeds are their committed rows (inserts),
    the DELETE feeds nothing (additions-only, stated), and the merge
    feeds precisely the ids the delete removed from under 20 as inserts
    PLUS — round-12 verdict #6 — the matched keys' UPDATE IMAGES
    (``update_preimage``/``update_postimage``, the Delta CDF shape,
    carried in the change sidecar's ``_ck`` column): exactly the
    surviving ids under 20. A feed that leaks updates as inserts,
    misses images, reads the wrong files, or mis-stamps versions
    changes a column and hash-mismatches. The
    exactly-once table-to-table replay loop is gated in
    tests/test_tablefmt.py (not SQL-expressible).

    Scale shape: each version's feed is one explicit-file-list scan
    over only that commit's NEW files — incremental cost proportional
    to change volume, never table size; the per-version aggregates are
    bounded (one row each) and collected eagerly so the temp table is
    removed (the q_table_time_travel pattern)."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select("doc_id")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_cdf_")
    try:
        TF.create_table(docs.where(F.col("doc_id") < 50), path)
        TF.append(
            docs.where((F.col("doc_id") >= 50) & (F.col("doc_id") < 80)), path
        )
        TF.delete_where(spark, path, "doc_id % 5 = 0")
        TF.merge_into(
            spark, path, docs.where(F.col("doc_id") < 20), on=["doc_id"]
        )
        hist = {h["version"]: h["kind"] for h in TF.history(path)}

        def _kind_agg(ck: str, suffix: str):
            is_k = F.col("_change_kind") == ck
            return [
                F.coalesce(
                    F.sum(F.when(is_k, F.lit(1)).otherwise(F.lit(0))),
                    F.lit(0),
                ).alias(f"n_{suffix}"),
                F.coalesce(
                    F.sum(F.when(is_k, F.col("doc_id"))), F.lit(0)
                ).alias(f"sum_{suffix}"),
            ]

        # coalesce: an EMPTY version's sums are 0, not NULL, so the
        # tiny-sf fixture (where the append range is empty) stays
        # NULL/NaN-fold-free cross-engine. Round 14 (guide §2.6): all
        # four versions' feeds aggregate in ONE union-of-aggregates job
        # instead of four sequential collect round-trips.
        from functools import reduce

        per_v = [
            TF.read_changes(spark, path, v, v)
            .agg(
                *_kind_agg("insert", "ins"),
                *_kind_agg("update_preimage", "upd_pre"),
                *_kind_agg("update_postimage", "upd_post"),
            )
            .select(F.lit(v).alias("v"), "*")
            for v in (0, 1, 2, 3)
        ]
        got = {
            r["v"]: r
            for r in reduce(lambda a, b: a.unionByName(b), per_v).collect()
        }
        rows = [
            (
                v, hist[v],
                got[v]["n_ins"], got[v]["sum_ins"],
                got[v]["n_upd_pre"], got[v]["sum_upd_pre"],
                got[v]["n_upd_post"], got[v]["sum_upd_post"],
            )
            for v in (0, 1, 2, 3)
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "version int, kind string, n_ins bigint, sum_ins bigint, "
        "n_upd_pre bigint, sum_upd_pre bigint, "
        "n_upd_post bigint, sum_upd_post bigint",
    )


@query(
    "q_table_zorder_scan",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           TRUE AS spans_shrank,
           TRUE AS pruned
    FROM documents WHERE doc_id < 25 AND n_chars < 300
    """,
)
def q_table_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ... ZORDER BY under the external oracle (round-11
    verdict #5 end-to-end): the documents table is created hash-
    SCATTERED (every file spans the full range of both columns — no
    accidental clustering), then ``optimize(cluster_by=[doc_id,
    n_chars])`` rewrites it along the 2-D Morton curve with bounds from
    the MANIFEST STATS (no extra data pass), and a 2-D box predicate
    runs through the pruned ``snapshot_read``. Emitted evidence:
    ``spans_shrank`` — the mean per-file min/max span (from the new
    manifest's stats) shrank on BOTH columns vs the scattered layout —
    and ``pruned`` — the box scan actually opened fewer files than the
    snapshot holds (df.inputFiles()). The aggregates prove the rewrite
    row-preserving AND the skip sound (a wrongly-skipped file would
    drop rows and hash-mismatch). The Morton interleave itself is
    bit-for-bit oracle-checked in q_zorder_code; exact span ratios and
    the 3-column path are gated in tests/test_zorder.py.

    Scale shape: one range shuffle + local sort at layout time buys
    every subsequent selective scan file-level skipping on EITHER
    column — the standard lakehouse OPTIMIZE…ZORDER trade. Pruning is
    driver-side arithmetic over the manifest; the curve keeps per-file
    ranges narrow in ALL clustered dimensions simultaneously, which a
    single-column sort cannot (SCALE.md §10g)."""
    import os as _os
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_z_")
    try:
        TF.create_table(docs.repartition(8), path)
        m0 = TF.read_manifest(path, 0)
        total_bytes = sum(
            _os.path.getsize(_os.path.join(path, e["path"]))
            for e in m0["files"]
        )
        # ~12 clustered output files: enough curve segments to cut both
        # dimensions at any fixture scale
        TF.optimize(
            spark, path, target_bytes=max(1, total_bytes // 12),
            cluster_by=["doc_id", "n_chars"],
        )
        m1 = TF.read_manifest(path, 1)

        def mean_span(m, col):
            spans = [
                e["stats"][col]["max"] - e["stats"][col]["min"]
                for e in m["files"]
            ]
            return sum(spans) / len(spans)

        spans_shrank = all(
            mean_span(m1, c) < mean_span(m0, c) for c in ("doc_id", "n_chars")
        )
        pred = "doc_id < 25 AND n_chars < 300"
        scan = TF.snapshot_read(spark, path, where=pred)
        pruned = len(scan.inputFiles()) < len(m1["files"])
        agg = scan.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
        ).collect()[0]
        row = (agg["n_docs"], agg["sum_doc_id"], spans_shrank, pruned)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        [row],
        "n_docs bigint, sum_doc_id bigint, spans_shrank boolean, "
        "pruned boolean",
    )


@query(
    "q_table_delete_dv",
    oracle="""
    SELECT CAST(0 AS INT) AS version,
           COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           TRUE AS no_rewrites
    FROM documents WHERE doc_id < 60
    UNION ALL
    SELECT CAST(1 AS INT), COUNT(*), CAST(SUM(doc_id) AS BIGINT), TRUE
    FROM documents WHERE doc_id < 60 AND doc_id % 3 <> 0
    UNION ALL
    SELECT CAST(2 AS INT), COUNT(*), CAST(SUM(doc_id) AS BIGINT), TRUE
    FROM documents WHERE doc_id < 60 AND doc_id % 3 <> 0 AND doc_id % 5 <> 0
    UNION ALL
    SELECT CAST(3 AS INT), COUNT(*), CAST(SUM(doc_id) AS BIGINT), TRUE
    FROM documents WHERE doc_id < 60 AND doc_id % 3 <> 0 AND doc_id % 5 <> 0
      AND doc_id % 2 <> 0
    """,
)
def q_table_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ DELETE via deletion vectors under the external
    oracle (round 12): ``delete_where(mode="dv")`` writes the matching
    rows' POSITIONS as a (file, pos) sidecar instead of rewriting data
    files — the Delta deletion-vectors / Iceberg positional-delete
    essence; reads apply the vector with an anti-join at scan time
    (``_metadata.row_index`` gives the stable in-file position). The
    query runs create (docs<60, range-clustered) → dv-delete %3=0 →
    dv-delete %5=0 (a SECOND vector on the same files — vectors UNION)
    and reads all three snapshots back by version; ``no_rewrites``
    asserts what makes this merge-on-read: both delete commits added
    ZERO data files and every surviving file entry carries forward from
    the create (the manifest's ``added`` record + file-set inclusion —
    structural evidence, not a claim). A wrong position, a lost union,
    a vector applied to the wrong file, or a phantom rewrite changes an
    aggregate or the flag and hash-mismatches. Interplay with
    COW/merge/optimize-materialization/vacuum is gated in
    tests/test_tablefmt.py.

    Scale shape: the write cost of a dv delete is DELETE-sized
    (positions, not file bytes) — the right trade for small frequent
    deletes against huge files (GDPR row erasure on a 100 TB table
    rewrites nothing); reads pay one delete-sized anti-join until
    OPTIMIZE materializes. The positions scan itself is stats-pruned
    and predicate-pushed like every other discovery."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select("doc_id")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_dv_")
    try:
        TF.create_table(
            docs.where(F.col("doc_id") < 60).repartitionByRange(4, "doc_id"),
            path,
        )
        TF.delete_where(spark, path, "doc_id % 3 = 0", mode="dv",
                        dv_rewrite_fraction=1.0)
        TF.delete_where(spark, path, "doc_id % 5 = 0", mode="dv",
                        dv_rewrite_fraction=1.0)
        # round-12 verdict #7: a delete whose deleted fraction crosses
        # ``dv_rewrite_fraction`` AUTO-MATERIALIZES the affected files
        # (rewritten clean in the same commit, vectors gone) — 0.0
        # forces it for every affected file, so the v3 gate below is
        # partitioning-independent
        TF.delete_where(spark, path, "doc_id % 2 = 0", mode="dv",
                        dv_rewrite_fraction=0.0)
        files = {
            v: {e["path"] for e in TF.read_manifest(path, v)["files"]}
            for v in (0, 1, 2, 3)
        }
        no_rewrites = (
            TF.read_manifest(path, 1)["added"] == []
            and TF.read_manifest(path, 2)["added"] == []
            and files[1] <= files[0]
            and files[2] <= files[1]
        )
        # materialization evidence: v3 added new (clean) files; entries
        # carried from v2 kept exactly their old vectors; every NEW
        # entry is vector-free
        m2_dv = {
            e["path"]: e.get("dv")
            for e in TF.read_manifest(path, 2)["files"]
        }
        m3 = TF.read_manifest(path, 3)
        materialized = (
            m3["added"] != []
            and all(
                (e.get("dv") == m2_dv[e["path"]])
                if e["path"] in m2_dv else not e.get("dv")
                for e in m3["files"]
            )
        )
        ok = no_rewrites and materialized
        # Round 14 (guide §2.6): the four snapshot aggregates run in ONE
        # union-of-aggregates job instead of four sequential collect
        # round-trips; the snapshot scans overlap on the executors.
        from functools import reduce

        per_v = [
            TF.snapshot_read(spark, path, version=v)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("doc_id"), F.lit(0)).alias("sum_doc_id"),
            )
            .select(F.lit(v).alias("v"), "n_docs", "sum_doc_id")
            for v in (0, 1, 2, 3)
        ]
        got = {
            r["v"]: r
            for r in reduce(lambda a, b: a.unionByName(b), per_v).collect()
        }
        rows = [
            (v, got[v]["n_docs"], got[v]["sum_doc_id"], ok)
            for v in (0, 1, 2, 3)
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "version int, n_docs bigint, sum_doc_id bigint, no_rewrites boolean",
    )


@query(
    "q_table_native_write",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           TRUE AS refused,
           TRUE AS stats_present
    FROM documents
    WHERE doc_id < 40
    """,
)
def q_table_native_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSTRAINT-BEARING NATIVE WRITES under the external oracle
    (round-13 verdict #1): ``df.write.format("tablefmt")`` must enforce
    CHECK constraints and collect footer stats INSIDE the executor
    write tasks — the constraint set is read once at plan time, each
    task validates its own Arrow batch with DuckDB before its shard
    lands, and the driver commit hook receives ready-made manifest
    entries (metadata-only; a 1 TB constrained append never re-reads
    data through the driver). The query creates a CHECK-constrained
    table (``n_chars >= 0``), lands the doc_id<40 slice in two native
    appends (split by parity), then attempts a VIOLATING native append:
    ``refused`` = the write raised naming the constraint AND the table
    row count is unchanged (no partial commit, no orphan rows).
    ``stats_present`` = every entry the two appends added carries
    footer min/max stats for both columns — the executor-collected
    stats actually reached the manifest, which is what makes natively
    written files prunable. The read-back goes through the NATIVE
    reader too (``spark.read.format("tablefmt")``), so the aggregates
    hash-check the whole native write→commit→read loop against DuckDB
    on the raw parquet. Unit gates (shard-level refusal before the file
    lands, plan-time constraint-set race → CommitConflict) live in
    tests/test_table_source.py.

    Scale shape: validation and stats are per-task, per-shard work that
    scales with executor count; the driver's commit is O(files) JSON
    arithmetic. CHECK constraints are row-local predicates, so
    shard-local validation IS whole-set validation."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF
    from rpa_etl_spark.streaming import table_source as TS

    TS.register(spark)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_native_")
    try:
        TF.create_table(docs.where(F.col("doc_id") < 0), path)  # schema only
        TF.add_constraint(spark, path, "nonneg", "n_chars >= 0")
        for parity in (0, 1):
            # coalesce (not repartition): same shard files, no round-robin
            # Exchange in front of the write tasks (r14, guide §2.1)
            (docs.where((F.col("doc_id") < 40)
                        & (F.col("doc_id") % 2 == parity))
             .coalesce(2)
             .write.format("tablefmt").option("path", path)
             .mode("append").save())
        n_before = TF.row_count(path)
        refused = False
        try:
            # literal SELECT, not createDataFrame(list): the list form
            # parallelizes 1 row into defaultParallelism slices — 32
            # Python write tasks for one row (31 empty); the LocalRelation
            # is a single task (measured 3.2 s → 0.9 s, r14)
            bad = spark.sql(
                "SELECT CAST(99999 AS BIGINT) AS doc_id, 'xx' AS lang, "
                "CAST(-5 AS BIGINT) AS n_chars")
            bad.write.format("tablefmt").option("path", path) \
                .mode("append").save()
        except Exception as e:  # noqa: BLE001 — the refusal IS the check
            refused = "nonneg" in str(e)
        refused = refused and TF.row_count(path) == n_before
        stats_present = True
        for v in (2, 3):  # the two native appends (v0 create, v1 constraint)
            m = TF.read_manifest(path, v)
            added = {e["path"]: e for e in m["files"]
                     if e["path"] in m["added"]}
            stats_present = stats_present and bool(added) and all(
                "doc_id" in e["stats"] and "n_chars" in e["stats"]
                and e["stats"]["doc_id"]["min"] is not None
                for e in added.values()
            )
        agg = (
            spark.read.format("tablefmt").option("path", path).load()
            .where(F.col("doc_id") < 40)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_n_chars"),
                F.countDistinct("lang").alias("n_langs"),
            ).collect()[0]
        )
        row = (agg["n_docs"], agg["sum_n_chars"], agg["n_langs"],
               bool(refused), bool(stats_present))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        [row],
        "n_docs bigint, sum_n_chars bigint, n_langs bigint, "
        "refused boolean, stats_present boolean",
    )


@query(
    "q_table_partitioned_scan",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           TRUE AS pruned,
           TRUE AS partition_scoped
    FROM documents
    WHERE lang IN ('en', 'zh')
    GROUP BY lang
    """,
)
def q_table_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-CLASS PARTITION COLUMNS under the external oracle
    (round-13 verdict #2): ``create_table(partition_by=["lang"])`` lays
    data out in hive-style ``lang=…/`` directories while keeping the
    partition column physically in every file, records each file's
    partition values in its manifest entry, and prunes WHOLE PARTITIONS
    in O(partitions) before any per-file stats arithmetic
    (fileskip.prune_entries's pv-group fast path; call-count gated in
    tests/test_tablefmt.py::test_partition_prune_is_o_partitions). The
    query creates the documents table partitioned by lang (plus an
    appended second slice, so partitions span multiple files and
    commits), reads ``lang IN ('en','zh')`` through the pruned
    snapshot, and emits per-lang aggregates PLUS structural evidence:
    ``pruned`` = the Spark scan opened fewer files than the snapshot
    holds (``df.inputFiles()``), ``partition_scoped`` = the opened file
    count equals EXACTLY the manifest entries whose recorded partition
    value is en/zh — the scan never opened a file of any other
    partition. A wrong pv record, a group check that prunes a matching
    partition, or a layout that routes rows to the wrong directory
    changes an aggregate or a flag and hash-mismatches.

    Scale shape: partition pruning is O(partitions) driver arithmetic —
    on a 10⁶-file, 10³-partition table a partition-scoped query prunes
    999 directories with 10³ group checks instead of 10⁶ per-file stats
    evaluations; footer-stats pruning still applies WITHIN surviving
    partitions, and the hive directory layout is what external tools
    (Delta/Iceberg readers, plain ``spark.read.parquet``) expect."""
    import shutil
    import tempfile

    from rpa_etl_spark.operators import tablefmt as TF

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_part_")
    try:
        half = docs.where(F.col("doc_id") % 2 == 0)
        rest = docs.where(F.col("doc_id") % 2 == 1)
        TF.create_table(half.repartition("lang"), path,
                        partition_by=["lang"])
        TF.append(rest.repartition("lang"), path)
        m = TF.read_manifest(path, 1)
        want_files = sum(
            1 for e in m["files"] if e["pv"]["lang"] in ("en", "zh"))
        pred = "lang IN ('en', 'zh')"
        pruned_df = TF.snapshot_read(spark, path, where=pred)
        files_scanned = len(pruned_df.inputFiles())
        files_total = len(m["files"])
        pruned = bool(files_scanned < files_total)
        partition_scoped = bool(files_scanned == want_files)
        rows = [
            (r["lang"], r["n_docs"], r["sum_n_chars"],
             pruned, partition_scoped)
            for r in pruned_df.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_n_chars"),
            ).collect()
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "lang string, n_docs bigint, sum_n_chars bigint, "
        "pruned boolean, partition_scoped boolean",
    )


@query(
    "q_table_sql",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           TRUE AS snapshot_isolated
    FROM documents
    WHERE doc_id < 200
    GROUP BY lang
    """,
)
def q_table_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-TEXT SURFACE over the table format under the external oracle
    (round-13 verdict #7): ``register_table(spark, name, path)`` makes
    a commit-log table queryable with plain ``spark.sql("SELECT … FROM
    name")`` — the entry point an analyst actually types — backed by
    the native snapshot source, so pushed filters, partition pruning
    and deletion vectors all apply under the SQL text. The view has
    SNAPSHOT-ISOLATION semantics: it pins the version current at
    registration. The query creates the table from the doc_id<200
    slice, registers the view, APPENDS the rest of the corpus, and
    runs the aggregation through ``spark.sql`` — the result must still
    be the registration-time snapshot (the oracle re-computes exactly
    the doc_id<200 slice in DuckDB; a view that leaked the later
    commit would change every aggregate and hash-mismatch).
    ``snapshot_isolated`` additionally gates the row counts both ways:
    the pinned view serves the old count while a RE-registration serves
    the new one. Unit gates (time-travel views, pushed-WHERE pruning)
    live in tests/test_table_source.py.

    Scale shape: the view is a name for a planned snapshot — queries
    over it plan with metadata-only file skipping exactly like the
    DataFrame path; re-registration is one manifest read."""
    import shutil
    import tempfile
    import uuid as _uuid

    from rpa_etl_spark.operators import tablefmt as TF
    from rpa_etl_spark.streaming import table_source as TS

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="rpa_etl_tablefmt_sql_")
    view = f"tfsql_{_uuid.uuid4().hex[:8]}"
    try:
        TF.create_table(docs.where(F.col("doc_id") < 200), path)
        n_v0 = TF.row_count(path)
        TS.register_table(spark, view, path)
        TF.append(docs.where(F.col("doc_id") >= 200), path)
        agg = spark.sql(
            f"SELECT lang, COUNT(*) AS n_docs, "
            f"SUM(n_chars) AS sum_n_chars FROM {view} GROUP BY lang"
        ).collect()
        # Round 14 (guide §2.6): the pinned view's COUNT(*) is the sum
        # of its per-lang group counts — same view, same snapshot, one
        # fewer sequential job than re-scanning for a separate COUNT
        pinned_n = sum(r["n_docs"] for r in agg)
        TS.register_table(spark, view, path)  # advance to the head
        head_n = spark.sql(
            f"SELECT COUNT(*) AS n FROM {view}").collect()[0]["n"]
        snapshot_isolated = bool(
            pinned_n == n_v0 and head_n == TF.row_count(path)
            and head_n > pinned_n
        )
        rows = [(r["lang"], r["n_docs"], r["sum_n_chars"],
                 snapshot_isolated) for r in agg]
    finally:
        try:
            spark.catalog.dropTempView(view)
        except Exception:  # noqa: BLE001 — registration may have failed
            pass
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "lang string, n_docs bigint, sum_n_chars bigint, "
        "snapshot_isolated boolean",
    )
