"""M2 — scalar-function parity queries (SURVEY.md §2.2: string/date/decimal/
array/map/json/hash/conditional categories).

These exercise the engine's function layer — the re-expression of the
reference's normalizer/parser/validator string work (P1-P11, X1-X4 in
SURVEY §2.1) — as JVM-side column expressions over the synthetic tables.
Everything stays inside whole-stage codegen; there are no Python UDFs in
any of these plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rpa_etl_spark.plans.common import dec, money
from rpa_etl_spark.registry import query
from rpa_etl_spark.tables import load, spread


@query(
    "q_string_funcs",
    oracle="""
    SELECT doc_id,
           UPPER(SUBSTR(text, 1, 20))                       AS head_uc,
           LENGTH(text)                                     AS text_len,
           TRIM(LOWER(SUBSTR(text, 1, 10)))                 AS head_lc,
           regexp_replace(text, 'data', 'DATA', 'g')        AS replaced,
           string_split(text, ' ')[1]                       AS first_tok,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
           CONCAT(lang, ':', source)                        AS lang_source,
           LPAD(CAST(doc_id AS VARCHAR), 8, '0')            AS padded_id,
           REVERSE(SUBSTR(text, 1, 5))                      AS head_rev,
           CONTAINS(text, 'spark')                          AS has_spark
    FROM documents
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery (reference P1-P5/P9-P11 building blocks)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 20)).alias("head_uc"),
        F.length("text").alias("text_len"),
        F.trim(F.lower(F.substring("text", 1, 10))).alias("head_lc"),
        F.regexp_replace("text", "data", "DATA").alias("replaced"),
        F.split("text", " ").getItem(0).alias("first_tok"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1).alias("n_tokens"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.substring("text", 1, 5)).alias("head_rev"),
        F.col("text").contains("spark").alias("has_spark"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                   AS order_year,
           CAST(month(o_orderdate) AS INT)                  AS order_month,
           CAST(day(o_orderdate) AS INT)                    AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT)
                                                            AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m')                   AS ym,
           o_orderdate + INTERVAL 30 DAY                    AS due_date,
           epoch_ms(o_orderdate)                            AS epoch_millis,
           CAST(isodow(o_orderdate) - 1 AS INT)             AS weekday_mon0,
           CAST(quarter(o_orderdate) AS INT)                AS order_quarter
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp battery (reference X4 date extraction, O6 durations)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.unix_millis("o_orderdate").alias("epoch_millis"),
        F.weekday("o_orderdate").alias("weekday_mon0"),
        F.quarter("o_orderdate").alias("order_quarter"),
    )


@query(
    "q_decimal_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    * (1 + CAST(l_tax AS DECIMAL(8,2))), 2) AS DOUBLE) AS charge,
           CAST(FLOOR(l_extendedprice) AS BIGINT)            AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT)             AS price_ceil,
           ABS(l_extendedprice - 50000)                      AS dist_from_50k,
           l_orderkey % 7                                    AS key_mod7,
           SQRT(l_quantity)                                  AS qty_sqrt,
           (TRY_CAST(l_returnflag AS DECIMAL(18,2)) IS NOT NULL)
                                                             AS flag_parses,
           CAST(COALESCE(TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                                       THEN CAST(l_linenumber AS VARCHAR)
                                       ELSE l_returnflag END AS DECIMAL(18,2)),
                         CAST(-1 AS DECIMAL(18,2))) AS DOUBLE)
                                                             AS mixed_parse,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 0) AS DOUBLE)
                                                             AS price_round0
    FROM lineitem
    """,
)
def q_decimal_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal/math battery (reference V4 Decimal parse + 2dp quantize,
    validators.py:298-336). The guarded parse is an rlike-gated cast (see
    column comment for why not try_cast under ANSI)."""
    li = load(spark, sf_dir, "lineitem")
    price, disc, tax = dec("l_extendedprice"), dec("l_discount", 8, 2), dec("l_tax", 8, 2)
    _NUM_RE = r"^[+-]?[0-9]+(\.[0-9]+)?$"
    _mixed_src = F.when(
        F.col("l_linenumber") % 2 == 0, F.col("l_linenumber").cast("string")
    ).otherwise(F.col("l_returnflag"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(price * (F.lit(1) - disc) * (F.lit(1) + tax)).alias("charge"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_extendedprice") - 50000).alias("dist_from_50k"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        # guarded parse via rlike-gated cast, NOT try_cast: under ANSI mode
        # try_cast pays a JVM exception throw/catch per FAILING row (~2us;
        # measured 1.2s vs 0.15s on this column at sf0.1) — the regex gate
        # makes the cast infallible so it stays in codegen. Equivalent to
        # TRY_CAST on this domain (plain decimal literals vs letters); the
        # oracle keeps TRY_CAST.
        F.col("l_returnflag").rlike(_NUM_RE).alias("flag_parses"),
        # Mixed column: even line numbers parse, the rest fall back to a
        # sentinel — NULL never reaches the output, so the oracle compare
        # sees no NULL-vs-NaN ambiguity (round-6 fix).
        F.coalesce(
            F.when(
                _mixed_src.rlike(_NUM_RE), _mixed_src.cast("decimal(18,2)")
            ),
            F.lit(-1).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("mixed_parse"),
        F.round(price, 0).cast("double").alias("price_round0"),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           len(words)                                        AS n_words,
           len(list_distinct(words))                         AS n_distinct_words,
           array_to_string(words[1:3], '_')                  AS first3,
           list_contains(words, 'spark')                     AS has_spark_tok,
           list_min(words)                                   AS min_word,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT)
                                                             AS total_chars,
           len(list_filter(words, w -> length(w) > 4))       AS n_long_words
    FROM toks
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order battery (reference B3 items array, P11 tokens).
    transform/filter/aggregate run inside the row — no explode, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_join(F.slice(words, 1, 3), "_").alias("first3"),
        F.array_contains(words, "spark").alias("has_spark_tok"),
        F.array_min(words).alias("min_word"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long_words"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT)               AS n_keys,
           array_to_string(json_keys(props), ',')           AS key_list,
           CAST(json_extract(props, '$.k') AS INT)          AS k_val
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map battery over events.props (reference: blocks dict B1, taxes map).
    from_json → MapType, then map_keys/element_at."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.element_at(m, "k").alias("k_val"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                AS k_str,
           CAST(json_extract(props, '$.k') AS INT)          AS k_int,
           json_extract_string(props, '$.missing')          AS missing_field,
           '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
                                                            AS event_json
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON battery (reference S4 context parse, K2 event serialization,
    R5 round-trip): get_json_object + from_json + to_json."""
    # rebalance before the per-row JSON parse (single-row-group scan is
    # one task; parsing is CPU-bound)
    ev = spread(load(spark, sf_dir, "events"))
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "struct<k:int>").getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.to_json(F.struct("event_id", "event_type")).alias("event_json"),
    )


@query(
    "q_hash",
    oracle="""
    SELECT doc_id,
           sha256(text)                                     AS text_sha256,
           md5(text)                                        AS text_md5,
           sha256(CONCAT(lang, '|', text))                  AS keyed_sha256
    FROM documents
    """,
)
def q_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash battery (reference O1 content hashing, orchestrator.py:24-30)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2("text", 256).alias("text_sha256"),
        F.md5("text").alias("text_md5"),
        F.sha2(F.concat(F.col("lang"), F.lit("|"), F.col("text")), 256).alias(
            "keyed_sha256"
        ),
    )


@query(
    "q_case_routing",
    oracle="""
    SELECT CASE WHEN o_totalprice IS NULL  THEN 'revisao_manual'
                WHEN o_totalprice > 300000 THEN 'auditoria_fiscal'
                ELSE 'processamento_normal' END              AS route,
           COUNT(*)                                          AS n_orders,
           CAST(ROUND(SUM(CAST(GREATEST(o_totalprice, 50000.0) AS DECIMAL(18,2))), 2)
                AS DOUBLE)                                   AS clamped_total,
           MIN(COALESCE(o_orderpriority, 'NONE'))            AS min_priority
    FROM orders
    GROUP BY 1
    """,
)
def q_case_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional routing (reference R1 value-threshold + R2 confidence
    routing, tests/e2e/test_pipeline_core.py:169-220; O3 status decision)."""
    orders = load(spark, sf_dir, "orders")
    route = (
        F.when(F.col("o_totalprice").isNull(), F.lit("revisao_manual"))
        .when(F.col("o_totalprice") > 300000, F.lit("auditoria_fiscal"))
        .otherwise(F.lit("processamento_normal"))
    )
    return (
        orders.groupBy(route.alias("route"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(dec(F.greatest(F.col("o_totalprice"), F.lit(50000.0))))).alias(
                "clamped_total"
            ),
            F.min(F.coalesce(F.col("o_orderpriority"), F.lit("NONE"))).alias(
                "min_priority"
            ),
        )
    )
