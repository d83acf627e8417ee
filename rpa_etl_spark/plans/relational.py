"""M1 — relational core declared queries (SURVEY.md §2.2, milestone M1).

Every query here is a pure DataFrame logical plan: filters/projections are
declarative (Catalyst pushes them into the parquet scan), dims are broadcast
(explicit hint only for true dims; AQE handles the rest at runtime), and the
only shuffles are the semantically required ones (group-by / big-big join /
window partitioning).

Determinism contract with the DuckDB oracle:
- exact-DECIMAL aggregation for money (see plans/common.py);
- averages as ``cast(decimal_sum as double) / count`` — IEEE division of
  identical operands on both engines;
- top-k and window orderings are made total with key tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rpa_etl_spark.plans.common import dec, money
from rpa_etl_spark.registry import query
from rpa_etl_spark.tables import load, spread

# (applicationId, table_name) pairs q_join_bucketed has already written in
# this process — keeps the eager bucketed-table write once-per-session
# without resorting to app-id-unique table names (which leak metastore
# entries across sessions; round-10 ADVICE).
_BUCKETED_WRITTEN: set[tuple[str, str]] = set()


# --------------------------------------------------------------------------
# Scan + projection (reference: R3/R4 payload re-shaping, SURVEY §2.1)
# --------------------------------------------------------------------------

@query(
    "q_scan_project",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                 AS brand_uc,
           p_type                         AS part_type,
           p_size + 1                     AS size_plus,
           CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * 0.9, 2) AS DOUBLE)
                                          AS discounted_price
    FROM part
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns; scan should read only 5 columns."""
    return load(spark, sf_dir, "part").select(
        F.col("p_partkey"),
        F.upper("p_brand").alias("brand_uc"),
        F.col("p_type").alias("part_type"),
        (F.col("p_size") + 1).alias("size_plus"),
        money(dec("p_retailprice") * F.lit("0.9").cast("decimal(3,2)")).alias(
            "discounted_price"
        ),
    )


@query(
    "q_filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 30
      AND l_discount > 0.02
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_linestatus IS NOT NULL
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates (isin/between/range/null) — all pushed to scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 30)
        & (F.col("l_discount") > 0.02)
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & F.col("l_linestatus").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# --------------------------------------------------------------------------
# Joins (reference analog: CNPJ↔party association B2; generalized per §2.2)
# --------------------------------------------------------------------------

@query(
    "q_join_inner_broadcast",
    oracle="""
    SELECT r.r_name AS region, COUNT(*) AS n_suppliers,
           CAST(ROUND(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two broadcast dims — zero shuffle until the agg."""
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            money(F.sum(dec("s_acctbal"))).alias("total_acctbal"),
        )
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0), 2) AS DOUBLE)
               AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join preserving order-less customers (None-preserving semantics,
    reference robot/schema/models.py:36 optional recipient)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            money(F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))).alias(
                "total_spent"
            ),
        )
    )


@query(
    "q_join_full",
    oracle="""
    WITH buyers AS (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ),
    rich AS (
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer WHERE c_acctbal > 9000
    )
    SELECT COALESCE(b.o_custkey, r.c_custkey) AS custkey,
           b.n_orders, r.acctbal,
           b.o_custkey IS NOT NULL AS is_buyer,
           r.c_custkey IS NOT NULL AS is_rich
    FROM buyers b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: buyers x high-balance customers, both unmatched
    sides preserved, key coalesced — completes the outer-join family
    (left is q_join_left)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    buyers = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    rich = customer.where(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("acctbal")
    )
    return (
        buyers.join(rich, F.col("o_custkey") == F.col("c_custkey"), "full")
        .select(
            F.coalesce(F.col("o_custkey"), F.col("c_custkey")).alias("custkey"),
            "n_orders",
            "acctbal",
            F.col("o_custkey").isNotNull().alias("is_buyer"),
            F.col("c_custkey").isNotNull().alias("is_rich"),
        )
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS status_key
        FROM orders
    ),
    d AS (
        SELECT * FROM (VALUES ('O', 'open'), ('F', 'filled'), (NULL, 'pending-unknown'))
                 AS t(status_key, status_label)
    )
    SELECT l.o_orderkey, d.status_label
    FROM l JOIN d ON l.status_key IS NOT DISTINCT FROM d.status_key
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    NULL dim rows instead of dropping — the semantics a dim lookup with an
    explicit 'unknown' bucket needs. Plans as a hash join on the null-safe
    key, not a nested loop."""
    orders = load(spark, sf_dir, "orders")
    left = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_key"),
    )
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "filled"), (None, "pending-unknown")],
        "status_key string, status_label string",
    )
    return (
        left.join(F.broadcast(dim), left["status_key"].eqNullSafe(dim["status_key"]))
        .select("o_orderkey", "status_label")
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers with a big order (no row duplication, no payload
    columns from the right side — the cheapest existence check at scale)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no URGENT orders (stoplist-rejection
    semantics, reference parser.py:61-69). The anti side is filtered to
    one priority class (round-10 continuation): the unfiltered form —
    customers with no orders AT ALL — is VACUOUSLY empty on the fixture
    (every customer has orders), and a 0-row result proves only that
    neither engine invents rows; ~200 of 1500 sf0.01 customers lack an
    urgent order, so the hash now covers real anti-join survivors."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_join_range",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('b0', 0.0, 50.0), ('b1', 50.0, 100.0), ('b2', 100.0, 200.0),
               ('b3', 200.0, 350.0), ('b4', 350.0, 1000.0)
    )
    SELECT b.band, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: events banded by value interval. The band table is
    tiny → broadcast nested-loop join, which is the right physical plan; the
    fact side streams through without a shuffle."""
    events = load(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("b0", 0.0, 50.0), ("b1", 50.0, 100.0), ("b2", 100.0, 200.0),
         ("b3", 200.0, 350.0), ("b4", 350.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(dec("value"))).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Aggregation (TPC-H Q1 shape; reference analogs R4 items_count, O2 Σpenalty)
# --------------------------------------------------------------------------

@query(
    "q_agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(8,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(8,2)))
                       * (1 + CAST(l_tax AS DECIMAL(8,2)))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical hash aggregate. Partial (map-side) aggregation
    makes the single shuffle carry only |groups|×|partitions| rows."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    qty, price = dec("l_quantity"), dec("l_extendedprice")
    disc, tax = dec("l_discount", 8, 2), dec("l_tax", 8, 2)
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money(F.sum(qty)).alias("sum_qty"),
        money(F.sum(price)).alias("sum_base_price"),
        money(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
        money(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))).alias("sum_charge"),
        (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
        (F.sum(price).cast("double") / cnt).alias("avg_price"),
        (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (reference P7 line-dedup semantics, set form)."""
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


@query(
    "q_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_10pct
    FROM lineitem GROUP BY 1
    """,
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for exact
    count-distinct (one pass, bounded memory, no giant shuffle).

    The estimate itself is sketch-specific, so the oracle can't recompute
    it — instead the query ALSO computes the exact distinct count and a
    deterministic accuracy gate (|approx − exact| ≤ 10% of exact, a 5-sigma
    bound at rsd=0.02; HLL is deterministic for fixed input, so the flag is
    stable). The oracle verifies the exact counts and asserts the gate
    holds — a false gate hash-mismatches against the oracle's TRUE."""
    # distinct-FIRST, then both aggregates over the deduped pairs: mixing
    # countDistinct with a non-distinct aggregate in one groupBy plans an
    # Expand that doubles every input row; pre-aggregating to distinct
    # (flag, partkey) pairs avoids the Expand entirely, the exact count
    # becomes a plain COUNT(*), and the HLL sketch is UNCHANGED (it
    # depends only on the distinct value set). Measured 2.4x faster at
    # sf0.1; at 100 TB the first keyed aggregation partial-dedupes
    # map-side so the only big shuffle carries |distinct pairs|, and the
    # spread keyed by the same columns makes the CPU-sizing exchange
    # satisfy that aggregation's distribution (no second exchange).
    deduped = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_partkey")
        # NULL partkeys stay IN (so a flag group whose partkeys are all
        # NULL still emits a row, matching COUNT(DISTINCT ...) = 0 in the
        # oracle); the null-ignoring count below restores countDistinct's
        # NULL semantics without dropping the group
        .transform(lambda d: spread(d, "l_returnflag", "l_partkey"))
        .groupBy("l_returnflag", "l_partkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        deduped.groupBy("l_returnflag")
        .agg(
            # count(col) skips NULL pairs — each surviving row is one
            # distinct non-null partkey; approx_count_distinct ignores
            # NULLs natively, so both sides agree on null-only groups
            F.count(F.col("l_partkey")).alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= F.col("exact_parts") * 0.10
            ).alias("approx_within_10pct"),
        )
    )


@query(
    "q_rollup",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass (nation → nation×segment → grand)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"),
                F.col("o_totalprice"))
        .rollup("nation", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(dec("o_totalprice"))).alias("revenue"),
        )
    )


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money(F.sum(dec("l_quantity"))).alias("sum_qty"),
        )
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_custkey,
           NTILE(4)       OVER w AS balance_quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY CAST(c_acctbal AS DECIMAL(18,2)), c_custkey)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-ranking windows (ntile / percent_rank / cume_dist)
    computed SCALE-SAFELY: a naive ``Window.orderBy`` with no partition is
    a single-partition total sort — a scale-killer. Instead:

    1. ``repartitionByRange`` on the sort key → globally range-ordered
       partitions (parallel sampling + shuffle, no single-node sort);
    2. ``row_number`` within each range partition (window partitioned by
       ``spark_partition_id`` — every window fits one task);
    3. per-partition counts (a ~#partitions-row aggregate) prefix-summed
       by an O(p) expression fold → global offset per partition + total n;
    4. global row number = local row number + offset; ntile /
       percent_rank / cume_dist are then closed-form expressions of
       (global_rn, total_n) because the sort key (balance, custkey) is
       unique.

    Every shuffle moves O(n/p) rows per task; the only 'global' data is
    the partition-count table (p rows, broadcast). This is the plan that
    survives a 100× scale-up."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", dec("c_acctbal").alias("bal")
    )
    nparts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = cust.repartitionByRange(nparts, F.col("bal"), F.col("c_custkey"))
    ranged = ranged.withColumn("pid", F.spark_partition_id())
    wloc = Window.partitionBy("pid").orderBy("bal", "c_custkey")
    local = ranged.withColumn("lrn", F.row_number().over(wloc))

    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    folded, out_cols = _ntile_static_cols(4)
    offsets = (
        counts.agg(folded.alias("f"))
        .select(F.explode("f.offs").alias("o"), F.col("f.tot").alias("n"))
        .select("o.pid", "o.offset", "n")
    )
    return local.join(F.broadcast(offsets), "pid").select(*out_cols)


from rpa_etl_spark.functions.exprs import col_memo as _col_memo


@_col_memo
def _ntile_static_cols(k: int):
    """q_window_ntile's input-independent Column trees (~170 ms of py4j
    construction per build — the round-15 construction profile's #1
    non-eager entry), built once per (k, gateway); pure extraction of the
    expressions that lived inline, reference-only on column names.

    The prefix-sum fold: ONE O(p) expression fold over a p-row array
    (p = #partitions, never data rows): collect → sort by pid →
    aggregate-fold accumulating the running total. No BNLJ self-join
    (quadratic in p), no unpartitioned window."""
    zero = F.struct(
        F.array().cast("array<struct<pid:int,offset:bigint>>").alias("offs"),
        F.lit(0).cast("bigint").alias("tot"),
    )
    folded = F.aggregate(
        F.sort_array(F.collect_list(F.struct("pid", "cnt"))),
        zero,
        lambda acc, x: F.struct(
            F.concat(
                acc["offs"],
                F.array(
                    F.struct(x["pid"].alias("pid"), acc["tot"].alias("offset"))
                ),
            ).alias("offs"),
            (acc["tot"] + x["cnt"]).alias("tot"),
        ),
    )
    rn = F.col("lrn") + F.col("offset")
    n = F.col("n")
    base = F.floor(n / k)  # rows per small bucket
    rem = n % k            # first `rem` buckets get one extra row
    big = base + 1
    ntile = F.when(
        rn <= rem * big, F.floor((rn - 1) / big) + 1
    ).otherwise(rem + F.floor((rn - rem * big - 1) / F.greatest(base, F.lit(1))) + 1)
    out_cols = (
        F.col("c_custkey"),
        ntile.cast("int").alias("balance_quartile"),
        ((rn - 1).cast("double") / (n - 1)).alias("pct_rank"),
        (rn.cast("double") / n).alias("cume"),
    )
    return folded, out_cols


@query(
    "q_gap_fill",
    oracle="""
    WITH days AS (
        SELECT user_id,
               UNNEST(generate_series(CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE),
                                      INTERVAL 1 DAY)) AS day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT d.user_id, CAST(d.day AS DATE) AS day,
           COALESCE(e.n_events, 0) AS n_events,
           e.n_events IS NULL AS is_gap
    FROM days d LEFT JOIN daily e ON d.user_id = e.user_id AND CAST(d.day AS DATE) = e.day
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: per-user calendar from min..max day via
    sequence+explode, left-joined against actual daily counts — missing
    days appear as zero-count gap rows (the standard gap-filling shape;
    the explode is per-key and bounded by the date span, so it scales
    with users x days, never with raw event volume)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    spans = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    daily = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("n"))
    return (
        days.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint slices + grand total in one pass —
    the general form rollup/cube specialize)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice"),
        )
        .groupingSets([["nation"], ["segment"], []], "nation", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum(dec("o_totalprice"))).alias("revenue"),
        )
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      OVER (PARTITION BY o_custkey
                            ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS spent_30d
    FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, peer-inclusive — deterministic under date
    ties, unlike a ROWS frame): per-customer spend over a trailing 30-day
    value window."""
    days = F.datediff("o_orderdate", F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.cast("long"))
        .rangeBetween(-30, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        money(F.sum(dec("o_totalprice")).over(w)).alias("spent_30d"),
    )


# --------------------------------------------------------------------------
# Set operations (reference analog: multi-pattern header union B1)
# --------------------------------------------------------------------------

@query(
    "q_scalar_subquery",
    oracle="""
    WITH seg_avg AS (
        SELECT c.c_mktsegment AS seg, AVG(CAST(o.o_totalprice AS DECIMAL(18,2))) AS avg_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    )
    SELECT o.o_orderkey, c.c_mktsegment AS segment,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) >
          2 * (SELECT avg_price FROM seg_avg s WHERE s.seg = c.c_mktsegment)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL front-end + correlated scalar subquery: orders above 2x their
    segment's average price. Exercises the parser/analyzer path and
    Catalyst's subquery decorrelation (rewritten to an aggregate + join —
    no per-row subquery execution at any scale). All other declared
    queries use the DataFrame API; this one proves the SQL surface against
    the same oracle."""
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH seg_avg AS (
            SELECT c.c_mktsegment AS seg,
                   AVG(CAST(o.o_totalprice AS DECIMAL(18,2))) AS avg_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        )
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) >
              2 * (SELECT avg_price FROM seg_avg s WHERE s.seg = c.c_mktsegment)
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                               THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS automobile,
           CAST(ROUND(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                               THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS building,
           CAST(ROUND(SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'
                               THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS machinery
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): revenue per nation by named market segment.
    Explicit value list keeps it a single-pass conditional aggregation —
    no extra distinct-values job, which is also the 100 TB rule: never
    pivot on an unbounded key domain."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), F.col("c_mktsegment"), "o_totalprice")
        .groupBy("nation")
        .pivot("c_mktsegment", ["AUTOMOBILE", "BUILDING", "MACHINERY"])
        .agg(money(F.sum(dec("o_totalprice"))))
        .withColumnsRenamed(
            {"AUTOMOBILE": "automobile", "BUILDING": "building", "MACHINERY": "machinery"}
        )
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT c_custkey, metric, val
    FROM (
        SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    WHERE val IS NOT NULL
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, melt): per-customer metrics to (key, metric,
    value) rows — narrow, no shuffle at any scale."""
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .where(F.col("val").isNotNull())
    )


@query(
    "q_set_ops",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
         rich   AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'buyer_and_rich' AS tag, custkey FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM rich)
    UNION ALL
    SELECT 'rich_not_buyer' AS tag, custkey FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM buyers)
    UNION ALL
    SELECT 'buyer_or_rich' AS tag, custkey FROM (SELECT custkey FROM buyers UNION SELECT custkey FROM rich)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    buyers = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    rich = customer.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        buyers.intersect(rich).select(F.lit("buyer_and_rich").alias("tag"), "custkey")
        .unionByName(rich.exceptAll(buyers).distinct().select(F.lit("rich_not_buyer").alias("tag"), "custkey"))
        .unionByName(buyers.union(rich).distinct().select(F.lit("buyer_or_rich").alias("tag"), "custkey"))
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark runs per-partition top-k then merges on the driver
    side of the exchange (TakeOrderedAndProject) — no full sort at scale.
    Ordering made total with the key tiebreak so the SET of rows is stable."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Window functions (reference analog: first-valid-wins X2/B2/B4 = rank 1;
# next-header position B1 = lead)
# --------------------------------------------------------------------------

@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — 'first valid match wins' generalized."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )


@query(
    "q_window_lead_lag",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)) AS ms_since_prev,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas (reference analog: B1 next-header position)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))).alias("ms_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS running_spent,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg_3
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame windows: running total + 3-row moving average per customer."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    total = dec("o_totalprice")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        money(F.sum(total).over(run)).alias("running_spent"),
        (F.sum(total).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias(
            "moving_avg_3"
        ),
    )


# --------------------------------------------------------------------------
# Skew-mitigated join (operators/skew.py — the 100 TB hot-key path)
# --------------------------------------------------------------------------

@query(
    "q_join_skew_salted",
    oracle="""
    WITH skewed AS (
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber + k * 1000, l_quantity
        FROM lineitem, UNNEST(generate_series(1, 19)) AS kk(k)
        WHERE l_orderkey % 997 = 1
    )
    SELECT o_orderpriority,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_qty,
           COUNT(*) AS n_rows
    FROM skewed JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECTIVE replicate-and-salt join (operators/skew.py::salted_join
    with ``hot_threshold`` — round-10 upgrade from the salt-everything
    form after the scaling probe measured whole-dim replication growing
    linearly with dim size, SCALE.md §10): the fact is lineitem with a
    DELIBERATE hot-key blowup (every orderkey ≡ 1 mod 997 gets 19 extra
    copies of each of its lines, ~20x row weight); keys above 50 rows
    are detected by one map-side-combined count, broadcast, and take the
    salted join against only the hot dim slice while the cold majority
    takes the plain join. The oracle is the PLAIN join over the same
    skewed fixture — the union being row-identical is the whole point
    (a dropped/duplicated hot row or a key routed to both paths changes
    the counts). At 100 TB this is the pre-planned alternative to AQE
    skew splitting; replication volume is |hot keys| x n_salts, not
    |dim| x n_salts. The salted aggregation twin (groupBy(key, salt)
    partial → merge) and the hot/cold row-identity property are gated by
    tests/test_scale_patterns.py."""
    from rpa_etl_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    clones = (
        li.where(F.col("l_orderkey") % 997 == 1)
        .select(
            "l_orderkey",
            "l_quantity",
            F.explode(F.sequence(F.lit(1), F.lit(19))).alias("k"),
            "l_linenumber",
        )
        .select(
            "l_orderkey",
            (F.col("l_linenumber") + F.col("k") * 1000).alias("l_linenumber"),
            "l_quantity",
        )
    )
    skewed = li.unionByName(clones)
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        skewed,
        orders,
        "l_orderkey",
        n_salts=8,
        salt_cols=["l_orderkey", "l_linenumber"],
        hot_threshold=50,
    )
    return joined.groupBy("o_orderpriority").agg(
        money(F.sum(dec("l_quantity"))).alias("total_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_agg_skew_salted",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (operators/skew.py::salted_sum_count)
    declared as a query so its bit-identity to the plain aggregation is
    oracle-checked: groupBy(key, salt) spreads each of the 3 hot
    l_returnflag keys across 16 reducers in phase 1, then the |keys|x16
    tiny partials merge in phase 2. Decimal-exact partials make the split
    invisible in the result. At 100 TB this is the pre-planned recipe for
    aggregations whose group key has a handful of giant groups — the agg
    analog of q_join_skew_salted."""
    from rpa_etl_spark.operators.skew import salted_sum_count

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    # default content-hash salt: (flag, quantity) — quantity's many values
    # spread each hot flag across the full salt range
    return salted_sum_count(li, ["l_returnflag"], "l_quantity", n_salts=16)


_RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE chain(custkey, root, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey BETWEEN 1 AND 10
        UNION ALL
        SELECT c.c_custkey, chain.root, chain.depth + 1
        FROM chain JOIN customer c ON c.c_custkey = chain.custkey * 2
    )
    SELECT root, custkey, depth FROM chain
"""


@query("q_recursive_cte", oracle=_RECURSIVE_CHAIN_SQL)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new SQL surface in Spark 4): key-doubling reachability
    chains from 10 seed customers — each iteration joins the frontier back
    to the customer table, terminating when no 2x key exists. Identical
    text runs on DuckDB as the oracle.

    Scale shape: iterations are bounded by log2(|customer|) (~34 at 100 TB),
    each one an equi-join of a SHRINKING frontier against the base table —
    the same linear-frontier pattern as operators/components.py's connected
    components, here expressed declaratively and driven by Catalyst's
    UnionLoop execution.

    The registered view is the key column only, lineage-cut once (r14,
    guide §5): UnionLoop re-plans and re-executes the view subtree EVERY
    iteration, so each round otherwise pays a fresh parquet scan-plan of
    the full table; the SQL text touches nothing but c_custkey, and the
    checkpointed single-column frame is what every iteration's join
    actually needs (measured ~30% off the query)."""
    (load(spark, sf_dir, "customer").select("c_custkey")
     .localCheckpoint(eager=False).createOrReplaceTempView("customer"))
    return spark.sql(_RECURSIVE_CHAIN_SQL)


_LATERAL_TOPK_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) o
"""


@query("q_lateral_topk", oracle=_LATERAL_TOPK_SQL)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY/LIMIT: each
    customer's top-2 orders by price (deterministic o_orderkey tiebreak).
    Catalyst decorrelates this into a ranked window over one shuffled join
    — no per-customer re-execution at any scale; DuckDB runs the same text
    as the oracle. The DataFrame twin of this shape (window + rank filter)
    is exercised by q_window_rank."""
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_TOPK_SQL)


@query(
    "q_join_bucketed",
    oracle="""
    SELECT c.c_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS total_cents
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: customer and orders are written
    `bucketBy(8, custkey) sortBy(custkey)` and re-joined — the layout
    investment that deletes the shuffle from every subsequent join on
    the key. The physical plan has ZERO Exchange operators: both scans
    come out hash-distributed by bucket, the sort-merge join consumes
    them in place, and the following per-custkey aggregation reuses the
    same distribution (machine-checked by tests/test_plan_shapes.py).
    At 100 TB this is THE difference between re-shuffling the fact table
    per query and paying the layout cost once at ingest — the DataFrame
    rendering of Hive/Iceberg bucketing.

    DELIBERATE eager step (same contract as q_sink_roundtrip): CALLING
    this writes both bucketed tables. Table names and paths are STABLE,
    keyed by sf only (round-10 ADVICE: the former app-id-unique
    identifiers accumulated two Derby metastore entries plus parquet per
    session, forever). Each session overwrites the same two tables once
    (session-local memo keeps repeated calls free); concurrent sessions
    racing the overwrite are out of scope per plans/common.scratch_dir.
    The write itself shuffles by the bucket key — the point is that NO
    LATER query pays that shuffle again."""
    import os
    import re

    from rpa_etl_spark.plans.common import scratch_dir

    base = scratch_dir(spark, sf_dir, "bucketed")
    # saveAsTable identifiers carry the same stable sf key as the path
    tag = re.sub(
        r"[^0-9a-zA-Z]+",
        "_",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
    )
    names = {}
    for tbl, key in (("customer", "c_custkey"), ("orders", "o_custkey")):
        name = f"bkt_{tbl}_{tag}"
        names[tbl] = name
        memo = (spark.sparkContext.applicationId, name)
        if memo not in _BUCKETED_WRITTEN:
            # overwrite even when a previous session left the table in
            # the metastore: the catalog entry may point at files from a
            # stale fixture generation; rewriting is the cheap, correct
            # default and leaves exactly one copy behind
            (
                load(spark, sf_dir, tbl)
                .write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(base, tbl))
                .format("parquet")
                .saveAsTable(name)
            )
            _BUCKETED_WRITTEN.add(memo)
    cust = spark.table(names["customer"])
    orders = spark.table(names["orders"])
    cents = F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0).cast("long")
    return (
        cust.hint("merge")
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "inner")
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )
    )
