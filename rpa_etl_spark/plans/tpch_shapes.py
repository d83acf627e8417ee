"""Classic multi-join analytical shapes (TPC-H Q3/Q5/Q10 analogs) — deeper
relational coverage beyond the single-feature queries: selective filters
on both fact and dim sides, multi-way joins, grouped decimal aggregates,
and top-k over aggregates. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rpa_etl_spark.plans.common import dec, money
from rpa_etl_spark.registry import query
from rpa_etl_spark.tables import load

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))"


@query(
    "q_tpch_q3_shape",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM({_REV.replace('l_', 'l.l_')}), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-12-25'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered customers → undelivered revenue per
    order. Both filters push to their scans; joins shuffle on keys."""
    customer = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-12-25").cast("timestamp")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 8, 2)))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q_tpch_q5_shape",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM({_REV.replace('l_', 'l.l_')}), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: local-supplier volume — six-way join with the
    same-nation correlation between supplier and customer."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 8, 2)))).alias("revenue"))
    )


@query(
    "q_tpch_q10_shape",
    oracle=f"""
    WITH ranked AS (
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               CAST(ROUND(SUM({_REV.replace('l_', 'l.l_')}), 2) AS DOUBLE) AS lost_revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, nation, lost_revenue
    FROM ranked
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by returned-item revenue — aggregate
    then global top-k (TakeOrderedAndProject over the agg output)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    agg = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(money(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 8, 2)))).alias("lost_revenue"))
    )
    return agg.orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc()).limit(20)


@query(
    "q_tpch_q14_shape",
    oracle=f"""
    SELECT CAST(ROUND(100.00 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                                        THEN {_REV.replace('l_', 'l.l_')}
                                        ELSE CAST(0 AS DECIMAL(18,2)) END)
                      / SUM({_REV.replace('l_', 'l.l_')}), 4) AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape (promo revenue ratio): fact-dim join + conditional decimal
    aggregate folded into a single global ratio. The part side broadcasts;
    at real TPC-H scale part is 1/5 of lineitem and AQE picks shuffle join
    — the declared plan leaves the choice to the optimizer."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 8, 2))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # mirror the oracle's float associations EXACTLY (round-10
            # review): the 100 multiplier stays DECIMAL so the numerator
            # is exact (a double literal added a rounding DuckDB never
            # performs), then both exact decimals convert to double and
            # one IEEE division happens — DuckDB types DECIMAL/DECIMAL
            # as DOUBLE (verified), i.e. double(num)/double(den)
            F.round(
                (F.lit(100).cast("decimal(5,2)") * F.sum(promo)).cast("double")
                / F.sum(rev).cast("double"),
                4,
            )
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_having_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 150
    """,
)
def q_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (HAVING over a grouped aggregate): orders whose total
    lineitem quantity exceeds a threshold — post-aggregation filtering,
    which Catalyst keeps above the partial/final agg so the shuffle still
    carries only group partials."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    qty = F.sum(dec("l_quantity"))
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(money(qty).alias("total_qty"), qty.alias("_raw"))
        .where(F.col("_raw") > 150)
        .drop("_raw")
    )


@query(
    "q_tpch_q21_shape",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 1900 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 1900 DAY
      )
    GROUP BY s.s_name
    """,
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers-who-kept-orders-waiting): for each supplier,
    count line items that were the ONLY late one on a multi-supplier order
    — a correlated EXISTS (another supplier participated) plus a
    correlated NOT EXISTS (no other supplier was late). Lateness here is
    shipdate > orderdate + 1900 days (the synthetic tables carry no
    receipt/commit dates; the classic query's shape is unchanged).

    Shape (round 15, single-scan rewrite): both correlated subqueries
    depend only on the per-order distinct-supplier sets — "another
    supplier exists" ⟺ the order has >1 distinct supplier, and "no other
    late supplier" ⟺ the order's distinct LATE-supplier set is exactly
    {this row's supplier} (size 1, since the row itself is late). Those
    sets come from ONE window over l_orderkey, so lineitem is scanned
    once and shuffled once — the r14 semi+anti self-join form scanned it
    three times. The set size per order is bounded by lines-per-order
    (≤7 in TPC-H), so collect_set over the window is O(1) per row at any
    scale. orders joins LEFT so unmatched line items still count toward
    the EXISTS side, exactly as the subquery (over bare lineitem) does;
    the supplier dim broadcasts.
    """
    from pyspark.sql import Window

    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 1900 DAYS")
            ).alias("is_late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late_supp"),
    )
    sole_late = flagged.where(
        F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey", "l_suppkey")
    return (
        sole_late.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
