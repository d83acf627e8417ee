"""Flagship query — the reference's financial-total + routing semantics in
relational form (SURVEY.md §7 minimum slice).

Reference semantics re-expressed:
- revenue aggregation = the reference's financial-total extraction
  (robot/core/parser.py:297-319) generalized to a grouped aggregate;
- threshold routing = tests/e2e/test_pipeline_core.py:169-194
  (total > 10000 → 'auditoria_fiscal', else 'processamento_normal');
- trust-style completeness ordering = orchestrator.py:84-101.

Spark shape: lineitem ⋈ orders ⋈ customer ⋈ nation. ``nation`` (25 rows)
and ``customer`` (sf-scaled but small relative to fact) join via broadcast
hints so the only shuffle is the final aggregation on the composite group
key. At 100 TB the lineitem scan is partition-pruned by the shipdate filter
(pushed to parquet) and the aggregate is partial (map-side combine) before
the single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rpa_etl_spark.plans.common import dec, money
from rpa_etl_spark.registry import query
from rpa_etl_spark.tables import load, spread

AUDIT_THRESHOLD = 10_000.0  # tests/e2e/test_pipeline_core.py:177

_FLAGSHIP_ORACLE = """
SELECT
    n.n_name                                  AS nation,
    l.l_returnflag                            AS returnflag,
    CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,2)))), 2) AS DOUBLE)
                                              AS revenue,
    COUNT(*)                                  AS n_items,
    COUNT(DISTINCT o.o_orderkey)              AS n_orders,
    CASE
        WHEN ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(8,2)))), 2) > 10000
            THEN 'auditoria_fiscal'
        ELSE 'processamento_normal'
    END                                       AS route
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
GROUP BY n.n_name, l.l_returnflag
"""


@query("q_flagship", oracle=_FLAGSHIP_ORACLE)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    revenue_expr = F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 8, 2)))

    return (
        # lineitem⋈orders is big-big at scale → shuffle hash join (AQE will
        # still broadcast at small SF); nation is a true dim → broadcast hint.
        # The explicit repartition on the join key is the join's required
        # distribution anyway (free at scale — the SMJ/SHJ shuffle subsumes
        # it) and decouples the filter+decimal compute from scan split
        # count (a single-row-group file scans as one task).
        lineitem.where(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        .transform(lambda d: spread(d, "l_orderkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("l_returnflag").alias("returnflag"))
        .agg(
            money(revenue_expr).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.when(F.round(revenue_expr, 2) > AUDIT_THRESHOLD, F.lit("auditoria_fiscal"))
            .otherwise(F.lit("processamento_normal"))
            .alias("route"),
        )
    )
