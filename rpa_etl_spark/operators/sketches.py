"""Count-Min sketch: fixed-memory frequency estimation (Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch
and its applications", J. Algorithms 2005).

The 100 TB problem it solves: exact per-key counts over a high-
cardinality key need state proportional to the number of distinct keys;
a CMS needs exactly d·w counters NO MATTER how many keys exist, is
mergeable by cell-wise addition (so partial sketches combine across
partitions/days/clusters like any other aggregate), and guarantees
estimate ≥ true count with overshoot ≤ εN at probability 1-δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Spark rendering: the sketch IS a (row_idx, bucket, cnt) DataFrame of at
most d·w rows — built by one explode + one groupBy whose partial
aggregation does the per-partition sketching map-side; estimates come
from joining candidate keys' d (row, bucket) coordinates against it and
taking MIN(cnt). Engine-neutral: the d hash rows are disjoint 6-hex-char
md5 slices (same family as operators/bloom.py), so the DuckDB oracle
re-derives every cell and every estimate bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rpa_etl_spark.operators import hashing as H

N_ROWS = 4


def buckets(key_col: Column, w_buckets: int) -> list[Column]:
    """The d bucket indices in [0, w_buckets) for a key (the shared
    md5-slice kernel, operators/hashing.py: row i covers hex chars
    1+6i .. 6+6i inclusive)."""
    H.check_modulus(w_buckets)
    return H.md5_slices(key_col, N_ROWS, w_buckets)


def buckets_sql(key_expr: str, w_buckets: int) -> list[str]:
    """DuckDB mirror of :func:`buckets`."""
    return H.md5_slices_sql(key_expr, N_ROWS, w_buckets)


def cms_build(df: DataFrame, key_col: str, w_buckets: int) -> DataFrame:
    """Sketch DataFrame (row_idx INT, bucket BIGINT, cnt BIGINT) —
    ≤ N_ROWS·w_buckets rows regardless of input size or cardinality.
    NULL keys are dropped (NULL is not a countable key; its hash is
    NULL and would form a junk cell)."""
    bs = buckets(F.col(key_col), w_buckets)
    coords = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("row_idx"), b.alias("bucket"))
                for i, b in enumerate(bs)
            ]
        )
    ).alias("c")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(coords)
        .groupBy(F.col("c.row_idx").alias("row_idx"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches by cell-wise addition (the mergeability that makes
    CMS a distributed aggregate: per-day/per-partition sketches combine
    without touching raw data)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame, key_col: str, sketch: DataFrame, w_buckets: int
) -> DataFrame:
    """Return a ``(key_col, cms_count)`` frame — one row per distinct
    probe key, ``cms_count`` = min over the key's d cells (0 when a cell
    is absent — an empty cell means no key hashed there). Other columns
    of ``keys`` are NOT carried through; join the result back on
    ``key_col`` if the caller needs them alongside the estimate.

    The sketch side is ≤ d·w rows, so the optimizer broadcasts it; the
    probe is one explode + one broadcast join + one per-key MIN — never
    a shuffle of the raw data."""
    bs = buckets(F.col(key_col), w_buckets)
    probe = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row_idx"), b.alias("bucket"))
                    for i, b in enumerate(bs)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row_idx", "c.bucket")
    joined = probe.join(F.broadcast(sketch), ["row_idx", "bucket"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cell")
    )
    return joined.groupBy(key_col).agg(F.min("cell").alias("cms_count"))
