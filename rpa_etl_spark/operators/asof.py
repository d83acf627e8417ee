"""As-of join (SURVEY.md §2.2 'deferred hard-list' item).

``asof_join(left, right, key, time)``: for every left row, attach the most
recent right row with the same key whose timestamp is ≤ the left row's.

Spark has no native ASOF JOIN. The scalable implementation is the
union + ordered-window trick:

1. union both sides into one keyed timeline (right rows flagged),
2. one shuffle: window partitioned by key, ordered by (ts, side) — right
   rows sort before left rows at equal timestamps so `ts_right ≤ ts_left`
   ties match,
3. ``last(value, ignorenulls)`` over the unbounded-preceding frame carries
   the latest right-side payload forward,
4. keep left rows.

Cost: ONE shuffle of |L|+|R| rows — strictly better at scale than the
range-join alternative (which explodes candidate pairs), and it inherits
AQE skew splitting on hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    right_values: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row + latest-prior ``right`` values.

    ``right_values`` are the right-side columns to carry; they appear in
    the output as ``<name><suffix>`` (NULL when no prior right row).
    """
    l_cols = [c for c in left.columns]
    lhs = left.select(
        *l_cols, F.lit(1).alias("_side"), *[F.lit(None).cast(right.schema[v].dataType).alias(f"{v}{suffix}") for v in right_values]
    )
    rhs = right.select(
        *[
            F.col(key) if c == key else F.col(time) if c == time else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"{v}{suffix}") for v in right_values],
    )
    u = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *l_cols,
        "_side",
        *[
            F.last(f"{v}{suffix}", ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in right_values
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")
