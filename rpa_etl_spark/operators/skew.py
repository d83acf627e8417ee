"""Skew mitigation utilities (the 100 TB reality: keys are never uniform).

Two standard techniques, composable with any plan:

- ``salted_agg``: two-phase aggregation — add a random-ish salt to the
  group key, partially aggregate (spreads one hot key over N reducers),
  then re-aggregate without the salt. Works for any algebraic aggregate
  (sum/count/min/max); here exposed for decimal-exact sum+count.
- ``salted_broadcast_left``: replicate-and-salt pattern for joining a
  skewed fact against a dim too big to broadcast whole but with known hot
  keys: hot-key rows join against a replicated dim slice.

AQE's skew-join splitting (enabled in session.py) already handles
sort-merge skew at runtime; these are for when the skew is in an
AGGREGATION or you need deterministic pre-planned handling.

The salt is POSITIONAL (hash of monotonically_increasing_id): a hot key
whose rows are byte-identical — the common duplicate-heavy shape — still
spreads across all n salts, which a content hash cannot do. Aggregation
results are independent of which salt a row lands on (sum/count are
algebraic over any split), so salt-assignment nondeterminism across task
retries cannot change the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Positional row salt in [0, n_salts) — spreads even byte-identical
    rows (a content hash would pin every duplicate of a hot row to ONE
    reducer, recreating the hotspot it exists to break)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe exact sum+count: groupBy(key, salt) partial → groupBy(key)
    final. The hot key's rows spread across ``n_salts`` reducers in phase 1;
    phase 2 merges |keys|×|salts| tiny partials. Decimal-exact, so the
    result is bit-identical to the unsalted aggregation."""
    salted = with_salt(df.select(*group_cols, value_col), n_salts)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(*group_cols).agg(
        F.round(F.sum("_psum"), 2).cast("double").alias("total"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate-and-salt equi-join for a skewed fact key: each fact row
    gets a deterministic salt in [0, n_salts); the dim side is replicated
    once per salt value; the join runs on (key, salt). A hot fact key's
    rows land on ``n_salts`` different reducers instead of one.

    Row-identical to ``fact.join(dim, key, how)`` for ``inner`` and
    ``left`` joins: every fact row carries exactly one salt, so it meets
    exactly one replica of its dim row (inner), and an unmatched fact row
    null-extends exactly once (left). Dim-preserving joins (right/full/
    semi/anti on the dim side) are NOT supported — the replicated dim
    would emit its unmatched rows once per salt — so they raise rather
    than silently corrupt.

    Cost: dim shuffle volume ×n_salts; use when the dim is small-ish but
    above the broadcast threshold and AQE's runtime skew split isn't
    available (e.g. the skewed side feeds a co-partitioned downstream op).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "dim replication would duplicate unmatched dim rows per salt"
        )
    salted_fact = with_salt(fact, n_salts, "_salt")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_dim = dim.select("*", salts)
    return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")
