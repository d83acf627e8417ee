"""Skew mitigation utilities (the 100 TB reality: keys are never uniform).

Two standard techniques, composable with any plan:

- ``salted_sum_count``: two-phase aggregation — add a salt to the group
  key, partially aggregate (spreads one hot key over N reducers), then
  re-aggregate without the salt. Works for any algebraic aggregate
  (sum/count/min/max); here exposed for decimal-exact sum+count.
- ``salted_join``: replicate-and-salt pattern for joining a skewed fact
  against a dim above the broadcast threshold: the dim is replicated once
  per salt so every fact row meets exactly one replica.

AQE's skew-join splitting (enabled in session.py) already handles
sort-merge skew at runtime; these are for when the skew is in an
AGGREGATION or you need deterministic pre-planned handling.

Salt derivation: a DETERMINISTIC content hash of ``salt_cols`` (default:
all columns). Determinism is what makes salting retry-safe — a recomputed
task assigns every row the same salt as the lost attempt, so partial
aggregates can never double-count under shuffle-fetch recovery. The
trade-off: byte-identical duplicate rows share a salt. When the data is
duplicate-heavy, pass a distinguishing column (a unique id) as
``salt_cols`` — positional salts (monotonically_increasing_id / rand)
would spread duplicates too, but their assignment changes on recompute,
which is exactly the nondeterministic-shuffle-retry correctness trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    n_salts: int = 16,
    col_name: str = "_salt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic row salt in [0, n_salts): content hash of
    ``salt_cols`` (default all columns). Retry-safe by construction; for
    duplicate-heavy data pass a unique id column so identical payload
    rows still spread (see module docstring for the trade-off)."""
    if col_name in df.columns:
        # withColumn would silently REPLACE (and salted_join later drop)
        # a user column of this name — make the collision loud
        raise ValueError(f"input already has a {col_name!r} column")
    cols = salt_cols if salt_cols is not None else df.columns
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe exact sum+count: groupBy(key, salt) partial → groupBy(key)
    final. The hot key's rows spread across ``n_salts`` reducers in phase 1;
    phase 2 merges |keys|×|salts| tiny partials. Decimal-exact, so the
    result is bit-identical to the unsalted aggregation."""
    # keep any salt_cols in the pre-salt projection — the documented
    # duplicate-heavy escape hatch passes a unique-id column that is
    # neither a group key nor the value (round-10 review fix: it
    # previously crashed unresolved)
    proj = list(dict.fromkeys([*group_cols, value_col, *(salt_cols or [])]))
    salted = with_salt(df.select(*proj), n_salts, salt_cols=salt_cols)
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
    salt_cols: list[str] | None = None,
    hot_threshold: int | None = None,
    broadcast_dim: bool = False,
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

    Cost: dim shuffle volume ×n_salts. The round-10 scaling probe
    measured that cost's growth directly (SCALE.md §10): with
    ``hot_threshold=None`` the WHOLE dim replicates, so the extra shuffle
    grows linearly with dim size and dominates once the base-plan
    overhead stops hiding it (5x data → 2.6x time on a uniform key,
    where plain ran 1.5x). Salting every key buys nothing for the cold
    ones — skew is by definition concentrated.

    ``hot_threshold``: selective salting (the production form, and what
    AQE's runtime skew split approximates). One map-side-combined
    aggregate over the fact finds keys with more than ``hot_threshold``
    rows — a SMALL set by the definition of skew — which is broadcast to
    split both sides: hot fact rows take the salted join against only
    the hot slice of the dim; everything else takes the plain join; the
    union is row-identical. Replication volume becomes |hot keys| x
    n_salts instead of |dim| x n_salts. (At 100 TB the exact count pass
    can be replaced by a sample or prior key statistics; the exact form
    keeps this oracle-checkable.)
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "dim replication would duplicate unmatched dim rows per salt"
        )
    if hot_threshold is not None:
        # checkpoint the hot-key set: it is BOUNDED (skew means few hot
        # keys) but feeds four consumers (hot/cold splits of both sides),
        # and without a barrier each consumer re-runs the full fact
        # count — the executed plan of q_join_skew_salted carried the
        # detection aggregate (and the fact subtree under it) four times
        hot = (
            fact.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > hot_threshold)
            .select(key)
            .localCheckpoint(eager=False)
        )
        fact_hot = fact.join(F.broadcast(hot), key, "left_semi")
        fact_cold = fact.join(F.broadcast(hot), key, "left_anti")
        dim_hot = dim.join(F.broadcast(hot), key, "left_semi")
        # the hot dim slice is bounded by |hot keys| x n_salts BY THE
        # DEFINITION of skew (few hot keys), so broadcasting it is the
        # deliberate strategy — size ESTIMATES after the semi join are
        # unreliable (guide: use an explicit hint when smallness is
        # structural), and without the hint the hot partition falls back
        # to a sort-merge join exactly where the skew lives. Gated by
        # tests/test_scale_patterns.py with auto-broadcast disabled.
        hot_part = salted_join(
            fact_hot, dim_hot, key, n_salts=n_salts, how=how,
            salt_cols=salt_cols, broadcast_dim=True,
        )
        cold_part = fact_cold.join(dim, key, how)
        return hot_part.unionByName(cold_part)
    salted_fact = with_salt(fact, n_salts, "_salt", salt_cols=salt_cols)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_dim = dim.select("*", salts)
    if broadcast_dim:
        replicated_dim = F.broadcast(replicated_dim)
    return salted_fact.join(replicated_dim, [key, "_salt"], how).drop("_salt")
