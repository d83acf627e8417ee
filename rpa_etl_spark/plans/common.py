"""Shared helpers for declared query plans.

The driver hash-compares query output values against a DuckDB oracle.
Summing IEEE doubles is order-dependent, and Spark/DuckDB will not sum in
the same order — so any money-ish aggregate must run in exact DECIMAL
arithmetic and only then be rounded and cast back to double. ``dec`` /
``money`` encapsulate that on the Spark side; the oracle SQL mirrors it
with ``CAST(x AS DECIMAL(p,s))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact-decimal view of a double column (deterministic aggregation)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money(col: Column) -> Column:
    """Round an exact-decimal aggregate to 2 dp and return a double.

    Cast of the *same* decimal value to double is deterministic in both
    Spark and DuckDB, so hash-compare is stable.
    """
    return F.round(col, 2).cast("double")


def scratch_dir(spark, sf_dir: str, kind: str) -> str:
    """STABLE (kind, sf)-keyed scratch path under the repo's
    spark-warehouse for queries that must write (sink round-trips,
    bucketed layouts).

    Keyed by the scale factor because the returned DataFrames read
    lazily and a later call at another sf must not overwrite this one's
    files. Deliberately NOT keyed by the application id (it was through
    round 10): every writer targeting these paths uses overwrite mode on
    deterministic data, so cross-session reuse rewrites identical bytes
    in place and nothing accumulates across runs. The trade-off is that
    two CONCURRENT sessions at the same sf would race the overwrite —
    out of scope for this single-tenant sandbox, same class of
    documented limitation as tablefmt's single-POSIX-filesystem commit
    arbiter (operators/tablefmt.py).
    """
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
        kind,
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
    )
