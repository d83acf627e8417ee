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
