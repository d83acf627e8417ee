"""Z-order (Morton-curve) data layout for multi-column file skipping.

Parquet data skipping works off per-file (and per-row-group) min/max
statistics: a filter can skip a file only when the file's value RANGE for
the filtered column is narrow. Sorting by a single column narrows that
column's ranges but leaves every other column's ranges full-width.
Interleaving the bits of several columns into one Morton code and sorting
by it narrows the ranges of ALL participating columns simultaneously —
the standard lakehouse `OPTIMIZE ... ZORDER BY` layout, here as a plain
column expression + `repartitionByRange/sortWithinPartitions` write.

At 100 TB this is a layout-time investment (one range shuffle + local
sort at write) that pays on every subsequent selective scan: multi-
predicate queries skip the files whose interleaved ranges exclude the
predicate box. Everything is JVM bit arithmetic — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rpa_etl_spark.functions.exprs import col_memo

# bits kept per dimension; 2 dims x 16 bits fits comfortably in a long
_BITS = 16


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) by linear scaling over
    [lo, hi] (caller supplies bounds — at scale these come from table
    stats, not an extra pass). Values at hi map to the top bucket."""
    span = (hi - lo).cast("double")
    frac = (col.cast("double") - lo.cast("double")) / span
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.least(
        (clamped * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


@col_memo
def morton2(
    col_a: Column,
    lo_a: float,
    hi_a: float,
    col_b: Column,
    lo_b: float,
    hi_b: float,
    bits: int = _BITS,
) -> Column:
    """Two-dimensional Morton code: interleave ``bits`` bits of each
    scaled column (a in even positions, b in odd). Pure shift/or
    expression tree — ``bits`` static iterations, no Python at runtime."""
    a = _scale_to_bits(col_a, F.lit(lo_a), F.lit(hi_a), bits)
    b = _scale_to_bits(col_b, F.lit(lo_b), F.lit(hi_b), bits)
    code = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return code


def morton(
    dims: list[tuple[Column, float, float]],
    bits: int | None = None,
) -> Column:
    """N-dimensional Morton code (round 12): interleave the scaled bits
    of every ``(column, lo, hi)`` dimension — dimension j owns bit
    positions ``i*n + j``. ``bits`` defaults to the most each dimension
    can carry in a 63-bit signed long (16 for 2-3 dims, 15 at 4, ...).
    morton2 is the fixed two-dimensional special case (kept for the
    oracle-checked q_zorder_code, whose SQL twin states the 2-D layout).
    Pure shift/or expression tree — ``bits * n`` static iterations, no
    Python at runtime."""
    n = len(dims)
    if n < 2:
        raise ValueError("morton needs at least two dimensions")
    if bits is None:
        bits = min(_BITS, 63 // n)
    scaled = [
        _scale_to_bits(col, F.lit(lo), F.lit(hi), bits) for col, lo, hi in dims
    ]
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, i * n + j))
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    bounds_a: tuple[float, float],
    col_b: str,
    bounds_b: tuple[float, float],
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet laid out along the 2-D Morton curve of
    (col_a, col_b): range-partition by the code so each output file owns
    a contiguous curve segment (a small tile in (a, b) space), then sort
    within partitions so row groups tile too. Bounds come from the
    caller (table-stat lookups at scale)."""
    code = morton2(
        F.col(col_a), bounds_a[0], bounds_a[1], F.col(col_b), bounds_b[0], bounds_b[1]
    )
    (
        df.withColumn("_z", code)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
