"""Shared engine-neutral hash-slice kernel.

Bloom positions (operators/bloom.py) and Count-Min buckets
(operators/sketches.py) both need k independent uniform hashes of a key
that Spark and DuckDB compute bit-identically. This module is the ONE
definition of that scheme — disjoint 6-hex-char slices of md5(key),
each reduced mod a power of two (which divides the 24-bit slice range
evenly, so the result is uniform) — in both its Spark-column and
DuckDB-SQL mirror forms. Keeping the pair in one place is what stops
the mirrors from silently desynchronizing (the q_sample_hash lesson:
an inline copy of a cross-engine expression is a latent oracle red).

md5 has 32 hex chars, so n_slices ≤ 5 at 6 chars per slice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SLICE_CHARS = 6  # hex chars per slice → 24 bits each


def check_modulus(modulus: int, lo: int = 2) -> None:
    """Power-of-two modulus in [lo, 2^24] (divides 16^6 evenly)."""
    if modulus & (modulus - 1) or not lo <= modulus <= 1 << 24:
        raise ValueError(f"modulus must be a power of two in [{lo}, 2^24]")


def md5_slices(key_col: Column, n_slices: int, modulus: int) -> list[Column]:
    """n_slices independent values in [0, modulus) for a key. Slice i
    covers md5 hex chars 1+6i .. 6+6i (1-based, inclusive — substring
    length SLICE_CHARS)."""
    if not 1 <= n_slices <= 5:
        raise ValueError("n_slices must be in [1, 5] (md5 has 32 hex chars)")
    h = F.md5(key_col.cast("string"))
    return [
        (
            F.conv(
                F.substring(h, 1 + i * SLICE_CHARS, SLICE_CHARS), 16, 10
            ).cast("long")
            % modulus
        )
        for i in range(n_slices)
    ]


def md5_slices_sql(key_expr: str, n_slices: int, modulus: int) -> list[str]:
    """The DuckDB mirror of :func:`md5_slices` — same slices, same mod."""
    return [
        f"(CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), "
        f"{1 + i * SLICE_CHARS}, {SLICE_CHARS})) AS BIGINT) % {modulus})"
        for i in range(n_slices)
    ]
