"""Distributed Bloom-filter membership (approximate set containment).

The 100 TB shape: a reference corpus too large to exact-join against on
every ingest batch is summarized once into an m-bit Bloom filter — k
deterministic hash positions per key, OR-ed into a bitmap — and every
incoming row probes the (tiny, broadcastable) bitmap. False positives
are possible at the designed rate; false negatives are impossible, so
"definitely new" is exact — which is the decision that matters for
incremental dedup (a false positive only costs one redundant exact
check downstream).

Implementation is engine-neutral integer arithmetic end-to-end:

- k=5 hash positions per key = five disjoint 6-hex-char slices of
  md5(key), each mod m (m a power of two ≤ 2^24 divides 16^6 evenly in
  the slice range, so positions are uniform).
- Build: explode keys → 5 positions → groupBy (pos DIV 64)
  → BIT_OR(1 << (pos MOD 64)) — no distinct step: bit_or is idempotent
  over duplicate positions, so dedup would only add a second exchange
  (removed round 14) — at most m/64 rows of (word_idx, word),
  the bitmap as a DataFrame. One shuffle of at most k·N tiny rows that
  partial-aggregates map-side; the result is ≤ m/64 rows regardless of
  corpus size.
- Probe, two forms:
  * :func:`probe` — pure-plan: distinct probe keys explode to positions,
    broadcast-join the bitmap, require all k bits set. No collect; use
    when m is large.
  * :func:`probe_inline` — the canonical broadcast shape: the bitmap
    (≤ m/64 longs, bounded BY CONSTRUCTION — this is the whole point of
    a Bloom filter) is collected once and embedded as a literal array,
    so the probe is a narrow per-row expression with ZERO joins and
    ZERO shuffles. This is what "broadcast the filter to 1000
    executors" compiles to on Spark.

Everything is int64 ops, so Spark and the DuckDB oracle agree
bit-for-bit — the oracle re-derives membership as "all k positions ∈
the reference position set", which is exactly what the bitmap encodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rpa_etl_spark.operators import hashing as H

N_HASHES = 5


def _check_m(m_bits: int) -> None:
    H.check_modulus(m_bits, lo=64)


def positions(key_col: Column, m_bits: int) -> list[Column]:
    """k deterministic bit positions in [0, m_bits) for a key (the
    shared md5-slice kernel, operators/hashing.py)."""
    _check_m(m_bits)
    return H.md5_slices(key_col, N_HASHES, m_bits)


def positions_sql(key_expr: str, m_bits: int) -> list[str]:
    """DuckDB mirror of :func:`positions` (same slices, same modulus)."""
    return H.md5_slices_sql(key_expr, N_HASHES, m_bits)


# 1 << i for i in 0..63 as signed int64 literals (bit 63 is the sign bit).
# PySpark's shiftleft/shiftright helpers only take Python-int shift
# amounts, so column-valued bit selection goes through this literal
# mask table instead — element_at + bitwiseAND, all inside codegen.
# F.lit(list) builds ONE array literal node (vs CreateArray with 64 lit
# children per use site — measured to matter for plan size/compile time
# once probe_inline embeds a 1024-word filter five times).
def _masks() -> Column:
    return F.lit([(1 << i) if i < 63 else -(1 << 63) for i in range(64)])


def _mask_at(pos: Column) -> Column:
    """The int64 with only bit (pos % 64) set."""
    return F.element_at(_masks(), (pos % 64).cast("int") + 1)


def build(df: DataFrame, key_col: str, m_bits: int) -> DataFrame:
    """Bitmap DataFrame (word_idx BIGINT, word BIGINT) — ≤ m_bits/64 rows.

    NULL keys are dropped (a NULL hashes to NULL positions, which would
    surface as a NULL-group bitmap row and crash collect_words; a NULL
    key is also not a meaningful set member)."""
    pos = F.explode(F.array(*positions(F.col(key_col), m_bits))).alias("pos")
    # no distinct before the aggregate: bit_or is idempotent, so duplicate
    # positions change nothing — the distinct was a second full exchange
    # (and a second evaluation of the hash columns) for identical words
    return (
        df.where(F.col(key_col).isNotNull())
        .select(pos)
        .groupBy(F.expr("pos DIV 64").alias("word_idx"))
        .agg(F.bit_or(_mask_at(F.col("pos"))).alias("word"))
    )


def _bit_set(word: Column, pos: Column) -> Column:
    """word & (1 << (pos % 64)) != 0."""
    return word.bitwiseAND(_mask_at(pos)) != 0


def probe(df: DataFrame, key_col: str, bitmap: DataFrame, m_bits: int) -> DataFrame:
    """Append ``bloom_hit`` (true = maybe present, false = DEFINITELY new).

    Pure-plan form: distinct keys → k position rows → broadcast join the
    bitmap on word_idx (missing word row == 64 zero bits) → all-k
    conjunction → joined back to ``df`` on the key. Two key-shuffles of
    distinct keys plus one broadcast join; prefer :func:`probe_inline`
    when m is small enough to embed.
    """
    probe_pos = (
        df.select(F.col(key_col).alias("_bloom_key"))
        .distinct()
        .select(
            "_bloom_key",
            F.explode(F.array(*positions(F.col("_bloom_key"), m_bits))).alias("pos"),
        )
    )
    joined = probe_pos.join(
        F.broadcast(bitmap),
        F.expr("pos DIV 64") == F.col("word_idx"),
        "left",
    ).select(
        "_bloom_key",
        _bit_set(F.coalesce(F.col("word"), F.lit(0).cast("long")), F.col("pos")).alias(
            "bit_set"
        ),
    )
    hits = joined.groupBy("_bloom_key").agg(
        (F.sum(F.when(F.col("bit_set"), 1).otherwise(0)) == N_HASHES).alias(
            "bloom_hit"
        )
    )
    return df.join(hits, df[key_col] == hits["_bloom_key"], "left").drop("_bloom_key")


def collect_words(bitmap: DataFrame, m_bits: int) -> list[int]:
    """Materialize the bitmap as a dense m_bits/64-long word list.

    BOUNDED collect: the row count is capped at m_bits/64 by the groupBy
    key's domain (≤ 2^18 rows at the modulus ceiling), independent of
    corpus size — compressing the corpus to exactly this is the Bloom
    filter's job.
    """
    _check_m(m_bits)
    words = [0] * (m_bits // 64)
    for r in bitmap.collect():
        words[int(r["word_idx"])] = int(r["word"])
    return words


def probe_inline(
    df: DataFrame, key_col: str, words: list[int], m_bits: int
) -> DataFrame:
    """Append ``bloom_hit`` testing against an embedded literal bitmap.

    Zero joins, zero shuffles: `element_at(words, pos DIV 64 + 1)` plus a
    shift-and-mask per hash, all inside whole-stage codegen. The literal
    array ships to executors once inside the serialized plan — the Spark
    rendering of "broadcast the filter".
    """
    arr = F.lit([int(w) for w in words])
    tests = [
        _bit_set(F.element_at(arr, (p / F.lit(64)).cast("int") + 1), p)
        for p in positions(F.col(key_col), m_bits)
    ]
    hit = tests[0]
    for t in tests[1:]:
        hit = hit & t
    # explicit NULL-key guard: element_at(<literal array>, <runtime-NULL
    # index>) mis-evaluates to the LAST element under whole-stage codegen
    # (measured on Spark 4.1: a foldable-array child with a non-foldable
    # null index), so the null must be decided before the bit tests —
    # matching probe()'s left-join semantics (NULL key → NULL verdict)
    return df.withColumn(
        "bloom_hit",
        F.when(F.col(key_col).isNull(), F.lit(None).cast("boolean")).otherwise(hit),
    )
