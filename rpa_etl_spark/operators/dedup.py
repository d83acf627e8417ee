"""Deduplication operators for LLM-training-data pipelines.

Five dedup families over a text corpus (`documents`), designed so the
cheap exact pass always runs first and the expensive near-dup passes work
on hash-bucketed candidates, never all-pairs:

- exact:     sha256(normalized text) → groupBy → keep canonical id.
  One shuffle keyed by the hash; at 100 TB use this before anything else.
- n-gram Jaccard: word-shingle set overlap for candidate pairs.
- MinHash+LSH:  k permutation-style hashes over shingles → band buckets →
  candidates are pairs sharing ≥1 band bucket. Shuffle is keyed by
  (band, bucket-hash): linear in corpus size, never quadratic.
- SimHash:   64-bit signed-bit-sum signature (vectorized numpy pandas_udf);
  near-dups = small Hamming distance, bucketed by signature prefix.
- Embedding cosine: see operators/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from rpa_etl_spark.functions.exprs import let1

MERSENNE_31 = (1 << 31) - 1


def normalize_for_dedup(col: Column) -> Column:
    """Cheap canonicalization before exact hashing: lower, collapse ws."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one hash-keyed shuffle; emits canonical id + copy count."""
    h = F.sha2(normalize_for_dedup(F.col(text_col)), 256)
    return (
        df.select(F.col(id_col), h.alias("text_sha"))
        .groupBy("text_sha")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (the near-dup unit). In-row transform — the
    shingle set never leaves the document row.

    The split is let-bound so each of the n ``element_at`` references in
    the gram lambda reads a materialized array instead of re-running the
    regex split (unbound form measured 15x slower at sf0.1)."""

    def body(words: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        )
        # guard: with fewer than n words there are no shingles. sequence()
        # with stop < start counts DOWN ([1,0], [1,0,-1], ...), so the
        # unguarded transform would call element_at out of bounds and —
        # under ANSI mode — kill the job on the first short document.
        return F.when(
            F.size(words) >= n, F.array_distinct(grams)
        ).otherwise(F.array().cast("array<string>"))

    return let1(F.split(col, r"\s+"), body)


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: min over shingles of (a_j·x + b_j) mod M31 where
    x = xxhash64(shingle) — all JVM-side, one array column out.

    Deterministic hash-family coefficients derive from the hash index, so
    signatures are reproducible across runs/clusters.

    The shingle hashes are let-bound once: the ``num_hashes`` array_min
    folds then each scan a materialized long array (otherwise every fold
    re-evaluates the shingle expression AND re-hashes every element).
    """
    hashed = F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % MERSENNE_31)

    # IMPORTANT: the per-j lambda must be built by a factory so it has
    # arity 1. A `lambda x, j=j:` spelling has TWO parameters, which
    # PySpark treats as an (element, index) lambda — j silently binds to
    # the array INDEX column instead of the captured constant, collapsing
    # every hash-family member into the same function.
    def _affine(j: int):
        return lambda x: (x * (2 * j + 1) + j * 0x9E3779B1) % MERSENNE_31

    def body(hs: Column) -> Column:
        sigs = [
            F.array_min(F.transform(hs, _affine(j))).alias(f"mh_{j}")
            for j in range(num_hashes)
        ]
        return F.array(*sigs)

    return let1(hashed, body)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 8,
    sig_len: int = 32,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` equal slices, bucket
    by (band index, slice hash), self-join buckets for candidates.

    The self-join shuffles on the bucket key — candidate volume scales with
    collisions, not |corpus|². Pairs are deduplicated (a<b) since two docs
    can share several bands.

    ``sig_len`` is the signature length the caller built (default matches
    :func:`minhash_signatures`). It is a required static parameter — a
    peek-at-one-row fallback would cost a driver-side Spark job per call.
    """
    if sig_len % bands:
        raise ValueError(f"sig_len {sig_len} not divisible by bands {bands}")
    rows_per_band = sig_len // bands

    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band).cast(
                        "string"
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


@F.pandas_udf(LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """Bit-aggregation half of SimHash over per-token 64-bit hashes:
    unpack each hash to 64 sign contributions (+1/−1), sum per document,
    sign of each bit-sum becomes the signature bit. Fully vectorized —
    ragged token lists are flattened once and segment-summed (reduceat)."""
    n = len(hashes)
    if n == 0:
        return pd.Series([], dtype=np.int64)
    lengths = np.array([0 if h is None else len(h) for h in hashes])
    nonempty = [h for h in hashes if h is not None and len(h) > 0]
    out = np.zeros(n, dtype=np.int64)
    if nonempty:
        flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in nonempty]).view(
            np.uint64
        )
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        contrib = 2 * bits - 1  # total_tokens x 64
        starts = np.concatenate(([0], np.cumsum(lengths[lengths > 0])[:-1]))
        sums = np.add.reduceat(contrib, starts, axis=0)  # docs_with_tokens x 64
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).view(np.int64)
        sigs = (sums > 0) @ weights
        out[lengths > 0] = sigs
    return pd.Series(out)


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over a token array: per-token hashing stays JVM-side
    (xxhash64 inside a transform — deterministic across processes), only
    the bit aggregation crosses to numpy via Arrow. The earlier all-Python
    version (hashlib per token, per-row loop) was ~10x slower."""
    return _simhash_from_hashes(F.transform(tokens, lambda t: F.xxhash64(t)))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (JVM bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Independently-verifiable (md5-family) variants
#
# The xxhash64 families above are the high-throughput defaults (one JVM hash
# per shingle/token). These md5 variants compute the SAME algorithms from a
# hash any engine can reproduce (md5 of the same string → same hex), so a
# DuckDB oracle can recompute signatures, buckets, and pairs bit-for-bit.
# md5 costs ~3-5x xxhash64 per call — still JVM-side, still linear, still the
# same shuffle structure; use them when end-to-end verifiability matters.
# ---------------------------------------------------------------------------


def minhash_signature_md5(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash with hash family h_j(s) = 16 hex chars of
    ``md5(s) || md5('#' || s)`` starting at offset 3j, minimized
    lexicographically — fixed-width lowercase hex makes string order
    identical to numeric order, so DuckDB's list_min over the same
    substrings reproduces the signature exactly.

    Sliding 16-hex windows over ONE 32-byte double digest cost 2 md5
    calls per shingle instead of ``num_hashes`` (8x cheaper on both
    engines at the default 16). Windows overlap, but each h_j leads with
    a hex region no other h_j leads with, and lexicographic min is
    decided by the leading chars — family members stay effectively
    independent for banding purposes (recall gates in tests hold)."""
    if num_hashes > 17:
        raise ValueError(f"md5 window family supports <= 17 hashes, got {num_hashes}")
    digests = F.transform(
        shingles, lambda s: F.concat(F.md5(s), F.md5(F.concat(F.lit("#"), s)))
    )
    # Window minima stay pure column expressions HERE; the production
    # query uses attach_minhash_md5_arrow (below), which gets the ~2x
    # Arrow-kernel win safely: a scalar pandas_udf column cannot feed the
    # downstream LSH Generate/self-join tree (Catalyst re-inlines the UDF
    # into the generator input, where the interpreted evaluator cannot
    # run it — INTERNAL_ERROR: Cannot evaluate PythonUDF), but mapInPandas
    # is a physical operator whose output no rule can inline. This
    # expression form remains the parity pin and the pure-JVM fallback.

    # arity-1 lambda factory — see the note in minhash_signature: a
    # `lambda d, j=j:` spelling would bind j to the array index column.
    def _window(j: int):
        return lambda d: F.substring(d, 3 * j + 1, 16)

    def body(ds: Column) -> Column:
        sigs = [
            F.array_min(F.transform(ds, _window(j))).alias(f"mh_{j}")
            for j in range(num_hashes)
        ]
        return F.array(*sigs)

    return let1(digests, body)


def lsh_candidate_pairs_md5(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 8,
    sig_len: int = 16,
) -> DataFrame:
    """LSH banding over an md5-family signature: bucket key is md5 of the
    '|'-joined band slice. Same linear shuffle structure as
    lsh_candidate_pairs, but every bucket id is engine-reproducible."""
    if sig_len % bands:
        raise ValueError(f"sig_len {sig_len} not divisible by bands {bands}")
    rpb = sig_len // bands
    # band count is static, so the band hashes unroll to plain expressions
    # (no higher-order lambda): the signature column may come from an
    # Arrow-batched kernel, and Python-UDF outputs cannot be referenced
    # inside an interpreted HOF lambda — Catalyst's UDF extraction only
    # rewrites non-lambda expression trees.
    band_hashes = F.array(
        *[
            F.md5(F.concat_ws("|", F.slice(F.col(sig_col), b * rpb + 1, rpb)))
            for b in range(bands)
        ]
    )
    banded = df.select(F.col(id_col), band_hashes.alias("_bands")).select(
        F.col(id_col),
        F.posexplode("_bands").alias("band", "bucket"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def simhash60_md5(tokens: Column) -> Column:
    """60-bit SimHash from the first 15 hex chars of md5(token) (60 bits
    keeps the value exactly representable as a BIGINT in both engines).
    Per-token hashing stays JVM-side (md5 inside a transform — the part
    DuckDB reproduces with CAST('0x'||substr(md5(t),1,15) AS UBIGINT));
    the bit-vote aggregation reuses the vectorized Arrow kernel shared
    with simhash64. A 60-bit hash's bits 60-63 are always 0, so their
    votes are all −1 and the kernel's 64-bit signature has zero high bits
    — numerically identical to a 60-bit fold. (The earlier pure-expression
    fold ran 60 interpreted higher-order aggregates per document —
    measured ~4x slower than one Arrow crossing.)"""
    hashed = F.transform(
        tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    return _simhash_from_hashes(hashed)


def attach_minhash_md5_arrow(
    df: DataFrame,
    grams_col: str = "grams",
    out_col: str = "minhash",
    num_hashes: int = 16,
) -> DataFrame:
    """Arrow-batched twin of :func:`minhash_signature_md5`: append the md5
    window-family signature as ``out_col`` via ONE ``mapInPandas`` stage.

    Why this exists when the scalar-UDF attempt (note in
    minhash_signature_md5) failed: a scalar ``pandas_udf`` is an
    EXPRESSION, and Catalyst re-inlines it into the downstream LSH
    Generate's input where the interpreted evaluator cannot run it.
    ``mapInPandas`` is a PHYSICAL operator — its output columns are
    materialized plan output, so the banding Generate/self-join tree
    consumes them like any scan column. Parity with the expression form
    is cell-exact (hashlib md5 == JVM md5 on UTF-8 bytes; fixed-width
    lowercase hex makes Python ``min`` == Spark ``array_min`` == DuckDB
    ``list_min``), pinned by tests/test_llmdata.py. Cost model: 2 hashlib
    calls + 16 slice-mins per shingle in one Python loop per batch vs an
    interpreted HOF fold per window — measured ~2x on the signature pass;
    per-executor, so the ratio holds at any cluster size."""
    import hashlib

    if num_hashes > 17:
        # same guard as the expression twin: window j starts at hex offset
        # 3j and needs 16 chars of the 64-char double digest — past 17 the
        # slices silently shorten into degenerate (mass-colliding) minima
        raise ValueError(f"md5 window family supports <= 17 hashes, got {num_hashes}")

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )

    def run(batches):
        for pdf in batches:
            sigs = []
            for grams in pdf[grams_col]:
                if grams is None:
                    # expression-twin semantics: transform(null) -> null
                    # digests -> null window minima
                    sigs.append([None] * num_hashes)
                    continue
                digs = [
                    hashlib.md5(g.encode()).hexdigest()
                    + hashlib.md5(("#" + g).encode()).hexdigest()
                    for g in grams
                ]
                if digs:
                    sigs.append(
                        [min(d[3 * j : 3 * j + 16] for d in digs) for j in range(num_hashes)]
                    )
                else:
                    # expression-twin semantics: array_min over empty -> null slots
                    sigs.append([None] * num_hashes)
            block = pdf.copy()
            block[out_col] = sigs
            yield block

    return df.mapInPandas(run, out_schema)


def attach_simhash60_md5_arrow(
    df: DataFrame, text_col: str = "text", out_col: str = "sig"
) -> DataFrame:
    """Arrow-batched twin of ``simhash60_md5(tokens(text))``: tokenize,
    md5-hash, and bit-vote in ONE mapInPandas stage (the expression form
    crosses to Arrow only for the bit-vote and pays an interpreted
    transform + conv per token for the hashing half).

    mapInPandas for the same reason as :func:`attach_minhash_md5_arrow`:
    the signature feeds a bucketed self-join, and a scalar-UDF column
    would be re-inlined where the interpreted evaluator cannot run it.
    Parity is Java-exact and pinned by test: tokens split on the ASCII
    ``\\s`` class after space-only trim (same contract as
    operators/textstats_arrow.py), hash = first 15 hex chars of
    hashlib md5 == JVM/DuckDB md5, bit-vote identical to
    _simhash_from_hashes (null text -> signature 0)."""
    import hashlib
    import re as _re

    _ws_run = _re.compile("[ \t\n\x0b\f\r]+")

    def _sig_one(t) -> int:
        if t is None:
            return 0
        toks = _ws_run.split(t.strip(" "))
        hs = np.array(
            [int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) for tok in toks],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        sums = (2 * bits - 1).sum(axis=0)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).view(np.int64)
        return int((sums > 0) @ weights)

    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])

    def run(batches):
        for pdf in batches:
            block = pdf.copy()
            block[out_col] = [_sig_one(t) for t in pdf[text_col]]
            yield block

    return df.mapInPandas(run, out_schema)
