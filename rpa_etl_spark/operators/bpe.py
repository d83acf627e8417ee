"""Corpus-trained BPE tokenizer (round 6).

Replaces the regex ``bpe_ish_token_count`` estimate (operators/textstats.py)
with a REAL byte-pair-encoding merge table trained on the corpus itself —
the token budget a training-data pipeline actually runs on. Reference
parity: the reference has no tokenizer (its P-chain normalizes text only);
this is part of the LLM-data-pipeline surface the engine adds on top.

Design for 100 TB:

- The ONLY corpus-scale pass is the word-frequency aggregation: explode →
  ``groupBy(word).count()`` — one hash-keyed shuffle with map-side partial
  aggregation, linear in corpus size.
- The merge loop runs on the driver over the TOP-K word-frequency table
  (deterministic top-K: count desc, word asc). K is a constant (default
  4096), so the collect is broadcast-equivalent — the same bounded-state
  argument as the IVF centroid collects (operators/similarity.py). This is
  how production BPE trainers work (single-node merge loop over a counted
  vocabulary); corpus size only affects the counting pass.
- Application is an Arrow-batched ``mapInPandas`` kernel with an
  LRU-cached per-word encoder — one Python crossing per batch, and the
  cache collapses the (Zipf-distributed) word stream to one BPE walk per
  distinct word per executor.

Determinism (oracle rules): ties in the top-K break on word ascending;
ties in pair counts break on the marker-string pair representation
ascending (identical to the DuckDB oracle's ``ORDER BY f DESC, pair ASC``
— UTF-8 byte order equals codepoint order). Merge application is the
original sequential Sennrich semantics: each merge in rank order, one
left-to-right non-overlapping pass — which the oracle replays as a chain
of ``REPLACE`` calls over marker-prefixed symbol strings.

Whitespace is ONE explicit char class ``[ \\t\\n\\r\\f]`` in all three
engines (Spark/Java regex, the Python Arrow kernel, DuckDB/RE2) — ``\\s``
means three different things across them (Java: ASCII incl \\x0B; Python:
Unicode-aware; RE2: ASCII excl \\x0B), so a document containing \\x0B or
\\xa0 would silently diverge engine vs oracle. BMP caveat: the top-K
word ORDER BY compares UTF-16 code units in Spark but codepoints in
DuckDB; for non-BMP characters at a tie boundary the orders differ —
the corpus is BMP-only and the tie-break assumes that.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# marker scheme shared with the SQL oracle: every symbol is written as
# "\x02<sym> " — \x02-prefixed AND space-terminated — and words are joined
# with "\x03 ". A merge pattern "\x02a \x02b " can then never match the
# tail of a longer symbol (prefix marker), a PREFIX of a longer symbol
# (space terminator), or span a word boundary (\x03 interposes)
_SYM = "\x02"
_WORDSEP = "\x03"

DEFAULT_TOP_WORDS = 4096
DEFAULT_N_MERGES = 24

# the one whitespace definition, spelled identically for Java regex
# (F.split), Python re (Arrow kernel), and RE2 (DuckDB oracle)
_WS_CLASS = r"[ \t\n\r\f]+"


# ---- byte-level mode (round 8) -------------------------------------------
# Production LLM tokenizers are BYTE-level (GPT-2 lineage): the initial
# alphabet is the 256 bytes of the word's UTF-8 encoding, so arbitrary
# Unicode never needs an UNK symbol. Rather than a GPT-2-style visible-
# character bijection, a byte symbol here is its fixed-width UPPERCASE hex
# pair ("61" for b"a"): `hex(encode(word))` exists verbatim in Spark
# (Java) and DuckDB with identical output, so the ENTIRE marker-string
# merge machinery — symbolization regex, pair construction, tie-break
# ordering, REPLACE application, \x02-marker token counting — carries over
# unchanged, including the SQL training-replay oracle. Hex is also order-
# faithful: byte value order == hex-pair lexicographic order, so for pure
# ASCII the byte-level tie-break matches the char-level one (the
# equivalence property pinned in tests/test_bpe.py). Non-BMP caveat from
# the module docstring does not apply at byte level (hex is ASCII-only).


def _byte_syms(word: str) -> list[str]:
    """Python twin of the engines' symbolization: UTF-8 bytes as
    fixed-width uppercase hex pairs."""
    h = word.encode("utf-8").hex().upper()
    return [h[i : i + 2] for i in range(0, len(h), 2)]


def _symbolize(word: str, byte_level: bool) -> list[str]:
    return _byte_syms(word) if byte_level else list(word)


def word_frequencies(docs: DataFrame, col: str = "text") -> DataFrame:
    """Corpus word counts — the one corpus-scale pass (one keyed shuffle,
    map-side combine). Whitespace pre-tokenization, empties dropped."""
    return (
        docs.select(F.explode(F.split(F.col(col), _WS_CLASS)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = DEFAULT_N_MERGES,
    top_words: int | None = DEFAULT_TOP_WORDS,
    col: str = "text",
    byte_level: bool = False,
) -> list[tuple[str, str, int]]:
    """Train a BPE merge table on the corpus; returns
    ``[(left, right, pair_count), ...]`` in rank order (may be shorter than
    ``n_merges`` if the vocabulary exhausts its pairs). ``byte_level``
    symbolizes words as UTF-8 hex byte pairs (GPT-2-style no-UNK alphabet)
    instead of characters.

    Distributed counting → bounded top-K collect → driver merge loop (see
    module docstring for the scale argument).

    AT 100 TB: prefer :func:`train_bpe_distributed`. ``top_words=None``
    here collects the FULL word-frequency table to the driver — its
    cardinality is the corpus's distinct-word count, which at web scale is
    10⁷–10⁸ rows (a multi-GB driver collect). The distributed trainer is
    output-identical (property-tested) with O(1) driver memory at any
    vocabulary size; this loop's advantage is latency on small/bounded
    vocabularies (measured crossover in SCALE.md §11).

    ``top_words`` is a MEASURED knob, not a hard constant (round-6 verdict
    #4): ``None`` trains on the full vocabulary — still just the output of
    one keyed aggregate. SCALE.md §11 records the measured merge-table
    delta and timing of full-vocab vs top-4096 at sf0.1; the driver loop
    is O(vocab · merges) either way, and pair counts ride on word
    frequencies, so the default cutoff only drops the Zipf tail."""
    wf = word_frequencies(docs, col)
    if top_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(top_words)
    top = wf.collect()
    vocab: list[tuple[list[str], int]] = [
        (_symbolize(r["word"], byte_level), int(r["freq"])) for r in top
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        # argmax with the oracle's exact tie-break: count desc, then the
        # marker-string form of the pair ascending (trailing space included
        # — the oracle's pair strings are terminator-carrying)
        best = min(
            counts.items(),
            key=lambda kv: (-kv[1], f"{_SYM}{kv[0][0]} {_SYM}{kv[0][1]} "),
        )
        (left, right), cnt = best
        merges.append((left, right, cnt))
        merged = left + right
        for k, (syms, freq) in enumerate(vocab):
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[k] = (out, freq)
    return merges


def train_bpe_distributed(
    docs: DataFrame,
    n_merges: int = DEFAULT_N_MERGES,
    top_words: int | None = None,
    col: str = "text",
    byte_level: bool = False,
) -> list[tuple[str, str, int]]:
    """Fully distributed Sennrich trainer — the 100 TB upgrade path over
    :func:`train_bpe`'s driver merge loop (SCALE.md §11): the vocabulary
    NEVER leaves the cluster. The word-frequency table is symbolized into
    the same marker-string form the oracle uses (``\\x02sym `` per symbol);
    each merge round is (a) one pair-count aggregate — explode adjacent
    symbol pairs, freq-weighted sum, argmax via orderBy+limit(1), the only
    driver transfer being ONE (pair, count) row — and (b) one narrow
    ``replace`` projection applying the merge, lazily localCheckpointed so
    the NEXT round's count job materializes it as a side effect (one job
    per round total) and the previous round's state is unpersisted (the
    Lloyd-iteration pattern). Cost is n_merges small keyed shuffles,
    independent of vocabulary size.

    Output is IDENTICAL to ``train_bpe(top_words=None)`` — same counting,
    same (count desc, marker-pair asc) tie-break, same sequential
    left-to-right replace semantics (property-tested in tests/test_bpe.py);
    ``top_words`` bounds the vocab identically when given. Trade-off vs the
    driver loop: n_merges extra small Spark jobs (measured: the driver
    loop wins below ~10⁵ distinct words, this wins above — and never holds
    vocab×freq rows in driver memory)."""
    wf = word_frequencies(docs, col)
    if top_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(top_words)
    # localCheckpoint (not persist): each round's frame must CUT its
    # lineage, or 24 chained replace-projections nest the logical plan
    # deep enough that AQE's per-job explainString rendering OOMs the
    # driver (observed) — same iterative-state pattern as
    # operators/components.py
    # (?s) DOTALL: Java-regex '.' excludes line terminators (U+2028,
    # U+2029, U+0085) that the pinned whitespace class deliberately does
    # NOT split on — without the flag such a char stays unsymbolized and
    # the output diverges from train_bpe's list(word). Byte level instead
    # symbolizes the UTF-8 hex encoding two digits at a time — pure ASCII,
    # no DOTALL concern (see the byte-level block above).
    sym_src = (
        F.hex(F.encode(F.col("word"), "UTF-8")) if byte_level else F.col("word")
    )
    sym_pat = r"(..)" if byte_level else r"(?s)(.)"
    cur = wf.select(
        F.concat(F.regexp_replace(sym_src, sym_pat, _SYM + r"$1 ")).alias("s"),
        "freq",
    ).localCheckpoint()
    # Adjacent-pair extraction as ONE anchored-lookahead regex (round 14,
    # guide §1.2 per-task work): overlapping matches of two consecutive
    # marker symbols, equivalent to the previous split → sequence →
    # transform(concat_ws) expression tree but ~5× fewer plan nodes, which
    # cuts the per-round analysis/codegen cost that dominated each tiny
    # job at small vocab (measured below). The `(?<![^ ])` anchor admits a
    # match only at a symbol start (begin-of-string or after the symbol
    # separator space) — without it a literal marker byte INSIDE a
    # symbol's content would seed a phantom pair. Symbol contents can
    # never contain the separator space itself (words are split on the
    # whitespace class; merges strip interior markers only), so `[^ ]*`
    # spans exactly one symbol.
    pair_pat = (
        f"(?<![^ ])(?=((?:{re.escape(_SYM)}[^ ]* ){{2}}))"
    )
    merges: list[tuple[str, str, int]] = []
    prev_ckpt: DataFrame | None = None  # lazily-checkpointed predecessor
    init_ckpt = cur
    try:
        for _ in range(n_merges):
            best = (
                cur.select(
                    F.explode(
                        F.regexp_extract_all(F.col("s"), F.lit(pair_pat), 1)
                    ).alias("pair"),
                    "freq",
                )
                .groupBy("pair")
                .agg(F.sum("freq").alias("f"))
                .orderBy(F.desc("f"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            # the collect above materialized cur's LAZY checkpoint (round
            # 14, guide §2.4/§5): checkpointing every round with
            # eager=False keeps the replace chain ≤1 deep — trivial
            # per-round plans — while adding ZERO extra jobs (the eager
            # every-6 cadence paid 1 materialization job per 6 rounds and
            # carried a 6-deep chain into every count; measured 4.6 s →
            # 3.1 s for 24 rounds at sf0.1). The predecessor is only
            # unpersisted AFTER the checkpoint that hangs off it is
            # materialized.
            if prev_ckpt is not None:
                prev_ckpt.unpersist()
                prev_ckpt = None
            if not best:
                break
            pair, cnt = best[0]["pair"], int(best[0]["f"])
            left, right = (t[1:] for t in pair.split(" ")[:2])
            merges.append((left, right, cnt))
            merged = pair.replace(" " + _SYM, "")
            nxt = cur.select(
                F.replace(F.col("s"), F.lit(pair), F.lit(merged)).alias("s"),
                "freq",
            )
            prev_ckpt = cur
            cur = nxt.localCheckpoint(eager=False)
    finally:
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        cur.unpersist()
        init_ckpt.unpersist()
    return merges


def apply_merges(
    word: str, merges: list[tuple[str, str]], byte_level: bool = False
) -> list[str]:
    """Sequential Sennrich application: each merge in rank order, one
    left-to-right non-overlapping pass. Exactly the semantics the oracle's
    REPLACE chain replays."""
    syms = _symbolize(word, byte_level)
    for left, right in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def attach_bpe_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    col: str = "text",
    id_col: str = "doc_id",
    carry: list[str] | None = None,
    byte_level: bool = False,
) -> DataFrame:
    """Per-document BPE stats via one Arrow-batched mapInPandas crossing:
    ``(id_col, *carry, n_words, n_tokens)`` — ``carry`` columns pass
    through the kernel untouched (cheaper than a post-hoc join back). The
    per-word encoder is LRU-cached — Zipf word distribution means one BPE
    walk per distinct word."""
    import re as _re
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    carry = carry or []
    in_schema = docs.select(id_col, *carry, col).schema
    schema = StructType(
        [in_schema[id_col]]
        + [in_schema[c] for c in carry]
        + [
            StructField("n_words", IntegerType()),
            StructField("n_tokens", IntegerType()),
        ]
    )
    pairs = [(left, right) for left, right, *_ in merges]
    ws = _re.compile(_WS_CLASS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        @lru_cache(maxsize=65536)
        def count_word(w: str) -> int:
            return len(apply_merges(w, pairs, byte_level))

        for pdf in batches:
            n_words, n_tokens = [], []
            for text in pdf[col]:
                # NULL text = empty document (matches word_frequencies and
                # the oracle, where NULL splits to NULL → no words), not
                # the literal word 'None'
                s = "" if text is None or pd.isna(text) else str(text)
                words = [w for w in ws.split(s) if w]
                n_words.append(len(words))
                n_tokens.append(sum(count_word(w) for w in words))
            out = {id_col: pdf[id_col]}
            for c in carry:
                out[c] = pdf[c]
            out["n_words"] = n_words
            out["n_tokens"] = n_tokens
            yield pd.DataFrame(out)

    return docs.select(id_col, *carry, col).mapInPandas(kernel, schema=schema)


# =========================================================================
# Oracle-SQL generators: replay the training loop (chained CTEs, one
# pair-count + argmax + REPLACE triple per merge) and the application
# (chained REPLACEs over marker symbol strings) in pure DuckDB SQL.
# =========================================================================


def _sym_sql(expr: str, byte_level: bool) -> str:
    """SQL symbolization of one word expression: chars, or UTF-8 hex byte
    pairs (byte level) — DuckDB's hex(encode(..)) matches Spark's
    hex(encode(..)) byte for byte (both uppercase, both UTF-8)."""
    if byte_level:
        return f"regexp_replace(hex(encode({expr})), '(..)', chr(2) || '\\1 ', 'g')"
    return f"regexp_replace({expr}, '(.)', chr(2) || '\\1 ', 'g')"


def _common_ctes(n_merges: int, top_words: int, byte_level: bool = False) -> str:
    parts = [
        "toks AS MATERIALIZED (SELECT doc_id, list_filter(regexp_split_to_array(text,"
        " '[ \\t\\n\\r\\f]+'), w -> w <> '') AS words FROM documents)",
        "wf AS MATERIALIZED (SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq"
        " FROM toks, UNNEST(words) AS t(w) GROUP BY w)",
        f"top AS MATERIALIZED (SELECT word, freq FROM wf ORDER BY freq DESC, word ASC"
        f" LIMIT {top_words})",
        f"it0 AS MATERIALIZED (SELECT {_sym_sql('word', byte_level)} AS s, freq FROM top)",
    ]
    for k in range(n_merges):
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT pr AS pair, CAST(SUM(freq) AS BIGINT) AS f"
            f" FROM (SELECT string_split(s, ' ') AS L, freq FROM it{k}),"
            f" UNNEST(list_transform(range(1, len(L) - 1),"
            f" i -> L[i] || ' ' || L[i+1] || ' ')) AS u(pr) GROUP BY pr)"
        )
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT pair, f FROM p{k} ORDER BY f DESC, pair ASC LIMIT 1)"
        )
        parts.append(
            f"it{k + 1} AS MATERIALIZED (SELECT REPLACE(s,"
            f" COALESCE((SELECT pair FROM m{k}), chr(1)),"
            f" COALESCE(REPLACE((SELECT pair FROM m{k}), ' ' || chr(2), ''),"
            f" chr(1))) AS s, freq FROM it{k})"
        )
    return ",\n    ".join(parts)


def bpe_train_oracle_sql(
    n_merges: int = DEFAULT_N_MERGES,
    top_words: int = DEFAULT_TOP_WORDS,
    byte_level: bool = False,
) -> str:
    """Oracle for q_bpe_train / q_bpe_train_bytes: the full training
    replay; final SELECT emits (rank, left, right, merged, pair_count) —
    symbols are chars, or uppercase hex byte pairs at byte level."""
    union = "\n        UNION ALL ".join(
        f"SELECT {k} AS rank, pair, f FROM m{k}" for k in range(n_merges)
    )
    return f"""
    WITH {_common_ctes(n_merges, top_words, byte_level)},
    merges AS ({union})
    SELECT CAST(rank AS INT) AS rank,
           REPLACE(string_split(pair, ' ')[1], chr(2), '') AS left_sym,
           REPLACE(string_split(pair, ' ')[2], chr(2), '') AS right_sym,
           trim(REPLACE(REPLACE(pair, ' ' || chr(2), ''), chr(2), '')) AS merged,
           f AS pair_count
    FROM merges
    """


def _apply_chain_ctes(
    n_merges: int, top_words: int, byte_level: bool = False
) -> str:
    """Training replay + chained-REPLACE application, ending in a CTE
    ``bpe_counts(doc_id, n_words, n_tokens)`` — the shared building block
    for every oracle that consumes real token counts."""
    apply_chain = []
    prev = "docsyms"
    for k in range(n_merges):
        apply_chain.append(
            f"a{k} AS MATERIALIZED (SELECT doc_id, n_words, REPLACE(s,"
            f" COALESCE((SELECT pair FROM m{k}), chr(1)),"
            f" COALESCE(REPLACE((SELECT pair FROM m{k}), ' ' || chr(2), ''),"
            f" chr(1))) AS s FROM {prev})"
        )
        prev = f"a{k}"
    chain = ",\n    ".join(apply_chain)
    return f"""{_common_ctes(n_merges, top_words, byte_level)},
    docsyms AS MATERIALIZED (
        SELECT doc_id,
               CAST(len(words) AS INT) AS n_words,
               array_to_string(list_transform(words,
                   w -> {_sym_sql('w', byte_level)}),
                   chr(3) || ' ') AS s
        FROM toks
    ),
    {chain},
    bpe_counts AS MATERIALIZED (
        SELECT doc_id, n_words,
               CAST(length(s) - length(REPLACE(s, chr(2), '')) AS INT) AS n_tokens
        FROM {prev}
    )"""


def bpe_tokenize_oracle_sql(
    n_merges: int = DEFAULT_N_MERGES,
    top_words: int = DEFAULT_TOP_WORDS,
    byte_level: bool = False,
) -> str:
    """Oracle for q_bpe_tokenize / q_bpe_tokenize_bytes: training replay +
    chained-REPLACE application over word-boundary-safe marker strings;
    emits (doc_id, n_words, n_tokens)."""
    return f"""
    WITH {_apply_chain_ctes(n_merges, top_words, byte_level)}
    SELECT doc_id, n_words, n_tokens FROM bpe_counts
    """
