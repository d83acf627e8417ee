"""Arrow-batched twin of the textstats lang-quality projection.

Same semantics as the column-expression forms in
:mod:`rpa_etl_spark.operators.textstats` (tokens/_marker_hits/quality_score/
bpe_ish_token_count/est_llm_tokens/fingerprint), implemented as ONE
``mapInPandas`` kernel. Why: the expression forms are dominated by
higher-order-function lambdas (per-token filter + polynomial fold), which
Catalyst always evaluates on the interpreted expression walker — the same
cost class the invoice parser hit (see functions/parsing_arrow.py docstring).
One Python batch loop with precompiled regexes does the identical work per
Arrow batch, with zero shuffle, and the speedup ratio is per-executor so it
holds on a 1000-executor cluster.

Parity is mirrored Java-regex-exactly and pinned by
tests/test_llmdata.py::test_lang_quality_arrow_matches_expressions:

- Spark ``trim`` strips ONLY the space character (not \\t/\\n) — mirrored
  with ``str.strip(' ')``.
- Java ``split("\\\\s+", -1)`` keeps leading/trailing empty tokens
  (``'a\\t'`` → ``['a','']``) — Python ``re.split`` has the same contract.
- Java ``\\s`` is ASCII-only ``[ \\t\\n\\x0B\\f\\r]`` (NBSP is a token
  char) — spelled out explicitly, never Python's unicode-aware ``\\s``.
- ``F.ascii('')`` is 0; for non-ASCII leading chars it returns the
  codepoint — mirrored with ``ord(w[0]) if w else 0``.
- The quality score is a DECIMAL(4,2) sum cast to double — mirrored with
  integer hundredths divided by 100.0 (bit-identical doubles).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from rpa_etl_spark.operators.textstats import LANG_MARKERS

_S = " \t\n\x0b\f\r"  # Java \s character set (ASCII-only)
_WS_RUN_RE = re.compile(f"[{_S}]+")
# textstats.TOKEN_RE with the Java \s class spelled out
_BPE_TOKEN_RE = re.compile(f"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{_S}]")
# the quality_score punctuation class, verbatim from textstats.quality_score
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")

_EN_MARKERS = frozenset(LANG_MARKERS["en"])

_MOD_TOK = 1000003
_MOD_FP = 1000000007

# dtypes pinned to the expression twin's output schema (F.size -> int,
# est_llm_tokens/fingerprint -> bigint) so the driver-visible schema is
# identical whichever form runs
_STATS_FIELDS = [
    StructField("en_hits", IntegerType()),
    StructField("lang_pred", StringType()),
    StructField("quality", DoubleType()),
    StructField("bpe_tokens", IntegerType()),
    StructField("est_tokens", LongType()),
    StructField("fingerprint", LongType()),
]


def _stats_one(t: str | None) -> tuple:
    if t is None:
        # expression-twin NULL semantics: every CASE's `otherwise` fires —
        # lang_pred falls through to 'und', and the punct-ratio guard's
        # otherwise-0.0 branch satisfies <= 0.1, so quality is 0.10
        return (None, "und", 0.10, None, None, None)
    toks = _WS_RUN_RE.split(t.strip(" "))
    n_tok = len(toks)
    n_chars = len(t)

    en_hits = 0
    fp = 0
    for w in toks:
        if w.lower() in _EN_MARKERS:
            en_hits += 1
        h = (len(w) * 17 + (ord(w[0]) if w else 0)) % _MOD_TOK
        fp = (fp * 31 + h) % _MOD_FP

    mean_wlen = n_chars / n_tok if n_tok > 0 else 0.0
    n_punct = len(_PUNCT_RE.findall(t))
    punct_ratio = n_punct / n_chars if n_chars > 0 else 0.0
    cents = (
        (40 if 100 <= n_chars <= 100000 else 0)
        + (30 if 3 <= mean_wlen <= 12 else 0)
        + (20 if en_hits > 0 else 0)
        + (10 if punct_ratio <= 0.1 else 0)
    )
    quality = cents / 100.0

    bpe_tokens = len(_BPE_TOKEN_RE.findall(t))
    est_tokens = -(-n_chars // 4)  # ceil(n_chars / 4)
    lang_pred = "en" if en_hits > 0 else "und"
    return (en_hits, lang_pred, quality, bpe_tokens, est_tokens, fp)


def lang_quality_arrow(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the six lang-quality stat columns to ``df``. Drop-in twin of
    the expression projection in plans/llmdata_queries.q_lang_quality; one
    narrow mapInPandas stage, no shuffle at any scale."""
    out_schema = StructType(list(df.schema.fields) + _STATS_FIELDS)
    names = [f.name for f in _STATS_FIELDS]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [_stats_one(t) for t in pdf[text_col]]
            block = pd.DataFrame(
                {n: [s[i] for s in stats] for i, n in enumerate(names)},
                index=pdf.index,
            )
            yield pd.concat([pdf, block], axis=1)

    return df.mapInPandas(run, out_schema)
