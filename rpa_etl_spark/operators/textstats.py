"""Text analysis for LLM-training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

All pure JVM column expressions (higher-order functions over the in-row
token array) — a 100 TB corpus pass stays inside whole-stage codegen with
zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny function-word lists per language (public linguistic common knowledge)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "que", "una", "con"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}

# BPE-ish token pattern: word pieces, digit runs, single other glyphs
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def _marker_hits(toks: Column, lang: str) -> Column:
    marker = F.array([F.lit(t) for t in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda w: F.array_contains(marker, F.lower(w))))


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (the n-gram-heuristic lang-ID core)."""
    toks = tokens(col)
    return {lang: _marker_hits(toks, lang) for lang in LANG_MARKERS}


def lang_id(col: Column) -> Column:
    """argmax of marker hits; deterministic tie order = dict order; 'und'
    when nothing matches."""
    scores = lang_scores(col)
    result = F.lit("und")
    # reversed when-chain so earlier langs win ties
    langs = list(scores)
    m = F.greatest(*[scores[lg] for lg in langs])
    for lg in reversed(langs):
        result = F.when((scores[lg] == m) & (m > 0), F.lit(lg)).otherwise(result)
    return result


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band, mean word length
    band, stopword presence, punctuation ratio (exact decimal arithmetic).
    Mirrors the completeness-penalty style of the reference's trust score
    (orchestrator.py:43-116) applied to corpus text."""
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    mean_wlen = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    stop_hits = _marker_hits(toks, "en")
    punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    d = "decimal(4,2)"
    score = (
        F.when((n_chars >= 100) & (n_chars <= 100000), F.lit("0.40").cast(d)).otherwise(F.lit("0.00").cast(d))
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit("0.30").cast(d)).otherwise(F.lit("0.00").cast(d))
        + F.when(stop_hits > 0, F.lit("0.20").cast(d)).otherwise(F.lit("0.00").cast(d))
        + F.when(punct_ratio <= 0.1, F.lit("0.10").cast(d)).otherwise(F.lit("0.00").cast(d))
    )
    return score.cast("decimal(4,2)")


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count via the TOKEN_RE segmentation."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))


def est_llm_tokens(col: Column) -> Column:
    """chars/4 rule-of-thumb estimate (ceil)."""
    return F.ceil(F.length(col) / F.lit(4.0)).cast("bigint")


def fingerprint(col: Column) -> Column:
    """Order-sensitive rolling document fingerprint: fold tokens through a
    polynomial hash (31ˣ) of cheap per-token features, mod 1e9+7. Same
    construction is expressible in ANSI SQL for the oracle."""
    toks = tokens(col)
    tok_h = lambda w: (F.length(w) * 17 + F.ascii(F.substring(w, 1, 1))) % 1000003  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + tok_h(w)) % 1000000007,
    )
