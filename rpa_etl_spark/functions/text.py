"""Text-normalization function library (reference parity: P1–P8).

Re-implements the *semantics* of the reference's text normalizer
(`/root/reference/robot/core/text_normalizer.py:4-92`) as pure Spark Column
expressions — every function here is JVM-side (whole-stage codegen), no
Python UDFs, so the chain fuses into one narrow stage over a string column.

The line-level operators (noise filter, order-preserving dedup) work on
``array<string>`` via higher-order functions instead of explode+shuffle:
per-document line counts are small, so keeping them inside one row is far
cheaper at 100 TB than a posexplode→groupBy→collect round trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Brazilian UF codes + fiscal abbreviations the noise filter keeps even when
# shorter than 3 chars — exact reference set (text_normalizer.py:33-38).
KEEP_SHORT_TOKENS = [
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA", "MT", "MS",
    "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN", "RS", "RO", "RR", "SC",
    "SP", "SE", "TO", "NF", "RG", "IE", "IM", "CPF",
]


def scrub_chars(col: Column) -> Column:
    """P2 — replace NBSP with space, drop zero-width space, CRLF→LF —
    the reference's exact CLEAN_REPLACEMENTS set (text_normalizer.py:4-8)."""
    c = F.regexp_replace(col, "\u00a0", " ")
    c = F.regexp_replace(c, "\u200b", "")
    return F.regexp_replace(c, "\r\n", "\n")


def normalize_whitespace(col: Column) -> Column:
    """P1 — collapse horizontal whitespace, squeeze 3+ newlines to 2, trim
    (text_normalizer.py:10-15)."""
    c = F.regexp_replace(col, "[ \t\f]+", " ")
    c = F.regexp_replace(c, "\n{2,}", "\n\n")
    # Python .strip() semantics: remove ALL leading/trailing whitespace
    # (incl. newlines) — plain trim only removes spaces
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def join_split_numbers(col: Column) -> Column:
    """P3 — delete whitespace between digits: '400 , 00'-style OCR splits
    (text_normalizer.py:17-20). Java regex lookaround, JVM-side."""
    return F.regexp_replace(col, r"(?<=\d)\s+(?=\d)", "")


def fix_decimal_commas(col: Column) -> Column:
    """P4 — tighten decimal commas `1 , 50`→`1,50`; DELETE dots (and any
    surrounding whitespace) sitting between a digit and a 3-digit group —
    i.e. BR thousands separators: `1.500,00`→`1500,00`, `3.14` untouched
    (text_normalizer.py:22-28)."""
    c = F.regexp_replace(col, r"(\d)\s*,\s*(\d{2})", "$1,$2")
    return F.regexp_replace(c, r"(?<=\d)\s*\.\s*(?=\d{3}\b)", "")


def fix_date_spacing(col: Column) -> Column:
    """P5 — re-space date+time collisions `15/12/202410:30:00`; the reference
    requires a full HH:MM:SS time (text_normalizer.py:52-61)."""
    return F.regexp_replace(
        col, r"(\d{2}/\d{2}/\d{4})(\d{2}:\d{2}:\d{2})", "$1 $2"
    )


def strip_noise_lines(lines: Column) -> Column:
    """P6 — keep a line iff it is whitelisted short token, has ≥3 chars, or
    contains a digit (text_normalizer.py:30-50). Higher-order filter —
    stays inside the row, no explode."""
    keep = F.array([F.lit(t) for t in KEEP_SHORT_TOKENS])
    return F.filter(
        lines,
        lambda line: F.array_contains(keep, F.upper(F.trim(line)))
        | (F.length(F.trim(line)) >= 3)
        | F.trim(line).rlike(r"\d"),
    )


def dedup_lines_preserve_order(lines: Column) -> Column:
    """P7 — order-preserving dedup: keep the first occurrence of each line
    (text_normalizer.py:84-90). Implemented as an array fold (O(n²) per doc,
    n = lines-per-doc which is small); avoids a posexplode→groupBy shuffle."""
    empty = F.array().cast("array<string>")
    return F.aggregate(
        lines,
        empty,
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )


def normalize_text(col: Column) -> Column:
    """P8 — full normalization chain (text_normalizer.py:63-92):
    scrub → whitespace → digit-join → date-spacing → comma-fix → line split
    → noise filter → order-preserving dedup → re-join. One fused expression."""
    c = scrub_chars(col)
    c = normalize_whitespace(c)
    c = join_split_numbers(c)
    c = fix_date_spacing(c)
    c = fix_decimal_commas(c)
    lines = F.split(c, "\n")
    lines = strip_noise_lines(lines)
    # NB: must be a 1-arg lambda — F.trim has an optional 2nd param, and
    # transform() would otherwise feed it the array index as trim-chars
    lines = dedup_lines_preserve_order(F.transform(lines, lambda x: F.trim(x)))
    return F.array_join(lines, "\n")


def remove_accents(col: Column) -> Column:
    """P10 — strip pt-BR diacritics via a translate table (parser.py:18-20).
    Cheaper than NFKD in a Python UDF for the fixed Latin-1 accent set."""
    return F.translate(
        col,
        "áàâãäéèêëíìîïóòôõöúùûüçÁÀÂÃÄÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇñÑ",
        "aaaaaeeeeiiiiooooouuuucAAAAAEEEEIIIIOOOOOUUUUCnN",
    )


def clean_party_name(col: Column, stop_tokens: list[str]) -> Column:
    """P11 — party-name cleanse (parser.py:22-70): collapse whitespace,
    uppercase, strip trailing punctuation; NULL when every remaining token is
    in the stoplist (i.e., the 'name' is just boilerplate)."""
    c = F.upper(F.trim(F.regexp_replace(col, r"\s+", " ")))
    c = F.regexp_replace(c, r"[.\-,]+$", "")
    tokens = F.split(c, " ")
    meaningful = F.array_except(tokens, F.array([F.lit(t) for t in stop_tokens]))
    return F.when(F.size(meaningful) > 0, c)
