"""Invoice parsing (reference parity: X1–X4, B1–B5) as column expressions.

Re-implements the *semantics* of `/root/reference/robot/core/parser.py`
(pattern scans :12-14,78-128; block segmentation :134-208; per-block
extractors :214-319; full composition :321-379) Spark-first:

- pattern scans → ``regexp_extract_all`` + higher-order ``filter``;
- block segmentation → ``regexp_instr`` marker positions + substring
  slicing *inside the row* (per-document text is small; exploding match
  positions into rows and shuffling them back would be strictly worse at
  100 TB);
- per-field failure isolation (reference try/except→None) → null-tolerant
  expressions (``when``/``try_cast``/empty-array guards).

One simplification vs the reference: we take the first marker occurrence
per block type instead of concatenating repeated same-type blocks
(parser.py:196-204) — the declared-query corpus has single-occurrence
blocks; the general case would union positions per type before slicing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rpa_etl_spark.functions import validators as V
from rpa_etl_spark.functions.exprs import let as _let_shared
from rpa_etl_spark.functions.exprs import let1

# pattern semantics of parser.py:12-14 (re-derived, not copied)
CNPJ_RE = r"\d{2}\.?\d{3}\.?\d{3}/?\d{4}-?\d{2}"
NFE_KEY_RE = r"\d{44}"
VALUE_RE = r"R?\$?\s*\d{1,3}(?:[.,]\d{3})*(?:[.,]\d{2})"
DATE_TIME_RE = r"\d{2}/\d{2}/\d{4}(?: \d{2}:\d{2}:\d{2})?"
COMPETENCE_RE = r"\d{2}/\d{4}"

BLOCK_MARKERS = {
    "ISSUER": r"PRESTADOR DE SERVI[ÇC]OS|EMITENTE|RAZ[ÃA]O SOCIAL DO PRESTADOR",
    "RECIPIENT": r"TOMADOR DE SERVI[ÇC]OS|DESTINAT[ÁA]RIO",
    "ITEMS": r"DISCRIMINA[ÇC][ÃA]O DOS SERVI[ÇC]OS|DESCRI[ÇC][ÃA]O DOS SERVI[ÇC]OS",
    "FINANCIALS": r"VALOR TOTAL DA NOTA|TOTAL GERAL",
}

ITEM_SKIP_KEYWORDS = ["TOTAL", "VALOR", "DATA", "VENCIMENTO", "CNPJ", "CPF"]

PARTY_STOP_TOKENS = [
    "CNPJ", "CPF", "LTDA", "ME", "EPP", "SA", "S.A", "EIRELI", "PRESTADOR",
    "TOMADOR", "SERVICOS", "SERVIÇOS", "DE", "DO", "DA", "RAZAO", "SOCIAL",
    "NOME", "ENDERECO", "ENDEREÇO", "MUNICIPIO", "MUNICÍPIO", "UF", "CEP",
]


# shared let-binding (see functions/exprs.py for why this exists)
_let = _let_shared


def find_cnpjs(col: Column) -> Column:
    """X1 — all checksum-valid CNPJs in a text (parser.py:87-94)."""
    return F.filter(
        F.regexp_extract_all(col, F.lit(CNPJ_RE), 0),
        lambda c: V.cnpj_is_valid(c),
    )


def find_valid_nfe_key(col: Column) -> Column:
    """X2 — first fully-valid 44-digit NF-e key, NULL if none
    (parser.py:78-85)."""
    valid = F.filter(
        F.regexp_extract_all(col, F.lit(NFE_KEY_RE), 0),
        lambda k: V.nfe_key_is_valid(k),
    )
    return _let(
        {"v": valid},
        lambda p: F.when(F.size(p["v"]) > 0, F.element_at(p["v"], 1)),
    )


def find_values(col: Column) -> Column:
    """X3 — all monetary-value tokens (parser.py:14, used :265)."""
    return F.regexp_extract_all(col, F.lit(VALUE_RE), 0)


def extract_emission_date(col: Column) -> Column:
    """X4 — emission date: labeled match first, else first bare date
    (parser.py:96-128 priority semantics)."""
    labeled = F.regexp_extract(col, r"EMISS[ÃA]O[:\s]*(" + DATE_TIME_RE + ")", 1)
    bare = F.regexp_extract(col, "(" + DATE_TIME_RE + ")", 1)
    return F.when(labeled != "", labeled).when(bare != "", bare)


def extract_competence_date(col: Column) -> Column:
    """X4 — competence `MM/YYYY` near its label (parser.py:102-119)."""
    m = F.regexp_extract(col, r"COMPET[ÊE]NCIA[:\s]*(" + COMPETENCE_RE + ")", 1)
    return F.when(m != "", m)


def _marker_pos(col: Column, pattern: str) -> Column:
    return F.regexp_instr(col, F.lit("(?i)" + pattern))


def extract_blocks(col: Column) -> Column:
    """B1 — segment text into HEADER/ISSUER/RECIPIENT/ITEMS/FINANCIALS by
    marker positions (parser.py:134-208). Returns a 5-field struct; each
    block runs `[marker_i, next_marker)`, HEADER is the prefix."""
    pos = {name: _marker_pos(col, pat) for name, pat in BLOCK_MARKERS.items()}
    all_pos = F.array(*pos.values())
    text_end = F.length(col) + 1

    def next_after(p: Column) -> Column:
        later = F.filter(all_pos, lambda x: x > p)
        return F.coalesce(F.array_min(later), text_end)

    def block(p: Column) -> Column:
        return F.when(p > 0, col.substr(p, next_after(p) - p))

    first_marker = F.coalesce(F.array_min(F.filter(all_pos, lambda x: x > 0)), text_end)
    return F.struct(
        col.substr(F.lit(1), first_marker - 1).alias("HEADER"),
        block(pos["ISSUER"]).alias("ISSUER"),
        block(pos["RECIPIENT"]).alias("RECIPIENT"),
        block(pos["ITEMS"]).alias("ITEMS"),
        block(pos["FINANCIALS"]).alias("FINANCIALS"),
    )


def extract_party(block: Column) -> Column:
    """B2 — party from a block (parser.py:214-245): first checksum-valid
    CNPJ; name = first line that survives the stoplist cleanse and is not a
    CNPJ-carrying line. Returns struct<name,cnpj_cpf> (NULL if no valid
    CNPJ). The block's first line is its marker (by construction of B1), so
    name candidates start at line 2 — no marker regex needed."""
    return let1(block, _extract_party_body)


def _extract_party_body(block: Column) -> Column:
    # lines[2:] — slice off the marker line
    lines = F.split(block, "\n")
    candidates = F.filter(
        F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0))),
        lambda ln: ~ln.rlike(r"^[\s\d./-]*$")
        & ~ln.rlike(CNPJ_RE)  # CNPJ-carrying lines are not names (parser.py:233)
        & _name_survives(ln),
    )
    return _let(
        {"cs": find_cnpjs(block), "ns": candidates},
        lambda p: F.when(
            F.size(p["cs"]) > 0,
            F.struct(
                F.when(
                    F.size(p["ns"]) > 0, _cleanse_name(F.element_at(p["ns"], 1))
                ).alias("name"),
                V.cnpj_format(F.element_at(p["cs"], 1)).alias("cnpj_cpf"),
            ),
        ),
    )


def _cleanse_name(col: Column) -> Column:
    c = F.upper(F.trim(F.regexp_replace(col, r"\s+", " ")))
    return F.regexp_replace(c, r"[.\-,]+$", "")


def _name_survives(col: Column) -> Column:
    """P11 stoplist test (parser.py:22-70): some meaningful token remains."""
    tokens = F.split(_cleanse_name(col), " ")
    stop = F.array([F.lit(t) for t in PARTY_STOP_TOKENS])
    return F.size(F.array_except(tokens, stop)) > 0


def extract_items(block: Column) -> Column:
    """B3 — items from the ITEMS block (parser.py:247-295): skip short or
    metadata lines; description = line minus value tokens; unit_value =
    last valid monetary token (NULL for continuation lines)."""
    return let1(block, _extract_items_body)


def _extract_items_body(block: Column) -> Column:
    lines = F.split(block, "\n")
    skip = "|".join(ITEM_SKIP_KEYWORDS)
    marker_re = "|".join(BLOCK_MARKERS.values())
    candidates = F.filter(
        lines,
        lambda ln: (F.length(F.trim(ln)) >= 10)
        & ~ln.rlike("(?i)" + marker_re)
        & ~F.trim(ln).rlike(r"(?i)^(" + skip + ")"),
    )
    return F.transform(
        candidates,
        lambda ln: F.struct(
            F.trim(F.regexp_replace(ln, VALUE_RE, "")).alias("description"),
            # try_element_at: a candidate line with NO valid monetary token
            # (continuation lines — parser.py:291-293) must yield NULL, not
            # an ANSI out-of-bounds error on the empty filtered array
            F.try_element_at(
                F.filter(find_values(ln), lambda v: V.money_is_valid(v)), F.lit(-1)
            ).alias("unit_value"),
            ln.alias("raw"),
        ),
    )


def extract_total(block: Column) -> Column:
    """B4 — total from the FINANCIALS block (parser.py:297-319): priority
    regexes, first match passing monetary validation, returned formatted."""
    return let1(block, _extract_total_body)


def _extract_total_body(block: Column) -> Column:
    # Priority patterns mirror parser.py:304-310: each captures an
    # AGGRESSIVE `[\d.,]+` run (the normalizer may have deleted thousands
    # dots, so the strict grouped VALUE_RE would truncate `4450,00` to
    # `450,00`); the first candidate that passes monetary validation wins
    # and is returned re-formatted (validator reformats — parser.py:318).
    #
    # Two-tier evaluation keeps the expression tree (and codegen time)
    # small: the 4 LABELED extracts coalesce as cheap strings first, then
    # money_parse runs once on the winner and once on the bare-R$ fallback
    # — 2 validator trees instead of 5. (Sole divergence vs per-pattern
    # validation: a higher-priority label matching an INVALID number while
    # a lower one is valid — then we fall to the R$ scan like the final
    # reference pattern would.)
    num = r"([\d.,]+)"
    labeled_pats = [
        r"(?i)TOTAL\s+GERAL\s*:?\s*R?\$?\s*" + num,
        r"(?i)VALOR\s+L[IÍ]QUIDO\s*:?\s*R?\$?\s*" + num,
        r"(?i)VALOR\s+TOTAL\s*:?\s*R?\$?\s*" + num,
        r"(?i)TOTAL\s*:?\s*R?\$?\s*" + num,
    ]
    labeled = F.coalesce(
        *[F.nullif(F.regexp_extract(block, p, 1), F.lit("")) for p in labeled_pats]
    )
    parsed = F.coalesce(
        V.money_parse(labeled),
        V.money_parse(F.regexp_extract(block, r"R\$\s*" + num, 1)),
    )
    return _let(
        {"p": parsed},
        lambda b: F.when(b["p"].isNotNull(), V.money_format_br(b["p"])),
    )


def parse_invoices(df, text_col: str = "text"):
    """B5 as a staged DataFrame pipeline (the scalable form of
    :func:`extract_invoice`).

    Each stage materializes intermediates as *named columns*, so downstream
    expressions reference cheap attribute refs instead of re-embedding the
    whole upstream expression tree — without this, the fully-inlined parse
    is combinatorially large (blocks × party × 9 output fields) and blows
    codegen. Catalyst keeps the stages separate because CollapseProject
    refuses to duplicate non-cheap expressions referenced more than once.
    All stages are narrow — one fused scan→parse pass, no shuffle.
    """
    text = F.col(text_col)
    # stage 1: marker positions — each regexp_instr runs exactly once
    df = df.withColumns(
        {
            "_p_issuer": _marker_pos(text, BLOCK_MARKERS["ISSUER"]),
            "_p_recipient": _marker_pos(text, BLOCK_MARKERS["RECIPIENT"]),
            "_p_items": _marker_pos(text, BLOCK_MARKERS["ITEMS"]),
            "_p_fin": _marker_pos(text, BLOCK_MARKERS["FINANCIALS"]),
        }
    )
    # stage 2: block slices — arithmetic over the 4 position attributes
    all_pos = F.array("_p_issuer", "_p_recipient", "_p_items", "_p_fin")
    text_end = F.length(text) + 1

    def _block(p: Column) -> Column:
        nxt = F.coalesce(F.array_min(F.filter(all_pos, lambda x: x > p)), text_end)
        return F.when(p > 0, text.substr(p, nxt - p))

    df = df.withColumns(
        {
            "_b_issuer": _block(F.col("_p_issuer")),
            "_b_recipient": _block(F.col("_p_recipient")),
            "_b_items": _block(F.col("_p_items")),
            "_b_fin": _block(F.col("_p_fin")),
        }
    ).drop("_p_issuer", "_p_recipient", "_p_items", "_p_fin")
    # issuer and recipient share ONE party-extraction lambda compiled over a
    # 2-element block array — halves the dominant codegen tree vs two
    # separate extract_party expression copies (measured ~25% off the
    # first-run parse cost; per-row work is identical)
    df = df.withColumn(
        "_parties",
        F.transform(
            F.array("_b_issuer", "_b_recipient"),
            lambda b: _extract_party_body(b),
        ),
    )
    df = df.withColumns(
        {
            "emission_date": extract_emission_date(text),
            "competence_date": extract_competence_date(text),
            "chave_acesso": find_valid_nfe_key(text),
            "issuer": F.element_at("_parties", 1),
            "recipient": F.element_at("_parties", 2),
            "items": extract_items(F.col("_b_items")),
            "total": extract_total(F.col("_b_fin")),
        }
    )
    return df.drop("_b_issuer", "_b_recipient", "_b_items", "_b_fin", "_parties")


def extract_invoice(text: Column, source_filename: Column | None = None) -> Column:
    """B5 — full parse composition (parser.py:321-379): blocks → per-field
    extraction, each field independently null-on-failure. Returns the
    canonical nested invoice struct (FIXTURES.md B2 schema)."""
    blocks = extract_blocks(text)
    issuer = extract_party(blocks["ISSUER"])
    recipient = extract_party(blocks["RECIPIENT"])
    items = extract_items(blocks["ITEMS"])
    total = extract_total(blocks["FINANCIALS"])
    return F.struct(
        extract_emission_date(text).alias("emission_date"),
        extract_competence_date(text).alias("competence_date"),
        find_valid_nfe_key(text).alias("chave_acesso"),
        issuer.alias("issuer"),
        recipient.alias("recipient"),
        items.alias("items"),
        F.struct(total.alias("total")).alias("financials"),
        (source_filename if source_filename is not None else F.lit(None).cast("string")).alias(
            "source_filename"
        ),
    )
