"""Arrow-batched twin of the invoice parser (B1–B5) for the flagship path.

Same semantics as :mod:`rpa_etl_spark.functions.parsing` (reference
`/root/reference/robot/core/parser.py` — scans :12-14,78-128, blocks
:134-208, extractors :214-319, composition :321-379), implemented as a
``mapInPandas`` kernel instead of column expressions.

Why both exist: the column-expression form is the general building block —
it composes into any plan and its validators run inside whole-stage
codegen. But the full B1–B5 composition is dominated by higher-order
function lambdas (per-line filters, per-candidate validation), which
Catalyst ALWAYS evaluates on the interpreted expression walker — and in a
mixed workload the walker's generic dispatch sites go megamorphic, so the
parse step settles at ~4.5-6.5 s/sf0.1 even fully JIT-warmed (vs 2.7 s in
a parse-only JVM). This kernel does the same per-document work in one
Python batch loop with precompiled regexes: one Arrow boundary per ~10k
docs, ~measured 3-4x faster end-to-end, and the ratio is per-executor so
it holds on a cluster. Parity is pinned by tests/test_parse_arrow.py,
which asserts row-identical output of both implementations over the
synthetic corpus, the reference's golden fixtures, and degenerate inputs.

Java-vs-Python regex note: patterns are rewritten with explicit ASCII
classes (``[0-9]``, ``[ \\t\\n\\x0B\\f\\r]``) so Python's unicode-aware
``\\d``/``\\s`` can't diverge from the Java regexes the column form runs.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from rpa_etl_spark.functions.parsing import (
    BLOCK_MARKERS,
    ITEM_SKIP_KEYWORDS,
    PARTY_STOP_TOKENS,
)

_D = "[0-9]"  # Java \d
_S = "[ \\t\\n\\x0B\\f\\r]"  # Java \s

# pattern semantics of parser.py:12-14 — same strings as parsing.py with
# ASCII classes substituted
_CNPJ_RE = re.compile(
    f"{_D}{{2}}\\.?{_D}{{3}}\\.?{_D}{{3}}/?{_D}{{4}}-?{_D}{{2}}"
)
_NFE_KEY_RE = re.compile(f"{_D}{{44}}")
_VALUE_RE = re.compile(
    f"R?\\$?{_S}*{_D}{{1,3}}(?:[.,]{_D}{{3}})*(?:[.,]{_D}{{2}})"
)
_DATE_TIME = f"{_D}{{2}}/{_D}{{2}}/{_D}{{4}}(?: {_D}{{2}}:{_D}{{2}}:{_D}{{2}})?"
_EMISSION_RE = re.compile(f"EMISS[ÃA]O[:{_S[1:-1]}]*({_DATE_TIME})")
_BARE_DATE_RE = re.compile(f"({_DATE_TIME})")
_COMPETENCE_RE = re.compile(f"COMPET[ÊE]NCIA[:{_S[1:-1]}]*({_D}{{2}}/{_D}{{4}})")

_MARKER_RES = {k: re.compile("(?i)" + v) for k, v in BLOCK_MARKERS.items()}
_ANY_MARKER_RE = re.compile("(?i)" + "|".join(BLOCK_MARKERS.values()))
_SKIP_RE = re.compile("(?i)^(" + "|".join(ITEM_SKIP_KEYWORDS) + ")")
_NOISE_LINE_RE = re.compile(f"^[{_S[1:-1]}{_D[1:-1]}./-]*$")
_WS_RUN_RE = re.compile(f"{_S}+")
_TRAIL_PUNCT_RE = re.compile(r"[.\-,]+$")
_NON_DIGIT_RE = re.compile("[^0-9]")
_MONEY_STRIP_RE = re.compile(r"[^\d,.\-]", re.ASCII)

_STOP_SET = set(PARTY_STOP_TOKENS)

_CNPJ_W1 = [5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2]
_CNPJ_W2 = [6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2]
_NFE_W = [2 + ((43 - i - 1) % 8) for i in range(43)]
_IBGE_UF = {
    11, 12, 13, 14, 15, 16, 17, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    31, 32, 33, 35, 41, 42, 43, 50, 51, 52, 53,
}


def _cnpj_is_valid(s: str) -> bool:
    d = _NON_DIGIT_RE.sub("", s)
    if len(d) != 14 or d == d[0] * 14:
        return False
    r1 = sum(int(d[i]) * _CNPJ_W1[i] for i in range(12)) % 11
    dv1 = 0 if r1 < 2 else 11 - r1
    r2 = sum(int(d[i]) * _CNPJ_W2[i] for i in range(13)) % 11
    dv2 = 0 if r2 < 2 else 11 - r2
    return int(d[12]) == dv1 and int(d[13]) == dv2


def _cnpj_format(s: str) -> str:
    d = _NON_DIGIT_RE.sub("", s)
    return f"{d[0:2]}.{d[2:5]}.{d[5:8]}/{d[8:12]}-{d[12:14]}"


def _nfe_key_is_valid(s: str) -> bool:
    d = _NON_DIGIT_RE.sub("", s)
    if len(d) != 44:
        return False
    uf, yy, mm = int(d[0:2]), int(d[2:4]), int(d[4:6])
    modelo = int(d[20:22])
    if uf not in _IBGE_UF or not (8 <= yy <= 30) or not (1 <= mm <= 12):
        return False
    if modelo not in (55, 65) or not _cnpj_is_valid(d[6:20]):
        return False
    r = sum(int(d[i]) * _NFE_W[i] for i in range(43)) % 11
    dv = 0 if r <= 1 else 11 - r
    return int(d[43]) == dv


def _money_parse(s: str | None) -> Decimal | None:
    """validators.money_parse semantics: strip symbols, last-separator
    normalization, reject negative / >1e9 / more than 2 decimal places."""
    if s is None:
        return None
    stripped = _MONEY_STRIP_RE.sub("", s)
    lc, ld = stripped.rfind(","), stripped.rfind(".")
    if lc >= 0 and (ld < 0 or lc > ld):
        norm = stripped.replace(".", "").replace(",", ".")
    else:
        norm = stripped.replace(",", "")
    try:
        exact = Decimal(norm)
    except InvalidOperation:
        return None
    if exact < 0 or exact > 1_000_000_000:
        return None
    q = exact.quantize(Decimal("0.01"))
    if q != exact:  # >2-dp reject
        return None
    return q


def _money_format_br(v: Decimal) -> str:
    sign = "-" if v < 0 else ""
    cents = int(abs(v).quantize(Decimal("0.01")) * 100)
    i, f = divmod(cents, 100)
    return f"{sign}{i:,}".replace(",", ".") + f",{f:02d}"


def _cleanse_name(s: str) -> str:
    c = _WS_RUN_RE.sub(" ", s).strip().upper()
    return _TRAIL_PUNCT_RE.sub("", c)


def _name_survives(s: str) -> bool:
    return any(t not in _STOP_SET for t in _cleanse_name(s).split(" "))


def _party(block: str | None) -> dict | None:
    if block is None:
        return None
    cnpjs = [c for c in _CNPJ_RE.findall(block) if _cnpj_is_valid(c)]
    if not cnpjs:
        return None
    lines = block.split("\n")
    name = None
    for ln in lines[1:]:  # line 1 is the marker by B1 construction
        if _NOISE_LINE_RE.search(ln) or _CNPJ_RE.search(ln):
            continue
        if _name_survives(ln):
            name = _cleanse_name(ln)
            break
    return {"name": name, "cnpj_cpf": _cnpj_format(cnpjs[0])}


def _items(block: str | None) -> list | None:
    if block is None:
        return None
    out = []
    for ln in block.split("\n"):
        if len(ln.strip()) < 10 or _ANY_MARKER_RE.search(ln):
            continue
        if _SKIP_RE.search(ln.strip()):
            continue
        valid_values = [v for v in _VALUE_RE.findall(ln) if _money_parse(v)
                        is not None]
        out.append(
            {
                "description": _VALUE_RE.sub("", ln).strip(),
                "unit_value": valid_values[-1] if valid_values else None,
                "raw": ln,
            }
        )
    return out


_TOTAL_LABELED = [
    re.compile(f"(?i)TOTAL{_S}+GERAL{_S}*:?{_S}*R?\\$?{_S}*([\\d.,]+)", re.ASCII),
    re.compile(f"(?i)VALOR{_S}+L[IÍ]QUIDO{_S}*:?{_S}*R?\\$?{_S}*([\\d.,]+)", re.ASCII),
    re.compile(f"(?i)VALOR{_S}+TOTAL{_S}*:?{_S}*R?\\$?{_S}*([\\d.,]+)", re.ASCII),
    re.compile(f"(?i)TOTAL{_S}*:?{_S}*R?\\$?{_S}*([\\d.,]+)", re.ASCII),
]
_TOTAL_BARE = re.compile(f"R\\${_S}*([\\d.,]+)", re.ASCII)


def _total(block: str | None) -> str | None:
    """Two-tier evaluation, exactly as _extract_total_body: the labeled
    extracts coalesce as strings first; money_parse runs on the winner,
    falling back to the bare-R$ scan."""
    if block is None:
        return None
    labeled = None
    for rx in _TOTAL_LABELED:
        m = rx.search(block)
        if m and m.group(1) != "":
            labeled = m.group(1)
            break
    parsed = _money_parse(labeled)
    if parsed is None:
        m = _TOTAL_BARE.search(block)
        parsed = _money_parse(m.group(1) if m else None)
    return _money_format_br(parsed) if parsed is not None else None


def _parse_one(text: str | None) -> dict:
    if text is None:
        text = ""
    pos = {k: (m.start() + 1 if (m := rx.search(text)) else 0)
           for k, rx in _MARKER_RES.items()}
    marker_positions = sorted(p for p in pos.values() if p > 0)
    text_end = len(text) + 1

    def block(p: int) -> str | None:
        if p <= 0:
            return None
        nxt = next((x for x in marker_positions if x > p), text_end)
        return text[p - 1 : nxt - 1]

    m = _EMISSION_RE.search(text)
    emission = m.group(1) if m else None
    if emission is None:
        m = _BARE_DATE_RE.search(text)
        emission = m.group(1) if (m and m.group(1) != "") else None
    m = _COMPETENCE_RE.search(text)
    competence = m.group(1) if m else None
    chave = next(
        (k for k in _NFE_KEY_RE.findall(text) if _nfe_key_is_valid(k)), None
    )
    return {
        "emission_date": emission,
        "competence_date": competence,
        "chave_acesso": chave,
        "issuer": _party(block(pos["ISSUER"])),
        "recipient": _party(block(pos["RECIPIENT"])),
        "items": _items(block(pos["ITEMS"])),
        "total": _total(block(pos["FINANCIALS"])),
    }


_PARTY_T = StructType(
    [StructField("name", StringType()), StructField("cnpj_cpf", StringType())]
)
_ITEM_T = StructType(
    [
        StructField("description", StringType()),
        StructField("unit_value", StringType()),
        StructField("raw", StringType()),
    ]
)
_PARSED_FIELDS = [
    StructField("emission_date", StringType()),
    StructField("competence_date", StringType()),
    StructField("chave_acesso", StringType()),
    StructField("issuer", _PARTY_T),
    StructField("recipient", _PARTY_T),
    StructField("items", ArrayType(_ITEM_T)),
    StructField("total", StringType()),
]


_PARSED_T = StructType(_PARSED_FIELDS)
_PARSED_NAMES = [f.name for f in _PARSED_FIELDS]


@F.pandas_udf(_PARSED_T)
def _parse_invoices_udf(texts: pd.Series) -> pd.DataFrame:
    parsed = [_parse_one(t) for t in texts]
    return pd.DataFrame({n: [p[n] for p in parsed] for n in _PARSED_NAMES})


def parse_invoices_arrow(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop-in for :func:`rpa_etl_spark.functions.parsing.parse_invoices`:
    preserves every input column and appends the seven parsed columns.

    Round 14 (guide §4.1): a STRUCT-returning vectorized UDF over the
    text column alone, not a ``mapInPandas`` over the whole row. The
    kernel's Python work is unchanged, but only ``text_col`` crosses
    into the worker and only the parsed structs cross back — the
    previous form shipped every input column out AND back through Arrow
    (raw text + normalized text + hashes, ~2x the document bytes per
    direction) and its full-width output schema made Spark regenerate
    the downstream projection per caller width (measured: the pipeline
    composition's first pass dropped 46 s → 4 s, warm passes ~8 s →
    ~3.5 s at sf0.1; one ArrowEvalPython node in the plan, so the
    struct is evaluated once, not once per extracted field)."""
    out = df.withColumn("_parsed", _parse_invoices_udf(F.col(text_col)))
    return out.select(
        "*", *[F.col("_parsed")[n].alias(n) for n in _PARSED_NAMES]
    ).drop("_parsed")
