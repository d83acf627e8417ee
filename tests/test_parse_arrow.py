"""Row-identical equivalence of the Arrow parse kernel and the
column-expression parser — the guarantee that lets q_parse_invoice run the
fast kernel while the column form stays the reference implementation."""

from __future__ import annotations

from rpa_etl_spark.functions import parsing as P
from rpa_etl_spark.functions.parsing_arrow import parse_invoices_arrow
from rpa_etl_spark.plans.document_queries import build_invoice_corpus
from tests.test_parsing import GOLDEN

PARSED_COLS = [
    "emission_date",
    "competence_date",
    "chave_acesso",
    "issuer",
    "recipient",
    "items",
    "total",
]


def _assert_equivalent(df, key: str):
    cols = [key, *PARSED_COLS]
    a = sorted(P.parse_invoices(df).select(*cols).collect())
    b = sorted(parse_invoices_arrow(df).select(*cols).collect())
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb, f"divergence at {key}={ra[0]}:\n column {ra}\n  arrow {rb}"


def test_equivalence_on_synthetic_corpus(spark, sf_dir):
    _assert_equivalent(build_invoice_corpus(spark, sf_dir), "o_orderkey")


def test_equivalence_on_golden_and_degenerate_fixtures(spark):
    key43 = "35" + "2412" + "04252011000110" + "55" + "001" + "000000001" + "1" + "12345678"
    w = [2 + ((43 - i - 1) % 8) for i in range(43)]
    r = sum(int(d) * x for d, x in zip(key43, w)) % 11
    key = key43 + str(0 if r <= 1 else 11 - r)
    fixtures = [
        GOLDEN,
        GOLDEN + f"\nCHAVE DE ACESSO\n{key}",
        GOLDEN.replace("04.252.011/0001-10", "04.252.011/0001-99"),
        "",
        "TEXTO QUALQUER SEM ESTRUTURA 123",
        "PRESTADOR DE SERVIÇOS",  # marker only, empty block
        # items with no valid money token + unparseable total
        "NOTA FISCAL\nDISCRIMINAÇÃO DOS SERVIÇOS\n"
        "SERVICOS PRESTADOS SEM NUMERO NENHUM\n"
        "OUTRA LINHA DE CONTINUACAO LONGA AQUI\n"
        "VALOR TOTAL DA NOTA\nVALOR A COMBINAR",
        # money edge cases: US format, >2dp, >1e9, negative-ish text
        "VALOR TOTAL DA NOTA R$ 1,234.56",
        "TOTAL GERAL: 12.3456",
        "VALOR TOTAL: R$ 9.999.999.999,00",
        "VALOR LÍQUIDO: 0,01\nTOTAL: 55,10",
        # date edge: HH:MM must NOT count as the timed form
        "EMISSÃO: 01/02/2024 10:30\nOUTRA DATA 03/04/2025 11:22:33",
        # marker collisions and unordered blocks
        "TOMADOR DE SERVIÇOS\nCNPJ: 11.222.333/0001-81\nALFA BETA LTDA\n"
        "PRESTADOR DE SERVIÇOS\nCNPJ: 04.252.011/0001-10\nGAMA DELTA ME",
        # party lines that are all stop-tokens (name must stay null)
        "PRESTADOR DE SERVIÇOS\nCNPJ: 04.252.011/0001-10\nRAZAO SOCIAL\nCNPJ CPF",
    ]
    df = spark.createDataFrame(
        list(enumerate(fixtures)), "doc_id long, text string"
    )
    _assert_equivalent(df, "doc_id")
