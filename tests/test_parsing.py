"""Parser unit tests against a reference-style golden NFS-e fixture
(shape of tests/e2e/test_pipeline_core.py:62-95 — re-written, not copied)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_spark.functions import parsing as P

GOLDEN = """NOTA FISCAL DE SERVICOS ELETRONICA - NFS-e
EMISSÃO: 15/12/2024 10:30:00
COMPETÊNCIA: 12/2024
PRESTADOR DE SERVIÇOS
CNPJ: 04.252.011/0001-10
TECH SOLUTIONS INFORMATICA LTDA
AVENIDA PAULISTA 1000 SP
TOMADOR DE SERVIÇOS
CNPJ: 11.222.333/0001-81
COMERCIO GLOBAL SA
DISCRIMINAÇÃO DOS SERVIÇOS
DESENVOLVIMENTO DE SISTEMA WEB R$ 2.500,00
MANUTENCAO MENSAL DE SERVIDORES R$ 1.200,00
SUPORTE TECNICO ESPECIALIZADO R$ 750,00
VALOR TOTAL DA NOTA
R$ 4.450,00"""


def _parse(spark, text: str):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return P.parse_invoices(df).collect()[0]


def test_golden_invoice_full_parse(spark):
    row = _parse(spark, GOLDEN)
    assert row["emission_date"] == "15/12/2024 10:30:00"
    assert row["competence_date"] == "12/2024"
    assert row["issuer"]["cnpj_cpf"] == "04.252.011/0001-10"
    assert row["issuer"]["name"] == "TECH SOLUTIONS INFORMATICA LTDA"
    assert row["recipient"]["cnpj_cpf"] == "11.222.333/0001-81"
    assert row["recipient"]["name"] == "COMERCIO GLOBAL SA"
    assert len(row["items"]) >= 3
    descriptions = [i["description"] for i in row["items"]]
    assert "DESENVOLVIMENTO DE SISTEMA WEB" in descriptions
    assert row["items"][0]["unit_value"].endswith("2.500,00")
    assert row["total"] == "4.450,00"


def test_incomplete_document_does_not_fail(spark):
    # per-field null-on-failure (parser.py try/except→None semantics)
    row = _parse(spark, "TEXTO QUALQUER SEM ESTRUTURA 123")
    assert row["issuer"] is None
    assert row["total"] is None
    assert row["competence_date"] is None
    row = _parse(spark, "")
    assert row["issuer"] is None


def test_invalid_issuer_cnpj_yields_null_party(spark):
    bad = GOLDEN.replace("04.252.011/0001-10", "04.252.011/0001-99")
    row = _parse(spark, bad)
    assert row["issuer"] is None
    assert row["recipient"] is not None


def test_block_non_leakage(spark):
    # issuer name must come from the ISSUER block, not RECIPIENT
    row = _parse(spark, GOLDEN)
    assert row["issuer"]["name"] != "COMERCIO GLOBAL SA"


def test_nfe_key_extraction(spark):
    key43 = "35" + "2412" + "04252011000110" + "55" + "001" + "000000001" + "1" + "12345678"
    weights = [2 + ((43 - i - 1) % 8) for i in range(43)]
    r = sum(int(d) * w for d, w in zip(key43, weights)) % 11
    dv = 0 if r <= 1 else 11 - r
    doc = GOLDEN + f"\nCHAVE DE ACESSO\n{key43}{dv}"
    row = _parse(spark, doc)
    assert row["chave_acesso"] == f"{key43}{dv}"


def test_idempotence(spark):
    # same input twice ⇒ identical output (test_pipeline_robustez.py:48-68)
    df = spark.createDataFrame([(1, GOLDEN), (2, GOLDEN)], "doc_id long, text string")
    rows = P.parse_invoices(df).drop("doc_id", "text").collect()
    assert rows[0] == rows[1]


def test_items_and_total_null_when_no_valid_value(spark):
    """Per-field null-on-failure contract (parser.py:330-361): candidate
    lines with no valid monetary token and FINANCIALS blocks with no
    parseable value must yield NULLs, not ANSI array errors."""
    from rpa_etl_spark.functions.parsing import parse_invoices

    text = "\n".join(
        [
            "NOTA FISCAL",
            "DISCRIMINAÇÃO DOS SERVIÇOS",
            "SERVICOS PRESTADOS SEM NUMERO NENHUM",   # no value token at all
            "OUTRA LINHA DE CONTINUACAO LONGA AQUI",  # continuation, no value
            "VALOR TOTAL DA NOTA",
            "SEM VALOR AQUI TAMBEM",                  # labeled block, no value
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = parse_invoices(df).collect()[0]
    assert row["total"] is None
    assert len(row["items"]) == 2
    for item in row["items"]:
        assert item["unit_value"] is None
        assert len(item["description"]) > 0
