"""End-to-end pipeline tests mirroring the reference's e2e suite
(test_pipeline_core.py / test_pipeline_robustez.py semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_spark.pipeline import process_documents
from tests.test_parsing import GOLDEN

NOISY_GOLDEN = GOLDEN.replace(
    "EMISSÃO: 15/12/2024 10:30:00", "EMISSÃO:  15/12/202410:30:00"
).replace("R$ 4.450,00", "R$ 4.450 , 00")


def _run(spark, docs: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    return process_documents(df).collect()


def test_golden_document_success_path(spark):
    row = _run(spark, [GOLDEN])[0]
    assert row["emission_date"] == "15/12/2024 10:30:00"
    assert row["competence_date"] == "12/2024"
    assert row["issuer"]["cnpj_cpf"] == "04.252.011/0001-10"
    assert len(row["items"]) >= 3
    assert row["total"] == "4.450,00"
    assert row["validation_issues"] == []
    assert float(row["trust_score"]) == 1.0
    assert row["status"] == "success"
    assert row["route"] == "processamento_normal"  # 4450 < 10000


def test_normalization_repairs_noise_before_parse(spark):
    # date-time collision + split decimal fixed by NORMALIZE, so PARSE
    # still lands every field (reference robustness requirement)
    row = _run(spark, [NOISY_GOLDEN])[0]
    assert row["emission_date"] == "15/12/2024 10:30:00"
    assert row["total"] == "4.450,00"
    assert row["status"] == "success"
    assert row["reduction_ratio"] >= 0.0


def test_invalid_issuer_routes_to_manual_review(spark):
    bad = GOLDEN.replace("04.252.011/0001-10", "04.252.011/0001-99")
    row = _run(spark, [bad])[0]
    codes = [i["code"] for i in row["validation_issues"]]
    assert "ISSUER_CNPJ_INVALID" in codes
    assert row["status"] == "error"
    assert row["route"] == "revisao_manual"
    assert float(row["trust_score"]) == 0.0


def test_high_value_routes_to_audit(spark):
    rich = GOLDEN.replace("R$ 4.450,00", "R$ 44.500,00")
    row = _run(spark, [rich])[0]
    assert row["status"] == "success"
    assert row["route"] == "auditoria_fiscal"  # 44500 > 10000


def test_incomplete_document_partial_not_crash(spark):
    row = _run(spark, ["PRESTADOR DE SERVIÇOS\nCNPJ: 04.252.011/0001-10\nEMPRESA X LTDA"])[0]
    assert row["status"] == "partial"
    codes = {i["code"] for i in row["validation_issues"]}
    assert "TOTAL_MISSING" in codes
    assert 0.0 < float(row["trust_score"]) < 1.0


def test_pipeline_idempotent_and_deterministic(spark):
    rows1 = _run(spark, [GOLDEN, NOISY_GOLDEN])
    rows2 = _run(spark, [GOLDEN, NOISY_GOLDEN])
    assert rows1 == rows2


def test_batch_of_mixed_documents(spark, sf_dir):
    from rpa_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(100)
    out = process_documents(docs)
    rows = out.collect()
    assert len(rows) == 100
    # word-salad corpus: no CNPJs anywhere → every doc errors to manual review
    assert all(r["status"] == "error" for r in rows)
    assert all(r["route"] == "revisao_manual" for r in rows)


def test_pipeline_observed_metrics(spark, sf_dir):
    """Observation metrics must match independently computed aggregates —
    and arrive from the same single pass (no extra action needed)."""
    from pyspark.sql import functions as F

    from rpa_etl_spark.pipeline import process_documents_with_metrics
    from rpa_etl_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(200)
    observed, obs = process_documents_with_metrics(docs)
    rows = observed.collect()  # one action → metrics materialize
    m = obs.get
    assert m["n_docs"] == len(rows)
    assert m["n_error"] == sum(1 for r in rows if r["status"] == "error")
    assert m["n_audit"] == sum(1 for r in rows if r["route"] == "auditoria_fiscal")
    expected_avg = sum(float(r["trust_score"]) for r in rows) / len(rows)
    assert abs(m["avg_trust"] - expected_avg) < 1e-9


def test_pipeline_handles_empty_and_degenerate_inputs(spark):
    """Reference robustness contract (test_pipeline_robustez.py:71-97
    semantics): empty corpus and degenerate texts must not crash — they
    produce schema-stable rows with null fields and error/manual routes."""
    from rpa_etl_spark.pipeline import process_documents

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = process_documents(empty)
    assert out.count() == 0
    assert "route" in out.columns  # schema fully resolved on empty input

    degenerate = spark.createDataFrame(
        [(1, ""), (2, " "), (3, "\n\n\n"), (4, "1"), (5, None)],
        "doc_id long, text string",
    )
    rows = process_documents(degenerate).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["status"] in ("success", "partial", "error")
        assert r["route"] == "revisao_manual"  # nothing parseable → manual
