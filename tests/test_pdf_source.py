"""PDF source plumbing tests (stub decode path — PyMuPDF absent here)."""

from __future__ import annotations

from rpa_etl_spark.sources import pdf as P


def _write_pdf(dirpath, name: str, body: bytes, header: bytes = b"%PDF-1.4") -> None:
    (dirpath / name).write_bytes(header + b"\n" + body)


def test_pdf_pipeline_stub(spark, tmp_path):
    _write_pdf(tmp_path, "a.pdf", b"conteudo do documento A")
    _write_pdf(tmp_path, "b.pdf", b"conteudo B")
    _write_pdf(tmp_path, "not_pdf.pdf", b"xx", header=b"NOPE")  # fails magic gate
    (tmp_path / "ignored.txt").write_bytes(b"%PDF-1.4\nnot matched by glob")

    out = P.pdf_pipeline(spark, str(tmp_path)).collect()
    assert len(out) == 2  # magic-gate filtered the fake, glob filtered .txt
    by_name = {r["path"].split("/")[-1]: r for r in out}
    assert by_name["a.pdf"]["text"] == "conteudo do documento A"
    assert by_name["a.pdf"]["extraction_method"] == "stub"
    assert by_name["a.pdf"]["page_count"] == 1
    assert by_name["a.pdf"]["size_bytes"] == len(b"%PDF-1.4\nconteudo do documento A")
    assert by_name["a.pdf"]["has_unicode_issues"] is False


def test_pdf_size_gate(spark, tmp_path):
    _write_pdf(tmp_path, "big.pdf", b"x" * 100)
    df = P.read_pdf_files(spark, str(tmp_path))
    assert P.validate_pdf_ingress(df, max_bytes=50).count() == 0
    assert P.validate_pdf_ingress(df, max_bytes=10_000).count() == 1
