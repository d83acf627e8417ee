#!/usr/bin/env python
"""End-to-end example: what a user of the reference pipeline runs here.

Reference equivalent: POST a PDF to the API → Orchestrator.process() → CSV
row + JSON event (robot/orchestrator.py:118-298, main.py:16-36). Engine
equivalent, batched over a corpus and cluster-ready:

    spark-submit examples/run_pipeline.py <input_parquet> <output_dir>

Reads a documents parquet (doc_id, text, ...), runs the full
normalize→parse→validate→score→route pipeline in one fused pass, writes:

- ``<out>/results``   — full PipelineResult-shaped rows, parquet,
                        partitioned by route (R1/R2 routing as layout)
- ``<out>/events``    — K2-style JSON event contract, one line per doc
- ``metrics``         — same-pass Observation telemetry printed as JSON

Defaults to the sf0.001 test corpus so it runs out of the box.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rpa_etl_spark.pipeline import process_documents_with_metrics  # noqa: E402
from rpa_etl_spark.session import get_spark  # noqa: E402


def _as_invoice_corpus(docs):
    """Wrap each document in an NFS-e-shaped envelope (CNPJ, dates, a BR
    total derived from doc_id) so the demo exercises the SUCCESS paths of
    parse/validate/route. Without this, the synthetic word corpus has no
    fiscal content and every row routes to manual review — correct, but a
    poor showcase. Odd doc_ids get an invalid issuer DV to light up the
    error/audit routes too."""
    issuer = F.when(
        F.col("doc_id") % 2 == 0, F.lit("04.252.011/0001-10")
    ).otherwise(F.lit("04.252.011/0001-11"))
    cents = (F.col("doc_id") * 7919) % 3_000_000  # spread totals over R$ 0-30k
    total_br = F.concat(
        (cents / 100).cast("long").cast("string"), F.lit(","),
        F.lpad((cents % 100).cast("string"), 2, "0"),
    )
    text = F.concat_ws(
        "\n",
        F.lit("NOTA FISCAL DE SERVICOS ELETRONICA"),
        F.lit("EMISSÃO: 15/12/2024 10:30:00"),
        F.lit("PRESTADOR DE SERVIÇOS"),
        F.concat(F.lit("CNPJ: "), issuer),
        F.lit("EMPRESA EXEMPLO COMERCIO LTDA"),
        F.lit("DISCRIMINAÇÃO DOS SERVIÇOS"),
        F.col("text"),
        F.lit("VALOR TOTAL DA NOTA"),
        F.concat(F.lit("R$ "), total_br),
    )
    return docs.select("doc_id", text.alias("text"))


def main() -> None:
    inp = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rpa_etl_spark_out"

    spark = get_spark("rpa-etl-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(inp)
    if "--raw" not in sys.argv:
        docs = _as_invoice_corpus(docs)
    result, obs = process_documents_with_metrics(docs)

    (
        result.write.mode("overwrite")
        .partitionBy("route")
        .parquet(f"{out}/results")
    )

    events = result.select(
        F.to_json(
            F.struct(
                F.sha2(F.col("raw_sha256"), 256).alias("event_id"),
                F.lit("document.processed").alias("event_type"),
                F.col("tenant_id"),
                F.col("status"),
                F.struct("trust_score", "route", "reduction_ratio").alias("data"),
            )
        ).alias("value")
    )
    events.write.mode("overwrite").text(f"{out}/events")

    print(json.dumps({"metrics": obs.get, "output": out}))
    spark.stop()


if __name__ == "__main__":
    main()
