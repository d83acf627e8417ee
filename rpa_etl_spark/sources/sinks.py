"""Sinks (reference parity: K1/K2 + R1 routing).

The reference appends one-row pandas frames to a CSV (main.py:27-30) and
maps results to a JSON event contract (orchestrator_models.py:51-66). The
engine equivalents are distributed writers:

- ``append_csv``      — K1: header-carrying CSV append.
- ``write_event_json``— K2: event-contract rows as JSON lines.
- ``write_routed``    — R1: partitioned-by-route parquet layout, so each
  downstream consumer (auditoria_fiscal / processamento_normal /
  revisao_manual) reads only its partition (partition pruning at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_csv(df: DataFrame, path: str) -> None:
    """K1 — append tabular rows as CSV with headers (main.py:27-30)."""
    df.write.mode("append").option("header", "true").csv(path)


def write_event_json(df: DataFrame, path: str) -> None:
    """K2 — JSON-lines event sink (map_to_event_contract semantics:
    orchestrator_models.py:51-66). One JSON object per row."""
    df.write.mode("append").json(path)


def event_contract(df: DataFrame, tenant: str = "default") -> DataFrame:
    """Shape rows into the K2 event-bus contract:
    event_id/event_type/tenant_id/status/data."""
    return df.select(
        F.sha2(F.to_json(F.struct(*df.columns)), 256).alias("event_id"),
        F.lit("pipeline.result.v1").alias("event_type"),
        F.lit(tenant).alias("tenant_id"),
        F.to_json(F.struct(*df.columns)).alias("data"),
    )


def write_routed(df: DataFrame, route_col: str, path: str) -> None:
    """R1 — value-threshold routing as a partitioned layout
    (test_pipeline_core.py:169-194): one directory per route."""
    df.write.mode("overwrite").partitionBy(route_col).parquet(path)


# Formats Spark ships without extra jars. Parquet and ORC are the columnar
# interchange pair (predicate pushdown + column pruning at the scan); CSV
# and JSON are schema-on-read text formats for ingress/egress edges.
_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Format-dispatched batch sink. CSV gets headers by default so the
    roundtrip is lossless on column names."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_table_permissive(
    spark,
    path: str,
    fmt: str,
    schema,
    corrupt_col: str = "_corrupt_record",
    **options,
):
    """Malformed-tolerant ingest for the text formats (CSV/JSON): good
    rows parse, malformed rows keep whatever fields DID parse, null the
    rest, and carry the raw record in ``corrupt_col`` — reject bad inputs
    without killing the batch (the reference's ingress-gate behavior,
    api/dependencies.py:26-47, lifted from per-request HTTP 4xx to
    per-row quarantine). Spark-native PERMISSIVE mode, so the tolerance
    is evaluated inside the scan at any scale — no second pass, no
    driver-side row loop.

    ``schema`` is the DATA schema (required — inference would both cost
    an extra full scan and mask malformedness by widening types; a DDL
    string is accepted, as in :func:`read_table`); the corrupt column is
    appended here. CSV defaults to ``header=true`` to match
    :func:`read_table`/:func:`write_table` — pass ``header="false"`` for
    headerless files. Malformed means: an unparseable field, too few
    tokens, or too many tokens (CSV); unparseable or schema-violating
    objects (JSON). Fields that parse in a malformed row are RETAINED
    (partial results), matching Spark semantics."""
    if fmt not in ("csv", "json"):
        raise ValueError(
            f"permissive ingest is for text formats, got {fmt!r}; "
            "parquet/ORC carry their schema and fail per-file, not per-row"
        )
    from pyspark.sql.types import StringType, StructField, StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col in schema.fieldNames():
        raise ValueError(f"schema already contains {corrupt_col!r}")
    # fresh StructType: StructType.add MUTATES the receiver, and callers
    # reasonably reuse one schema object across reads
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    r = (
        spark.read.format(fmt)
        .schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if fmt == "csv":
        r = r.option("header", "true")  # caller options below may override
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def quarantine_malformed(df, corrupt_col: str = "_corrupt_record"):
    """Split a PERMISSIVE read into (good, quarantined, parsed): good rows
    drop the corrupt column; quarantined rows keep it as the evidence
    record; ``parsed`` is the CACHED frame backing both — returned so the
    caller owns its lifecycle (``parsed.unpersist()`` once both branches
    are materialized; a long-lived session that never unpersists pins one
    parsed copy per ingest in executor storage). The cache is load-bearing
    twice over: Spark disallows queries that reference ONLY the internal
    corrupt column of a raw CSV/JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and it means
    the text is parsed once, not once per branch."""
    df = df.cache()
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull())
    return good, bad, df


def read_table(spark, path: str, fmt: str = "parquet", schema=None, **options):
    """Format-dispatched batch source. Pass an explicit ``schema`` for the
    text formats (CSV/JSON) — schema-on-file formats (parquet/ORC) carry
    their own and skip inference; at 100 TB inference is a full extra scan,
    so production reads should always supply or carry a schema."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {_FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        r = r.option("inferSchema", "true")
    if fmt == "csv":
        r = r.option("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
