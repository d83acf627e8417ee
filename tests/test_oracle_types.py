"""Registration-time output-type audit for every declared oracle.

Round 3 lost 8 driver verdicts to oracle OUTPUT TYPING, not engine
values: DuckDB `SUM(BIGINT)` silently returns HUGEINT (fetched as
float64, hash-mismatching Spark's int64) and list-typed cells crash the
driver's canonicalizer. These two gates make that class of bug
impossible to re-introduce:

1. DuckDB logical-type audit (no Spark needed): every oracle's bound
   output schema must contain no HUGEINT and no LIST/STRUCT/MAP column.
2. Spark output-schema audit (reads `.schema`, which is analysis-only
   for every query except q_sink_roundtrip — that one executes its sink
   writes as a side effect of construction, by design): every
   oracle-checked query's DataFrame schema must contain no
   ArrayType/MapType/StructType at top level.

The value-level cross-check — int64 vs float64 vs Decimal per CELL — is
enforced by tests/oracle.py::assert_matches_oracle (type-exact since
round 4) in test_oracle_parity.py.
"""

from __future__ import annotations

import duckdb
import pytest

from rpa_etl_spark import registry
from rpa_etl_spark.tables import TABLE_NAMES

registry.load_all_plans()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for name in TABLE_NAMES:
        c.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield c
    c.close()


def _is_nested(type_str: str) -> bool:
    return type_str.endswith("[]") or type_str.startswith(("STRUCT", "MAP", "LIST"))


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_output_types_scalar_and_sized(con, name):
    rel = con.sql(registry.ORACLES[name])
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) == "HUGEINT" or _is_nested(str(t))
    ]
    assert not offenders, (
        f"{name}: oracle emits HUGEINT/nested columns {offenders} — "
        "CAST sums to BIGINT and serialize arrays/maps (array_to_string/"
        "to_json); the driver's hash layer renders HUGEINT as float64 "
        "and cannot sort list cells"
    )


def test_spark_output_schemas_scalar(spark, sf_dir):
    from pyspark.sql import types as T

    offenders = {}
    for name, fn in registry.QUERIES.items():
        if name not in registry.ORACLES:
            continue
        schema = fn(spark, sf_dir).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, (
        f"oracle-checked queries with nested output columns: {offenders} — "
        "serialize (array_join/to_json) before declaring"
    )
