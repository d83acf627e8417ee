"""Gate: every declared query with an oracle must hash-match DuckDB locally
(sf0.001 by default — the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from rpa_etl_spark import registry
from tests.oracle import assert_matches_oracle

registry.load_all_plans()

ORACLE_QUERIES = sorted(registry.ORACLES)
ROWS_ONLY_QUERIES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, registry.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
