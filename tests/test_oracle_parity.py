"""Gate: every declared query with an oracle must hash-match DuckDB locally
(sf0.001 by default — the driver runs the same comparison at sf0.01) AND
return at least one row. The non-vacuity check exists because a 0 == 0
row comparison verifies only that neither engine invents rows: a round-10
audit found two queries (embedding dedup above the fixture's max cosine,
anti-join with an always-matching right side) that had been "passing"
vacuously for rounds. A future query whose correct result is genuinely
empty must be listed in VACUOUS_OK with a reason."""

from __future__ import annotations

import pytest

from rpa_etl_spark import registry
from tests.oracle import assert_matches_oracle

registry.load_all_plans()

ORACLE_QUERIES = sorted(registry.ORACLES)
ROWS_ONLY_QUERIES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


# queries whose correct output is legitimately empty on the fixtures
# (currently none — add with a reason, never to silence a regression)
VACUOUS_OK: set[str] = set()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    n = assert_matches_oracle(df, registry.ORACLES[name], sf_dir, name=name)
    if name not in VACUOUS_OK:
        assert n > 0, (
            f"{name} returned 0 rows — vacuous oracle comparison "
            "(see module docstring); fix the query or allowlist with a reason"
        )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
