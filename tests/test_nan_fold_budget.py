"""NaN/NULL-fold audit (round 6).

A NULL in a numeric oracle column fetches from DuckDB as float64 NaN, which
the compare folds back to NULL (tests/oracle.py::_NAN_IS_NULL). That fold
is safe — the driver faces the identical post-fetch ambiguity — but every
column relying on it is one canonicalizer change away from a red, so the
set is BUDGETED: this test pins exactly which queries may carry fold-armed
columns. The entries below keep NULL deliberately because NULL is the
demonstrated semantic (try-arith failure, window edge, full-join
unmatched, unparseable money, pivot hole). Queries where NULL was
incidental were de-armed instead (q_decimal_math round 6 →
boolean+sentinel; q_dedup_incremental round 6 → -1 sentinel;
q_join_asof round 11 → matched boolean + -1 sentinels).

A new query appearing here unintentionally should be fixed like those two,
not added to the allowlist.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from rpa_etl_spark import registry

# Single source of truth lives in tests/oracle.py (the compare consults it
# to decide whether a fold warrants the once-per-process warning); this
# test pins the measured fold-armed set to exactly that list.
from tests.oracle import FOLD_ARMED_OK as ALLOWED_FOLD_ARMED

SF = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.filterwarnings("ignore::UserWarning")
def test_fold_armed_queries_are_exactly_the_allowlist():
    registry.load_all_plans()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    armed = set()
    for q, sql in registry.ORACLES.items():
        pdf = con.execute(sql).fetchdf()
        for c in pdf.columns:
            col = pdf[c]
            if str(col.dtype).startswith("float"):
                if int(col.isna().sum()):
                    armed.add(q)
            elif col.dtype == object:
                if any(isinstance(v, float) and math.isnan(v) for v in col):
                    armed.add(q)
    unexpected = armed - ALLOWED_FOLD_ARMED
    stale = ALLOWED_FOLD_ARMED - armed
    assert not unexpected, (
        f"new fold-armed queries {sorted(unexpected)} — emit a sentinel or "
        "boolean instead of a nullable numeric (see module docstring)"
    )
    assert not stale, (
        f"allowlist entries no longer fold-armed: {sorted(stale)} — prune them"
    )
