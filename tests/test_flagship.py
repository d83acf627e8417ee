from __future__ import annotations

from rpa_etl_spark import registry
from tests.oracle import assert_matches_oracle

registry.load_all_plans()


def test_flagship_matches_oracle(spark, sf_dir):
    df = registry.QUERIES["q_flagship"](spark, sf_dir)
    assert_matches_oracle(df, registry.ORACLES["q_flagship"], sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"nation", "returnflag", "revenue", "n_items", "n_orders", "route"}
