"""Declared-query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus, when expressible,
the equivalent ANSI SQL for the DuckDB oracle. ``__spark_entry__.py``
re-exports this registry to the driver.

Determinism rules for oracle-checked queries (the driver hashes values
order-insensitively but exactly):
- monetary/double aggregates are computed in exact DECIMAL arithmetic, then
  rounded and cast to double on BOTH sides — bit-identical results;
- no wall-clock, no uuid, no floating aggregation order dependence;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_plans() -> None:
    """Import every module that registers queries (idempotent)."""
    from rpa_etl_spark.plans import flagship  # noqa: F401

    for mod in (
        "rpa_etl_spark.plans.relational",
        "rpa_etl_spark.plans.functions_queries",
        "rpa_etl_spark.plans.validator_queries",
        "rpa_etl_spark.plans.document_queries",
        "rpa_etl_spark.plans.streaming_queries",
        "rpa_etl_spark.plans.llmdata_queries",
        "rpa_etl_spark.plans.payload_queries",
        "rpa_etl_spark.plans.tpch_shapes",
    ):
        try:
            __import__(mod)
        except ModuleNotFoundError as e:
            # tolerate only "this plan module doesn't exist yet" — an
            # ImportError from INSIDE an existing module (typo'd symbol,
            # missing dependency) must fail loudly, not silently shrink
            # the declared-query surface
            if e.name != mod:
                raise
