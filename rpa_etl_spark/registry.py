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


# Export order for queries(): the driver iterates the dict in order and has
# historically stopped after ~50 entries (time/size budget), leaving the tail
# without a correctness verdict. Order therefore encodes VERIFICATION
# PRIORITY, not module layout:
#   1. queries that have never received a driver verdict (LLM-data ops,
#      payload/audit transforms, as-of join, TPC-H shapes);
#   2. the reference-soul queries (parse/validate/normalize/route) and any
#      query whose plan changed this round;
#   3. stable, repeatedly-green relational battery queries last — losing a
#      verdict on one of these costs the least information.
PRIORITY_ORDER = [
    # == tier 1 (33 entries): the 30 queries with NO driver-green verdict
    #    in r01-r03, plus the 3 new round-4 queries ===================
    # -- 1a: round-2 reds, fixed locally long ago, never re-queued ------
    "q_normalize_docs",  # the reference's soul (P1-P8 + P10 accent strip)
    "q_date_funcs",
    "q_window_lead_lag",
    "q_approx_count_distinct",
    # -- 1b: round-3 additions that sat below the driver's ~50 cutoff ---
    "q_corr_stats",
    "q_url_parse",
    "q_argmax",
    "q_time_weighted_avg",
    "q_zorder_code",
    "q_wordcount",
    "q_mode",
    "q_event_sequence",
    "q_entropy",
    "q_set_ops_all",
    "q_try_arith",
    "q_not_in_null_semantics",
    "q_daily_kpis",
    "q_percentile_disc",
    "q_user_totals_state",
    "q_array_agg",
    "q_window_rank_ties",
    "q_explode_outer",
    # -- 1c: the 8 round-3 reds re-typed this round (oracle casts) ------
    "q_text_stats",
    "q_lang_quality",
    "q_embedding_quantize",
    "q_multimodal_decode",
    "q_multimodal_png",
    "q_multimodal_audio",
    "q_multimodal_frames",
    "q_pack_sequences",
    # -- 1d: new this round (round 4) — S1/S2/S3 PDF chain + K1/K2 sinks
    "q_pdf_extract",
    "q_sink_roundtrip",
    "q_domain_mix",
    # == tier 2: re-confirmation battery (all ever-green; with 33 tier-1
    #    entries only ~17 of these fit a ~50-query driver budget — losing
    #    a verdict on one costs the least information) — reference soul
    #    first, then one representative per operator family ===========
    "q_flagship",
    "q_parse_invoice",
    "q_dedup_lines",
    "q_monetary_br",
    "q_trust_score",
    "q_case_routing",
    "q_join_asof",
    "q_dedup_minhash",
    "q_dedup_clusters",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_sim_topk",
    "q_chunk_documents",
    "q_quality_cascade",
    "q_contamination",
    "q_agg_skew_salted",
    "q_join_skew_salted",
    "q_tpch_q3_shape",
    "q_tpch_q21_shape",
    "q_session_window",
    "q_stream_dedup",
    # == tier 3: stable relational/functions battery ==================
    "q_cnpj_valid",
    "q_nfe_key_valid",
    "q_string_funcs",
    "q_window_ntile",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_fuzzy_match",
    "q_multimodal_meta",
    "q_repetition_stats",
    "q_quantiles",
    "q_sample_hash",
    "q_sample_stratified",
    "q_having_large_orders",
    "q_funnel",
    "q_profile_stats",
    "q_hll_sketch_merge",
    "q_merge_upsert",
    "q_outlier_zscore",
    "q_retention_cohort",
    "q_window_value_funcs",
    "q_recursive_cte",
    "q_lateral_topk",
    "q_scd2_history",
    "q_pii_redact",
    "q_tfidf_terms",
    "q_embedding_centroid",
    "q_histogram",
    "q_payload_erp",
    "q_payload_analytics",
    "q_audit_events",
    "q_tpch_q5_shape",
    "q_tpch_q10_shape",
    "q_tpch_q14_shape",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_interval_join",
    "q_agg_group",
    "q_join_inner_broadcast",
    "q_window_rank",
    "q_topk",
    "q_set_ops",
    "q_scalar_subquery",
    "q_rollup",
    "q_gap_fill",
]


def _reorder() -> None:
    """Rebuild QUERIES/ORACLES in PRIORITY_ORDER (unlisted names keep their
    registration order after the prioritized block). Both dicts get the
    same order so the driver sees the priority regardless of which export
    it iterates."""
    ordered = [n for n in PRIORITY_ORDER if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    reordered_q = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered_q)
    reordered_o = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_o)


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
        "rpa_etl_spark.plans.curation_queries",
        "rpa_etl_spark.plans.analytics_queries",
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
    _reorder()
