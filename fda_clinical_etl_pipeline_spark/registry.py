"""Query registry — the single source of truth behind __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an ANSI-SQL oracle string DuckDB can run over the same
parquet tables. The driver hash-compares the two at sf=0.01; tests/
test_oracle_parity.py runs the identical comparison locally at sf=0.001.

Rules for parity (SURVEY.md §7.4 #6):
- alias every computed column identically on both sides;
- round floating aggregates (both sides) so summation order can't flip
  the hash;
- keep timestamps out of results — project dates or strings;
- make every top-k / per-key-latest deterministic with explicit tiebreaks.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}

# Plan cache — the DataFrame-API analog of a prepared statement.
# Registered queries are deterministic (spark, sf_dir) -> DataFrame
# BUILDERS; the DataFrame they return is an immutable logical plan that
# re-executes freshly on every action, so re-invoking the builder only
# re-pays Python-side expression construction (py4j round-trips:
# measured 60 ms-0.8 s per query, ~5 s across the 84-query suite) for
# a byte-identical plan. Keyed by (session, sf_dir); holding the
# session object strongly also guarantees its id() is never recycled
# into a false cache hit. Bounded: the newest _PLAN_CACHE_SESSIONS
# sessions are retained (test suites create sessions per run; a
# long-lived service has exactly one).
_PLAN_CACHE_SESSIONS = 4
_plan_cache: dict[int, tuple[SparkSession, dict[tuple[str, str], DataFrame]]] = {}


def _cached_build(name: str, fn, spark: SparkSession, sf_dir: str) -> DataFrame:
    sid = id(spark)
    entry = _plan_cache.get(sid)
    if entry is None or entry[0] is not spark:
        while len(_plan_cache) >= _PLAN_CACHE_SESSIONS:
            _plan_cache.pop(next(iter(_plan_cache)))
        entry = _plan_cache[sid] = (spark, {})
    plans = entry[1]
    key = (name, sf_dir)
    df = plans.get(key)
    if df is None:
        df = plans[key] = fn(spark, sf_dir)
    return df


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query. The
    registered callable is wrapped with the plan cache; the decorated
    function itself is returned unwrapped for direct/ad-hoc use."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _cached_build(name, fn, spark, sf_dir)

        _REGISTRY[name] = RegisteredQuery(name, cached, oracle, doc)
        return fn

    return wrap


# Externally-verified gate windows are bounded (the driver checks the
# FIRST 50 entries of queries() in iteration order), so ordering is part
# of the verification contract. Rotation rule: queries never
# driver-checked — or changed since their last check — come first, then
# ascending last-checked round, name-tiebroken. Every round therefore
# re-verifies the STALEST ~50 queries, so a regression can never hide
# outside the window for more than ceil(91/50) rounds. This ordering
# must only ever rotate VERIFIED queries out of the window — rotating a
# failing query out to dodge a red row would defeat the gate.
#
# name -> last round with a driver-recorded check (green oracle row, or
# rows-returned for declared no-oracle queries). Update when each
# round's CORRECTNESS report lands.
_LAST_CHECKED: dict[str, int] = {
    # r5 window (CORRECTNESS_r05.json: 42 green + 5 declared rows-only
    # + 3 hash fails; the fails are excluded here and sit in _CHANGED)
    "approx_distinct_users": 5,
    "approx_heavy_hitters": 5,
    "approx_percentile_sketch": 5,
    "basket_association_pairs": 5,
    "catalog_active_sources": 5,
    "dedup_incremental_minhash": 5,
    "dedup_incremental_portable": 5,
    "dedup_minhash_lsh": 5,
    "dedup_near_dup_clusters": 5,
    "dedup_portable_clusters": 5,
    "dedup_portable_minhash": 5,
    "dedup_simhash": 5,
    "emb_centroid_per_label": 5,
    "event_transition_matrix": 5,
    "graph_triangle_count": 5,
    "ivm_incremental_rollup": 5,
    "llm_bpe_pair_counts": 5,
    "llm_dsir_weights": 5,
    "llm_lang_temperature": 5,
    "llm_quality_filter_quantile": 5,
    "llm_shuffle_order": 5,
    "llm_token_budget_mix": 5,
    "llm_unigram_logprob": 5,
    "ntile_price_deciles": 5,
    "profile_table_stats": 5,
    "q11_important_stock": 5,
    "q13_custdist": 5,
    "q16_supplier_part_counts": 5,
    "q17_small_qty_revenue": 5,
    "q19_disjunctive_revenue": 5,
    "q20_part_promotion_suppliers": 5,
    "q21_waiting_suppliers": 5,
    "q22_idle_balance": 5,
    "q2_min_cost_supplier": 5,
    "q6_forecast_revenue": 5,
    "q8_market_share": 5,
    "q9_profit_by_nation": 5,
    "rfm_segmentation": 5,
    "sim_ann_ivf_topk": 5,
    "sim_ann_portable_topk": 5,
    "supplier_pareto_8020": 5,
    "text_repetition_stats": 5,
    "text_token_entropy": 5,
    "training_corpus_prep": 5,
    "training_corpus_prep_portable": 5,
    "ts_gapfill_ffill": 5,
    "window_percent_rank_cume": 5,
    # r4 (CORRECTNESS_r04.json)
    "agg_count_distinct": 4,
    "agg_error_sample": 4,
    "agg_max_by_precombine": 4,
    "anomaly_zscore_events": 4,
    "asof_join_events": 4,
    "asof_join_tolerance": 4,
    "batch_sessionize_events": 4,
    "dedup_exact": 4,
    "dedup_incremental": 4,
    "dedup_ngram_jaccard": 4,
    "filter_eq_status": 4,
    "filter_in_conjunctive": 4,
    "filter_like_failed": 4,
    "grouping_rollup_region": 4,
    "hash_row_integrity": 4,
    "join_anti_no_orders": 4,
    "join_inner_enrich": 4,
    "join_left_order_counts": 4,
    "join_semi_with_orders": 4,
    "llm_pack_chunks": 4,
    "mad_anomaly_events": 4,
    "proj_rename_canonical": 4,
    "q10_returned_items": 4,
    "q12_shipmode_priority": 4,
    "q14_promo_revenue": 4,
    "q15_top_supplier": 4,
    "q18_large_orders_having": 4,
    "q1_pricing_summary": 4,
    "q3_shipping_priority": 4,
    "q4_order_priority_check": 4,
    "q5_revenue_by_nation": 4,
    "q7_nation_volume": 4,
    "setop_except_intersect": 4,
    "setop_union_canonical": 4,
    "stats_price_by_status": 4,
    "text_fingerprint": 4,
    "text_lang_id": 4,
    "text_quality_score": 4,
    "text_tfidf_topterms": 4,
    "text_token_stats": 4,
    "text_top_bigrams": 4,
    "topk_orders": 4,
    # r3 (CORRECTNESS_r03.json)
    "cohort_retention": 3,
    "constraint_check_orders": 3,
    "date_lenient_parse": 3,
    "dedup_embedding_cosine": 3,
    "emb_norm_stats": 3,
    "funnel_conversion": 3,
    "grouping_cube_orders": 3,
    "grouping_sets_explicit": 3,
    "histogram_prices": 3,
    "hl7_parse_extract": 3,
    "hopping_window_events": 3,
    "listagg_top_customers": 3,
    "llm_chunk_documents": 3,
    "llm_decontaminate": 3,
    "llm_quota_sample": 3,
    "llm_sample_stratified": 3,
    "multimodal_decode_features": 3,
    "percentile_prices": 3,
    "phi_rule_hits": 3,
    "phi_scrub_chain": 3,
    "pivot_status_priority": 3,
    "range_join_price_bands": 3,
    "scalar_date_parts": 3,
    "scalar_json_extract": 3,
    "scalar_string_funcs": 3,
    "session_window_native": 3,
    "sim_ann_lsh_topk": 3,
    "sim_cosine_topk": 3,
    "skew_salted_join_agg": 3,
    "skew_two_phase_agg": 3,
    "subquery_above_avg": 3,
    "union_missing_columns": 3,
    "unpivot_customer_metrics": 3,
    "validation_report": 3,
    "window_lag_lead_rank": 3,
    "window_latest_per_key": 3,
    "window_range_frame": 3,
    "window_running_total": 3,
    "window_topn_per_group": 3,
    "window_tumbling_events": 3,
}

# Queries whose implementation changed after their last driver check:
# treated as never-checked (front of the window) until the next
# CORRECTNESS report re-greens them. Clear entries as reports land.
# (r4's two rewrites — ntile_price_deciles, llm_pack_chunks — re-greened
# in CORRECTNESS_r04 and were cleared.)
_CHANGED: set[str] = {
    # r6: the three CORRECTNESS_r05 hash fails — values were judge-
    # verified identical; the DuckDB oracles emitted HUGEINT (int128)
    # SUM columns and the driver hash is result-type-sensitive. Fixed
    # with CAST(... AS BIGINT) on the oracle side; front-loaded so the
    # r6 window re-greens them. tests/test_oracle_types.py now lints
    # every oracle's bound result types so the class is dead.
    "graph_pagerank",
    "user_growth_curve",
    "variant_semi_structured",
    # r6 implementation changes after their last driver check:
    "rfm_segmentation",          # r6: persisted aggregate + score joins
    "basket_association_pairs",  # r6: in-array pair generation
    "ntile_price_deciles",       # r6: global_ntile emits BIGINT
    "window_topn_per_group",     # r6: rnk cast to BIGINT
    "supplier_pareto_8020",      # r6: deepest_rank cast to BIGINT
}


def validate_rotation() -> list[str]:
    """Names in the rotation metadata that no longer exist in the
    registry — a typo or a renamed query would otherwise silently lose
    (or never get) its verification-window slot. Asserted empty in
    tests; warned about at runtime."""
    return sorted((set(_LAST_CHECKED) | _CHANGED) - set(_REGISTRY))


def all_queries() -> dict[str, RegisteredQuery]:
    # Import registers as a side effect; keep imports here so a broken
    # optional module can't take down the whole entry point.
    from .operators import advanced  # noqa: F401
    from .operators import corpus  # noqa: F401
    from .operators import relational  # noqa: F401
    from .operators import windows  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import graph  # noqa: F401
    from .operators import ivm  # noqa: F401
    from .operators import bpe  # noqa: F401
    from .operators import llmprep  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import skew  # noqa: F401
    from .operators import text  # noqa: F401
    from .operators import tpch_extra  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .operators import substring  # noqa: F401
    from .plans import clinical_queries  # noqa: F401

    unknown = validate_rotation()
    if unknown:
        import warnings

        warnings.warn(
            f"rotation metadata references unregistered queries: {unknown}",
            stacklevel=2,
        )

    def order(name: str) -> tuple[int, str]:
        last = 0 if name in _CHANGED else _LAST_CHECKED.get(name, 0)
        return (last, name)

    return {n: _REGISTRY[n] for n in sorted(_REGISTRY, key=order)}
