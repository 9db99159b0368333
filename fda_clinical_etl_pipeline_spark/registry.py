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


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, doc)
        return fn

    return wrap


# Externally-verified gate windows are bounded (the driver checks the
# FIRST 50 entries of queries() in iteration order), so ordering is part
# of the verification contract: queries that have not yet earned a green
# driver row come first, then this round's new queries, then queries
# already verified in a previous round.  Keep this list in sync when a
# round's CORRECTNESS report lands.
_PRIORITY: list[str] = [
    # Clinical flagship gates (reference core semantics).
    "phi_scrub_chain",
    "hl7_parse_extract",
    "validation_report",
    "phi_rule_hits",
    "catalog_active_sources",
    "constraint_check_orders",
    # Window operators.
    "window_latest_per_key",
    "window_topn_per_group",
    "window_running_total",
    "window_lag_lead_rank",
    "window_tumbling_events",
    "window_range_frame",
    # As-of joins.
    "asof_join_events",
    "asof_join_tolerance",
    # Scalar function surface.
    "scalar_string_funcs",
    "scalar_date_parts",
    "scalar_json_extract",
    "date_lenient_parse",
    # Set-op / grouping stragglers.
    "union_missing_columns",
    "grouping_cube_orders",
    # LLM-prep pipeline.
    "llm_chunk_documents",
    "llm_sample_stratified",
    "llm_pack_chunks",
    "llm_quota_sample",
    "llm_decontaminate",
    # Similarity / embeddings.
    "sim_cosine_topk",
    "emb_norm_stats",
    # Skew utilities.
    "skew_salted_join_agg",
    "skew_two_phase_agg",
    # Multimodal plumbing.
    "multimodal_decode_features",
    # Never-checked rows-only gates.
    "dedup_embedding_cosine",
    "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",
]


def all_queries() -> dict[str, RegisteredQuery]:
    # Import registers as a side effect; keep imports here so a broken
    # optional module can't take down the whole entry point.
    from .operators import advanced  # noqa: F401
    from .operators import corpus  # noqa: F401
    from .operators import relational  # noqa: F401
    from .operators import windows  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import llmprep  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import skew  # noqa: F401
    from .operators import text  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .plans import clinical_queries  # noqa: F401

    ordered: dict[str, RegisteredQuery] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
