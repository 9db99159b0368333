"""Unit tests for the shared MERGE clause staging
(plans/merge_clauses.py) — the semantics both the Delta and Iceberg
twins inherit: null-key behavior, clause precedence, condition
gating, X-row filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.plans.merge_clauses import (
    check_ambiguous_source,
    normalize_clauses,
    require_some_clause,
    stage_merge,
)

SCHEMA = "k long, bal double"


def _acts(staged):
    return {
        (r["k"] if r["k"] is not None else r["__sk"]): r["__act"]
        for r in staged.select(
            F.col("t.k").alias("k"),
            F.col("s.k").alias("__sk"),
            "__act",
        ).collect()
    }


def test_null_keys_never_match(spark):
    tgt = spark.createDataFrame([(None, 1.0), (1, 1.0)], SCHEMA)
    src = spark.createDataFrame([(None, 2.0), (1, 2.0)], SCHEMA)
    staged = stage_merge(
        tgt, src, "k",
        {"bal": "s.bal"}, None, False, {"k": "s.k", "bal": "s.bal"},
        None, False,
    )
    rows = staged.select(
        F.col("t.k").alias("tk"), F.col("s.k").alias("sk"), "__act"
    ).collect()
    by = {(r["tk"], r["sk"]): r["__act"] for r in rows}
    # SQL equality: NULL = NULL is not true — the target null-key row
    # keeps (t-only), the source null-key row inserts (s-only)
    assert by[(None, None)] in ("K", "I")  # two rows, one each
    acts = sorted(r["__act"] for r in rows)
    assert acts == ["I", "K", "U"]


def test_delete_clause_precedes_update(spark):
    tgt = spark.createDataFrame([(1, 1.0)], SCHEMA)
    src = spark.createDataFrame([(1, -1.0)], SCHEMA)
    staged = stage_merge(
        tgt, src, "k",
        {"bal": "s.bal"}, None, "s.bal < 0", None, None, False,
    )
    assert [r["__act"] for r in staged.collect()] == ["D"]


def test_unmatched_source_without_insert_is_x(spark):
    tgt = spark.createDataFrame([(1, 1.0)], SCHEMA)
    src = spark.createDataFrame([(2, 2.0)], SCHEMA)
    staged = stage_merge(
        tgt, src, "k", {"bal": "s.bal"}, None, False, None, None,
        False,
    )
    acts = sorted(r["__act"] for r in staged.collect())
    assert acts == ["K", "X"]  # X rows are dropped by the twins


def test_update_condition_gates_to_keep(spark):
    tgt = spark.createDataFrame([(1, 5.0), (2, 5.0)], SCHEMA)
    src = spark.createDataFrame([(1, 10.0), (2, 1.0)], SCHEMA)
    staged = stage_merge(
        tgt, src, "k",
        {"bal": "s.bal"}, "s.bal > t.bal", False, None, None, False,
    )
    by = {r["k"]: r["__act"] for r in staged.select(
        F.col("t.k").alias("k"), "__act").collect()}
    assert by == {1: "U", 2: "K"}


def test_normalize_and_clause_validation(spark):
    upd, ins = normalize_clauses(["k", "bal"], "all", None)
    assert upd == {"k": "s.k", "bal": "s.bal"} and ins is None
    with pytest.raises(ValueError, match="unknown columns"):
        normalize_clauses(["k"], {"nope": "s.nope"}, None)
    with pytest.raises(ValueError, match="at least one clause"):
        require_some_clause(None, False, None, False)


def test_ambiguity_only_for_matched_duplicates(spark):
    tgt = spark.createDataFrame([(1, 1.0)], SCHEMA)
    dup_unmatched = spark.createDataFrame(
        [(9, 1.0), (9, 2.0)], SCHEMA
    )
    check_ambiguous_source(tgt, dup_unmatched, "k")  # fine
    dup_matched = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], SCHEMA
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        check_ambiguous_source(tgt, dup_matched, "k")
