"""Edge-hardening: empty inputs, NULL text, NULL keys through the major
operator families — the inputs production data always eventually
contains and fixtures never do."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.functions.scrub import redact_expr
from fda_clinical_etl_pipeline_spark.operators.corpus import prepare_training_corpus
from fda_clinical_etl_pipeline_spark.operators.dedup import (
    minhash_lsh_candidates,
    shingles,
)
from fda_clinical_etl_pipeline_spark.operators.versioning import VersionedTable
from fda_clinical_etl_pipeline_spark.plans.canonical import (
    canonical_union,
    canonicalize_hospital_a,
)
from fda_clinical_etl_pipeline_spark.plans.validate import validate


DOCS_SCHEMA = "doc_id long, text string, lang string"


def test_minhash_on_empty_and_null_text(spark):
    empty = spark.createDataFrame([], DOCS_SCHEMA)
    assert minhash_lsh_candidates(empty.select("doc_id", "text")).count() == 0

    with_nulls = spark.createDataFrame(
        [(1, None, "en"), (2, "", "en"),
         (3, "the same exact words here repeated", "en"),
         (4, "the same exact words here repeated", "en")],
        DOCS_SCHEMA,
    )
    pairs = minhash_lsh_candidates(with_nulls.select("doc_id", "text")).collect()
    # identical docs are candidates; null/empty text doesn't crash the
    # shingle pipeline
    assert (3, 4) in {(r["doc_a"], r["doc_b"]) for r in pairs}


def test_shingles_of_null_empty_short(spark):
    df = spark.createDataFrame(
        [(None,), ("",), ("one",), ("one two",)], "t string"
    )
    rows = df.select(shingles("t").alias("s")).collect()
    assert rows[0]["s"] == []        # null text → no shingles
    assert rows[1]["s"] == []        # empty text → no shingles
    assert rows[2]["s"] == ["one"]   # shorter than k → whole-text shingle
    assert rows[3]["s"] == ["one two"]


def test_redact_null_passthrough(spark):
    df = spark.createDataFrame([(None,), ("a@b.co",)], "t string")
    out = [r["s"] for r in df.select(redact_expr("t").alias("s")).collect()]
    assert out[0] is None
    assert out[1] == "[REDACTED_EMAIL]"


def test_validate_empty_frame(spark):
    df = spark.createDataFrame([], "id string, amount string")
    res = validate(df, [{"column_name": "id", "data_type": "string",
                         "is_nullable": False}])
    assert res.valid.count() == 0 and res.quarantine.count() == 0
    assert res.error_summary().count() == 0


def test_canonical_union_with_empty_side(spark):
    a = spark.createDataFrame(
        [("P1", "N", "1970-01-01", "2025-01-01", "Flu", "note")],
        "patient_id string, patient_name string, dob string, "
        "visit_date string, diagnosis string, notes string",
    )
    empty = spark.createDataFrame(
        [], "patient_id string, patient_name string, dob string, "
            "visit_date string, diagnosis string, notes string",
    )
    out = canonical_union(
        canonicalize_hospital_a(a), canonicalize_hospital_a(empty)
    )
    assert out.count() == 1
    assert len(out.columns) == 9


def test_corpus_prep_empty_and_all_filtered(spark):
    empty = spark.createDataFrame([], DOCS_SCHEMA)
    assert prepare_training_corpus(empty).count() == 0
    junk = spark.createDataFrame([(1, "zz", "en"), (2, None, "en")], DOCS_SCHEMA)
    assert prepare_training_corpus(junk).count() == 0  # all quality-dropped


def test_versioned_upsert_empty_batch(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "v"), "k", "ts")
    t.upsert(spark.createDataFrame([("a", "1", 1)], "k string, ts string, x long"))
    entry = t.upsert(
        spark.createDataFrame([], "k string, ts string, x long")
    )
    # empty batch: a no-op commit (0 rows written, no buckets touched);
    # the snapshot carries forward through the unchanged bucket map
    assert entry["rows"] == 0 and entry["buckets"] == []
    assert t.snapshot().count() == 1


def test_window_ops_with_null_keys(spark):
    from fda_clinical_etl_pipeline_spark.operators.versioning import (
        precombine_dedup,
    )

    df = spark.createDataFrame(
        [(None, "2025-01-01", "a"), (None, "2025-02-01", "b"),
         ("K", "2025-01-01", "c")],
        "k string, ts string, v string",
    )
    out = precombine_dedup(df, "k", "ts")
    rows = {r["v"] for r in out.collect()}
    # NULL keys group together (Spark window partitioning treats NULL as
    # one key); latest wins within the NULL group
    assert rows == {"b", "c"}
