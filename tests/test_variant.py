"""VARIANT semi-structured operators (operators/variant.py):
round-trip fidelity, the parse-failure vs JSON-null distinction,
merged-schema inference, lenient shredding under heterogeneity, and
the point of shredding — parquet predicate pushdown on shredded
columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.operators.variant import (
    json_to_variant,
    shred_variant,
    variant_quarantine_split,
    variant_schema,
)


def _docs(spark):
    rows = [
        ('{"a": 1, "b": "x", "n": {"c": 1.5}}',),
        ('{"a": 2, "b": "\\u00e9\\"quote\\"", "n": {"c": -0.25}}',),
        ('{"a": 9007199254740993, "b": null, "n": {}}',),
        ('{"a": null, "extra": [1, 2, 3]}',),
    ]
    return spark.createDataFrame(rows, "j string")


def test_roundtrip_and_lenient_shred(spark):
    parsed, corrupt = variant_quarantine_split(
        json_to_variant(_docs(spark), "j"), "v"
    )
    assert corrupt.count() == 0
    got = shred_variant(parsed, {
        "a": ("$.a", "long"),
        "b": ("$.b", "string"),
        "c": ("$.n.c", "double"),
    }).select("a", "b", "c").collect()
    vals = sorted(
        ((r["a"], r["b"], r["c"]) for r in got),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert vals == [
        (1, "x", 1.5),
        (2, 'é"quote"', -0.25),
        (9007199254740993, None, None),  # > 2^53: long-exact
        (None, None, None),            # a null, no $.n.c
    ]


def test_parse_failure_vs_json_null(spark):
    df = spark.createDataFrame(
        [("{broken",), ("null",), ('{"a": 1}',)], "j string"
    )
    parsed, corrupt = variant_quarantine_split(
        json_to_variant(df, "j"), "v"
    )
    assert corrupt.count() == 1            # only the malformed doc
    flags = parsed.select(
        F.is_variant_null(F.col("v")).alias("isnull")
    ).collect()
    assert sorted(r["isnull"] for r in flags) == [False, True]


def test_type_mismatch_yields_null_not_failure(spark):
    df = json_to_variant(
        spark.createDataFrame(
            [('{"a": "not-a-number"}',), ('{"a": 7}',)], "j string"
        ), "j",
    )
    got = shred_variant(df, {"a": ("$.a", "long")}).select("a")
    assert sorted(
        (r["a"] for r in got.collect()),
        key=lambda v: (v is None, v or 0),
    ) == [7, None]


def test_schema_inference_merges_all_documents(spark):
    s = variant_schema(json_to_variant(_docs(spark), "j"), "v")
    # one aggregate; the merged schema must mention every field any
    # document carried, including the long-tail 'extra' array
    for field in ("a", "b", "c", "extra"):
        assert field in s, s


def test_shredded_columns_take_parquet_pushdown(spark, tmp_path):
    docs = spark.range(1000).select(
        F.to_json(F.struct(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("grp"),
        )).alias("j")
    )
    shredded = shred_variant(
        json_to_variant(docs, "j"),
        {"k": ("$.k", "long"), "grp": ("$.grp", "long")},
        residual=False,
    )
    out = str(tmp_path / "shredded")
    shredded.write.parquet(out)
    q = spark.read.parquet(out).filter(F.col("k") == 17)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan.split(
        "PushedFilters"
    )[1][:80], plan
    assert [r["k"] for r in q.collect()] == [17]
