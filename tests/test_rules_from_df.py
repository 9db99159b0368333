"""Data-driven PHI rules: load the rule set from a DataFrame (the
reference's phi_rules table) and verify the compiled chain honors
rule_id order and custom rules."""

from __future__ import annotations

from fda_clinical_etl_pipeline_spark.functions.scrub import (
    DEFAULT_PHI_RULES,
    redact_expr,
    rules_from_df,
)


def test_rules_roundtrip_from_dataframe(spark):
    rows = [(r.rule_id, r.pattern, r.replacement, r.description)
            for r in DEFAULT_PHI_RULES]
    df = spark.createDataFrame(
        rows, "rule_id string, pattern string, replacement string, description string"
    )
    loaded = rules_from_df(df)
    assert loaded == tuple(sorted(DEFAULT_PHI_RULES, key=lambda r: r.rule_id))


def test_custom_rule_table_drives_redaction(spark):
    rules_df = spark.createDataFrame(
        [
            ("R1_BADGE", r"badge-\d+", "[BADGE]", "badge ids"),
            ("R2_WARD", r"ward [A-Z]", "[WARD]", "ward names"),
        ],
        "rule_id string, pattern string, replacement string, description string",
    )
    rules = rules_from_df(rules_df)
    data = spark.createDataFrame(
        [("patient in ward B with badge-7731 present",)], "t string"
    )
    out = data.select(redact_expr("t", rules).alias("s")).collect()[0]["s"]
    assert out == "patient in [WARD] with [BADGE] present"


# --- UDTF extension surface (functions/udf.py) ------------------------------


def test_regex_extract_udtf(spark):
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.functions.udf import (
        make_regex_extract_udtf,
        register_udtf,
    )

    ExtractAll = make_regex_extract_udtf()
    rows = ExtractAll(
        F.lit("id=a1 id=b22 id=c333"), F.lit(r"[a-z]\d+")
    ).collect()
    assert [(r.match, r.pos) for r in rows] == [
        ("a1", 0), ("b22", 1), ("c333", 2)
    ]
    register_udtf(spark, "extract_all_t", ExtractAll)
    got = spark.sql(
        r"SELECT t.match FROM extract_all_t('x9 y88', '[a-z]\\d+') t"
    ).collect()
    assert [r.match for r in got] == ["x9", "y88"]


def test_split_fields_udtf_dynamic_schema(spark):
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.functions.udf import (
        make_split_fields_udtf,
    )

    SplitFields = make_split_fields_udtf()
    df = SplitFields(
        F.lit("MRN001|2024-01-02|ok"), F.lit("mrn|visit|status")
    )
    assert df.columns == ["mrn", "visit", "status"]
    row = df.collect()[0]
    assert (row.mrn, row.visit, row.status) == (
        "MRN001", "2024-01-02", "ok"
    )
    # short line pads with NULLs rather than failing
    short = SplitFields(F.lit("only"), F.lit("a|b")).collect()[0]
    assert (short.a, short.b) == ("only", None)
