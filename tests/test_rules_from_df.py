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
