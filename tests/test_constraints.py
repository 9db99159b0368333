"""TableConstraints negative-path tests: every constraint type catches
its violation with the right count."""

from __future__ import annotations

from fda_clinical_etl_pipeline_spark.plans.constraints import TableConstraints


def test_each_constraint_type_catches_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "F", 10.0, 100),
            (1, "O", 20.0, 200),      # duplicate key
            (None, "P", 30.0, 100),   # null key
            (3, "Z", -5.0, 999),      # bad status, negative price, bad FK
        ],
        "k long, status string, price double, cust long",
    )
    dim = spark.createDataFrame([(100,), (200,)], "ck long")
    checks = TableConstraints(
        not_null=["k"],
        unique=[("k",)],
        accepted_values={"status": ("F", "O", "P")},
        ranges={"price": (0.0, 100.0)},
        min_rows=10,
        references={"cust": (dim, "ck")},
    )
    by_name = {r.name: r for r in checks.check(df)}
    assert not by_name["not_null:k"].passed
    assert by_name["not_null:k"].violations == 1
    assert not by_name["unique:k"].passed
    # one extra copy of k=1, plus the null key (COUNT(*) - COUNT(DISTINCT)
    # semantics: a null key is not a unique identifier)
    assert by_name["unique:k"].violations == 2
    assert not by_name["accepted_values:status"].passed
    assert by_name["accepted_values:status"].violations == 1
    assert not by_name["range:price"].passed
    assert by_name["range:price"].violations == 1
    assert not by_name["references:cust"].passed
    assert by_name["references:cust"].violations == 1
    assert not by_name["min_rows"].passed
    assert by_name["min_rows"].violations == 6  # floor 10, 4 rows

    # clean table passes everything
    clean = spark.createDataFrame(
        [(i, "F", 1.0, 100) for i in range(12)],
        "k long, status string, price double, cust long",
    )
    assert all(r.passed for r in checks.check(clean))


def test_check_df_shape(spark):
    df = spark.createDataFrame([(1,)], "k long")
    out = TableConstraints(not_null=["k"]).check_df(df)
    assert out.columns == ["constraint", "passed", "violations", "detail"]
    assert out.collect()[0]["passed"] is True
