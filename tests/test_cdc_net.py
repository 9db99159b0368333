"""net_changes: churn → window-endpoint deltas, format-agnostic
(Iceberg changelog shape and Delta CDF shape)."""

from __future__ import annotations

from fda_clinical_etl_pipeline_spark.sources.cdc import net_changes

SCHEMA = (
    "k long, val double, _change_type string, _change_ordinal int"
)


def _net(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    got = net_changes(df, keys=["k"], **kw).collect()
    return sorted((r["_change_type"], r["k"], r["val"]) for r in got)


def test_net_insert_then_update_folds_to_final_insert(spark):
    rows = [
        (1, 1.0, "insert", 0),
        (1, 1.0, "delete", 2),  # update pre
        (1, 9.0, "insert", 2),  # update post
    ]
    assert _net(spark, rows) == [("insert", 1, 9.0)]


def test_net_transient_key_vanishes(spark):
    rows = [(1, 1.0, "insert", 0), (1, 1.0, "delete", 3)]
    assert _net(spark, rows) == []


def test_net_preexisting_delete_keeps_pre_values(spark):
    # deleted, re-inserted, deleted again: net = one delete with the
    # window-START values (5.0), not the transient re-insert's
    rows = [
        (1, 5.0, "delete", 0),
        (1, 7.0, "insert", 1),
        (1, 7.0, "delete", 2),
    ]
    assert _net(spark, rows) == [("delete", 1, 5.0)]


def test_net_equal_values_update_folds_away(spark):
    # delete + re-insert with IDENTICAL values = no net change
    rows = [(1, 5.0, "delete", 0), (1, 5.0, "insert", 1)]
    assert _net(spark, rows) == []


def test_net_update_emits_delete_plus_insert(spark):
    rows = [(1, 5.0, "delete", 1), (1, 6.0, "insert", 1)]
    assert _net(spark, rows) == [
        ("delete", 1, 5.0), ("insert", 1, 6.0),
    ]


def test_net_delta_cdf_shape(spark):
    """Delta CDF types normalize: update_preimage/postimage fold like
    delete/insert; ordinal column is _commit_version."""
    df = spark.createDataFrame(
        [
            (1, 5.0, "update_preimage", 4),
            (1, 6.0, "update_postimage", 4),
            (2, 1.0, "insert", 5),
            (3, 2.0, "delete", 6),
        ],
        "k long, val double, _change_type string, _commit_version int",
    )
    got = net_changes(
        df, keys=["k"], ord_col="_commit_version"
    ).collect()
    assert sorted(
        (r["_change_type"], r["k"], r["val"]) for r in got
    ) == [
        ("delete", 1, 5.0), ("delete", 3, 2.0),
        ("insert", 1, 6.0), ("insert", 2, 1.0),
    ]


def test_net_matches_mirror_apply(spark, tmp_path):
    """End-to-end contract: applying the NET changes to the window-
    start snapshot reproduces the final table exactly — on the real
    Iceberg changelog of a delete + merge history."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(
            [(i, float(i)) for i in range(60)], "k long, val double"
        ),
    )
    s0 = t.metadata()["current-snapshot-id"]
    start = {(r["k"], r["val"]) for r in t.snapshot().collect()}
    t.equality_delete(
        spark.createDataFrame([(int(i),) for i in range(0, 60, 9)],
                              "k long"), ["k"],
    )
    t.merge(
        spark.createDataFrame(
            [(5, 555.0), (9, 9.0), (100, 1.0)], "k long, val double"
        ),
        on="k",
        when_matched_update="all",
        when_not_matched_insert="all",
    )
    net = net_changes(
        t.changelog_scan(from_snapshot_id=s0), keys=["k"]
    ).collect()
    mirror = set(start)
    for r in net:
        if r["_change_type"] == "delete":
            mirror.discard((r["k"], r["val"]))
    for r in net:
        if r["_change_type"] == "insert":
            mirror.add((r["k"], r["val"]))
    assert mirror == {
        (r["k"], r["val"]) for r in t.snapshot().collect()
    }
    # and the fold is smaller than the churn (k=9 delete+re-insert
    # with its original value must fold away)
    churn = t.changelog_scan(from_snapshot_id=s0).count()
    assert len(net) < churn
