"""HudiTable.changelog — row-level churn from the timeline + touched
file slices (the Hudi leg of the three-format CDC story)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    HudiTable,
)

SCHEMA = "k int, ver int, bal double"
I1, I2, I3, I4, I5 = (
    "20240101000000000", "20240102000000000", "20240103000000000",
    "20240104000000000", "20240105000000000",
)


def _mk(spark, tmp_path, ttype):
    t = HudiTable.create(
        spark, str(tmp_path / "h"), "cdl", "k", "ver",
        table_type=ttype,
    )
    t.upsert(spark.createDataFrame(
        [(i, 1, float(i)) for i in range(10)], SCHEMA
    ), instant=I1)
    t.upsert(spark.createDataFrame(
        [(0, 2, 99.0), (50, 1, 5.0)], SCHEMA
    ), instant=I2)
    t.delete_keys(spark.createDataFrame([(3,)], "k int"), instant=I3)
    t.merge(
        spark.createDataFrame(
            [(1, 9, 111.0), (60, 1, 6.0), (0, 0, 0.0)], SCHEMA
        ),
        when_matched_update="all",
        when_matched_delete="s.bal < 1.0",
        when_not_matched_insert="all",
        instant=I4,
    )
    return t


EXPECTED = sorted([
    # I2: update k=0 (pre 0.0 -> post 99.0), fresh k=50
    ("delete", I2, 0, 1, 0.0),
    ("insert", I2, 0, 2, 99.0),
    ("insert", I2, 50, 1, 5.0),
    # I3: delete k=3
    ("delete", I3, 3, 1, 3.0),
    # I4 merge: update k=1, matched-delete k=0, insert k=60
    ("delete", I4, 1, 1, 1.0),
    ("insert", I4, 1, 9, 111.0),
    ("delete", I4, 0, 2, 99.0),
    ("insert", I4, 60, 1, 6.0),
])


def _churn(t, from_instant=I1, to_instant=None):
    return sorted(
        (r["_change_type"], r["_commit_instant"], r["k"], r["ver"],
         r["bal"])
        for r in t.changelog(
            from_instant=from_instant, to_instant=to_instant
        ).collect()
    )


@pytest.mark.parametrize("ttype", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_changelog_exact_churn(spark, tmp_path, ttype):
    t = _mk(spark, tmp_path, ttype)
    assert _churn(t) == EXPECTED
    # ordinals ascend with commit order
    ords = {
        r["_commit_instant"]: r["_change_ordinal"]
        for r in t.changelog(from_instant=I1).collect()
    }
    assert ords[I2] < ords[I3] < ords[I4]


def test_changelog_window_bounds(spark, tmp_path):
    t = _mk(spark, tmp_path, "MERGE_ON_READ")
    # (I2, I3]: only the delete
    assert _churn(t, from_instant=I2, to_instant=I3) == [
        ("delete", I3, 3, 1, 3.0),
    ]
    # full history (from ""): the create-load rows are inserts too
    full = _churn(t, from_instant="")
    assert ("insert", I1, 7, 1, 7.0) in full
    assert len(full) == len(EXPECTED) + 10


def test_changelog_compaction_invisible(spark, tmp_path):
    t = _mk(spark, tmp_path, "MERGE_ON_READ")
    before = _churn(t)
    t.compact(instant=I5)
    assert _churn(t) == before
    assert t.changelog(from_instant=I4).count() == 0


def test_changelog_losing_resend_emits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, "MERGE_ON_READ")
    # a LOWER-precombine re-send of k=1 loses the merge fold: the
    # stored (9, 111.0) stands, so the commit must emit no churn for
    # that key despite physically writing a log row
    t.upsert(spark.createDataFrame([(1, 4, 4.0)], SCHEMA), instant=I5)
    rows = [
        r for r in t.changelog(from_instant=I4).collect()
        if r["k"] == 1
    ]
    assert rows == []


def test_changelog_net_fold_mirror_apply(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.cdc import (
        net_changes,
    )

    t = _mk(spark, tmp_path, "MERGE_ON_READ")
    start = {
        (r["k"], r["ver"], r["bal"])
        for r in t.snapshot(as_of_instant=I1)
        .select("k", "ver", "bal").collect()
    }
    net = net_changes(
        t.changelog(from_instant=I1).drop("_commit_instant"),
        keys=["k"],
    ).collect()
    mirror = set(start)
    for r in net:
        if r["_change_type"] == "delete":
            mirror.discard((r["k"], r["ver"], r["bal"]))
    for r in net:
        if r["_change_type"] == "insert":
            mirror.add((r["k"], r["ver"], r["bal"]))
    assert mirror == {
        (r["k"], r["ver"], r["bal"])
        for r in t.snapshot().select("k", "ver", "bal").collect()
    }
    # k=0 churned twice (update then delete): net = ONE delete with
    # the window-start values
    k0 = [r for r in net if r["k"] == 0]
    assert [(r["_change_type"], r["ver"], r["bal"]) for r in k0] == [
        ("delete", 1, 0.0)
    ]


@pytest.mark.parametrize("ttype", ["MERGE_ON_READ", "COPY_ON_WRITE"])
def test_shared_scan_states_match_per_commit_path(
    spark, tmp_path, ttype, monkeypatch
):
    """r15: the shared-scan as-of state derivation (one base scan ∪
    log decode per window) must answer row-for-row like the per-commit
    _scan_slices fallback, on both table types and on both the full
    window and a sub-window."""
    t = _mk(spark, tmp_path, ttype)
    monkeypatch.setenv("SPARK_GRAFT_HUDI_SHARED", "0")
    fallback_full = _churn(t)
    fallback_sub = _churn(t, from_instant=I2, to_instant=I4)
    monkeypatch.setenv("SPARK_GRAFT_HUDI_SHARED", "1")
    assert _churn(t) == fallback_full
    assert _churn(t, from_instant=I2, to_instant=I4) == fallback_sub
