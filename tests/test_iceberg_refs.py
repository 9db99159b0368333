"""Iceberg v2 refs: named branches and tags in table metadata.

Spec: the ``refs`` map (name -> SnapshotRef {snapshot-id, type,
retention fields}) supports branch writes that advance only the ref,
immutable tags, fast-forward publish (write-audit-publish), and
ref-aware snapshot expiration. The reference's versioned store has a
single lineage (hudi/register_hudi.py); refs are what let a 100 TB
table stage and audit a batch without copying it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)

SCHEMA = "k int, ver int, bal double"


def _df(spark, i0, i1, ver=1):
    return spark.createDataFrame(
        [(i, ver, float(i)) for i in range(i0, i1)], SCHEMA
    )


def _keys(df):
    return sorted(r["k"] for r in df.collect())


def test_branch_write_isolated_from_main(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 10)
    )
    t.create_branch("audit")
    log_before = t.metadata().get("snapshot-log", [])
    t.append(_df(spark, 10, 20), branch="audit")
    # main unchanged; branch sees both
    assert _keys(t.snapshot()) == list(range(10))
    assert _keys(t.snapshot(ref="audit")) == list(range(20))
    # snapshot-log tracks main only (spec): branch write added nothing
    assert t.metadata().get("snapshot-log", []) == log_before
    # refs map is spec-shaped
    refs = t.refs()
    assert refs["audit"]["type"] == "branch"
    assert refs["main"]["type"] == "branch"
    assert refs["main"]["snapshot-id"] == (
        t.metadata()["current-snapshot-id"]
    )


def test_write_audit_publish_roundtrip(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 10)
    )
    t.create_branch("wap")
    t.append(_df(spark, 10, 20), branch="wap")
    t.append(_df(spark, 20, 25), branch="wap")
    # audit the staged state in place
    staged = t.snapshot(ref="wap")
    assert staged.filter(F.col("bal") < 0).count() == 0
    # publish: one metadata swap
    sid = t.fast_forward("main", "wap")
    assert _keys(t.snapshot()) == list(range(25))
    assert t.metadata()["current-snapshot-id"] == sid
    assert t.refs()["main"]["snapshot-id"] == sid
    # idempotent
    assert t.fast_forward("main", "wap") == sid


def test_fast_forward_refuses_diverged_target(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 10)
    )
    t.create_branch("b")
    t.append(_df(spark, 10, 20), branch="b")
    t.append(_df(spark, 50, 55))  # main moves too -> diverged
    with pytest.raises(ValueError, match="diverged"):
        t.fast_forward("main", "b")
    # branch-to-branch fast-forward works when ancestry holds
    t.create_branch("b2", snapshot_id=t.refs()["b"]["snapshot-id"])
    t.append(_df(spark, 20, 22), branch="b")
    t.fast_forward("b2", "b")
    assert (
        t.refs()["b2"]["snapshot-id"] == t.refs()["b"]["snapshot-id"]
    )


def test_tag_pins_snapshot_through_expire(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 10)
    )
    t.create_tag("train-v1")
    t.overwrite(_df(spark, 100, 110, ver=2))
    t.overwrite(_df(spark, 200, 210, ver=3))
    removed = t.expire_snapshots(keep_last=1)
    # the middle overwrite expired; the tagged original survived
    assert removed
    assert _keys(t.snapshot(ref="train-v1")) == list(range(10))
    assert _keys(t.snapshot()) == list(range(200, 210))
    ids = {s["snapshot-id"] for s in t.metadata()["snapshots"]}
    assert t.refs()["train-v1"]["snapshot-id"] in ids
    # dropping the tag releases the pin
    t.drop_ref("train-v1")
    removed2 = t.expire_snapshots(keep_last=1)
    assert removed2
    assert len(t.metadata()["snapshots"]) == 1


def test_tags_immutable_and_ref_validation(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 5)
    )
    t.create_tag("v1")
    with pytest.raises(ValueError, match="tag"):
        t.append(_df(spark, 5, 10), branch="v1")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("v1")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("main")
    with pytest.raises(ValueError, match="no branch"):
        t.append(_df(spark, 5, 10), branch="nope")
    with pytest.raises(ValueError, match="no ref"):
        t.snapshot(ref="nope")
    with pytest.raises(ValueError, match="main"):
        t.drop_ref("main")
    with pytest.raises(ValueError, match="no ref"):
        t.drop_ref("ghost")
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.create_tag("bad", snapshot_id=42)


def test_branch_retention_keeps_min_snapshots(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 5)
    )
    t.create_branch("b", min_snapshots_to_keep=2)
    t.append(_df(spark, 5, 10), branch="b")
    t.append(_df(spark, 10, 15), branch="b")
    t.overwrite(_df(spark, 100, 105, ver=2))
    t.expire_snapshots(keep_last=1)
    # branch head + one ancestor pinned (min-snapshots-to-keep=2)
    ids = {s["snapshot-id"] for s in t.metadata()["snapshots"]}
    head = t.refs()["b"]["snapshot-id"]
    by_id = {
        s["snapshot-id"]: s for s in t.metadata()["snapshots"]
    }
    assert head in ids
    assert by_id[head]["parent-snapshot-id"] in ids
    assert _keys(t.snapshot(ref="b")) == list(range(15))


def test_rollback_syncs_main_ref(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 5)
    )
    t.create_branch("x")  # materializes refs incl. main
    s0 = t.metadata()["current-snapshot-id"]
    t.append(_df(spark, 5, 10))
    assert t.refs()["main"]["snapshot-id"] != s0
    t.rollback_to_snapshot(s0)
    assert t.refs()["main"]["snapshot-id"] == s0
    # MOR-path commits (delete_where / upsert) sync main too
    t.delete_where(F.col("k") == 0)
    assert t.refs()["main"]["snapshot-id"] == (
        t.metadata()["current-snapshot-id"]
    )
    t.upsert(_df(spark, 1, 3, ver=2), key="k", precombine="ver")
    assert t.refs()["main"]["snapshot-id"] == (
        t.metadata()["current-snapshot-id"]
    )
