"""Rollback / restore across the three table-format twins:

- Iceberg ``rollback_to_snapshot`` / ``set_current_snapshot`` —
  metadata-only swaps (the spec's maintenance actions); abandoned
  descendants stay reachable by id until ``expire_snapshots`` removes
  them as unreferenced.
- Delta ``restore`` — a forward-moving RESTORE commit re-adding the
  target version's files (DV-aware), restoring metaData, writing cdc
  on CDF tables so table_changes stays readable.
- Hudi ``savepoint`` + ``restore_to_savepoint`` — clean never
  reclaims savepointed slices; restore destroys history after the
  savepoint (Hudi's contract), retiring timeline files and deleting
  newer base/log files.

The reference's versioned store only moves forward
(hudi/register_hudi.py is upsert-only); undo of a bad batch is the
lifecycle op a production table needs.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    HudiTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)

SCHEMA = "k int, ver int, bal double"


def _df(spark, i0, i1, ver, bump=0.0):
    return spark.createDataFrame(
        [(i, ver, float(i) + bump) for i in range(i0, i1)], SCHEMA
    )


def _keys(df):
    return sorted(r["k"] for r in df.collect())


# ------------------------------------------------------------ iceberg
def test_iceberg_rollback_and_branch_rules(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 10, 1)
    )
    s0 = t.metadata()["current-snapshot-id"]
    t.append(_df(spark, 10, 20, 1))
    s1 = t.metadata()["current-snapshot-id"]
    t.append(_df(spark, 20, 30, 1))
    s2 = t.metadata()["current-snapshot-id"]
    assert t.snapshot().count() == 30

    t.rollback_to_snapshot(s1)
    assert _keys(t.snapshot()) == list(range(20))
    # the abandoned head stays reachable by id
    assert t.snapshot(snapshot_id=s2).count() == 30
    # s2 is no longer an ancestor: rollback refuses, jump is explicit
    with pytest.raises(ValueError, match="not an ancestor"):
        t.rollback_to_snapshot(s2)
    t.set_current_snapshot(s2)
    assert t.snapshot().count() == 30
    t.rollback_to_snapshot(s0)
    assert _keys(t.snapshot()) == list(range(10))
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.rollback_to_snapshot(123456789)


def test_iceberg_expire_removes_abandoned_branch(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _df(spark, 0, 10, 1)
    )
    t.append(_df(spark, 10, 20, 1))
    s1 = t.metadata()["current-snapshot-id"]
    t.append(_df(spark, 20, 30, 1))
    s2 = t.metadata()["current-snapshot-id"]
    t.rollback_to_snapshot(s1)
    removed = t.expire_snapshots(keep_last=2)
    ids = {s["snapshot-id"] for s in t.metadata()["snapshots"]}
    assert s2 not in ids and s1 in ids
    # s2's exclusive data file was deleted; shared files survive
    assert removed
    assert _keys(t.snapshot()) == list(range(20))
    with pytest.raises(ValueError):
        t.snapshot(snapshot_id=s2)


# -------------------------------------------------------------- delta
def test_delta_restore_roundtrip_with_dv_and_schema(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _df(spark, 0, 20, 1),
        key="k", precombine="ver",
    )
    v0 = t.latest_version()
    t.append(_df(spark, 20, 30, 1))
    v1 = t.latest_version()
    t.delete_where(F.col("k") < 5, mode="mor")  # deletion vector
    v2 = t.latest_version()
    t.append(
        _df(spark, 30, 35, 1).withColumn("tier", F.lit(7)),
        merge_schema=True,
    )
    v3 = t.latest_version()
    assert _keys(t.snapshot()) == list(range(5, 35))

    # restore to v1: DV'd files come back whole, tier column gone
    rv = t.restore(v1)
    assert rv == v3 + 1
    assert _keys(t.snapshot()) == list(range(30))
    assert "tier" not in t.snapshot().columns
    # history kept moving forward: the pre-restore head still reads
    assert _keys(t.snapshot(v3)) == list(range(5, 35))
    assert t.history()[-1]["operation"] == "RESTORE"

    # restore forward to v2 (a DV state): the DV applies again
    t.restore(v2)
    assert _keys(t.snapshot()) == list(range(5, 30))

    # restore to v0
    t.restore(v0)
    assert _keys(t.snapshot()) == list(range(20))

    with pytest.raises(ValueError, match="outside"):
        t.restore(999)


def test_delta_restore_writes_cdc_on_cdf_tables(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _df(spark, 0, 10, 1),
        key="k", precombine="ver", enable_cdf=True,
    )
    v0 = t.latest_version()
    t.append(_df(spark, 10, 16, 1))
    rv = t.restore(v0)
    # the restore commit is CDC-readable: the appended rows read as
    # deletes (file-level change granularity)
    ch = t.table_changes(rv, rv)
    rows = [(r["k"], r["_change_type"]) for r in ch.collect()]
    assert sorted(rows) == [(k, "delete") for k in range(10, 16)]
    assert _keys(t.snapshot()) == list(range(10))


def test_delta_restore_refuses_when_files_vacuumed(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _df(spark, 0, 10, 1),
        key="k", precombine="ver",
    )
    v0 = t.latest_version()
    t.overwrite(_df(spark, 50, 60, 2))
    # simulate a vacuum that reclaimed v0's files
    _meta, active0 = t._replay(v0)
    for rel in active0:
        os.remove(os.path.join(t.path, rel))
    with pytest.raises(ValueError, match="vacuum"):
        t.restore(v0)


# --------------------------------------------------------------- hudi
I1, I2, I3, I4 = (
    "20240101000000000",
    "20240102000000000",
    "20240103000000000",
    "20240104000000000",
)


def test_hudi_savepoint_protects_from_clean(spark, tmp_path):
    root = str(tmp_path / "h")
    t = HudiTable.create(spark, root, "sp_tbl", "k", "ver")
    for ver, inst in enumerate((I1, I2, I3, I4), start=1):
        t.upsert(_df(spark, 0, 20, ver), instant=inst,
                 insert_groups=1)
    t.savepoint(I1, user="tester", comment="pre-migration")
    state_i1 = sorted(
        (r["k"], r["bal"]) for r in t.snapshot(as_of_instant=I1)
        .collect()
    )
    res = t.clean(retain_commits=2)  # boundary I3
    assert res is not None
    # I1's base survives (savepointed); I2's is gone
    insts = {
        os.path.basename(p)[: -len(".parquet")].rsplit("_", 1)[-1]
        for p in glob.glob(os.path.join(root, "*.parquet"))
    }
    assert I1 in insts and I2 not in insts
    # the savepointed instant reads below the cleaner horizon
    assert sorted(
        (r["k"], r["bal"]) for r in t.snapshot(as_of_instant=I1)
        .collect()
    ) == state_i1
    with pytest.raises(ValueError, match="cleaner horizon"):
        t.snapshot(as_of_instant=I2)
    # unpinned, the next clean reclaims it
    t.delete_savepoint(I1)
    res2 = t.clean(retain_commits=2)
    assert res2 is not None and any(
        I1 in p for p in res2["files_deleted"]
    )
    # savepointing below the horizon refuses
    with pytest.raises(ValueError, match="cleaner horizon"):
        t.savepoint(I1)


def test_hudi_restore_to_savepoint(spark, tmp_path):
    root = str(tmp_path / "h")
    t = HudiTable.create(spark, root, "rs_tbl", "k", "ver",
                         table_type="MERGE_ON_READ")
    t.upsert(_df(spark, 0, 20, 1), instant=I1, insert_groups=1)
    t.upsert(_df(spark, 0, 5, 2, bump=0.5), instant=I2)
    t.savepoint(I2)
    state_i2 = sorted(
        (r["k"], r["ver"], r["bal"])
        for r in t.snapshot().collect()
    )
    t.upsert(_df(spark, 5, 10, 3, bump=0.9), instant=I3)
    t.delete_where(F.col("k") >= 15, instant=I4)
    assert t.snapshot().count() == 15

    with pytest.raises(ValueError, match="savepoint"):
        t.restore_to_savepoint(I3)
    res = t.restore_to_savepoint(I2)
    assert res["rolled_back"] == [I3, I4]
    assert t.commits() == [I1, I2]
    assert sorted(
        (r["k"], r["ver"], r["bal"])
        for r in t.snapshot().collect()
    ) == state_i2
    # the destroyed instants' log files are gone from disk
    for p in glob.glob(os.path.join(root, "**", ".*.log.*"),
                       recursive=True):
        assert not p.endswith((f"_0-0-{I3}", f"_0-0-{I4}"))
    # a restore action landed on the timeline
    assert glob.glob(os.path.join(root, ".hoodie", "*.restore"))
    # the table keeps working after the rewind
    t.upsert(_df(spark, 0, 3, 9, bump=2.0), instant=I3)
    got = {r["k"]: r["ver"] for r in t.snapshot().collect()}
    assert got[0] == 9 and got[19] == 1
