"""Iceberg format-version 3 Row Lineage (spec "Row Lineage"):
next-row-id counter, snapshot first-row-id, manifest field 142,
_row_id / _last_updated_sequence_number inheritance, and preservation
through COW upsert, MOR upsert, and compaction. Reference analog:
none — the reference engine has no row-identity concept."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)


def _mk(spark, n=20):
    root = tempfile.mkdtemp(prefix="ice_lineage_")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).repartition(1).sortWithinPartitions("k")
    return IcebergTable.create(spark, os.path.join(root, "t"), df)


def _lineage(t):
    return {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in t.snapshot_lineage().collect()
    }


def test_enable_and_inherit_on_append(spark):
    t = _mk(spark, 10)
    # pre-upgrade: no lineage metadata at all
    assert "next-row-id" not in t.metadata()
    t.enable_row_lineage()
    meta = t.metadata()
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 0
    # enablement is idempotent
    v = t.current_version()
    assert t.enable_row_lineage() == v

    # pre-upgrade file: NULL row ids, lusn inherits the file's seq
    got = _lineage(t)
    assert all(rid is None and seq == 1 for rid, seq in got.values())

    # sorted single-file append: ids 0..4 in key order, lusn = seq 2
    t.append(
        spark.range(10, 15).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartition(1).sortWithinPartitions("k")
    )
    got = _lineage(t)
    assert [got[k] for k in range(10, 15)] == [
        (i, 2) for i in range(5)
    ]
    assert t.metadata()["next-row-id"] == 5
    # snapshot's first-row-id recorded
    snap = t._snapshot_by(t.metadata(), None)
    assert snap["first-row-id"] == 0
    # manifest entries carry spec field 142
    entries = t._entries_of_snapshot(snap, content=0)
    firsts = {
        e["data_file"].get("first_row_id") for e in entries
    }
    assert firsts == {None, 0}  # pre-upgrade file has none


def _enabled_table(spark):
    root = tempfile.mkdtemp(prefix="ice_lineage_")
    t = IcebergTable.create(
        spark, os.path.join(root, "t"),
        spark.range(0).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ),
    )
    t.enable_row_lineage()
    t.append(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartition(1).sortWithinPartitions("k")
    )
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_upsert_keeps_row_ids(spark, mode):
    t = _enabled_table(spark)
    before = _lineage(t)
    seq_before = t.metadata()["last-sequence-number"]
    t.upsert(
        spark.createDataFrame(
            [(3, 300.0), (7, 700.0), (100, 1.0)], "k long, v double"
        ),
        key="k", precombine="v", mode=mode,
    )
    got = _lineage(t)
    seq_now = t.metadata()["last-sequence-number"]
    # updated rows: id kept, sequence number moved to this commit
    for k in (3, 7):
        assert got[k][0] == before[k][0]
        assert got[k][1] == seq_now > seq_before
    # untouched rows: both unchanged
    for k in (0, 11, 19):
        assert got[k] == before[k]
    # insert: a FRESH id (>= the pre-upsert counter), this commit
    assert got[100][0] is not None
    assert got[100][0] >= 20
    assert got[100][1] == seq_now
    # ids stay unique
    ids = [rid for rid, _ in got.values()]
    assert len(ids) == len(set(ids))


def test_compaction_preserves_lineage(spark):
    t = _enabled_table(spark)
    t.upsert(
        spark.createDataFrame([(5, 500.0)], "k long, v double"),
        key="k", precombine="v", mode="cow",
    )
    before = _lineage(t)
    t.rewrite_data_files(min_input_files=2)
    assert _lineage(t) == before  # byte-for-byte same lineage
    # purge compaction preserves too (the MOR delete already hides
    # k=6 from reads; the purge must not disturb the survivors)
    t.delete_where(F.col("k") == 6, mode="mor")
    before = _lineage(t)
    assert 6 not in before
    t.purge_deletes()
    assert _lineage(t) == before


def test_merge_keeps_row_ids(spark):
    """MERGE INTO (equality-delete MOR) under lineage: updated rows
    keep their id in the batch's new files (old copies die via the
    equality delete), kept rows never rewrite, inserts mint fresh."""
    t = _enabled_table(spark)
    before = _lineage(t)
    t.merge(
        spark.createDataFrame([(3, 333.0), (100, 5.0)],
                              "k long, v double"),
        on="k", when_matched_update="all",
        when_not_matched_insert="all",
    )
    seq = t.metadata()["last-sequence-number"]
    got = _lineage(t)
    assert got[3][0] == before[3][0] and got[3][1] == seq
    assert got[7] == before[7]
    assert got[100][0] is not None and got[100][1] == seq
    ids = [rid for rid, _ in got.values()]
    assert len(ids) == len(set(ids))


def test_counter_monotonic_and_disjoint(spark):
    t = _enabled_table(spark)
    n0 = t.metadata()["next-row-id"]
    t.append(spark.range(20, 30).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ))
    n1 = t.metadata()["next-row-id"]
    assert n1 == n0 + 10
    t.upsert(
        spark.createDataFrame([(200, 1.0)], "k long, v double"),
        key="k", precombine="v", mode="cow",
    )
    assert t.metadata()["next-row-id"] > n1
    ids = [
        r["_row_id"] for r in t.snapshot_lineage().collect()
    ]
    assert len(ids) == len(set(ids))
