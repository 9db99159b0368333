"""Iceberg MERGE INTO (shared clause semantics with the Delta twin,
one merge-on-read snapshot: equality deletes + appended data files).
The scale claim under test: a merge writes O(changed rows) bytes —
no touched data file rewrites — and cannot eat its own output (the
spec's strict sequence rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)

SCHEMA = "k long, bal double, seg string"


def _mk(spark, path):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b")
         for i in range(100)],
        SCHEMA,
    ).repartitionByRange(4, "k")
    return IcebergTable.create(spark, str(path), df)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_update_insert_delete_one_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    files_before = set(t._files_of_snapshot(
        t._snapshot_by(t.metadata(), None)
    ))
    src = spark.createDataFrame(
        [(0, 1000.0, "a"), (1, -1.0, "b"), (500, 7.0, "new")],
        SCHEMA,
    )
    t.merge(
        src, on="k",
        when_matched_update={"bal": "s.bal + t.bal"},
        when_matched_delete="s.bal < 0",
        when_not_matched_insert="all",
    )
    snap = t.snapshot()
    assert snap.count() == 100
    assert _rows(snap.filter(F.col("k") == 0)) == [(0, 1000.0, "a")]
    assert snap.filter(F.col("k") == 1).count() == 0
    assert _rows(snap.filter(F.col("k") == 500)) == [
        (500, 7.0, "new")
    ]
    assert _rows(snap.filter(F.col("k") == 77)) == [(77, 77.0, "b")]
    # merge-on-read: ONE new snapshot, no stored data file rewritten
    meta = t.metadata()
    assert len(meta["snapshots"]) == 2
    files_after = set(t._files_of_snapshot(
        t._snapshot_by(meta, None)
    ))
    assert files_before <= files_after  # originals all carried


def test_merge_does_not_eat_own_inserts(spark, tmp_path):
    # an inserted key equal to a deleted key: the same-commit
    # sequence rule must keep the insert alive
    t = _mk(spark, tmp_path / "ice")
    src = spark.createDataFrame([(2, 222.0, "z")], SCHEMA)
    t.merge(src, on="k", when_matched_update="all")
    assert _rows(t.snapshot().filter(F.col("k") == 2)) == [
        (2, 222.0, "z")
    ]
    # a second merge updating the same key again (the first merge's
    # APPENDED file is now the stored row being displaced)
    t.merge(
        spark.createDataFrame([(2, 333.0, "z")], SCHEMA),
        on="k", when_matched_update="all",
    )
    assert _rows(t.snapshot().filter(F.col("k") == 2)) == [
        (2, 333.0, "z")
    ]
    assert t.snapshot().count() == 100


def test_merge_by_source_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    src = spark.createDataFrame(
        [(i, 0.0, "keep") for i in range(50)], SCHEMA
    )
    t.merge(
        src, on="k",
        when_not_matched_by_source_delete="t.seg = 'b'",
    )
    snap = t.snapshot()
    assert snap.count() == 75
    assert snap.filter(
        (F.col("k") >= 50) & (F.col("seg") == "b")
    ).count() == 0


def test_merge_ambiguous_refuses_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    pre = t.metadata()["current-snapshot-id"]
    with pytest.raises(ValueError, match="multiple source rows"):
        t.merge(
            spark.createDataFrame(
                [(0, 1.0, "a"), (0, 2.0, "a")], SCHEMA
            ),
            on="k", when_matched_update="all",
        )
    t.merge(
        spark.createDataFrame([(0, 9.0, "a")], SCHEMA),
        on="k", when_matched_update="all",
    )
    # the pre-merge snapshot still answers with the old value
    assert _rows(
        t.snapshot(snapshot_id=pre).filter(F.col("k") == 0)
    ) == [(0, 0.0, "a")]


def test_merge_then_purge_folds_debt(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    t.merge(
        spark.createDataFrame([(0, 5.0, "a"), (300, 3.0, "n")],
                              SCHEMA),
        on="k", when_matched_update="all",
        when_not_matched_insert="all",
    )
    before = _rows(t.snapshot())
    t.purge_deletes()
    assert _rows(t.snapshot()) == before
    snap = t._snapshot_by(t.metadata(), None)
    assert t._delete_files_of_snapshot(snap) == []
    assert t._equality_deletes_of_snapshot(snap) == []


def test_merge_staging_is_file_pruned(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")  # 4 range-disjoint files
    # metadata-only pruning: a single clustered key touches ONE file
    touched = t._bounds_touched_files("k", [3])
    assert len(touched) == 1
    all_files = set(t._files_of_snapshot(
        t._snapshot_by(t.metadata(), None)
    ))
    assert len(all_files) == 4
    # and the merge over that key still lands the right answer with
    # every original file carried untouched
    t.merge(
        spark.createDataFrame([(3, 999.0, "x")], SCHEMA),
        on="k", when_matched_update="all",
    )
    assert _rows(t.snapshot().filter(F.col("k") == 3)) == [
        (3, 999.0, "x")
    ]
    assert t.snapshot().count() == 100


def test_merge_on_partitioned_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b")
         for i in range(100)],
        SCHEMA,
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice"), df, partition_by=["seg"]
    )
    t.merge(
        spark.createDataFrame(
            [(0, 999.0, "a"), (1, -1.0, "b"), (300, 3.0, "c")],
            SCHEMA,
        ),
        on="k",
        when_matched_update="all",
        when_matched_delete="s.bal < 0",
        when_not_matched_insert="all",
    )
    snap = t.snapshot()
    assert snap.count() == 100
    assert _rows(snap.filter(F.col("k") == 0)) == [(0, 999.0, "a")]
    assert snap.filter(F.col("k") == 1).count() == 0
    assert _rows(snap.filter(F.col("k") == 300)) == [(300, 3.0, "c")]
    # partition pruning still keyed on the struct after the merge
    cands, skipped = t.partition_pruned_files({"seg": "c"})
    assert len(cands) >= 1 and skipped
    # rename-under-field-ids then merge again (schema evolution mix)
    t.rename_column("bal", "balance")
    t.merge(
        spark.createDataFrame(
            [(2, 555.0, "a")], "k long, balance double, seg string"
        ),
        on="k", when_matched_update="all",
    )
    assert _rows(
        t.snapshot().filter(F.col("k") == 2)
        .select("k", "balance", "seg")
    ) == [(2, 555.0, "a")]
