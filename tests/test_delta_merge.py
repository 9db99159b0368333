"""Delta MERGE INTO: matched update/delete (conditional), not-matched
insert, not-matched-by-source delete, ambiguous-source refusal, CDF
change rows, and the file-group-pruned rewrite (untouched files keep
their add actions — the scale contract)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)

SCHEMA = "k long, bal double, seg string"


def _mk(spark, path, **kw):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b")
         for i in range(100)],
        SCHEMA,
    ).repartitionByRange(4, "k")  # 4 files with disjoint key ranges
    return DeltaProtocolTable.create(spark, str(path), df, **kw)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_update_insert_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    src = spark.createDataFrame(
        [(0, 1000.0, "a"),      # matched -> updated
         (1, -1.0, "b"),        # matched + delete condition -> deleted
         (500, 7.0, "new")],    # unmatched -> inserted
        SCHEMA,
    )
    t.merge(
        src, on="k",
        when_matched_update={"bal": "s.bal + t.bal"},
        when_matched_delete="s.bal < 0",
        when_not_matched_insert="all",
    )
    snap = t.snapshot()
    assert snap.count() == 100  # -1 deleted, +1 inserted
    assert _rows(snap.filter(F.col("k") == 0)) == [(0, 1000.0, "a")]
    assert snap.filter(F.col("k") == 1).count() == 0
    assert _rows(snap.filter(F.col("k") == 500)) == [
        (500, 7.0, "new")
    ]
    # untouched rows intact
    assert _rows(snap.filter(F.col("k") == 77)) == [(77, 77.0, "b")]


def test_merge_prunes_untouched_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    v0 = t.latest_version()
    _, active0 = t._replay(v0)
    assert len(active0) == 4
    # source keys land in ONE key-range file
    src = spark.createDataFrame([(3, 9.0, "a")], SCHEMA)
    t.merge(src, on="k", when_matched_update="all", mode="cow")
    with open(t._commit_file(v0 + 1)) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    removed = [a["remove"]["path"] for a in acts if "remove" in a]
    assert len(removed) == 1  # three files never rewrote
    _, active1 = t._replay(v0 + 1)
    assert len(set(active0) & set(active1)) == 3


def test_merge_insert_only_and_condition(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    src = spark.createDataFrame(
        [(200, 5.0, "x"), (201, -5.0, "x"), (0, 9.0, "a")], SCHEMA
    )
    t.merge(
        src, on="k",
        when_not_matched_insert={"k": "s.k", "bal": "s.bal"},
        not_matched_insert_condition="s.bal > 0",
    )
    snap = t.snapshot()
    assert snap.count() == 101  # only k=200 inserted
    got = _rows(snap.filter(F.col("k") == 200))
    assert got == [(200, 5.0, None)]  # seg omitted -> NULL
    assert snap.filter(F.col("k") == 201).count() == 0
    # matched row untouched (no matched clause)
    assert _rows(snap.filter(F.col("k") == 0)) == [(0, 0.0, "a")]


def test_merge_by_source_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    src = spark.createDataFrame(
        [(i, 0.0, "keep") for i in range(50)], SCHEMA
    )
    t.merge(
        src, on="k",
        when_not_matched_by_source_delete="t.seg = 'b'",
    )
    snap = t.snapshot()
    # unmatched (k>=50) 'b'-segment rows deleted; matched survive
    assert snap.count() == 100 - 25
    assert snap.filter(
        (F.col("k") >= 50) & (F.col("seg") == "b")
    ).count() == 0
    assert snap.filter(F.col("k") < 50).count() == 50


def test_merge_ambiguous_source_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    src = spark.createDataFrame(
        [(0, 1.0, "a"), (0, 2.0, "a")], SCHEMA
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        t.merge(src, on="k", when_matched_update="all")
    # insert-only merges tolerate source duplicates (no ambiguity)
    t.merge(
        spark.createDataFrame(
            [(300, 1.0, "x"), (300, 2.0, "x")], SCHEMA
        ),
        on="k", when_not_matched_insert="all",
    )
    assert t.snapshot().filter(F.col("k") == 300).count() == 2


def test_merge_no_clause_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    with pytest.raises(ValueError, match="at least one clause"):
        t.merge(spark.createDataFrame([(0, 0.0, "a")], SCHEMA),
                on="k")


def test_merge_cdf_change_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "d", enable_cdf=True)
    v0 = t.latest_version()
    src = spark.createDataFrame(
        [(0, 999.0, "a"), (1, -1.0, "b"), (400, 4.0, "n")], SCHEMA
    )
    t.merge(
        src, on="k",
        when_matched_update="all",
        when_matched_delete="s.bal < 0",
        when_not_matched_insert="all",
    )
    ch = t.table_changes(v0 + 1, v0 + 1)
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_type == {
        "update_preimage": 1, "update_postimage": 1,
        "delete": 1, "insert": 1,
    }
    post = ch.filter(
        F.col("_change_type") == "update_postimage"
    ).collect()[0]
    assert post["bal"] == 999.0


def test_merge_txn_replay_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    src = spark.createDataFrame([(0, 50.0, "a")], SCHEMA)
    t.merge(src, on="k", when_matched_update={"bal": "t.bal + s.bal"},
            txn=("app", 1))
    v = t.latest_version()
    t.merge(src, on="k", when_matched_update={"bal": "t.bal + s.bal"},
            txn=("app", 1))  # replay: must not double-apply
    assert t.latest_version() == v
    assert _rows(t.snapshot().filter(F.col("k") == 0)) == [
        (0, 50.0, "a")
    ]


def test_merge_append_only_gate(spark, tmp_path):
    df = spark.createDataFrame([(0, 0.0, "a")], SCHEMA)
    t = DeltaProtocolTable.create(spark, str(tmp_path / "d"), df)
    meta, _ = t._replay(t.latest_version())
    new_meta = dict(meta)
    new_meta["configuration"] = {"delta.appendOnly": "true"}
    with open(t._commit_file(t.latest_version() + 1), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")
    with pytest.raises(ValueError, match="appendOnly"):
        t.merge(
            spark.createDataFrame([(0, 1.0, "a")], SCHEMA),
            on="k", when_matched_delete=True,
        )
    # pure-insert merges are appends: allowed
    t.merge(
        spark.createDataFrame([(5, 1.0, "a")], SCHEMA),
        on="k", when_not_matched_insert="all",
    )
    assert t.snapshot().count() == 2


def test_merge_mor_deletion_vectors_displaced_rows_only(
    spark, tmp_path
):
    t = _mk(spark, tmp_path / "d")
    v0 = t.latest_version()
    _, active0 = t._replay(v0)
    src = spark.createDataFrame(
        [(3, 999.0, "x"), (1, -1.0, "b"), (300, 3.0, "n")], SCHEMA
    )
    # auto picks mor: 3 keys against a 25-row file group
    t.merge(
        src, on="k",
        when_matched_update="all",
        when_matched_delete="s.bal < 0",
        when_not_matched_insert="all",
    )
    _, active1 = t._replay(t.latest_version())
    # every original file is still active (no rewrite); the touched
    # one carries a DV for exactly the displaced rows
    assert set(active0) <= set(active1)
    dvs = [a["deletionVector"] for a in active1.values()
           if a.get("deletionVector")]
    assert sum(d["cardinality"] for d in dvs) == 2  # k=3 upd, k=1 del
    snap = t.snapshot()
    assert snap.count() == 100  # -1 deleted, +1 inserted
    assert _rows(snap.filter(F.col("k") == 3)) == [(3, 999.0, "x")]
    assert snap.filter(F.col("k") == 1).count() == 0
    assert _rows(snap.filter(F.col("k") == 300)) == [(300, 3.0, "n")]


def test_merge_mor_cdf_matches_cow_cdf(spark, tmp_path):
    src_rows = [(0, 999.0, "a"), (1, -1.0, "b"), (400, 4.0, "n")]

    def run(mode, path):
        t = _mk(spark, path, enable_cdf=True)
        v0 = t.latest_version()
        t.merge(
            spark.createDataFrame(src_rows, SCHEMA), on="k",
            when_matched_update="all",
            when_matched_delete="s.bal < 0",
            when_not_matched_insert="all",
            mode=mode,
        )
        return sorted(
            tuple(r) for r in t.table_changes(v0 + 1, v0 + 1)
            .select("k", "bal", "seg", "_change_type").collect()
        )

    assert run("cow", tmp_path / "c") == run("mor", tmp_path / "m")


def test_merge_on_partitioned_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b")
         for i in range(100)],
        SCHEMA,
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), df, partition_by=["seg"]
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
        mode="cow",
    )
    snap = t.snapshot()
    assert snap.count() == 100
    assert _rows(snap.filter(F.col("k") == 0)) == [(0, 999.0, "a")]
    assert snap.filter(F.col("k") == 1).count() == 0
    assert _rows(snap.filter(F.col("k") == 300)) == [(300, 3.0, "c")]
    # the insert landed in a NEW hive partition directory
    cands, _ = t.partition_pruned_files({"seg": "c"})
    assert len(cands) == 1


def test_merge_under_column_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    t.rename_column("bal", "balance")  # enables column mapping
    t.merge(
        spark.createDataFrame(
            [(0, 999.0, "a")], "k long, balance double, seg string"
        ),
        on="k", when_matched_update="all",
    )
    got = _rows(
        t.snapshot().filter(F.col("k") == 0)
        .select("k", "balance", "seg")
    )
    assert got == [(0, 999.0, "a")]
    assert t.snapshot().count() == 100
