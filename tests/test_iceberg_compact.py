"""Iceberg rewrite_data_files: bin-pack small-file compaction and
sorted rewrite (spec: maintenance actions + Sort Orders). The scale
claim under test: compaction folds N small files into ~target-sized
files without changing a single answer, and a sorted rewrite leaves
per-file bounds disjoint so read_range prunes to O(matching files).
Reference analog: none (the reference rewrites whole datasets) —
this is the small-file hygiene a 100 TB table needs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)


def _mk_many_small(spark, path, appends=6, rows_each=500):
    df0 = spark.range(0, rows_each).select(
        F.col("id"),
        (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v-"), F.col("id")).alias("val"),
    ).coalesce(1)
    t = IcebergTable.create(spark, str(path), df0)
    for i in range(1, appends):
        t.append(
            spark.range(i * rows_each, (i + 1) * rows_each).select(
                F.col("id"),
                (F.col("id") % 5).alias("grp"),
                F.concat(F.lit("v-"), F.col("id")).alias("val"),
            ).coalesce(1)
        )
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _data_files(t):
    return [e["data_file"] for e in t._entries_of_current()]


def test_binpack_fewer_files_same_answer(spark, tmp_path):
    t = _mk_many_small(spark, tmp_path / "ice", appends=6)
    before_files = _data_files(t)
    assert len(before_files) == 6
    before = _rows(t.snapshot())
    pre_snap = t.metadata()["current-snapshot-id"]

    sid = t.rewrite_data_files(target_file_size_bytes=128 << 20)

    after_files = _data_files(t)
    assert len(after_files) == 1  # 6 tiny files bin-pack into one
    assert _rows(t.snapshot()) == before
    hist = {h["snapshot_id"]: h["operation"] for h in t.history()}
    assert hist[sid] == "replace"
    # time travel: the pre-compaction snapshot still reads the small
    # files, untouched on disk
    assert _rows(t.snapshot(snapshot_id=pre_snap)) == before
    for d in before_files:
        assert os.path.exists(d["file_path"])


def test_binpack_noop_below_min_input_files(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).alias("grp"),
        F.lit("x").alias("val"),
    ).coalesce(1)
    t = IcebergTable.create(spark, str(tmp_path / "ice"), df)
    before = t.metadata()["current-snapshot-id"]
    assert t.rewrite_data_files() == before  # 1 file < min_input=2
    assert t.metadata()["current-snapshot-id"] == before


def test_binpack_respects_partitions(spark, tmp_path):
    df = spark.range(0, 900).select(
        F.col("id"), (F.col("id") % 3).alias("grp"),
        F.concat(F.lit("v-"), F.col("id")).alias("val"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice"), df.coalesce(1),
        partition_by=["grp"],
    )
    for i in range(2):
        t.append(
            spark.range(900 + i * 900, 900 + (i + 1) * 900).select(
                F.col("id"), (F.col("id") % 3).alias("grp"),
                F.concat(F.lit("v-"), F.col("id")).alias("val"),
            ).coalesce(1)
        )
    before = _rows(t.snapshot())
    n_before = len(_data_files(t))
    t.rewrite_data_files()
    after_files = _data_files(t)
    # one output file per partition tuple, each still carrying its
    # partition struct for pruning
    parts = {tuple(sorted((d.get("partition") or {}).items()))
             for d in after_files}
    assert len(after_files) == 3 < n_before
    assert len(parts) == 3
    assert _rows(t.snapshot()) == before
    cands, skipped = t.partition_pruned_files({"grp": 1})
    assert len(cands) == 1 and len(skipped) == 2


def test_binpack_folds_delete_debt(spark, tmp_path):
    t = _mk_many_small(spark, tmp_path / "ice", appends=4)
    t.delete_where(F.col("id") % 100 == 0, mode="mor")
    t.equality_delete(
        spark.createDataFrame([(7,), (1003,)], "id long"), ["id"]
    )
    before = _rows(t.snapshot())
    assert len(before) == 4 * 500 - 20 - 2

    t.rewrite_data_files()

    files = _data_files(t)
    assert len(files) == 1
    assert _rows(t.snapshot()) == before
    # the rewritten file carries NO live delete debt: a fresh scan of
    # the raw parquet equals the merged read
    raw = _rows(
        spark.read.schema(t._spark_schema())
        .parquet(files[0]["file_path"])
    )
    assert raw == before


def test_sorted_rewrite_prunes_and_records_order(spark, tmp_path):
    # 6 appends each spanning the FULL id range: every file's (lo, hi)
    # bounds overlap, so read_range can prune nothing before the sort
    df0 = spark.range(0, 6000).select(
        (F.col("id") * 7919 % 6000).alias("id"),
        (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v-"), F.col("id")).alias("val"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice"), df0.coalesce(1)
    )
    for i in range(1, 6):
        t.append(
            spark.range(0, 6000).select(
                ((F.col("id") * 7919 + i) % 6000 + 6000 * i)
                .alias("id"),
                (F.col("id") % 5).alias("grp"),
                F.concat(F.lit("v-"), F.col("id")).alias("val"),
            ).coalesce(1)
        )
    before = _rows(t.snapshot())
    cands, skipped = t.skipped_files("id", 0, 10)
    assert len(cands) >= 1

    t.rewrite_data_files(
        target_file_size_bytes=40_000, sort_by=["id"]
    )

    assert _rows(t.snapshot()) == before
    files = _data_files(t)
    assert len(files) >= 3  # target forces a multi-file sorted layout
    cands, skipped = t.skipped_files("id", 0, 10)
    assert len(cands) == 1 and len(skipped) == len(files) - 1
    assert _rows(t.read_range("id", 0, 10)) == [
        r for r in before if 0 <= r[0] <= 10
    ]
    meta = t.metadata()
    oid = meta["default-sort-order-id"]
    assert oid != 0
    order = next(
        o for o in meta["sort-orders"] if o["order-id"] == oid
    )
    id_field = next(
        f for f in meta["schemas"][meta["current-schema-id"]]
        ["fields"] if f["name"] == "id"
    )
    assert order["fields"] == [{
        "transform": "identity", "source-id": id_field["id"],
        "direction": "asc", "null-order": "nulls-first",
    }]


def test_sorted_rewrite_unknown_column_refuses(spark, tmp_path):
    t = _mk_many_small(spark, tmp_path / "ice", appends=2)
    with pytest.raises(ValueError, match="sort columns"):
        t.rewrite_data_files(sort_by=["nope"])


def test_sorted_rewrite_reuses_existing_order_id(spark, tmp_path):
    t = _mk_many_small(spark, tmp_path / "ice", appends=3)
    t.rewrite_data_files(sort_by=["id"])
    oid1 = t.metadata()["default-sort-order-id"]
    t.append(
        spark.range(90_000, 90_500).select(
            F.col("id"), (F.col("id") % 5).alias("grp"),
            F.lit("late").alias("val"),
        ).coalesce(1)
    )
    t.rewrite_data_files(sort_by=["id"])
    meta = t.metadata()
    assert meta["default-sort-order-id"] == oid1
    assert len([
        o for o in meta["sort-orders"] if o["order-id"] == oid1
    ]) == 1


# ------------------------------------------------ metadata tables
def test_metadata_tables(spark, tmp_path):
    t = _mk_many_small(spark, tmp_path / "ice", appends=3)
    t.delete_where(F.col("id") == 7, mode="mor")
    t.create_tag("v1")
    t.create_branch("dev")

    snaps = t.metadata_table("snapshots")
    assert snaps.count() == 4  # 3 appends + 1 delete
    ops = [r["operation"] for r in
           snaps.orderBy("committed_at_ms").collect()]
    assert ops[0] == "append" and ops[-1] == "delete"

    hist = t.metadata_table("history").collect()
    assert len(hist) == 4
    assert all(r["is_current_ancestor"] for r in hist)

    refs = {r["name"]: r for r in
            t.metadata_table("refs").collect()}
    assert refs["v1"]["type"] == "tag"
    assert refs["dev"]["type"] == "branch"
    assert refs["main"]["snapshot_id"] == (
        t.metadata()["current-snapshot-id"]
    )

    files = t.metadata_table("files")
    by_content = {
        r["content"]: r["cnt"]
        for r in files.groupBy("content")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert by_content[0] == 3  # three data files
    assert by_content.get(1, 0) >= 1  # the position-delete file

    mans = t.metadata_table("manifests").collect()
    assert {m["content"] for m in mans} == {0, 1}

    parts = t.metadata_table("partitions").collect()
    assert len(parts) == 1  # unpartitioned: one empty-map group
    assert parts[0]["record_count"] == 3 * 500
    assert parts[0]["file_count"] == 3

    with pytest.raises(ValueError, match="unknown metadata table"):
        t.metadata_table("nope")


def test_metadata_partitions_rollup(spark, tmp_path):
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).alias("grp"),
        F.lit("x").alias("val"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice"), df, partition_by=["grp"]
    )
    parts = {
        r["partition"]["grp"]: (r["file_count"], r["record_count"])
        for r in t.metadata_table("partitions").collect()
    }
    assert set(parts) == {"0", "1", "2"}
    assert all(rc == 100 for _fc, rc in parts.values())


def test_zorder_rewrite_prunes_both_columns(spark, tmp_path):
    # rows where k and v are INDEPENDENT: a single-column sort makes
    # bounds tight on one column only; the z-order rewrite must give
    # useful bounds on BOTH
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 48271) % 20_000).alias("v"),
        F.lit("p").alias("val"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice"), df.coalesce(1)
    )
    before = _rows(t.snapshot())
    t.rewrite_data_files(
        target_file_size_bytes=12_000, zorder_by=["k", "v"]
    )
    assert _rows(t.snapshot()) == before
    files = _data_files(t)
    assert len(files) >= 8
    ck, sk = t.skipped_files("k", 0, 100)
    cv, sv = t.skipped_files("v", 0, 100)
    # both columns prune away at least half the files
    assert len(sk) >= len(files) // 2, (len(ck), len(files))
    assert len(sv) >= len(files) // 2, (len(cv), len(files))
    assert t.metadata()["properties"]["write.zorder.columns"] == "k,v"
    with pytest.raises(ValueError, match="ONE of"):
        t.rewrite_data_files(sort_by=["k"], zorder_by=["v"])


def test_hilbert_rewrite_prunes_both_columns(spark, tmp_path):
    """hilbert_by: same independent-columns setup as the z-order test —
    the Hilbert rewrite must give useful bounds on BOTH columns, record
    the write.hilbert.columns property, and refuse combined strategies
    and wrong arity."""
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 48271) % 20_000).alias("v"),
        F.lit("p").alias("val"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice_h"), df.coalesce(1)
    )
    before = _rows(t.snapshot())
    t.rewrite_data_files(
        target_file_size_bytes=12_000, hilbert_by=["k", "v"]
    )
    assert _rows(t.snapshot()) == before
    files = _data_files(t)
    assert len(files) >= 8
    ck, sk = t.skipped_files("k", 0, 100)
    cv, sv = t.skipped_files("v", 0, 100)
    assert len(sk) >= len(files) // 2, (len(ck), len(files))
    assert len(sv) >= len(files) // 2, (len(cv), len(files))
    assert (
        t.metadata()["properties"]["write.hilbert.columns"] == "k,v"
    )
    with pytest.raises(ValueError, match="ONE of"):
        t.rewrite_data_files(zorder_by=["k"], hilbert_by=["k", "v"])
    with pytest.raises(ValueError, match="exactly 2"):
        t.rewrite_data_files(hilbert_by=["k"])
