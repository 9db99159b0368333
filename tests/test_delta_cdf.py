"""Delta Change Data Feed: spec's cdc actions + table_changes reader.

Read rules under test (delta-io PROTOCOL.md, Change Data Files):
- commits carrying ``cdc`` actions are authoritative (MERGE/DELETE/
  overwrite record per-row change files under _change_data/);
- pure dataChange adds derive as inserts, pure dataChange removes as
  deletes — no change files needed;
- dataChange:false rewrites (OPTIMIZE) are invisible to the feed;
- a commit that rewrote files without cdc actions refuses to be read
  as changes (instead of fabricating rows from carried-over files);
- change files are plain parquet externally readable with the spec's
  ``_change_type`` column.
"""

from __future__ import annotations

import json
import os

import pytest

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
        "id long, val string, stamp int",
    )
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "cdf"), df,
        key="id", precombine="stamp", enable_cdf=True,
    )


def _changes(table, start, end=None):
    rows = table.table_changes(start, end).collect()
    return {
        (r.id, r.val, r._change_type, r._commit_version) for r in rows
    }


def test_create_marks_cdf(table):
    assert table.cdf_enabled()
    meta, _ = table._replay(0)
    assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"
    with open(table._commit_file(0)) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    protocol = next(
        a["protocol"] for a in actions if "protocol" in a
    )
    assert protocol["minWriterVersion"] == 4


def test_append_derives_inserts(spark, table):
    table.append(spark.createDataFrame(
        [(4, "d", 1)], "id long, val string, stamp int"
    ))
    assert _changes(table, 1) == {(4, "d", "insert", 1)}


def test_upsert_records_update_pairs_and_inserts(spark, table):
    # id=2 updated (stamp wins), id=3 untouched (stamp loses -> no
    # change rows), id=9 inserted
    table.upsert(spark.createDataFrame(
        [(2, "B", 2), (3, "old", 0), (9, "z", 2)],
        "id long, val string, stamp int",
    ))
    got = _changes(table, 1)
    assert got == {
        (2, "b", "update_preimage", 1),
        (2, "B", "update_postimage", 1),
        (9, "z", "insert", 1),
    }
    # the cdc files are plain parquet under _change_data/
    cdc_dir = os.path.join(table.path, "_change_data")
    files = [f for f in os.listdir(cdc_dir) if f.endswith(".parquet")]
    assert files
    ext = spark.read.parquet(
        *[os.path.join(cdc_dir, f) for f in files]
    )
    assert "_change_type" in ext.columns


def test_delete_records_deleted_rows(spark, table):
    from pyspark.sql import functions as F

    table.delete_where(F.col("id") == 2)
    assert _changes(table, 1) == {(2, "b", "delete", 1)}


def test_overwrite_records_full_diff(spark, table):
    table.overwrite(spark.createDataFrame(
        [(7, "n", 1)], "id long, val string, stamp int"
    ))
    got = _changes(table, 1)
    assert got == {
        (1, "a", "delete", 1), (2, "b", "delete", 1),
        (3, "c", "delete", 1), (7, "n", "insert", 1),
    }


def test_optimize_is_invisible(spark, table):
    table.append(spark.createDataFrame(
        [(4, "d", 1)], "id long, val string, stamp int"
    ))
    v = table.compact(target_files=1)
    assert v == 2
    # the OPTIMIZE commit contributes no change rows
    assert _changes(table, 1, 2) == {(4, "d", "insert", 1)}


def test_range_spans_multiple_versions(spark, table):
    from pyspark.sql import functions as F

    table.append(spark.createDataFrame(
        [(4, "d", 1)], "id long, val string, stamp int"
    ))
    table.delete_where(F.col("id") == 1)
    got = _changes(table, 0)
    # version 0: the CTAS inserts; v1 insert; v2 delete
    assert (1, "a", "insert", 0) in got
    assert (4, "d", "insert", 1) in got
    assert (1, "a", "delete", 2) in got
    assert len(got) == 5


def test_non_cdf_table_refuses(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "plain"),
        spark.createDataFrame([(1, "a", 1)],
                              "id long, val string, stamp int"),
        key="id", precombine="stamp",
    )
    with pytest.raises(ValueError, match="not enabled"):
        t.table_changes(0)


def test_pre_cdf_rewrite_commit_refuses(spark, tmp_path):
    """A commit that mixed adds+removes without cdc actions (written
    before CDF was enabled, or by a non-CDF writer) must refuse
    change reconstruction rather than fabricate rows."""
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "mix"),
        spark.createDataFrame([(1, "a", 1), (2, "b", 1)],
                              "id long, val string, stamp int"),
        key="id", precombine="stamp",
    )
    t.upsert(spark.createDataFrame(
        [(2, "B", 2)], "id long, val string, stamp int"
    ))  # non-CDF rewrite commit
    # enable CDF afterwards via a metadata-carrying overwrite is not
    # implemented; simulate an external enable by rewriting metaData
    meta, _ = t._replay(t.latest_version())
    meta = dict(meta)
    meta["configuration"] = {"delta.enableChangeDataFeed": "true"}
    t._write_commit(t.latest_version() + 1, [
        t._commit_info("SET TBLPROPERTIES"), {"metaData": meta},
    ])
    with pytest.raises(ValueError, match="without recording"):
        t.table_changes(0)


def test_cdf_stream_source(spark, tmp_path):
    """Streaming twin of table_changes: drains the change feed
    micro-batch by micro-batch with exactly-once checkpointing —
    appends stream as inserts, an upsert's cdc files stream as
    update pairs + inserts, OPTIMIZE contributes nothing."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaCdfStreamSource,
    )

    spark.dataSource.register(DeltaCdfStreamSource)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "cst"),
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1)],
            "id long, val string, stamp int",
        ),
        key="id", precombine="stamp", enable_cdf=True,
    )

    def drain():
        got = []

        def sink(batch_df, _bid):
            got.extend(
                (r.id, r.val, r._change_type, r._commit_version)
                for r in batch_df.collect()
            )

        q = (
            spark.readStream.format("delta_cdf_stream")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cst_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert drain() == [
        (1, "a", "insert", 0), (2, "b", "insert", 0),
    ]
    t.upsert(spark.createDataFrame(
        [(2, "B", 2), (5, "e", 1)], "id long, val string, stamp int"
    ))
    t.compact(target_files=1)
    # only the MERGE commit's change rows; OPTIMIZE is invisible
    assert drain() == [
        (2, "B", "update_postimage", 1),
        (2, "b", "update_preimage", 1),
        (5, "e", "insert", 1),
    ]
    assert drain() == []


def test_cdf_stream_source_refuses_non_cdf_table(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        _DeltaCdfStreamReader,
        _table_schema,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "ncd"),
        spark.createDataFrame([(1, "a", 1)],
                              "id long, val string, stamp int"),
        key="id", precombine="stamp",
    )
    with pytest.raises(ValueError, match="not enabled"):
        _DeltaCdfStreamReader(t.path, _table_schema(t.path), {})


def test_cli_delta_changes_and_iceberg_expire(spark, tmp_path, capsys):
    import json as _json

    from fda_clinical_etl_pipeline_spark.__main__ import main
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "clic"),
        spark.createDataFrame([(1, "a", 1)],
                              "id long, val string, stamp int"),
        key="id", precombine="stamp", enable_cdf=True,
    )
    t.append(spark.createDataFrame([(2, "b", 1)],
                                   "id long, val string, stamp int"))
    assert main(["delta-changes", t.path, "1"]) in (0, None)
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    rows = [_json.loads(ln) for ln in lines]
    assert rows and rows[0]["_change_type"] == "insert"
    assert rows[0]["_commit_version"] == 1

    it = IcebergTable.create(
        spark, str(tmp_path / "iexp"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    it.overwrite(spark.createDataFrame([(2, "b")], "id long, s string"))
    it.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    assert main(["iceberg-expire", it.path, "--keep-last", "2"]) \
        in (0, None)
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kept_snapshots"] == 2 and out["removed"] >= 1


def test_cdf_on_partitioned_table(spark, tmp_path):
    """Change files are written flat (partition columns as ordinary
    columns inside the file), and every CDF path — derived inserts
    from partitioned adds, cdc files from a partitioned MERGE —
    carries the partition column values."""
    from pyspark.sql import functions as F

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "pcdf"),
        spark.createDataFrame(
            [("east", 1, "a", 1), ("west", 2, "b", 1)],
            "rg string, id long, val string, stamp int",
        ),
        key="id", precombine="stamp",
        partition_by=["rg"], enable_cdf=True,
    )
    # derived inserts re-inject partition values from add actions
    got = {(r.rg, r.id, r._change_type)
           for r in t.table_changes(0).collect()}
    assert got == {("east", 1, "insert"), ("west", 2, "insert")}
    # MERGE cdc files carry the partition column inside the file
    t.upsert(spark.createDataFrame(
        [("east", 1, "A", 2), ("west", 9, "z", 1)],
        "rg string, id long, val string, stamp int",
    ))
    ch = {(r.rg, r.id, r.val, r._change_type)
          for r in t.table_changes(1).collect()}
    assert ch == {
        ("east", 1, "a", "update_preimage"),
        ("east", 1, "A", "update_postimage"),
        ("west", 9, "z", "insert"),
    }
    # DELETE on one partition records only that partition's rows
    t.delete_where(F.col("rg") == "west")
    ch2 = {(r.rg, r.id, r._change_type)
           for r in t.table_changes(2).collect()}
    assert ch2 == {("west", 2, "delete"), ("west", 9, "delete")}


def test_cdf_across_schema_evolution(spark, tmp_path):
    """table_changes pins each version's OWN schema; reading a range
    spanning a mergeSchema append surfaces the new column as NULL on
    pre-evolution change rows."""
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "ecdf"),
        spark.createDataFrame([(1, "a", 1)],
                              "id long, val string, stamp int"),
        key="id", precombine="stamp", enable_cdf=True,
    )
    t.append(
        spark.createDataFrame(
            [(2, "b", 1, "X")],
            "id long, val string, stamp int, tag string",
        ),
        merge_schema=True,
    )
    rows = {(r.id, r.tag, r._change_type, r._commit_version)
            for r in t.table_changes(0).collect()}
    assert rows == {(1, None, "insert", 0), (2, "X", "insert", 1)}
