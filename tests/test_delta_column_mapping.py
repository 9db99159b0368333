"""Delta column mapping, mode "name" (delta-io PROTOCOL.md "Column
Mapping"): metadata-only rename/drop, physical-name storage, protocol
gating, and every reader/writer path resolving logical ↔ physical."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    ).repartition(2)
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), df, key="id", precombine="grp"
    )


def test_enable_writes_spec_metadata(table):
    table.enable_column_mapping()
    meta, _ = table._replay(table.latest_version())
    config = meta["configuration"]
    assert config["delta.columnMapping.mode"] == "name"
    assert config["delta.columnMapping.maxColumnId"] == "3"
    fields = json.loads(meta["schemaString"])["fields"]
    for i, f in enumerate(fields, start=1):
        assert f["metadata"]["delta.columnMapping.id"] == i
        # upgrade path: physical = the name existing files store
        assert f["metadata"]["delta.columnMapping.physicalName"] \
            == f["name"]
    proto = None
    for i in range(table.latest_version() + 1):
        for ln in open(table._commit_file(i)):
            a = json.loads(ln)
            if "protocol" in a:
                proto = a["protocol"]
    assert proto == {"minReaderVersion": 2, "minWriterVersion": 5}
    # idempotent
    v = table.latest_version()
    assert table.enable_column_mapping() == v


def test_rename_is_metadata_only(table):
    files = sorted(glob.glob(table.path + "/*.parquet"))
    mtimes = {p: os.path.getmtime(p) for p in files}
    table.rename_column("val", "label")  # implicit enable
    for p in files:
        assert os.path.getmtime(p) == mtimes[p]
    snap = table.snapshot()
    assert snap.columns == ["id", "grp", "label"]
    assert snap.where("id = 7").collect()[0]["label"] == "v7"
    # time travel to before the rename reads the OLD logical names
    assert table.snapshot(0).columns == ["id", "grp", "val"]


def test_writes_store_physical_names(table):
    table.rename_column("val", "label")
    table.append(spark_df(table, [(500, 0, "n500")]))
    # the new file stores the PHYSICAL column name ('val')
    import pyarrow.parquet as pq

    newest = max(
        glob.glob(table.path + "/*.parquet"), key=os.path.getmtime
    )
    assert "val" in pq.read_schema(newest).names
    assert "label" not in pq.read_schema(newest).names
    assert table.snapshot().where("id = 500").collect()[0][
        "label"
    ] == "n500"
    # stats keys are physical too -> range reads still prune
    _, active = table._replay(table.latest_version())
    stats = [
        json.loads(a["stats"]) for a in active.values() if a.get("stats")
    ]
    assert all("val" in s["minValues"] or "val" in s["nullCount"]
               for s in stats)


def spark_df(table, rows):
    return table.spark.createDataFrame(
        rows, "id long, grp long, label string"
    )


def test_merge_schema_under_mapping_gets_uuid_physical(table):
    table.enable_column_mapping()
    table.append(
        table.spark.createDataFrame(
            [(900, 0, "x", 1.5)],
            "id long, grp long, val string, score double",
        ),
        merge_schema=True,
    )
    meta, _ = table._replay(table.latest_version())
    fields = json.loads(meta["schemaString"])["fields"]
    score = next(f for f in fields if f["name"] == "score")
    assert score["metadata"]["delta.columnMapping.physicalName"] \
        .startswith("col-")
    assert score["metadata"]["delta.columnMapping.id"] == 4
    assert meta["configuration"][
        "delta.columnMapping.maxColumnId"
    ] == "4"
    snap = table.snapshot()
    assert snap.where("id = 900").collect()[0]["score"] == 1.5
    assert snap.where("id = 7").collect()[0]["score"] is None


def test_upsert_delete_mor_and_cdf_on_mapped_table(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).alias("grp"),
        F.lit("x").alias("val"),
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "m"), df, key="id",
        precombine="grp", enable_cdf=True,
    )
    t.rename_column("val", "label")
    v0 = t.latest_version()
    t.upsert(spark.createDataFrame(
        [(1, 99, "u1"), (500, 1, "n500")],
        "id long, grp long, label string",
    ))
    t.delete_where(F.col("id") == 2)  # MOR DV under mapping
    snap = t.snapshot()
    assert snap.where("id = 1").collect()[0]["label"] == "u1"
    assert snap.where("id = 2").count() == 0
    assert snap.count() == 100  # 100 + 1 insert - 1 delete
    ch = t.table_changes(v0 + 1, t.latest_version())
    got = sorted((r.id, r._change_type) for r in ch.collect())
    assert got == [
        (1, "update_postimage"), (1, "update_preimage"),
        (2, "delete"), (500, "insert"),
    ]


def test_drop_column_and_guards(table):
    table.rename_column("val", "label")
    table.drop_column("grp")
    snap = table.snapshot()
    assert snap.columns == ["id", "label"]
    assert snap.count() == 200
    with pytest.raises(ValueError, match="no column"):
        table.drop_column("ghost")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("id", "label")


def test_partition_column_rename_refused(spark, tmp_path):
    df = spark.range(0, 40).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd")
        .alias("par"),
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "p"), df, partition_by=["par"]
    )
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("par", "side")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("par")
    # non-partition renames still work on a partitioned table, and
    # partition-pruned reads keep working through the mapping
    t.rename_column("id", "ident")
    assert t.read_partitions({"par": "even"}).where(
        "ident = 0"
    ).count() == 1


def test_reader_gating_mode_id_refused(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "g"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    meta, _ = t._replay(t.latest_version())
    bad = dict(meta)
    bad["configuration"] = {"delta.columnMapping.mode": "id"}
    with open(t._commit_file(t.latest_version() + 1), "w") as f:
        f.write(json.dumps({"metaData": bad}) + "\n")
    with pytest.raises(ValueError, match="modes none/name"):
        t.snapshot()


def test_vanilla_sources_resolve_mapping(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaBatchSource,
    )

    df = spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "vs"), df, key="id", precombine="grp"
    )
    t.rename_column("grp", "bucket")
    t.append(spark.createDataFrame(
        [(600, 9)], "id long, bucket long"))
    spark.dataSource.register(DeltaBatchSource)
    ext = spark.read.format("delta_log").option(
        "path", t.path).load()
    assert ext.columns == ["id", "bucket"]
    assert ext.count() == 51
    assert ext.where("id = 600").collect()[0]["bucket"] == 9


def test_checkpoint_preserves_mapping(table):
    table.rename_column("val", "label")
    table.checkpoint()
    snap = table.snapshot()
    assert snap.columns == ["id", "grp", "label"]
    assert snap.count() == 200
    assert snap.where("id = 7").collect()[0]["label"] == "v7"
