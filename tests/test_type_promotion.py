"""Type promotion / widening across the Iceberg and Delta twins.

Iceberg (spec Schema Evolution): int -> long, float -> double —
metadata-only, same field id; pre-promotion files keep their narrow
physical parquet type (upcast at read) and their narrow single-value
bound serialization (decoded width-tolerantly).
Delta (typeWidening table feature): lossless chains
byte->short->integer->long and float->double; ``delta.typeChanges``
field metadata records the history; protocol upgrades to explicit
feature lists carrying prior obligations."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------ iceberg
def _ice(spark, path):
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.5).cast("float").alias("x"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    ).coalesce(1)
    return IcebergTable.create(spark, str(path), df)


def test_iceberg_promote_int_to_long(spark, tmp_path):
    t = _ice(spark, tmp_path / "ice")
    fid = next(
        f["id"] for f in
        t.metadata()["schemas"][t.metadata()["current-schema-id"]]
        ["fields"] if f["name"] == "k"
    )
    t.promote_column_type("k", "long")
    t.promote_column_type("x", "double")
    meta = t.metadata()
    cur = meta["schemas"][meta["current-schema-id"]]
    by_name = {f["name"]: f for f in cur["fields"]}
    assert by_name["k"]["type"] == "long"
    assert by_name["k"]["id"] == fid  # field id never changes
    assert by_name["x"]["type"] == "double"
    # old files upcast at read; values identical
    snap = t.snapshot()
    assert dict(snap.dtypes)["k"] == "bigint"
    assert dict(snap.dtypes)["x"] == "double"
    assert [r[0] for r in _rows(snap.select("k"))] == list(range(100))
    # new appends write the wide type and mix with old files
    t.append(spark.range(100, 110).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("x"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    ).coalesce(1))
    assert t.snapshot().count() == 110


def test_iceberg_promoted_bounds_still_skip(spark, tmp_path):
    t = _ice(spark, tmp_path / "ice")
    t.promote_column_type("k", "long")
    t.append(spark.range(1000, 1100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("x"),
        F.lit("w").alias("val"),
    ).coalesce(1))
    # pre-promotion file has int-serialized bounds (4 bytes), the new
    # one long-serialized (8 bytes): both must decode and prune
    cands, skipped = t.skipped_files("k", 0, 50)
    assert len(cands) == 1 and len(skipped) == 1
    got = _rows(t.read_range("k", 0, 50).select("k"))
    assert got == [(i,) for i in range(51)]
    cands, skipped = t.skipped_files("k", 1050, 1060)
    assert len(cands) == 1 and len(skipped) == 1


def test_iceberg_promotion_rules_enforced(spark, tmp_path):
    t = _ice(spark, tmp_path / "ice")
    with pytest.raises(ValueError, match="not a spec promotion"):
        t.promote_column_type("val", "long")  # string -> long
    with pytest.raises(ValueError, match="not a spec promotion"):
        t.promote_column_type("k", "double")  # int -> double
    with pytest.raises(ValueError, match="no column"):
        t.promote_column_type("nope", "long")


def test_iceberg_promote_bucket_partition_survives(spark, tmp_path):
    # spec hashes int and long identically (8-byte little-endian), so
    # bucket layout keeps pruning correctly across the promotion
    df = spark.range(0, 200).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice"), df, partition_by=["bucket(8, k)"]
    )
    pre = _rows(t.read_eq(k=42))
    t.promote_column_type("k", "long")
    assert _rows(t.read_eq(k=42)) == pre
    _c, skipped = t.source_pruned_files({"k": 42})
    assert skipped  # still prunes through the transform


# ------------------------------------------------------------- delta
def _delta(spark, path):
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.5).cast("float").alias("x"),
        (F.col("id") % 4).alias("grp"),
    )
    return DeltaProtocolTable.create(spark, str(path), df)


def test_delta_widen_column_type(spark, tmp_path):
    t = _delta(spark, tmp_path / "d")
    v = t.widen_column_type("k", "long")
    meta, _ = t._replay(v)
    field = next(
        f for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "k"
    )
    assert field["type"] == "long"
    assert field["metadata"]["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long", "tableVersion": v}
    ]
    # protocol upgraded to explicit feature lists with typeWidening
    protocol = None
    for a in t._actions_upto(v):
        if "protocol" in a:
            protocol = a["protocol"]
    assert protocol["minReaderVersion"] == 3
    assert "typeWidening" in protocol["readerFeatures"]
    assert "typeWidening" in protocol["writerFeatures"]
    assert "appendOnly" in protocol["writerFeatures"]  # legacy carried
    # reads upcast old files
    snap = t.snapshot()
    assert dict(snap.dtypes)["k"] == "bigint"
    assert snap.count() == 100


def test_delta_widen_then_append_narrow_batch(spark, tmp_path):
    t = _delta(spark, tmp_path / "d")
    t.widen_column_type("k", "long")
    t.append(spark.range(100, 120).select(
        F.col("id").cast("int").alias("k"),  # pre-widening producer
        (F.col("id") * 1.5).cast("float").alias("x"),
        (F.col("id") % 4).alias("grp"),
    ))
    got = _rows(t.snapshot().select("k"))
    assert got == [(i,) for i in range(120)]
    # time travel below the widening still reads the narrow schema
    assert dict(t.snapshot(0).dtypes)["k"] == "int"


def test_delta_widen_rules_enforced(spark, tmp_path):
    t = _delta(spark, tmp_path / "d")
    with pytest.raises(ValueError, match="not a spec widening"):
        t.widen_column_type("x", "long")  # float -> long: lossy
    with pytest.raises(ValueError, match="no column"):
        t.widen_column_type("nope", "long")


def test_delta_widen_partition_column_refuses(spark, tmp_path):
    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("int").alias("grp"),
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), df, partition_by=["grp"]
    )
    with pytest.raises(ValueError, match="partition column"):
        t.widen_column_type("grp", "long")
