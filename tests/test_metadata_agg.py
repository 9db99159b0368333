"""Metadata-only aggregates (operators/metadata_agg.py): every
answer must EQUAL a full scan or refuse with
MetadataOnlyUnavailable — and producing it must launch ZERO Spark
jobs (the whole point: a 100 TB count(*)/min/max from the commit
log / manifests / timeline alone)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.operators.metadata_agg import (
    MetadataOnlyUnavailable,
    delta_metadata_aggregate,
    hudi_metadata_aggregate,
    iceberg_metadata_aggregate,
)
from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)


def _df(spark):
    return spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("bal"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id"))).alias("name"),
        (F.col("id") % 3).cast("int").alias("seg"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 30).cast("int")).alias("d"),
    )


def _scan_expect(t):
    r = t.snapshot().agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("min_k"), F.max("k").alias("max_k"),
        F.min("bal").alias("min_bal"), F.max("bal").alias("max_bal"),
        F.sum(F.col("name").isNull().cast("long")).alias("null_name"),
        F.min("d").alias("min_d"), F.max("d").alias("max_d"),
        F.min("seg").alias("min_seg"), F.max("seg").alias("max_seg"),
    ).collect()[0]
    return r


def test_delta_matches_scan_and_launches_no_jobs(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _df(spark), key="k",
        precombine="bal", partition_by=["seg"],
    )
    t.upsert(
        _df(spark).filter(F.col("k") < 100)
        .withColumn("bal", F.col("bal") + 100),
        mode="cow",
    )
    t.delete_where(F.col("k").between(900, 949), mode="cow")
    exp = _scan_expect(t)

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    got = delta_metadata_aggregate(t)
    assert set(tracker.getJobIdsForGroup()) == before, \
        "metadata aggregate must launch zero Spark jobs"

    assert got["row_count"] == exp["n"]
    c = got["columns"]
    assert (c["k"]["min"], c["k"]["max"]) == (exp["min_k"],
                                              exp["max_k"])
    assert (c["bal"]["min"], c["bal"]["max"]) == (exp["min_bal"],
                                                  exp["max_bal"])
    assert c["name"]["null_count"] == exp["null_name"]
    assert (c["d"]["min"], c["d"]["max"]) == (exp["min_d"],
                                              exp["max_d"])
    # partition column: folded from partitionValues, not file stats
    assert (c["seg"]["min"], c["seg"]["max"]) == (exp["min_seg"],
                                                  exp["max_seg"])
    assert c["seg"]["null_count"] == 0


def test_delta_dv_refuses_data_cols_keeps_count_and_partitions(
    spark, tmp_path
):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _df(spark), key="k",
        precombine="bal", partition_by=["seg"],
    )
    t.delete_where(F.col("k").between(100, 149), mode="mor")

    with pytest.raises(MetadataOnlyUnavailable, match="deletion"):
        delta_metadata_aggregate(t, cols=["bal"])

    got = delta_metadata_aggregate(t, cols=["seg"])
    exp = t.snapshot().agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seg").alias("mn"), F.max("seg").alias("mx"),
    ).collect()[0]
    # count subtracts DV cardinality; partition col is constant per
    # file, so its stats survive the DV exactly
    assert got["row_count"] == exp["n"] == 950
    assert got["columns"]["seg"]["min"] == exp["mn"]
    assert got["columns"]["seg"]["max"] == exp["mx"]


def test_iceberg_matches_scan_snapshots_and_deletes(spark, tmp_path):
    df = _df(spark)
    t = IcebergTable.create(spark, str(tmp_path / "t"), df)
    t.append(df.withColumn("k", F.col("k") + 1000))
    pre_sid = t.metadata()["current-snapshot-id"]
    exp = t.snapshot().agg(
        F.count(F.lit(1)).alias("n"),
        F.min("k").alias("min_k"), F.max("k").alias("max_k"),
        F.min("name").alias("min_s"), F.max("name").alias("max_s"),
        F.min("d").alias("min_d"), F.max("d").alias("max_d"),
    ).collect()[0]

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    got = iceberg_metadata_aggregate(t)
    assert set(tracker.getJobIdsForGroup()) == before

    assert got["row_count"] == exp["n"]
    c = got["columns"]
    assert (c["k"]["min"], c["k"]["max"]) == (exp["min_k"],
                                              exp["max_k"])
    assert (c["name"]["min"], c["name"]["max"]) == (exp["min_s"],
                                                    exp["max_s"])
    assert (c["d"]["min"], c["d"]["max"]) == (exp["min_d"],
                                              exp["max_d"])

    # v2 position delete: row_count stays exact, min/max refuses,
    # and the PRE-delete snapshot still answers min/max by id
    t.delete_where(F.col("k") < 5, mode="mor")
    n = iceberg_metadata_aggregate(t, cols=[])["row_count"]
    assert n == t.snapshot().count() == 1995
    with pytest.raises(MetadataOnlyUnavailable, match="position"):
        iceberg_metadata_aggregate(t)
    old = iceberg_metadata_aggregate(t, cols=["k"],
                                     snapshot_id=pre_sid)
    assert old["row_count"] == 2000
    assert old["columns"]["k"] == {"min": 0, "max": 1999}


def test_iceberg_equality_deletes_refuse_everything(spark, tmp_path):
    df = _df(spark).select("k", "bal")
    t = IcebergTable.create(spark, str(tmp_path / "t"), df)
    t.equality_delete(
        spark.createDataFrame([(1,)], "k long"), ["k"]
    )
    with pytest.raises(MetadataOnlyUnavailable, match="equality"):
        iceberg_metadata_aggregate(t, cols=[])


def test_hudi_cow_matches_scan_mor_refuses_until_compaction(
    spark, tmp_path
):
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    df = _df(spark).select("k", "bal")
    t = HudiTable.create(
        spark, str(tmp_path / "cow"), "ma_cow", "k", "bal"
    )
    t.upsert(df)
    t.upsert(df.filter(F.col("k") < 50)
             .withColumn("bal", F.col("bal") + 100))
    got = hudi_metadata_aggregate(t)
    exp = t.snapshot().agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("k").cast("string")).alias("mn"),
        F.max(F.col("k").cast("string")).alias("mx"),
    ).collect()[0]
    assert got["row_count"] == exp["n"]
    assert got["record_key"] == {"min": exp["mn"], "max": exp["mx"]}

    m = HudiTable.create(
        spark, str(tmp_path / "mor"), "ma_mor", "k", "bal",
        table_type="MERGE_ON_READ",
    )
    m.upsert(df)
    m.upsert(df.filter(F.col("k") < 50)
             .withColumn("bal", F.col("bal") + 100))
    with pytest.raises(MetadataOnlyUnavailable, match="log"):
        hudi_metadata_aggregate(m)
    m.compact()
    got2 = hudi_metadata_aggregate(m)
    assert got2["row_count"] == m.snapshot().count() == 1000
