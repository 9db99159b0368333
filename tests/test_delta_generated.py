"""Delta generated columns (spec: delta.generationExpression column
metadata, legacy writer-version-4 generatedColumns feature) — Delta's
hidden-partitioning idiom, the twin of Iceberg's partition transforms:
partition by a GENERATED column, write batches that never mention it,
and prune source-column equality queries through the expression."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


def _events(spark, n=300):
    return spark.range(0, n).select(
        F.col("id"),
        (
            F.to_timestamp(F.lit("2024-03-01 00:00:00"))
            + F.make_interval(hours=(F.col("id") % 72).cast("int"))
        ).alias("ts"),
        (F.col("id") % 9).alias("grp"),
    )


GEN = {"event_date": "CAST(ts AS DATE)"}


def _mk(spark, path, **kw):
    return DeltaProtocolTable.create(
        spark, str(path), _events(spark),
        partition_by=["event_date"], generated=GEN, **kw,
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_computes_and_records_generated(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    meta, _ = t._replay(t.latest_version())
    fields = {
        f["name"]: f
        for f in json.loads(meta["schemaString"])["fields"]
    }
    assert fields["event_date"]["metadata"][
        "delta.generationExpression"
    ] == GEN["event_date"]
    assert meta["partitionColumns"] == ["event_date"]
    # legacy writer version 4 claims generatedColumns
    with open(os.path.join(str(tmp_path / "d"),
                           "_delta_log",
                           "00000000000000000000.json")) as f:
        protos = [json.loads(line) for line in f if line.strip()]
    proto = next(a["protocol"] for a in protos if "protocol" in a)
    assert proto["minWriterVersion"] >= 4
    # hive layout: one directory per derived date (72h -> 3 days)
    dirs = {d for d in os.listdir(str(tmp_path / "d"))
            if d.startswith("event_date=")}
    assert dirs == {
        "event_date=2024-03-01", "event_date=2024-03-02",
        "event_date=2024-03-03",
    }
    got = _rows(t.snapshot().select("id", "event_date"))
    exp = _rows(_events(spark).select(
        "id", F.col("ts").cast("date")
    ))
    assert got == exp


def test_append_omitting_generated_column(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    late = spark.range(300, 320).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-03-09 12:00:00")).alias("ts"),
        (F.col("id") % 9).alias("grp"),
    )
    t.append(late)  # no event_date column: the writer computes it
    got = _rows(
        t.snapshot().filter(F.col("id") >= 300)
        .select("id", "event_date")
    )
    assert got == [(i, datetime.date(2024, 3, 9))
                   for i in range(300, 320)]


def test_append_wrong_generated_value_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    bad = spark.range(500, 501).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-03-09 12:00:00")).alias("ts"),
        F.lit(0).cast("long").alias("grp"),
        F.to_date(F.lit("1999-01-01")).alias("event_date"),
    )
    with pytest.raises(ValueError, match="generated"):
        t.append(bad)


def test_create_wrong_generated_value_refuses(spark, tmp_path):
    df = _events(spark).withColumn(
        "event_date", F.to_date(F.lit("1999-01-01"))
    )
    with pytest.raises(ValueError, match="generated"):
        DeltaProtocolTable.create(
            spark, str(tmp_path / "d"), df,
            partition_by=["event_date"], generated=GEN,
        )


def test_source_predicate_prunes_through_expression(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    probe_ts = datetime.datetime(2024, 3, 2, 5, 0, 0)
    cands, skipped = t.source_pruned_files({"ts": probe_ts})
    assert cands and skipped  # only the 2024-03-02 directory survives
    assert all("event_date=2024-03-02" in c for c in cands)
    got = _rows(t.read_eq(ts=probe_ts).select("id", "grp"))
    exp = _rows(
        _events(spark).filter(F.col("ts") == F.lit(probe_ts))
        .select("id", "grp")
    )
    assert got and got == exp


def test_read_eq_direct_partition_column_still_prunes(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    d = datetime.date(2024, 3, 3)
    cands, skipped = t.source_pruned_files({"event_date": d})
    assert len(cands) >= 1 and skipped
    got = _rows(t.read_eq(event_date=d).select("id"))
    exp = _rows(
        _events(spark)
        .filter(F.col("ts").cast("date") == F.lit(d)).select("id")
    )
    assert got == exp


def test_upsert_completes_generated(spark, tmp_path):
    df = _events(spark).withColumn("ver", F.lit(1).cast("long"))
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), df,
        partition_by=["event_date"], generated=GEN,
        key="id", precombine="ver",
    )
    inc = spark.range(0, 5).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-03-05 01:00:00")).alias("ts"),
        F.lit(99).cast("long").alias("grp"),
        F.lit(2).cast("long").alias("ver"),
    )
    t.upsert(inc)  # event_date derived for the incoming rows
    got = _rows(
        t.snapshot().filter(F.col("id") < 5)
        .select("id", "grp", "event_date")
    )
    assert got == [(i, 99, datetime.date(2024, 3, 5))
                   for i in range(5)]
    assert t.snapshot().count() == 300


def test_non_partition_generated_column(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _events(spark),
        generated={"id_mod": "id % 10"},
    )
    t.append(spark.range(300, 310).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-03-09 00:00:00")).alias("ts"),
        F.lit(0).cast("long").alias("grp"),
    ))
    got = _rows(
        t.snapshot().filter(F.col("id") >= 300)
        .select("id", "id_mod")
    )
    assert got == [(i, i % 10) for i in range(300, 310)]


def test_range_prunes_through_generated_date(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")  # event_date = CAST(ts AS DATE)
    lo = datetime.datetime(2024, 3, 2, 0, 0, 0)
    hi = datetime.datetime(2024, 3, 2, 23, 0, 0)
    cands, skipped = t.source_pruned_files_range("ts", lo, hi)
    # only the 2024-03-02 directory survives (3 day-dirs exist)
    assert skipped
    assert all("event_date=2024-03-02" in c for c in cands)
    got = _rows(t.read_range("ts", lo, hi).select("id"))
    exp = _rows(
        _events(spark).filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
        ).select("id")
    )
    assert got == exp


def test_range_prunes_direct_partition_column_typed(spark, tmp_path):
    # int-typed partition values must compare numerically, not as
    # strings ('10' < '9' lexicographically)
    df = spark.range(0, 120).select(
        F.col("id").alias("k"),
        (F.col("id") % 12).cast("int").alias("bucketed"),
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), df, partition_by=["bucketed"]
    )
    cands, skipped = t.source_pruned_files_range("bucketed", 9, 11)
    assert len(skipped) > len(cands)
    got = sorted(
        r["bucketed"]
        for r in t.read_range("bucketed", 9, 11)
        .select("bucketed").distinct().collect()
    )
    assert got == [9, 10, 11]


def test_range_never_prunes_unlisted_expressions(spark, tmp_path):
    # k % 8 is NOT monotonic: the whitelist must refuse to project
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"),
        _events(spark),
        partition_by=["k_mod"],
        generated={"k_mod": "id % 8"},
    )
    cands, skipped = t.source_pruned_files_range("id", 0, 3)
    assert skipped == []  # no unsound pruning
    assert t.read_range("id", 0, 3).count() == 4
