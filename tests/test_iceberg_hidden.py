"""Iceberg hidden partitioning: bucket / truncate / temporal
transforms (spec "Partition Transforms" + Appendix B).

The point of hidden partitioning at 100 TB: the table is laid out by
``bucket(16, k)`` or ``day(ts)`` but queries name only the SOURCE
column — the engine projects the predicate through the transform and
prunes files from metadata alone. Bucket uses the spec's 32-bit
Murmur3 (x86, seed 0) over the value's single-value serialization;
the Appendix B test vectors are pinned here bit-for-bit.
"""

from __future__ import annotations

import datetime
import glob
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
    _mmh3_32,
    _mmh3_long,
    _np_mmh3_long,
    _parse_partition_entry,
    _transform_literal,
)


def _signed(h: int) -> int:
    return h - (1 << 32) if h >= (1 << 31) else h


def test_murmur3_spec_vectors():
    """Iceberg spec Appendix B: exact bucket-hash test vectors."""
    assert _signed(_mmh3_long(34)) == 2017239379       # int & long
    assert _signed(_mmh3_32(b"iceberg")) == 1210000089  # string
    assert _signed(_mmh3_long(17486)) == -653330422     # 2017-11-16
    assert _signed(_mmh3_long(1510871468000000)) == -2047944441
    import numpy as np

    vec = _np_mmh3_long(np.array([34, 17486, 1510871468000000]))
    assert [_signed(int(x)) for x in vec] == [
        2017239379, -653330422, -2047944441,
    ]


def test_parse_and_literal_projection():
    assert _parse_partition_entry("bucket(16, k)") == ("bucket[16]", "k")
    assert _parse_partition_entry("truncate(4,name)") == (
        "truncate[4]", "name")
    assert _parse_partition_entry("day(ts)") == ("day", "ts")
    assert _parse_partition_entry("k") == ("identity", "k")
    with pytest.raises(ValueError, match="unparseable"):
        _parse_partition_entry("bucket(k)")
    # truncate floor semantics for negatives: W * floor(v/W)
    assert _transform_literal("truncate[10]", -1, "int") == -10
    assert _transform_literal("truncate[10]", 19, "int") == 10
    assert _transform_literal("truncate[3]", "iceberg", "string") == "ice"
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    assert _transform_literal("year", ts, "timestamp") == 47
    assert _transform_literal("month", ts, "timestamp") == 574
    assert _transform_literal("day", ts, "timestamp") == (
        datetime.date(2017, 11, 16)
    )
    # 1510871468 epoch-seconds // 3600
    assert _transform_literal("hour", ts, "timestamp") == 419686


def test_bucket_table_end_to_end(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(None, -1.0)],
        "k int, bal double",
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), df, partition_by=["bucket(4, k)"]
    )
    # data files keep ALL schema columns; layout is hidden
    assert sorted(
        r["k"] for r in t.snapshot().collect() if r["k"] is not None
    ) == list(range(100))
    # partition struct carries the spec hash value
    for e in t._entries_of_current():
        pv = e["data_file"]["partition"]
        assert set(pv) == {"k_bucket"}
        if pv["k_bucket"] is not None:
            assert 0 <= pv["k_bucket"] < 4
    # pruning: equality on the SOURCE column skips 3 of 4 buckets
    cands, skipped = t.source_pruned_files({"k": 5})
    assert skipped and len(cands) < len(cands) + len(skipped)
    expect = _transform_literal("bucket[4]", 5, "int")
    rows = t.read_eq(k=5).collect()
    assert [r["k"] for r in rows] == [5]
    # the read never opened a file outside the matching bucket
    got_dirs = {os.path.dirname(f) for f in cands}
    assert all(
        f"k_bucket={expect}" in d
        or "__HIVE_DEFAULT_PARTITION__" in d  # null rows: candidate
        or "k_bucket" not in d
        for d in got_dirs
    )
    # null-source rows land in the hive default partition and stay
    # candidates under any filter (conservative)
    assert t.read_eq(k=5).count() == 1


def test_temporal_transforms_and_pruning(spark, tmp_path):
    rows = [
        (i, datetime.datetime(2024, 1 + i % 3, 10 + i % 5, 12, 0, 0))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp")
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), df, partition_by=["day(ts)"]
    )
    # hive layout human-readable, struct value = int days since epoch
    dirs = glob.glob(os.path.join(str(tmp_path / "i"), "data", "*"))
    assert any("ts_day=2024-01-1" in d for d in dirs)
    for e in t._entries_of_current():
        # OCF logical-date round-trip: struct carries date objects,
        # serialized as the spec's int days-since-epoch
        assert isinstance(
            e["data_file"]["partition"]["ts_day"], datetime.date
        )
    probe = datetime.datetime(2024, 2, 11, 12, 0, 0)
    cands, skipped = t.source_pruned_files({"ts": probe})
    assert skipped, "day() must prune other days' files"
    got = t.read_eq(ts=probe)
    assert got.count() == len(
        [r for r in rows if r[1] == probe]
    ) > 0
    # month/year transforms validate + project
    t2 = IcebergTable.create(
        spark, str(tmp_path / "i2"), df,
        partition_by=["month(ts)"],
    )
    c2, s2 = t2.source_pruned_files({"ts": probe})
    assert s2 and t2.read_eq(ts=probe).count() == got.count()
    with pytest.raises(ValueError, match="unsupported"):
        IcebergTable.create(
            spark, str(tmp_path / "i3"), df,
            partition_by=["year(k)"],  # int source: not temporal
        )


def test_truncate_transform_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i - 10, f"name_{i:03d}") for i in range(40)],
        "k int, name string",
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), df,
        partition_by=["truncate(10, k)", "truncate(5, name)"],
    )
    for e in t._entries_of_current():
        pv = e["data_file"]["partition"]
        assert pv["k_trunc"] % 10 == 0
        assert pv["name_trunc"] == "name_"
    cands, skipped = t.source_pruned_files({"k": -5})
    assert skipped  # negative k floor-truncates to -10, prunes 0/10/20
    assert [r["k"] for r in t.read_eq(k=-5).collect()] == [-5]


def test_spec_evolution_to_hidden(spark, tmp_path):
    """Identity -> bucket spec evolution: old files stay readable and
    candidate; new files prune by the transform (cross-spec rule)."""
    df1 = spark.createDataFrame(
        [(i, 1) for i in range(20)], "k int, ver int"
    )
    t = IcebergTable.create(spark, str(tmp_path / "i"), df1)
    t.update_partition_spec(["bucket(4, k)"])
    t.append(spark.createDataFrame(
        [(i, 2) for i in range(20, 60)], "k int, ver int"
    ))
    assert t.snapshot().count() == 60
    cands, skipped = t.source_pruned_files({"k": 25})
    # some NEW files pruned; the pre-evolution file has no k_bucket
    # partition value so it stays a candidate
    assert skipped
    got = sorted(
        (r["k"], r["ver"]) for r in t.read_eq(k=25).collect()
    )
    assert got == [(25, 2)]
    got2 = sorted(
        (r["k"], r["ver"]) for r in t.read_eq(k=5).collect()
    )
    assert got2 == [(5, 1)]


def test_mutations_on_bucketed_table(spark, tmp_path):
    """upsert/delete_where recompute transform values on rewrite."""
    df = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(50)],
        "k int, ver int, bal double",
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), df, partition_by=["bucket(4, k)"]
    )
    t.upsert(
        spark.createDataFrame(
            [(5, 2, 500.0), (99, 1, 99.0)],
            "k int, ver int, bal double",
        ),
        key="k", precombine="ver",
    )
    t.delete_where(F.col("k") == 7)
    got = {r["k"]: r["bal"] for r in t.snapshot().collect()}
    assert got[5] == 500.0 and got[99] == 99.0 and 7 not in got
    assert len(got) == 50  # 50 - deleted + inserted
    # pruning still correct after the rewrite
    assert [r["bal"] for r in t.read_eq(k=5).collect()] == [500.0]


def test_range_prunes_through_monotonic_transforms(spark, tmp_path):
    import datetime

    from pyspark.sql import functions as F

    df = spark.range(0, 1200).select(
        F.col("id").alias("k"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(hours=(F.col("id") % 1200).cast("int"))
        ).alias("ts"),  # 50 days of hourly rows
        F.concat(F.lit("u"), F.col("id") % 7).alias("u"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ice"), df,
        partition_by=["day(ts)", "bucket(4, k)"],
    )
    lo = datetime.datetime(2024, 1, 10, 0, 0, 0)
    hi = datetime.datetime(2024, 1, 11, 23, 0, 0)
    cands, skipped = t.source_pruned_files_range("ts", lo, hi)
    assert skipped and len(cands) < len(cands) + len(skipped)
    # exactly the two days' directories survive (x4 buckets)
    assert len(cands) <= 2 * 4
    got = sorted(
        r["k"] for r in t.read_range("ts", lo, hi).collect()
    )
    exp = sorted(
        r["k"] for r in df.filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
        ).collect()
    )
    assert got == exp
    # a bucketed source column never range-prunes (hash order)
    c2, s2 = t.source_pruned_files_range("k", 0, 10)
    assert s2 == []
    assert len(c2) == len(cands) + len(skipped)
