"""Distributed key→file pruning (sources/keyindex.py): the driver-
bounded replacement for the historical batch-key collect on the
Delta/Iceberg/Hudi upsert+merge write paths.

Unit tier pins the two primitives; the E2E tier forces the
distributed path (cap=0 via SPARK_GRAFT_KEY_COLLECT_CAP) on all three
table formats and asserts byte-identical merge outcomes AND unchanged
file pruning vs the collect path."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources import keyindex

SCHEMA = "k long, bal double, seg string"


@pytest.fixture()
def force_distributed(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_KEY_COLLECT_CAP", "0")


def _keys_df(spark, vals, typ="long"):
    return spark.createDataFrame([(v,) for v in vals], f"__k {typ}")


# ------------------------------------------------------------- unit
def test_collect_keys_if_small_cap_behavior(spark):
    ks = _keys_df(spark, range(10))
    got = keyindex.collect_keys_if_small(ks, cap=10)
    assert sorted(got) == list(range(10))
    assert keyindex.collect_keys_if_small(ks, cap=9) is None
    assert keyindex.collect_keys_if_small(ks, cap=0) is None


def test_stats_prune_distributed_int_and_string(spark):
    ks = _keys_df(spark, [5, 17, 40]).repartition(3)
    bounds = [("a", 0, 4), ("b", 5, 9), ("c", 10, 16),
              ("d", 17, 17), ("e", 30, 50), ("f", 51, 99)]
    assert keyindex.stats_prune_distributed(ks, bounds) == \
        {"b", "d", "e"}

    ks = _keys_df(spark, ["mm", "zz"], typ="string")
    bounds = [("a", "aa", "ll"), ("b", "ma", "mz"), ("c", "x", "z"),
              ("d", "z", "zzz")]
    assert keyindex.stats_prune_distributed(ks, bounds) == \
        {"b", "d"}

    # empty inputs
    assert keyindex.stats_prune_distributed(ks.limit(0), bounds) == set()
    assert keyindex.stats_prune_distributed(ks, []) == set()


def test_stats_prune_incomparable_bounds_conservative(spark):
    # string bounds against long keys: every file stays a candidate
    # (the exact-membership stage guarantees correctness)
    ks = _keys_df(spark, [5])
    bounds = [("a", "0", "4"), ("b", "9", "x")]
    assert keyindex.stats_prune_distributed(ks, bounds) == {"a", "b"}


def test_files_containing_distributed(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    ).repartitionByRange(4, "k")
    df.write.parquet(str(tmp_path / "p"))
    full = spark.read.parquet(str(tmp_path / "p"))
    ks = _keys_df(spark, [3, 97]).withColumnRenamed("__k", "__k")
    names = keyindex.files_containing_distributed(full, "k", ks)
    # keys 3 and 97 live in exactly two of the four range files
    assert len(names) == 2
    assert keyindex.files_containing_distributed(
        full, "k", ks.limit(0)
    ) == set()


# ---------------------------------------------------- E2E: 3 formats
def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_upsert_and_merge_distributed(
    spark, tmp_path, force_distributed
):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )

    base = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b")
         for i in range(100)],
        SCHEMA,
    ).repartitionByRange(4, "k")
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), base, key="k", precombine="bal"
    )
    v0 = t.latest_version()
    # upsert hitting one key-range file + one insert
    inc = spark.createDataFrame(
        [(3, 300.0, "a"), (500, 1.0, "x")], SCHEMA
    )
    t.upsert(inc, mode="cow")
    snap = t.snapshot()
    assert snap.count() == 101
    assert _rows(snap.filter("k = 3")) == [(3, 300.0, "a")]
    assert _rows(snap.filter("k = 500")) == [(500, 1.0, "x")]
    # pruning parity: only ONE of the four key-range files rewrote
    with open(t._commit_file(v0 + 1)) as f:
        acts = [json.loads(ln) for ln in f if ln.strip()]
    assert len([a for a in acts if "remove" in a]) == 1

    # merge through the same pruned path
    src = spark.createDataFrame(
        [(0, 1000.0, "a"), (600, 7.0, "n")], SCHEMA
    )
    t.merge(src, on="k", when_matched_update="all",
            when_not_matched_insert="all", mode="cow")
    snap = t.snapshot()
    assert snap.count() == 102
    assert _rows(snap.filter("k = 0")) == [(0, 1000.0, "a")]
    assert _rows(snap.filter("k = 600")) == [(600, 7.0, "n")]


def test_iceberg_upsert_and_merge_distributed(
    spark, tmp_path, force_distributed
):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    base = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, v double"
    ).repartitionByRange(4, "k")
    t = IcebergTable.create(spark, str(tmp_path / "i"), base)
    t.upsert(
        spark.createDataFrame([(7, 700.0), (500, 1.0)],
                              "k long, v double"),
        key="k", precombine="v", mode="cow",
    )
    snap = t.snapshot()
    assert snap.count() == 101
    assert _rows(snap.filter("k = 7")) == [(7, 700.0)]

    t.merge(
        spark.createDataFrame([(8, 800.0), (600, 2.0)],
                              "k long, v double"),
        on="k", when_matched_update="all",
        when_not_matched_insert="all",
    )
    snap = t.snapshot()
    assert snap.count() == 102
    assert _rows(snap.filter("k = 8")) == [(8, 800.0)]
    assert _rows(snap.filter("k = 600")) == [(600, 2.0)]


def test_hudi_upsert_distributed(spark, tmp_path, force_distributed):
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    t = HudiTable.create(
        spark, str(tmp_path / "h"), "t", record_key="k",
        precombine="ts",
    )
    t.upsert(spark.createDataFrame(
        [(i, 1, float(i)) for i in range(50)], "k long, ts int, v double"
    ))
    t.upsert(spark.createDataFrame(
        [(3, 2, 333.0), (500, 1, 5.0)], "k long, ts int, v double"
    ))
    snap = t.snapshot().select("k", "ts", "v")
    assert snap.count() == 51
    assert _rows(snap.filter("k = 3")) == [(3, 2, 333.0)]
    assert _rows(snap.filter("k = 500")) == [(500, 1, 5.0)]


def test_hudi_null_tombstone_key_ignored(spark, tmp_path):
    """Regression (r13 review): a NULL tombstone key must be dropped
    before the small-batch collect+sort — pre-fix, sorted() raised
    TypeError ordering None against strings; the pre-keyindex code
    silently dropped nulls and the upsert succeeded."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    t = HudiTable.create(
        spark, str(tmp_path / "h"), "t", record_key="k",
        precombine="ts",
    )
    t.upsert(spark.createDataFrame(
        [(i, 1, float(i)) for i in range(20)],
        "k long, ts int, v double",
    ))
    t.upsert(
        spark.createDataFrame([(3, 2, 333.0)],
                              "k long, ts int, v double"),
        tombstone_keys=spark.createDataFrame(
            [("5",), (None,)], "tk string"
        ),
    )
    snap = t.snapshot().select("k", "v")
    keys = {r["k"] for r in snap.collect()}
    assert 5 not in keys  # tombstoned
    assert 3 in keys and snap.count() == 19


def test_mpegts_pmt_less_capture_single_pid_fallback():
    """Regression (r13 review): a capture whose PMT packet is missing
    (PAT present) must still derive a duration — from the single PID
    with the widest span, never a mixed-PID clock."""
    import struct as _struct

    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        _TS_AUDIO_PID,
        _TS_PAT_PID,
        _TS_PMT_PID,
        _TS_VIDEO_PID,
        _psi_section,
        _ts_packet,
        probe_mpegts,
    )

    pat = _psi_section(0x00, _struct.pack(">H", 1) + b"\xc1\x00\x00"
                       + _struct.pack(">H", 1)
                       + bytes([0xE0 | (_TS_PMT_PID >> 8),
                                _TS_PMT_PID & 0xFF]))
    pes_v = b"\x00\x00\x01\xe0\x00\x00\x80\x00\x00"
    pes_a = b"\x00\x00\x01\xc0\x00\x00\x80\x00\x00"
    blob = b"".join([
        _ts_packet(_TS_PAT_PID, 0, b"\x00" + pat, pusi=True),
        # no PMT packet at all; two PIDs carry PCRs on different
        # clocks — the wider single-PID span (video: 3.0 s) wins
        _ts_packet(_TS_VIDEO_PID, 0, pes_v, pusi=True, pcr_base=0),
        _ts_packet(_TS_AUDIO_PID, 0, pes_a, pusi=True,
                   pcr_base=50_000_000),
        _ts_packet(_TS_VIDEO_PID, 1, b"\xaa" * 16,
                   pcr_base=270_000),
        _ts_packet(_TS_AUDIO_PID, 1, b"\xaa" * 16,
                   pcr_base=50_090_000),
    ])
    m = probe_mpegts(blob)
    assert m["pcr_pid"] is None
    assert m["duration_s"] == 3.0  # video span, not a mixed clock
