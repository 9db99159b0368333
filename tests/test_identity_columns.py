"""Delta identity columns (the identityColumns table feature):
system-assigned values are unique, step-aligned, and strictly beyond
the high-water mark; the mark is maintained centrally from write
stats on every commit; GENERATED ALWAYS refuses explicit values;
legacy minWriterVersion-6 tables (which imply identityColumns) are
now writable."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


def _ids(t):
    return [r["id"] for r in t.snapshot().select("id").collect()]


def _hwm(t):
    meta, _ = t._replay(t.latest_version())
    for f in json.loads(meta["schemaString"])["fields"]:
        if f["name"] == "id":
            return (f.get("metadata") or {}).get(
                "delta.identity.highWaterMark"
            )
    return None


def _batch(spark, lo, n):
    return spark.range(lo, lo + n).select(F.col("id").alias("k"))


def test_generated_always_assigns_unique_step_aligned(
    spark, tmp_path
):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _batch(spark, 0, 100),
        key="k", precombine="k",
        identity={"id": {"start": 10, "step": 3}},
    )
    ids = _ids(t)
    assert len(ids) == len(set(ids)) == 100
    assert all(v >= 10 and (v - 10) % 3 == 0 for v in ids)
    assert _hwm(t) == max(ids)

    proto = None
    for line in open(
        os.path.join(str(tmp_path / "t"), "_delta_log",
                     "00000000000000000000.json")
    ):
        a = json.loads(line)
        if "protocol" in a:
            proto = a["protocol"]
    assert proto["minWriterVersion"] == 7
    assert "identityColumns" in proto["writerFeatures"]
    # writer-only feature: reader version stays 1
    assert proto["minReaderVersion"] == 1

    # second batch: every new value strictly beyond the old mark
    old_hwm = _hwm(t)
    t.append(_batch(spark, 100, 50))
    ids2 = _ids(t)
    assert len(ids2) == len(set(ids2)) == 150
    fresh = set(ids2) - set(ids)
    assert all(v > old_hwm for v in fresh)
    assert _hwm(t) == max(ids2)


def test_generated_always_refuses_explicit_and_merge(
    spark, tmp_path
):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _batch(spark, 0, 10),
        key="k", precombine="k", identity={"id": {}},
    )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.append(
            _batch(spark, 10, 5).withColumn("id", F.lit(999))
        )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.upsert(
            _batch(spark, 0, 3).withColumn("id", F.lit(1)),
        )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.merge(
            _batch(spark, 0, 3).withColumn("id", F.lit(1)),
            on="k", when_matched_update={"k": "s.k"},
        )


def test_allow_explicit_folds_hwm_and_upserts(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"),
        _batch(spark, 0, 10),
        key="k", precombine="k",
        identity={"id": {"allow_explicit": True}},
    )
    hwm0 = _hwm(t)
    # explicit values beyond the mark advance it (ids are sparse —
    # the mark is whatever the allocator reached, so go beyond it)
    t.append(
        _batch(spark, 10, 3).withColumn(
            "id", F.col("k") - 10 + F.lit(hwm0 + 1_000)
        )
    )
    assert _hwm(t) == hwm0 + 1_002
    # and the next system-assigned batch clears the explicit range
    t.append(_batch(spark, 13, 4))
    fresh = [v for v in _ids(t) if v > hwm0 + 1_002]
    assert len(fresh) == 4
    # upsert with carried ids: updates keep them, mark is stable
    before = dict(
        (r["k"], r["id"])
        for r in t.snapshot().select("k", "id").collect()
    )
    src = t.snapshot().filter(F.col("k") < 3)
    t.upsert(src.withColumn("k", F.col("k")))
    after = dict(
        (r["k"], r["id"])
        for r in t.snapshot().select("k", "id").collect()
    )
    assert after == before


def test_negative_step_descends_and_hwm_is_min(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _batch(spark, 0, 20),
        key="k", precombine="k",
        identity={"id": {"start": -1, "step": -2}},
    )
    ids = _ids(t)
    assert all(v <= -1 and (v + 1) % 2 == 0 for v in ids)
    assert _hwm(t) == min(ids)
    t.append(_batch(spark, 20, 5))
    ids2 = _ids(t)
    assert len(set(ids2)) == 25
    assert _hwm(t) == min(ids2)


def test_legacy_v6_table_is_writable(spark, tmp_path):
    """minWriterVersion 6 IMPLIES identityColumns; before this
    feature existed the writer refused such tables outright."""
    path = str(tmp_path / "t")
    t = DeltaProtocolTable.create(
        spark, path, _batch(spark, 0, 5), key="k", precombine="k",
        identity={"id": {}},
    )
    # rewrite version 0's protocol to the legacy shape
    log = os.path.join(path, "_delta_log",
                       "00000000000000000000.json")
    lines = []
    for line in open(log):
        a = json.loads(line)
        if "protocol" in a:
            a = {"protocol": {"minReaderVersion": 1,
                              "minWriterVersion": 6}}
        lines.append(json.dumps(a))
    open(log, "w").write("\n".join(lines) + "\n")

    t2 = DeltaProtocolTable(spark, path, key="k", precombine="k")
    old_hwm = _hwm(t2)
    t2.append(_batch(spark, 5, 5))
    assert t2.snapshot().count() == 10
    assert _hwm(t2) > old_hwm


def test_identity_cannot_partition_or_zero_step(spark, tmp_path):
    with pytest.raises(ValueError, match="partition"):
        DeltaProtocolTable.create(
            spark, str(tmp_path / "a"), _batch(spark, 0, 5),
            key="k", precombine="k",
            identity={"id": {}}, partition_by=["id"],
        )
    with pytest.raises(ValueError, match="step"):
        DeltaProtocolTable.create(
            spark, str(tmp_path / "b"), _batch(spark, 0, 5),
            key="k", precombine="k", identity={"id": {"step": 0}},
        )
