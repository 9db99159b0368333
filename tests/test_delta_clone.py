"""Delta CLONE: zero-copy (hardlink) shallow clone and deep clone.
The scale claim under test: a shallow clone of an N-file table moves
ZERO data bytes (inode-level links), the clone is fully independent
(writes/vacuum on either side never corrupt the other), and deletion
vectors ride along."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


def _mk(spark, path, partitioned=False, n=400):
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 4).alias("grp"),
        (F.col("id") * 1.5).alias("bal"),
        F.lit(1).cast("long").alias("ver"),
    )
    return DeltaProtocolTable.create(
        spark, str(path), df, key="id", precombine="ver",
        partition_by=["grp"] if partitioned else None,
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _data_files(root):
    out = []
    for r, _d, fns in os.walk(root):
        if "_delta_log" in r:
            continue
        out += [os.path.join(r, f) for f in fns
                if f.endswith(".parquet")]
    return out


def test_shallow_clone_zero_copy_same_answer(spark, tmp_path):
    t = _mk(spark, tmp_path / "src", partitioned=True)
    before = _rows(t.snapshot())
    c = t.clone(str(tmp_path / "dst"))
    assert _rows(c.snapshot()) == before
    # zero-copy: every cloned data file shares its inode with a source
    # file (hardlink), so nlink >= 2 and no data bytes moved
    for p in _data_files(str(tmp_path / "dst")):
        assert os.stat(p).st_nlink >= 2
    # fresh identity, same schema/partitioning
    sm, _ = t._replay(t.latest_version())
    cm, _ = c._replay(c.latest_version())
    assert cm["id"] != sm["id"]
    assert cm["schemaString"] == sm["schemaString"]
    assert cm["partitionColumns"] == sm["partitionColumns"]
    assert c.latest_version() == 0  # history is not cloned


def test_clone_divergence_is_independent(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    c = t.clone(str(tmp_path / "dst"))
    c.upsert(spark.createDataFrame(
        [(0, 0, 999.0, 2)], "id long, grp long, bal double, ver long"
    ))
    t.delete_where(F.col("id") < 100)
    # each side sees only its own change
    assert t.snapshot().count() == 300
    assert c.snapshot().count() == 400
    assert _rows(c.snapshot().filter(F.col("id") == 0))[0][2] == 999.0


def test_vacuum_on_either_side_keeps_the_other(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    c = t.clone(str(tmp_path / "dst"))
    before = _rows(t.snapshot())
    # clone rewrites everything then vacuums: source files' bytes must
    # survive (hardlink refcount), and vice versa
    c.overwrite(c.snapshot().withColumn("bal", F.col("bal") + 1))
    c.vacuum(staging_ttl_s=0.0)
    assert _rows(t.snapshot()) == before
    t.overwrite(t.snapshot().withColumn("bal", F.col("bal") + 2))
    t.vacuum(staging_ttl_s=0.0)
    assert c.snapshot().count() == 400
    assert _rows(c.snapshot().filter(F.col("id") == 1))[0][2] == 2.5


def test_clone_carries_deletion_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    t.delete_where(F.col("id") % 10 == 0, mode="mor")  # DV path
    before = _rows(t.snapshot())
    assert len(before) == 360
    c = t.clone(str(tmp_path / "dst"))
    assert _rows(c.snapshot()) == before


def test_deep_clone_copies_bytes(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    c = t.clone(str(tmp_path / "dst"), mode="deep")
    assert _rows(c.snapshot()) == _rows(t.snapshot())
    for p in _data_files(str(tmp_path / "dst")):
        assert os.stat(p).st_nlink == 1  # real copies


def test_clone_refuses_existing_target(spark, tmp_path):
    t = _mk(spark, tmp_path / "src")
    t.clone(str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="already exists"):
        t.clone(str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="unknown clone mode"):
        t.clone(str(tmp_path / "other"), mode="lazy")
