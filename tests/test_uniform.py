"""UniForm-style Iceberg metadata twin over a Delta table: zero-copy
sync, DV-to-position-delete conversion, incremental re-sync, scope
gates. The scale claim under test: not one data byte moves — the
Iceberg view references the Delta parquet files in place."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)
from fda_clinical_etl_pipeline_spark.sources.uniform import (
    sync_iceberg_uniform,
)

SCHEMA = "k long, bal double, seg string"


def _mk(spark, path, n=200):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(n)],
        SCHEMA,
    ).repartitionByRange(4, "k")
    return DeltaProtocolTable.create(spark, str(path), df)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_uniform_zero_copy_view(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    ice = sync_iceberg_uniform(spark, str(tmp_path / "d"))
    assert _rows(ice.snapshot()) == _rows(t.snapshot())
    # zero copy: the iceberg tree holds METADATA ONLY — every data
    # file the view references is the delta table's own parquet
    ice_root = str(tmp_path / "d" / "_iceberg")
    local_parquet = [
        p for p in glob.glob(
            os.path.join(ice_root, "**", "*.parquet"), recursive=True
        )
    ]
    assert local_parquet == []
    for fp in ice._files_of_snapshot(
        ice._snapshot_by(ice.metadata(), None)
    ):
        assert fp.startswith(str(tmp_path / "d"))
        assert "_iceberg" not in fp


def test_uniform_syncs_deletion_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    t.delete_where(F.col("k") % 10 == 0, mode="mor")  # DV debt
    expected = _rows(t.snapshot())
    assert len(expected) == 180
    ice = sync_iceberg_uniform(spark, str(tmp_path / "d"))
    assert _rows(ice.snapshot()) == expected
    # the DV became a spec position-delete file in the iceberg tree
    snap = ice._snapshot_by(ice.metadata(), None)
    assert len(ice._delete_files_of_snapshot(snap)) >= 1


def test_uniform_incremental_resync(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    ice = sync_iceberg_uniform(spark, str(tmp_path / "d"))
    v1 = ice.current_version()
    # no-op when already current
    sync_iceberg_uniform(spark, str(tmp_path / "d"))
    assert IcebergTable(
        spark, str(tmp_path / "d" / "_iceberg")
    ).current_version() == v1
    # new delta commits advance the view on re-sync
    t.append(spark.createDataFrame([(500, 5.0, "z")], SCHEMA))
    t.delete_where(F.col("k") == 0)
    ice = sync_iceberg_uniform(spark, str(tmp_path / "d"))
    assert _rows(ice.snapshot()) == _rows(t.snapshot())
    assert ice.metadata()["properties"]["uniform.delta-version"] == (
        str(t.latest_version())
    )
    # iceberg-side history: each sync is one replace snapshot, and
    # time travel to the first sync still answers
    assert ice.snapshot(
        snapshot_id=ice.metadata()["snapshots"][1]["snapshot-id"]
    ).count() == 200


def test_uniform_after_merge_and_upsert(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    t.merge(
        spark.createDataFrame([(0, 999.0, "a"), (700, 7.0, "n")],
                              SCHEMA),
        on="k", when_matched_update="all",
        when_not_matched_insert="all",
    )
    ice = sync_iceberg_uniform(spark, str(tmp_path / "d"))
    assert _rows(ice.snapshot()) == _rows(t.snapshot())


def test_uniform_scope_gates(spark, tmp_path):
    df = spark.createDataFrame([(0, 0.0, "a")], SCHEMA)
    DeltaProtocolTable.create(
        spark, str(tmp_path / "p"), df, partition_by=["seg"]
    )
    with pytest.raises(ValueError, match="unpartitioned"):
        sync_iceberg_uniform(spark, str(tmp_path / "p"))
    t2 = DeltaProtocolTable.create(spark, str(tmp_path / "m"), df)
    t2.rename_column("seg", "segment")  # enables column mapping
    with pytest.raises(ValueError, match="column-mapping"):
        sync_iceberg_uniform(spark, str(tmp_path / "m"))
    with pytest.raises(ValueError, match="no delta table"):
        sync_iceberg_uniform(spark, str(tmp_path / "nope"))


def test_uniform_bounds_prune(spark, tmp_path):
    # delta stats become iceberg column bounds: the view data-skips
    t = _mk(spark, tmp_path / "d", n=400)  # 4 range-disjoint files
    ice = sync_iceberg_uniform(spark, str(tmp_path / "d"))
    cands, skipped = ice.skipped_files("k", 0, 10)
    assert len(cands) == 1 and len(skipped) == 3
    assert _rows(ice.read_range("k", 0, 10)) == _rows(
        t.snapshot().filter(F.col("k") <= 10)
    )


# --------------------------------------------------- hudi -> iceberg
def test_uniform_hudi_cow_view(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_iceberg_uniform_hudi,
    )

    h = HudiTable.create(
        spark, str(tmp_path / "h"), "uni_tbl", "k", "ver",
        partition_field="seg",
    )
    rows = [(i, 1, float(i), "a" if i % 2 == 0 else "b")
            for i in range(100)]
    h.upsert(spark.createDataFrame(
        rows, "k int, ver int, bal double, seg string"
    ), instant="20240101000000000")
    h.upsert(spark.createDataFrame(
        [(0, 2, 999.0, "a")], "k int, ver int, bal double, seg string"
    ), instant="20240102000000000")
    ice = sync_iceberg_uniform_hudi(spark, str(tmp_path / "h"))
    got = _rows(ice.snapshot().select("k", "ver", "bal", "seg"))
    exp = _rows(
        h.snapshot().select("k", "ver", "bal", "seg")
    )
    assert got == exp
    assert [r for r in got if r[0] == 0][0] == (0, 2, 999.0, "a")
    # zero copy: view references the hudi base files in place
    for fp in ice._files_of_snapshot(
        ice._snapshot_by(ice.metadata(), None)
    ):
        assert "_iceberg" not in fp
    # idempotent re-sync
    v = ice.current_version()
    sync_iceberg_uniform_hudi(spark, str(tmp_path / "h"))
    assert IcebergTable(
        spark, str(tmp_path / "h" / "_iceberg")
    ).current_version() == v


def test_uniform_hudi_mor_refuses_until_compacted(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_iceberg_uniform_hudi,
    )

    h = HudiTable.create(
        spark, str(tmp_path / "h"), "uni_mor", "k", "ver",
        table_type="MERGE_ON_READ",
    )
    h.upsert(spark.createDataFrame(
        [(i, 1, float(i)) for i in range(50)],
        "k int, ver int, bal double",
    ), instant="20240101000000000")
    h.upsert(spark.createDataFrame(
        [(0, 2, 9.0)], "k int, ver int, bal double"
    ), instant="20240102000000000")  # log write
    with pytest.raises(ValueError, match="compact"):
        sync_iceberg_uniform_hudi(spark, str(tmp_path / "h"))
    h.compact(instant="20240103000000000")
    ice = sync_iceberg_uniform_hudi(spark, str(tmp_path / "h"))
    assert _rows(ice.snapshot().select("k", "ver", "bal")) == _rows(
        h.snapshot().select("k", "ver", "bal")
    )
