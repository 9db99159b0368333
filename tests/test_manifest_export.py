"""External-engine interop exports: symlink_format_manifest for
Delta/Hudi (file-list consumption + STALE-manifest refusal after any
newer commit) and Iceberg register_table-style metadata relocation
(pinned registration, no-overwrite refusal). The oracle-gated
end-to-end read lives in lakehouse_manifest_export."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    HudiTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)
from fda_clinical_etl_pipeline_spark.sources.manifest_export import (
    export_symlink_manifest,
    manifest_files,
    read_symlink_manifest,
    register_iceberg_table,
)

SCHEMA = "k long, bal double, seg string"


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b")
         for i in range(lo, hi)],
        SCHEMA,
    )


def _sorted_rows(df):
    return sorted(
        (r["k"], r["bal"], r["seg"])
        for r in df.select("k", "bal", "seg").collect()
    )


def test_delta_export_and_stale_refusal(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _rows(spark, 0, 20),
        key="k", precombine="bal",
    )
    export_symlink_manifest(t)
    assert _sorted_rows(read_symlink_manifest(spark, t.path)) == \
        _sorted_rows(t.snapshot())
    # a NEWER commit makes the export stale: refuse, never serve a
    # rewritten/deleted file list
    t.upsert(
        spark.createDataFrame([(1, 999.0, "b")], SCHEMA), mode="cow"
    )
    with pytest.raises(ValueError, match="STALE"):
        manifest_files(t.path)
    with pytest.raises(ValueError, match="STALE"):
        read_symlink_manifest(spark, t.path)
    # regeneration clears it — and the rewrite's removed files must
    # be gone from the list (rows would double otherwise)
    export_symlink_manifest(t)
    assert _sorted_rows(read_symlink_manifest(spark, t.path)) == \
        _sorted_rows(t.snapshot())


def test_delta_partitioned_export_reinjects_columns(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "dp"), _rows(spark, 0, 20),
        key="k", precombine="bal", partition_by=["seg"],
    )
    root = export_symlink_manifest(t)
    import os

    # Hive-layout per-partition manifests
    assert os.path.isfile(os.path.join(root, "seg=a", "manifest"))
    assert os.path.isfile(os.path.join(root, "seg=b", "manifest"))
    got = read_symlink_manifest(spark, t.path)
    assert _sorted_rows(got) == _sorted_rows(t.snapshot())


def test_delta_dv_refusal(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "dv"), _rows(spark, 0, 20),
        key="k", precombine="bal",
    )
    t.delete_where(F.col("k") < 5, mode="mor")
    with pytest.raises(ValueError, match="deletion vectors"):
        export_symlink_manifest(t)


def test_hudi_export_and_stale_refusal(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "h"), "mx_tbl", "k", "bal",
        partition_field="seg",
    )
    t.upsert(_rows(spark, 0, 20), instant="20240101120000000")
    export_symlink_manifest(t)
    assert _sorted_rows(read_symlink_manifest(spark, t.path)) == \
        _sorted_rows(t.snapshot())
    t.upsert(
        spark.createDataFrame([(1, 999.0, "b")], SCHEMA),
        instant="20240102120000000",
    )
    with pytest.raises(ValueError, match="STALE"):
        read_symlink_manifest(spark, t.path)
    export_symlink_manifest(t)
    assert _sorted_rows(read_symlink_manifest(spark, t.path)) == \
        _sorted_rows(t.snapshot())


def test_hudi_mor_log_refusal(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "hm"), "mx_mor", "k", "bal",
        table_type="MERGE_ON_READ",
    )
    t.upsert(_rows(spark, 0, 10), instant="20240101120000000")
    t.upsert(
        spark.createDataFrame([(1, 999.0, "b")], SCHEMA),
        instant="20240102120000000",
    )
    with pytest.raises(ValueError, match="log"):
        export_symlink_manifest(t)
    t.compact(instant="20240103120000000")
    export_symlink_manifest(t)
    assert _sorted_rows(read_symlink_manifest(spark, t.path)) == \
        _sorted_rows(t.snapshot())


def test_iceberg_register_table(spark, tmp_path):
    src = IcebergTable.create(
        spark, str(tmp_path / "i"), _rows(spark, 0, 20)
    )
    src.append(_rows(spark, 20, 25))
    reg = register_iceberg_table(
        spark, src.path, str(tmp_path / "reg")
    )
    assert _sorted_rows(reg.snapshot()) == _sorted_rows(src.snapshot())
    before = _sorted_rows(reg.snapshot())
    # pinned registration: later SOURCE commits do not appear
    src.append(_rows(spark, 25, 30))
    assert _sorted_rows(reg.snapshot()) == before
    # never overwrites an existing table
    with pytest.raises(ValueError, match="never overwrites"):
        register_iceberg_table(
            spark, src.path, str(tmp_path / "reg")
        )
