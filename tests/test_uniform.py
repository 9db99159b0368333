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


def _mk_ice(spark, path, n=200, partition_by=None):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(n)],
        SCHEMA,
    ).repartitionByRange(4, "k")
    return IcebergTable.create(
        spark, str(path), df, partition_by=partition_by
    )


def test_uniform_reverse_zero_copy_view(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = _mk_ice(spark, tmp_path / "i")
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    assert _rows(d.snapshot()) == _rows(ice.snapshot())
    # zero copy: the delta tree holds METADATA (and DV) only, and
    # every add action references the iceberg parquet in place via
    # an absolute path
    d_root = str(tmp_path / "i" / "_delta")
    assert glob.glob(
        os.path.join(d_root, "**", "*.parquet"), recursive=True
    ) == []
    _, active = d._replay(d.latest_version())
    assert active and all(os.path.isabs(r) for r in active)
    assert all("_delta" not in r for r in active)


def test_uniform_reverse_position_deletes_to_dvs(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = _mk_ice(spark, tmp_path / "i")
    ice.delete_where(F.col("k") % 10 == 0, mode="mor")
    expected = _rows(ice.snapshot())
    assert len(expected) == 180
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    assert _rows(d.snapshot()) == expected
    # the position deletes became DV descriptors on the adds, the DV
    # files live under the DELTA root (storageType u resolves there)
    _, active = d._replay(d.latest_version())
    dvs = [a["deletionVector"] for a in active.values()
           if a.get("deletionVector")]
    assert dvs and all(dv["storageType"] == "u" for dv in dvs)
    assert glob.glob(
        os.path.join(str(tmp_path / "i" / "_delta"), "deletion_vector*")
    )


def test_uniform_reverse_equality_delete_gate(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = _mk_ice(spark, tmp_path / "i")
    ice.equality_delete(
        spark.createDataFrame([(5,), (7,)], "k long"), ["k"]
    )
    with pytest.raises(ValueError, match="purge_deletes"):
        sync_delta_uniform(spark, str(tmp_path / "i"))
    ice.purge_deletes()  # fold the debt, then the sync proceeds
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    got = _rows(d.snapshot())
    assert len(got) == 198
    assert got == _rows(ice.snapshot())


def test_uniform_reverse_rename_gate(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = _mk_ice(spark, tmp_path / "i")
    ice.rename_column("seg", "segment")
    with pytest.raises(ValueError, match="renamed"):
        sync_delta_uniform(spark, str(tmp_path / "i"))
    with pytest.raises(ValueError, match="no iceberg table"):
        sync_delta_uniform(spark, str(tmp_path / "nope"))


def test_uniform_reverse_incremental_resync(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = _mk_ice(spark, tmp_path / "i")
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    v1 = d.latest_version()
    sync_delta_uniform(spark, str(tmp_path / "i"))  # no-op
    assert DeltaProtocolTable(
        spark, str(tmp_path / "i" / "_delta")
    ).latest_version() == v1
    ice.append(spark.createDataFrame([(500, 5.0, "z")], SCHEMA))
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    # O(delta): the append-only advance commits ONE add, no removes
    import json as _json

    with open(d._commit_file(d.latest_version())) as f:
        acts = [_json.loads(ln) for ln in f if ln.strip()]
    assert sum(1 for a in acts if "add" in a) == 1
    assert sum(1 for a in acts if "remove" in a) == 0
    ice.delete_where(F.col("k") == 0, mode="mor")
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    # the delete touched one file: one remove+add pair carries its DV
    with open(d._commit_file(d.latest_version())) as f:
        acts = [_json.loads(ln) for ln in f if ln.strip()]
    assert sum(1 for a in acts if "remove" in a) == 1
    new_adds = [a["add"] for a in acts if "add" in a]
    assert len(new_adds) == 1 and new_adds[0]["deletionVector"]
    assert _rows(d.snapshot()) == _rows(ice.snapshot())
    meta, _ = d._replay(d.latest_version())
    assert meta["configuration"]["uniform.iceberg-snapshot"] == str(
        ice.metadata()["current-snapshot-id"]
    )
    # unchanged delete set on a further advance: DV files reused, the
    # DV'd file carries forward with NO new actions
    ice.append(spark.createDataFrame([(501, 5.1, "z")], SCHEMA))
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    with open(d._commit_file(d.latest_version())) as f:
        acts = [_json.loads(ln) for ln in f if ln.strip()]
    assert sum(1 for a in acts if "remove" in a) == 0
    assert sum(1 for a in acts if "add" in a) == 1
    assert _rows(d.snapshot()) == _rows(ice.snapshot())
    # delta-side history: time travel to the first sync still answers
    assert d.snapshot(version=v1).count() == 200


def test_uniform_reverse_bounds_prune(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = _mk_ice(spark, tmp_path / "i", n=400)
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    # iceberg column bounds became delta per-file stats: the view
    # data-skips without reading a footer
    cands, skipped = d.skipped_files("k", 0, 10)
    assert len(cands) == 1 and len(skipped) == 3
    assert _rows(d.read_range("k", 0, 10)) == _rows(
        ice.snapshot().filter(F.col("k") <= 10)
    )


def test_uniform_reverse_hidden_partitioned_source(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    # hidden-partitioned iceberg works: data files are self-contained
    ice = _mk_ice(
        spark, tmp_path / "i", partition_by=["bucket(4, k)"]
    )
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    assert _rows(d.snapshot()) == _rows(ice.snapshot())
    meta, _ = d._replay(d.latest_version())
    assert meta["partitionColumns"] == []


def test_uniform_roundtrip_delta_iceberg_delta(spark, tmp_path):
    """The verdict's Done criterion: Delta -> Iceberg view -> Delta
    view shows identical snapshots, DV debt surviving BOTH format
    boundaries (DV -> position delete -> DV) without a data rewrite."""
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform, sync_iceberg_uniform,
    )

    t = _mk(spark, tmp_path / "d")
    t.delete_where(F.col("k") % 11 == 0, mode="mor")  # DV debt
    t.merge(
        spark.createDataFrame([(0, 999.0, "a"), (700, 7.0, "n")],
                              SCHEMA),
        on="k", when_matched_update="all",
        when_not_matched_insert="all",
    )
    expected = _rows(t.snapshot())
    ice = sync_iceberg_uniform(spark, str(tmp_path / "d"))
    assert _rows(ice.snapshot()) == expected
    back = sync_delta_uniform(
        spark, str(tmp_path / "d" / "_iceberg"),
        delta_path=str(tmp_path / "dview"),
    )
    assert _rows(back.snapshot()) == expected
    # still zero-copy after two boundary crossings: every data file
    # the round-trip view references is the ORIGINAL delta parquet
    _, active = back._replay(back.latest_version())
    for r in active:
        assert r.startswith(str(tmp_path / "d"))
        assert "_iceberg" not in r and "dview" not in r


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


def test_uniform_reverse_schema_evolution_add_column(spark, tmp_path):
    """An added column is fine (files written before the evolution
    surface it as NULL under the pinned view schema); only RENAMES
    refuse (field-id vs by-name resolution)."""
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = _mk_ice(spark, tmp_path / "i", n=50)
    ice.add_column("note", __import__(
        "pyspark.sql.types", fromlist=["StringType"]
    ).StringType())
    ice.append(spark.createDataFrame(
        [(500, 5.0, "z", "hello")],
        "k long, bal double, seg string, note string",
    ))
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    got = _rows(d.snapshot())
    assert got == _rows(ice.snapshot())
    assert sum(1 for r in got if r[3] == "hello") == 1
    assert sum(1 for r in got if r[3] is None) == 50


def test_uniform_v3_dv_sync_zero_recode(spark, tmp_path):
    """dv_mode='v3': Delta DVs surface to Iceberg readers as
    `deletion-vector-v1` Puffin blobs whose VECTOR BYTES are lifted
    verbatim from the Delta DV file — zero re-encoding (the UniForm
    byte-identity property) — and the view stamps format-version 3."""
    from fda_clinical_etl_pipeline_spark.sources.delta_dv import (
        read_dv_bytes,
    )
    from fda_clinical_etl_pipeline_spark.sources.puffin import (
        DV_BLOB_TYPE,
        read_puffin,
    )

    t = _mk(spark, tmp_path / "d")
    t.delete_where(F.col("k") % 10 == 0, mode="mor")  # DV debt
    expected = _rows(t.snapshot())
    ice = sync_iceberg_uniform(
        spark, str(tmp_path / "d"), dv_mode="v3"
    )
    assert _rows(ice.snapshot()) == expected
    assert ice.metadata()["format-version"] == 3

    snap = ice._snapshot_by(ice.metadata(), None)
    assert ice._delete_files_of_snapshot(snap) == []  # no v2 files
    dv_entries = ice._dv_entries_of_snapshot(snap)
    assert dv_entries

    # byte identity: every blob's inner vector == the Delta DV bytes
    _meta, active = t._replay(t.latest_version())
    delta_vecs = {
        os.path.join(str(tmp_path / "d"), rel):
            read_dv_bytes(str(tmp_path / "d"), a["deletionVector"])
        for rel, a in active.items() if a.get("deletionVector")
    }
    assert set(delta_vecs) == {
        d["referenced_data_file"] for d in dv_entries
    }
    for d in dv_entries:
        _props, blobs = read_puffin(d["file_path"])
        (payload,) = [
            p for bm, p in blobs if bm["offset"] == d["content_offset"]
        ]
        # [4B BE len][magic+vector == Delta bytes verbatim][4B BE crc]
        # — Delta's portable serialization starts with the magic, and
        # the v3 frame does NOT prepend a second one
        assert payload[4:-4] == delta_vecs[d["referenced_data_file"]]
        assert payload[4:8] == b"\xd1\xd3\x39\x64"
        assert payload[8:12] != b"\xd1\xd3\x39\x64"
        (bm,) = [
            bm for bm, _ in blobs
            if bm["offset"] == d["content_offset"]
        ]
        assert bm["type"] == DV_BLOB_TYPE
        assert int(bm["properties"]["cardinality"]) == \
            d["record_count"]
