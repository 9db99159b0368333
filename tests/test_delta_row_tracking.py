"""Delta protocol Row Tracking (spec "Row Tracking"): protocol
upgrade, rowIdHighWaterMark domain metadata, per-commit baseRowId /
defaultRowCommitVersion stamping, inheritance, preservation through
COW + MOR upsert, DELETE (both strategies), OPTIMIZE, and the
checkpoint, plus the UniForm lift into Iceberg v3 Row Lineage.
Reference analog: none — the reference has no row-identity concept."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


def _mk_rows(spark, a, b):
    return spark.range(a, b).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).repartition(1).sortWithinPartitions("k")


def _tracked(spark, tmp, n=20):
    t = DeltaProtocolTable.create(
        spark, str(tmp / "t"), _mk_rows(spark, 0, 0),
        key="k", precombine="v",
    )
    t.enable_row_tracking()
    t.append(_mk_rows(spark, 0, n))
    return t


def _lineage(t):
    return {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in t.snapshot_row_tracking().collect()
    }


def test_enable_protocol_and_fresh_ids(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _mk_rows(spark, 0, 10),
        key="k", precombine="v",
    )
    assert t._row_id_hwm(t.latest_version()) is None
    t.enable_row_tracking()
    v = t.latest_version()
    assert t.enable_row_tracking() == v  # idempotent
    # protocol carries the writer features; config names the
    # materialized columns
    meta, active = t._replay(t.latest_version())
    protocol = [
        a["protocol"] for a in t._actions_upto(v) if "protocol" in a
    ][-1]
    assert "rowTracking" in protocol["writerFeatures"]
    assert meta["configuration"]["delta.enableRowTracking"] == "true"
    assert meta["configuration"][
        "delta.rowTracking.materializedRowIdColumnName"
    ] == "_row_id"

    # pre-upgrade file: NULL lineage
    got = _lineage(t)
    assert all(x == (None, None) for x in got.values())

    # sorted single-file append: fresh ids 0..4, this commit version
    t.append(_mk_rows(spark, 10, 15))
    v2 = t.latest_version()
    got = _lineage(t)
    assert [got[k] for k in range(10, 15)] == [
        (i, v2) for i in range(5)
    ]
    assert t._row_id_hwm(v2) == 4
    # add actions carry the spec fields
    _, active = t._replay(v2)
    stamped = [
        a for a in active.values() if a.get("baseRowId") is not None
    ]
    assert len(stamped) == 1
    assert stamped[0]["baseRowId"] == 0
    assert stamped[0]["defaultRowCommitVersion"] == v2


def test_upsert_keeps_row_ids_cow_and_mor(spark, tmp_path):
    for mode in ("cow", "mor"):
        tmp = tmp_path / mode
        tmp.mkdir()
        t = _tracked(spark, tmp)
        before = _lineage(t)
        t.upsert(
            spark.createDataFrame(
                [(3, 300.0), (7, 700.0), (100, 1.0)],
                "k long, v double",
            ),
            mode=mode,
        )
        v = t.latest_version()
        got = _lineage(t)
        for k in (3, 7):  # updated: id kept, commit version moved
            assert got[k][0] == before[k][0], mode
            assert got[k][1] == v, mode
        for k in (0, 11, 19):  # untouched: both unchanged
            assert got[k] == before[k], mode
        assert got[100][0] is not None and got[100][0] >= 20, mode
        assert got[100][1] == v, mode
        ids = [rid for rid, _ in got.values()]
        assert len(ids) == len(set(ids)), mode


def test_delete_and_optimize_preserve(spark, tmp_path):
    t = _tracked(spark, tmp_path)
    t.upsert(spark.createDataFrame([(5, 500.0)], "k long, v double"),
             mode="cow")
    before = _lineage(t)
    # DV delete: file + position unchanged → lineage untouched
    t.delete_where(F.col("k") == 6)
    got = _lineage(t)
    assert 6 not in got
    del before[6]
    assert got == before
    # OPTIMIZE (dataChange=false) must not change row identity
    t.compact(target_files=1)
    assert _lineage(t) == before
    # checkpoint must carry baseRowId/defaultRowCommitVersion
    t.checkpoint()
    assert _lineage(t) == before


def test_high_water_mark_monotonic_across_commits(spark, tmp_path):
    t = _tracked(spark, tmp_path, n=10)
    h0 = t._row_id_hwm(t.latest_version())
    assert h0 == 9
    t.append(_mk_rows(spark, 10, 13))
    assert t._row_id_hwm(t.latest_version()) == 12
    # rewrites mint ids only for NULL-lineage rows; the mark still
    # advances by the rewritten file's row count (fresh range is
    # reserved whether or not rows use it — no reuse, ever)
    t.upsert(spark.createDataFrame([(1, 100.0)], "k long, v double"),
             mode="cow")
    assert t._row_id_hwm(t.latest_version()) > 12
    dm = [
        a["domainMetadata"]
        for a in t._actions_upto(t.latest_version())
        if a.get("domainMetadata", {}).get("domain")
        == "delta.rowTracking"
    ]
    marks = [
        json.loads(d["configuration"])["rowIdHighWaterMark"]
        for d in dm
    ]
    assert marks == sorted(marks)  # never regresses


def test_merge_keeps_row_ids_cow_and_mor(spark, tmp_path):
    """MERGE INTO under row tracking: U keeps the target row's id
    (commit version moves), K keeps both, D frees nothing for reuse,
    I mints fresh — in both physical strategies."""
    for mode in ("cow", "mor"):
        tmp = tmp_path / mode
        tmp.mkdir()
        t = _tracked(spark, tmp)
        before = _lineage(t)
        src = spark.createDataFrame(
            [(3, 333.0), (4, -1.0), (100, 5.0)], "k long, v double"
        )
        t.merge(
            src, on="k",
            when_matched_update={"v": "s.v"},
            when_matched_delete="s.v < 0",
            when_not_matched_insert="all",
            mode=mode,
        )
        v = t.latest_version()
        got = _lineage(t)
        assert got[3][0] == before[3][0] and got[3][1] == v, mode
        assert 4 not in got, mode
        assert got[100][0] is not None and got[100][1] == v, mode
        assert got[7] == before[7], mode  # kept rows untouched
        ids = [rid for rid, _ in got.values() if rid is not None]
        assert len(ids) == len(set(ids)), mode


def test_streaming_upsert_tracks_rows(spark, tmp_path):
    """The 100 TB CDC-ingest shape: stream_upsert drives a
    row-tracking table one micro-batch at a time — every micro-batch
    commit stamps fresh ids, updates keep identity across batches,
    and the high-water mark advances monotonically."""
    import json as _json

    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_upsert,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(1, 1.0)], "k long, v double"),
        key="k", precombine="v",
    )
    t.enable_row_tracking()
    # post-upgrade base row so k=1 HAS an id to keep
    t.upsert(spark.createDataFrame([(1, 2.0)], "k long, v double"),
             mode="cow")
    id_k1 = _lineage(t)[1][0]
    assert id_k1 is not None

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(_json.dumps(
        {"k": 1, "v": 10.0}))
    (src / "b2.json").write_text(_json.dumps(
        {"k": 2, "v": 20.0}))
    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    stream_upsert(stream, t, str(tmp_path / "ckpt"))
    got = _lineage(t)
    assert got[1][0] == id_k1  # identity survives micro-batches
    assert got[2][0] is not None and got[2][0] != id_k1
    ids = [rid for rid, _ in got.values() if rid is not None]
    assert len(ids) == len(set(ids))


def test_clone_carries_high_water_mark(spark, tmp_path):
    """CLONE keeps row identity: the copied adds carry their
    baseRowId, and the rowIdHighWaterMark domain metadata must carry
    too — or the clone would re-mint ids already in use."""
    t = _tracked(spark, tmp_path, n=10)
    hwm = t._row_id_hwm(t.latest_version())
    c = t.clone(str(tmp_path / "c"))
    assert c._row_id_hwm(c.latest_version()) == hwm
    assert _lineage(c) == _lineage(t)
    # fresh ids on the clone continue above the carried mark
    c.append(_mk_rows(spark, 10, 13))
    got = _lineage(c)
    assert sorted(got[k][0] for k in range(10, 13)) == [
        hwm + 1, hwm + 2, hwm + 3
    ]


def test_reverse_uniform_lifts_lineage_to_row_tracking(
    spark, tmp_path
):
    """The mirror lift: an Iceberg table with v3 Row Lineage syncs to
    a Delta view whose adds carry baseRowId verbatim — row ids read
    identically through snapshot_row_tracking()."""
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = IcebergTable.create(
        spark, str(tmp_path / "i"),
        _mk_rows(spark, 0, 0),
    )
    ice.enable_row_lineage()
    ice.append(_mk_rows(spark, 0, 15))
    ice.upsert(
        spark.createDataFrame([(4, 444.0), (100, 1.0)],
                              "k long, v double"),
        key="k", precombine="v", mode="cow",
    )
    ice_ids = {
        r["k"]: r["_row_id"]
        for r in ice.snapshot_lineage().collect()
    }
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    got = {
        r["k"]: r["_row_id"]
        for r in d.snapshot_row_tracking().collect()
    }
    assert got == ice_ids
    assert got[4] is not None  # materialized id survived the lift


def test_uniform_lift_row_tracking_to_row_lineage(spark, tmp_path):
    """baseRowId lifts into Iceberg first_row_id verbatim and the
    materialized _row_id columns read identically through the
    UniForm view — the same zero-recode property as the DV lift."""
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_iceberg_uniform,
    )

    t = _tracked(spark, tmp_path)
    t.upsert(
        spark.createDataFrame([(12, 999.0), (100, 1.0)],
                              "k long, v double"),
        mode="cow",
    )
    delta_ids = {
        r["k"]: r["_row_id"]
        for r in t.snapshot_row_tracking().collect()
    }
    ice = sync_iceberg_uniform(spark, str(tmp_path / "t"))
    meta = ice.metadata()
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == t._row_id_hwm(
        t.latest_version()
    ) + 1
    ice_ids = {
        r["k"]: r["_row_id"]
        for r in ice.snapshot_lineage().collect()
    }
    assert ice_ids == delta_ids
    # manifest entries carry field 142 with the Delta base verbatim
    snap = ice._snapshot_by(meta, None)
    firsts = {
        e["data_file"].get("first_row_id")
        for e in ice._entries_of_snapshot(snap, content=0)
    }
    _, active = t._replay(t.latest_version())
    assert firsts == {
        a.get("baseRowId") for a in active.values()
    }


def test_convert_preserves_row_identity(spark, tmp_path):
    """Row identity survives FULL cross-format migration (not just
    the metadata-twin view): convert_table reads lineage snapshots,
    the destination enables tracking seeded with the source counter,
    and materialized _row_id columns carry through the write
    alignment in both directions."""
    from fda_clinical_etl_pipeline_spark.sources.convert import (
        convert_table,
    )
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = _tracked(spark, tmp_path, n=12)
    t.upsert(
        spark.createDataFrame([(5, 555.0), (100, 1.0)],
                              "k long, v double"),
        mode="cow",
    )
    src_ids = {
        r["k"]: r["_row_id"]
        for r in t.snapshot_row_tracking().collect()
    }
    ice = convert_table(
        spark, str(tmp_path / "t"), str(tmp_path / "ice"), "iceberg"
    )
    assert {
        r["k"]: r["_row_id"]
        for r in ice.snapshot_lineage().collect()
    } == src_ids
    # fresh destination ids mint ABOVE the carried range
    assert ice.metadata()["next-row-id"] >= t._row_id_hwm(
        t.latest_version()
    ) + 1
    ice.upsert(
        spark.createDataFrame([(200, 1.0)], "k long, v double"),
        key="k", precombine="v", mode="cow",
    )
    lin = {
        r["k"]: r["_row_id"]
        for r in ice.snapshot_lineage().collect()
    }
    assert lin[200] not in set(src_ids.values())

    # round-trip back to Delta: identity still intact
    back = convert_table(
        spark, str(tmp_path / "ice"), str(tmp_path / "back"),
        "delta", record_key="k", precombine="v",
    )
    got = {
        r["k"]: r["_row_id"]
        for r in back.snapshot_row_tracking().collect()
    }
    assert got == lin


def test_convert_untracked_source_stays_plain(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.convert import (
        convert_table,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _mk_rows(spark, 0, 5),
        key="k", precombine="v",
    )
    ice = convert_table(
        spark, str(tmp_path / "t"), str(tmp_path / "ice"), "iceberg"
    )
    assert ice.snapshot().count() == 5
    assert "next-row-id" not in ice.metadata()


def test_reverse_uniform_enables_row_tracking_on_twin(spark, tmp_path):
    """ADVICE r13: the lift must ENABLE row tracking on the twin, not
    just carry baseRowId fields — writer features, the
    enableRowTracking config, and a high-water mark equal to the
    source's next-row-id - 1, so a write through the twin can never
    mint colliding ids."""
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    ice = IcebergTable.create(
        spark, str(tmp_path / "i"), _mk_rows(spark, 0, 0)
    )
    ice.enable_row_lineage()
    ice.append(_mk_rows(spark, 0, 15))
    d = sync_delta_uniform(spark, str(tmp_path / "i"))
    v = d.latest_version()
    protocol = [
        a["protocol"] for a in d._actions_upto(v) if "protocol" in a
    ][-1]
    assert "rowTracking" in protocol["writerFeatures"]
    assert "domainMetadata" in protocol["writerFeatures"]
    meta, _ = d._replay(v)
    assert meta["configuration"]["delta.enableRowTracking"] == "true"
    next_rid = ice.metadata()["next-row-id"]
    assert d._row_id_hwm(v) == next_rid - 1

    # a write THROUGH the twin mints ids strictly above the lifted
    # mark — the collision the enablement exists to prevent
    d.append(_mk_rows(spark, 100, 103))
    ids = {
        r["k"]: r["_row_id"]
        for r in d.snapshot_row_tracking().collect()
    }
    assert {ids[100], ids[101], ids[102]} == {
        next_rid, next_rid + 1, next_rid + 2
    }

    # re-sync after more source commits: lifted ids stay verbatim
    # (caller-managed stamp — no minting over the sync's adds), and
    # the mark follows the source's counter
    ice.append(_mk_rows(spark, 200, 203))
    d2 = sync_delta_uniform(spark, str(tmp_path / "i"),
                            delta_path=str(tmp_path / "d2"))
    ice_ids = {
        r["k"]: r["_row_id"]
        for r in ice.snapshot_lineage().collect()
    }
    got = {
        r["k"]: r["_row_id"]
        for r in d2.snapshot_row_tracking().collect()
    }
    assert got == ice_ids
    assert d2._row_id_hwm(d2.latest_version()) == (
        ice.metadata()["next-row-id"] - 1
    )


def test_stamp_refuses_statless_add_on_tracked_table(spark, tmp_path):
    """ADVICE r13: a new add without stats.numRecords on a row-tracked
    table must raise — defaulting to 0 silently mints overlapping
    row-id ranges."""
    import pytest

    t = _tracked(spark, tmp_path, n=5)
    v = t.latest_version()
    with pytest.raises(ValueError, match="numRecords"):
        t._stamp_row_ids(
            [{"add": {"path": "x.parquet", "partitionValues": {},
                      "size": 1, "modificationTime": 0,
                      "dataChange": True}}],
            v + 1,
        )


def test_stamp_folds_caller_mark_and_passes_disable(spark, tmp_path):
    """ADVICE r13: a caller-supplied rowTracking domain action is
    folded via max (caller-managed ids pass verbatim, unstamped adds
    stay NULL on purpose); a removed=true disable action passes
    through untouched."""
    t = _tracked(spark, tmp_path, n=5)
    v = t.latest_version()
    hwm = t._row_id_hwm(v)
    mark = lambda m: {"domainMetadata": {
        "domain": "delta.rowTracking",
        "configuration": json.dumps({"rowIdHighWaterMark": m}),
        "removed": False,
    }}
    # caller mark above the table's: preserved
    out = t._stamp_row_ids([mark(hwm + 100)], v + 1)
    got = json.loads(out[-1]["domainMetadata"]["configuration"])
    assert got["rowIdHighWaterMark"] == hwm + 100
    # caller mark below: folded up to the table's (never regresses)
    out = t._stamp_row_ids([mark(hwm - 3)], v + 1)
    got = json.loads(out[-1]["domainMetadata"]["configuration"])
    assert got["rowIdHighWaterMark"] == hwm
    # caller-managed commit: adds with ids pass verbatim, unstamped
    # adds stay NULL (pre-enablement files through the UniForm lift)
    add_with = {"add": {"path": "a.parquet", "partitionValues": {},
                        "size": 1, "modificationTime": 0,
                        "dataChange": True, "baseRowId": 7,
                        "defaultRowCommitVersion": 1}}
    add_null = {"add": {"path": "b.parquet", "partitionValues": {},
                        "size": 1, "modificationTime": 0,
                        "dataChange": True}}
    out = t._stamp_row_ids(
        [add_with, add_null, mark(hwm + 100)], v + 1
    )
    adds = {a["add"]["path"]: a["add"] for a in out if "add" in a}
    assert adds["a.parquet"]["baseRowId"] == 7
    assert adds["b.parquet"].get("baseRowId") is None
    # disable passes through untouched, no re-stamp appended
    disable = {"domainMetadata": {
        "domain": "delta.rowTracking", "configuration": "{}",
        "removed": True,
    }}
    out = t._stamp_row_ids([disable], v + 1)
    assert out == [disable]
