"""Delta deletion vectors (delta-io PROTOCOL.md "Deletion Vectors"):
codec round-trips + structural conformance of the serialized bitmaps
and DV files, merge-on-read delete semantics through every reader
path, protocol feature gating, checkpoint survival, and the
bytes-written assertion that proves the O(deleted rows) claim."""

from __future__ import annotations

import glob
import json
import os
import struct
import uuid
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources import delta_dv as dv
from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


# ------------------------------------------------------------ codec
def test_z85_known_shape():
    raw = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff").bytes
    enc = dv.z85_encode(raw)
    assert len(enc) == 20
    assert dv.z85_decode(enc) == raw
    with pytest.raises(ValueError):
        dv.z85_encode(b"abc")  # not a multiple of 4


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40),
                max_size=300))
def test_bitmap_roundtrip(positions):
    data = dv.serialize_positions(positions)
    assert dv.deserialize_positions(data) == sorted(set(positions))


def test_bitmap_container_boundary():
    # >4096 low values in one 16-bit block flips the container from
    # array to bitmap encoding; both must round-trip
    dense = list(range(5000))
    sparse = [70000 + i * 3 for i in range(100)]
    for vals in (dense, sparse, dense + sparse):
        assert dv.deserialize_positions(
            dv.serialize_positions(vals)
        ) == sorted(set(vals))


def test_serialized_layout_bytes():
    data = dv.serialize_positions([1, 2, 2**33])
    magic, n = struct.unpack_from("<iq", data, 0)
    assert magic == 1681511377  # spec magic
    assert n == 2  # two high-32 keys: 0 and 2
    key0 = struct.unpack_from("<i", data, 12)[0]
    assert key0 == 0
    cookie = struct.unpack_from("<I", data, 16)[0]
    assert cookie == 12346  # portable, no run containers


def test_dv_file_layout(tmp_path):
    u = uuid.uuid4()
    desc = dv.write_dv_file(str(tmp_path), u, [5, 9, 1])
    assert desc["storageType"] == "u"
    assert len(desc["pathOrInlineDv"]) == 20
    assert desc["cardinality"] == 3
    fp = os.path.join(str(tmp_path), dv.dv_file_name(u))
    blob = open(fp, "rb").read()
    assert blob[0] == 1  # format version byte
    (size,) = struct.unpack_from(">i", blob, desc["offset"])
    assert size == desc["sizeInBytes"]
    payload = blob[desc["offset"] + 4: desc["offset"] + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, desc["offset"] + 4 + size)
    assert crc == zlib.crc32(payload)
    assert dv.read_dv(str(tmp_path), desc) == [1, 5, 9]
    # corrupted payload is caught by the checksum
    bad = bytearray(blob)
    bad[6] ^= 0xFF
    with open(fp, "wb") as f:
        f.write(bad)
    with pytest.raises(ValueError, match="checksum|magic|cookie"):
        dv.read_dv(str(tmp_path), desc)


def test_inline_dv_read():
    payload = dv.serialize_positions([0, 7])
    pad = (-len(payload)) % 4
    desc = {
        "storageType": "i",
        "pathOrInlineDv": dv.z85_encode(payload + b"\x00" * pad),
        "sizeInBytes": len(payload),  # recovers the unpadded length
        "cardinality": 2,
    }
    assert dv.read_dv("/nonexistent", desc) == [0, 7]


# ----------------------------------------------------------- table
@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    ).repartition(4)
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), df, key="id", precombine="grp"
    )


def test_mor_delete_writes_dv_not_files(table):
    files = sorted(glob.glob(table.path + "/*.parquet"))
    data_bytes = sum(os.path.getsize(p) for p in files)
    mtimes = {p: os.path.getmtime(p) for p in files}
    v = table.delete_where(F.col("id").isin([3, 500, 4999]))
    for p in files:
        assert os.path.getmtime(p) == mtimes[p], "data file rewritten"
    dv_files = glob.glob(table.path + "/deletion_vector_*.bin")
    assert dv_files
    assert sum(os.path.getsize(p) for p in dv_files) < data_bytes / 10
    assert table.snapshot().count() == 4997
    assert table.snapshot().where("id = 3").count() == 0
    # the commit re-adds the same paths with descriptors
    actions = [
        json.loads(ln)
        for ln in open(table._commit_file(v))
    ]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(a["deletionVector"] for a in adds)
    for a in adds:
        d = a["deletionVector"]
        assert d["storageType"] == "u"
        assert d["cardinality"] >= 1
    removes = [a["remove"]["path"] for a in actions if "remove" in a]
    assert sorted(removes) == sorted(a["path"] for a in adds)


def test_protocol_upgrade_once(table):
    table.delete_where(F.col("id") == 1)
    v1 = table.latest_version()
    proto = None
    for i in range(v1 + 1):
        for ln in open(table._commit_file(i)):
            a = json.loads(ln)
            if "protocol" in a:
                proto = a["protocol"]
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert proto["readerFeatures"] == ["deletionVectors"]
    assert "deletionVectors" in proto["writerFeatures"]
    # second MOR delete does not re-emit a protocol action
    table.delete_where(F.col("id") == 2)
    actions = [
        json.loads(ln)
        for ln in open(table._commit_file(table.latest_version()))
    ]
    assert not any("protocol" in a for a in actions)


def test_stacked_deletes_merge_dvs(table):
    table.delete_where(F.col("id") == 1)
    table.delete_where(F.col("id") == 2)
    table.delete_where((F.col("id") >= 10) & (F.col("id") < 15))
    assert table.snapshot().count() == 4993
    got = sorted(
        r.id for r in table.read_range("id", 0, 20).collect()
    )
    assert got == [0] + [3, 4, 5, 6, 7, 8, 9] + list(range(15, 21))
    # deleting already-dead rows: no new commit
    v = table.latest_version()
    assert table.delete_where(F.col("id") == 2) == v


def test_time_travel_and_cdf_across_dv_delete(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "cdf"), df, key="id",
        precombine="grp", enable_cdf=True,
    )
    v0 = t.latest_version()
    t.delete_where(F.col("id") < 5)
    assert t.snapshot().count() == 95
    assert t.snapshot(v0).count() == 100  # pre-DV time travel
    changes = t.table_changes(v0 + 1, t.latest_version())
    dels = changes.where("_change_type = 'delete'")
    assert sorted(r.id for r in dels.collect()) == [0, 1, 2, 3, 4]


def test_upsert_on_dv_table_does_not_resurrect(table):
    table.delete_where(F.col("id").isin([7, 8]))
    inc = table.spark.createDataFrame(
        [(7, 99, "revive"), (9, 99, "upd9")],
        "id long, grp long, val string",
    )
    table.upsert(inc)
    snap = table.snapshot()
    rows = {r.id: r.val for r in snap.where(
        F.col("id").isin([7, 8, 9])).collect()}
    assert rows[7] == "revive"   # explicit re-insert wins
    assert 8 not in rows         # DV'd row stays dead through merge
    assert rows[9] == "upd9"
    assert snap.count() == 4999


def test_checkpoint_preserves_dvs(table):
    table.delete_where(F.col("id").isin([1, 2, 3]))
    cp = table.checkpoint()
    # replay now reads the checkpoint; DV info must survive it
    assert table.snapshot().count() == 4997
    acts = table._read_checkpoint(cp)
    dv_adds = [
        a["add"] for a in acts
        if "add" in a and a["add"].get("deletionVector")
    ]
    assert dv_adds
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos[0]["readerFeatures"] == ["deletionVectors"]


def test_vacuum_keeps_live_dvs_drops_orphans(table):
    # id % 97 == 1 spreads across every file -> every file gets a DV
    table.delete_where(F.col("id") % 97 == 1)
    live_before = set(glob.glob(
        table.path + "/deletion_vector_*.bin"))
    assert live_before
    # superseding delete writes a NEW merged DV per touched file; the
    # old ones become orphans
    table.delete_where(F.col("id") % 97 == 2)
    removed = table.vacuum(staging_ttl_s=0)
    assert any("deletion_vector_" in r for r in removed)
    live_after = set(glob.glob(table.path + "/deletion_vector_*.bin"))
    assert live_after and not (live_after & live_before)
    n_del = 5000 // 97 + (1 if 5000 % 97 > 1 else 0)  # ids ≡1 mod 97
    n_del2 = 5000 // 97 + (1 if 5000 % 97 > 2 else 0)
    assert table.snapshot().count() == 5000 - n_del - n_del2


def test_auto_mode_mass_delete_uses_cow(table):
    table.delete_where(F.col("id") < 2500)  # 50% >> threshold
    v = table.latest_version()
    actions = [
        json.loads(ln) for ln in open(table._commit_file(v))
    ]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and not any(a.get("deletionVector") for a in adds)
    assert table.snapshot().count() == 2500


def test_compact_folds_dvs_away(table):
    table.delete_where(F.col("id").isin([1, 2, 3]))
    table.compact(target_files=2)
    _, active = table._replay(table.latest_version())
    assert not any(
        a.get("deletionVector") for a in active.values()
    )
    assert table.snapshot().count() == 4997


def test_vanilla_batch_source_applies_dvs(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaBatchSource,
    )

    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "vb"), df, key="id", precombine="grp"
    )
    t.delete_where(F.col("id").isin([0, 1]))
    spark.dataSource.register(DeltaBatchSource)
    got = spark.read.format("delta_log").option("path", t.path).load()
    assert got.count() == 198
    assert got.where("id = 0").count() == 0


def test_mor_upsert_dv_plus_append(table):
    files = sorted(glob.glob(table.path + "/*.parquet"))
    mtimes = {p: os.path.getmtime(p) for p in files}
    inc = table.spark.createDataFrame(
        [(5, 99, "win5"), (7, -1, "lose7"), (9000, 1, "new")],
        "id long, grp long, val string",
    )
    v = table.upsert(inc)
    for p in files:
        assert os.path.getmtime(p) == mtimes[p], "data file rewritten"
    actions = [
        json.loads(ln) for ln in open(table._commit_file(v))
    ]
    dv_adds = [
        a["add"] for a in actions
        if "add" in a and a["add"].get("deletionVector")
    ]
    plain_adds = [
        a["add"] for a in actions
        if "add" in a and not a["add"].get("deletionVector")
    ]
    assert dv_adds, "displaced stored row should be DV'd in place"
    assert plain_adds, "winning batch rows should append"
    snap = table.snapshot()
    rows = {
        r.id: (r.val, r.grp)
        for r in snap.where(F.col("id").isin([5, 7, 9000])).collect()
    }
    assert rows[5] == ("win5", 99)
    assert rows[7] == ("v7", 0)      # grp=-1 lost to stored 0
    assert rows[9000] == ("new", 1)
    assert snap.count() == 5001


def test_mor_upsert_tie_goes_to_incoming(table):
    inc = table.spark.createDataFrame(
        [(14, 0, "tie14")], "id long, grp long, val string"
    )  # stored grp for id=14 is 14%7=0: a precombine tie
    table.upsert(inc, mode="mor")
    assert table.snapshot().where("id = 14").collect()[0].val \
        == "tie14"
    assert table.snapshot().count() == 5000


def test_mor_upsert_all_losers_is_noop(table):
    v = table.latest_version()
    inc = table.spark.createDataFrame(
        [(5, -10, "stale")], "id long, grp long, val string"
    )
    assert table.upsert(inc) == v


def test_mor_upsert_cdf_changes(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 3).alias("grp"),
        F.lit("x").alias("val"),
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "mc"), df, key="id",
        precombine="grp", enable_cdf=True,
    )
    v0 = t.latest_version()
    t.upsert(spark.createDataFrame(
        [(1, 99, "u1"), (500, 1, "n500")],
        "id long, grp long, val string",
    ))
    ch = t.table_changes(v0 + 1, t.latest_version())
    got = sorted((r.id, r._change_type) for r in ch.collect())
    assert got == [
        (1, "update_postimage"), (1, "update_preimage"),
        (500, "insert"),
    ]


def test_mor_upsert_txn_idempotent(table):
    inc = table.spark.createDataFrame(
        [(3, 99, "once")], "id long, grp long, val string"
    )
    v1 = table.upsert(inc, txn=("app", 7))
    # replayed batch: same txn version -> no new commit
    assert table.upsert(inc, txn=("app", 7)) == v1
    assert table.snapshot().where("id = 3").count() == 1


def test_stream_source_masks_dv_readds(spark, tmp_path):
    """A DV re-add commit streamed through the log source must emit
    the file's LIVE rows only — not the DV-dead positions."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        _DeltaStreamReader,
    )

    df = spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "s"), df, key="id", precombine="grp"
    )
    v0 = t.latest_version()
    t.delete_where(F.col("id").isin([1, 2]))  # MOR re-add
    v1 = t.latest_version()
    r = _DeltaStreamReader(
        t.path, t.snapshot().schema, {}
    )
    got = []
    dv_adds = []
    for p in r.partitions({"version": v0}, {"version": v1}):
        if p.value[2] is not None:
            dv_adds.append(p.value)
        got.extend(r.read(p))
    assert dv_adds, "delete commit should re-add with a DV"
    ids = sorted(row[0] for row in got)
    # the batch re-emits only the touched file's LIVE rows: its
    # physical rows minus the DV cardinality, never ids 1/2
    assert 1 not in ids and 2 not in ids
    phys = 0
    for rel, _pv, dv in dv_adds:
        import pyarrow.parquet as pq

        phys += pq.ParquetFile(
            os.path.join(t.path, rel)
        ).metadata.num_rows
    assert len(ids) == phys - 2


def test_dv_upgrade_preserves_implied_legacy_features(spark, tmp_path):
    """The DV protocol upgrade to reader 3 / writer 7 must carry the
    feature set IMPLIED by the table's previous legacy
    minWriterVersion — a v5 column-mapping table whose upgraded
    explicit writerFeatures dropped columnMapping would be
    spec-invalid (ADVICE r8: the upgrade used a stale inline map
    covering only mwv 2-4)."""
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "v5"),
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "id long, s string"),
        key="id", precombine="s",
    )
    with open(t._commit_file(t.latest_version() + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 5,
        }}) + "\n")
    t.delete_where(F.col("id") == 1, mode="mor")  # DV upgrade
    proto = None
    for i in range(t.latest_version() + 1):
        for ln in open(t._commit_file(i)):
            a = json.loads(ln)
            if "protocol" in a:
                proto = a["protocol"]
    assert proto["minWriterVersion"] == 7
    wf = set(proto["writerFeatures"])
    # v5 implies all of these (spec version->feature table)
    assert {"appendOnly", "invariants", "checkConstraints",
            "changeDataFeed", "generatedColumns", "columnMapping",
            "deletionVectors"} <= wf

    # a table ALREADY at v7 keeps its explicit list across the upgrade
    t2 = DeltaProtocolTable.create(
        spark, str(tmp_path / "v7"),
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "id long, s string"),
        key="id", precombine="s",
    )
    with open(t2._commit_file(t2.latest_version() + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "readerFeatures": [],
            "writerFeatures": ["appendOnly", "changeDataFeed"],
        }}) + "\n")
    t2.delete_where(F.col("id") == 2, mode="mor")
    proto2 = None
    for i in range(t2.latest_version() + 1):
        for ln in open(t2._commit_file(i)):
            a = json.loads(ln)
            if "protocol" in a:
                proto2 = a["protocol"]
    assert {"appendOnly", "changeDataFeed", "deletionVectors"} <= set(
        proto2["writerFeatures"]
    )
