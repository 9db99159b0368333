"""Iceberg format-version 3 deletion vectors (spec "Deletion Vectors"
+ Puffin blob type `deletion-vector-v1`).

DVs replace v2 position-delete parquet files: deleted positions for
ONE data file live as a roaring-bitmap blob inside a Puffin file,
addressed from the delete manifest via spec fields 143-145
(referenced_data_file / content_offset / content_size_in_bytes), at
most one live DV per data file, merged (old ∪ new) on re-delete. The
blob payload is the Delta-compatible layout (big-endian length frame,
magic D1 D3 39 64, 64-bit portable RoaringBitmapArray, big-endian
CRC-32) so a UniForm table can expose identical bytes to both
ecosystems."""

from __future__ import annotations

import os
import struct
import tempfile

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import IcebergTable
from fda_clinical_etl_pipeline_spark.sources.puffin import (
    DV_BLOB_TYPE,
    decode_dv_payload,
    encode_dv_payload,
    read_puffin,
)


def test_dv_payload_framing_and_delta_compat():
    from fda_clinical_etl_pipeline_spark.sources.delta_dv import (
        serialize_positions,
    )

    pos = [0, 5, 7, 100_000, (1 << 33) + 17]
    payload = encode_dv_payload(pos)
    assert decode_dv_payload(payload) == sorted(pos)
    # [4B BE length of (magic+vector)][magic D1 D3 39 64][vector][4B BE CRC]
    (flen,) = struct.unpack(">I", payload[:4])
    assert payload[4:8] == b"\xd1\xd3\x39\x64"
    assert len(payload) == 4 + flen + 4
    # (magic + vector) bytes are EXACTLY what the Delta DV writer
    # produces — magic appears ONCE (Delta's portable serialization
    # already starts with it; the v3 spec frame does NOT add another)
    assert payload[4:4 + flen] == serialize_positions(sorted(pos))
    assert payload[8:12] != b"\xd1\xd3\x39\x64"

    bad = bytearray(payload)
    bad[10] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_dv_payload(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        decode_dv_payload(payload[:4] + b"\x00\x00\x00\x00"
                          + payload[8:])
    with pytest.raises(ValueError, match="length|short"):
        decode_dv_payload(payload[:-6])


def _fresh(spark, n=100, mod=7):
    root = tempfile.mkdtemp(prefix="ice_dv_")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % mod).alias("grp")
    )
    return IcebergTable.create(spark, os.path.join(root, "t"), df)


def test_dv_delete_read_merge_and_purge(spark):
    t = _fresh(spark)
    sid1 = t.delete_where(F.col("k") % 10 == 0, mode="dv")
    live = sorted(r["k"] for r in t.snapshot().collect())
    assert live == [k for k in range(100) if k % 10 != 0]

    # format-version 3 stamped by the first DV commit
    assert t.metadata()["format-version"] == 3

    # manifest entries carry the spec's blob address fields and the
    # Puffin blobs carry the spec's properties
    snap = t._snapshot_by(t.metadata(), None)
    dvs = t._dv_entries_of_snapshot(snap)
    assert dvs and all(d["file_format"] == "PUFFIN" for d in dvs)
    for d in dvs:
        assert d["referenced_data_file"]
        assert d["content_offset"] > 0
        assert d["content_size_in_bytes"] > 0
        _props, blobs = read_puffin(d["file_path"])
        match = [
            (bm, payload) for bm, payload in blobs
            if bm["offset"] == d["content_offset"]
        ]
        assert len(match) == 1
        bm, payload = match[0]
        assert bm["type"] == DV_BLOB_TYPE
        assert bm["properties"]["referenced-data-file"] == \
            d["referenced_data_file"]
        assert int(bm["properties"]["cardinality"]) == \
            d["record_count"] == len(decode_dv_payload(payload))

    # merge rule: a second delete on the same files REPLACES each
    # file's DV with the union — still at most one live DV per file
    t.delete_where(F.col("k") % 10 == 1, mode="dv")
    live = sorted(r["k"] for r in t.snapshot().collect())
    assert live == [k for k in range(100) if k % 10 not in (0, 1)]
    dvs = t._dv_entries_of_snapshot(t._snapshot_by(t.metadata(), None))
    refs = [d["referenced_data_file"] for d in dvs]
    assert len(refs) == len(set(refs))

    # time travel: the first delete's snapshot still reads its DVs
    tt = sorted(
        r["k"] for r in t.snapshot(snapshot_id=sid1).collect()
    )
    assert tt == [k for k in range(100) if k % 10 != 0]

    # purge folds DVs into rewritten data files; answers unchanged
    t.purge_deletes()
    live = sorted(r["k"] for r in t.snapshot().collect())
    assert live == [k for k in range(100) if k % 10 not in (0, 1)]
    assert not t._dv_entries_of_snapshot(
        t._snapshot_by(t.metadata(), None)
    )


def test_dv_partial_manifest_rewrite_keeps_survivors(spark):
    """A re-delete touching SOME of a manifest's referenced files must
    rewrite that manifest with the untouched entries carried (same
    blob address) — not drop them, not duplicate them."""
    t = _fresh(spark, n=80, mod=4)
    # one commit -> one delete manifest holding a DV per touched file
    t.delete_where(F.col("k") % 20 == 0, mode="dv")
    snap = t._snapshot_by(t.metadata(), None)
    before = {
        d["referenced_data_file"]:
            (d["record_count"], d["file_path"], d["content_offset"])
        for d in t._dv_entries_of_snapshot(snap)
    }
    assert len(before) >= 2
    # pick rows 1,2 — they live in exactly one of the DV'd files
    t.delete_where(F.col("k").isin(1, 2), mode="dv")
    snap = t._snapshot_by(t.metadata(), None)
    after = {
        d["referenced_data_file"]:
            (d["record_count"], d["file_path"], d["content_offset"])
        for d in t._dv_entries_of_snapshot(snap)
    }
    assert set(after) == set(before)
    changed = {
        f for f in before if after[f] != before[f]
    }
    assert len(changed) == 1  # exactly the re-deleted file replaced
    (f,) = changed
    assert after[f][0] == before[f][0] + 2  # union of positions
    for g in before:
        if g != f:  # survivors carry their ORIGINAL blob address
            assert after[g] == before[g]
    live = sorted(r["k"] for r in t.snapshot().collect())
    assert live == [
        k for k in range(80) if k % 20 != 0 and k not in (1, 2)
    ]


def test_dv_changelog_attribution(spark):
    t = _fresh(spark, n=60, mod=3)
    s0 = t.metadata()["current-snapshot-id"]
    s1 = t.delete_where(F.col("k") < 5, mode="dv")
    s2 = t.delete_where(
        (F.col("k") >= 5) & (F.col("k") < 8), mode="dv"
    )
    rows = [
        (r["_change_type"], r["k"], r["_commit_snapshot_id"])
        for r in t.changelog_scan(s0, s2).collect()
    ]
    dels = sorted(k for ct, k, _ in rows if ct == "delete")
    assert dels == list(range(8))
    by_snap: dict = {}
    for ct, k, sid in rows:
        if ct == "delete":
            by_snap.setdefault(sid, []).append(k)
    # the s2 merge REPLACED s1's DVs, but only newly-dead rows may be
    # attributed to s2
    assert sorted(by_snap[s1]) == [0, 1, 2, 3, 4]
    assert sorted(by_snap[s2]) == [5, 6, 7]


def test_dv_puffin_never_orphaned(spark):
    t = _fresh(spark, n=40, mod=2)
    t.delete_where(F.col("k") % 4 == 0, mode="dv")
    dvs = t._dv_entries_of_snapshot(t._snapshot_by(t.metadata(), None))
    puffins = {d["file_path"] for d in dvs}
    removed = t.remove_orphan_files(older_than_s=0.0)
    assert all(os.path.isfile(p) for p in puffins), removed
    live = sorted(r["k"] for r in t.snapshot().collect())
    assert live == [k for k in range(40) if k % 4 != 0]


def test_dv_coexists_with_v2_deletes_and_upsert(spark):
    """A table can carry v2 position deletes AND v3 DVs; the reader
    applies both. Upsert's MOR path on a DV table still resolves."""
    t = _fresh(spark, n=50, mod=5)
    t.delete_where(F.col("k") < 3, mode="mor")   # v2 parquet deletes
    t.delete_where(F.col("k") >= 47, mode="dv")  # v3 DVs
    live = sorted(r["k"] for r in t.snapshot().collect())
    assert live == list(range(3, 47))
    incoming = spark.range(10, 13).select(
        F.col("id").alias("k"),
        F.lit(99).cast("long").alias("grp"),
        F.lit(2).cast("long").alias("ver"),
    )
    base_ver = t.snapshot().withColumn(
        "ver", F.lit(1).cast("long")
    )
    # upsert needs the ver column in the table: evolve by rewriting
    # is out of scope here — instead verify upsert on a fresh table
    # that ALREADY carries DVs and a ver column
    root = tempfile.mkdtemp(prefix="ice_dv_up_")
    t2 = IcebergTable.create(
        spark, os.path.join(root, "t"), base_ver
    )
    t2.delete_where(F.col("k") >= 45, mode="dv")
    t2.upsert(incoming, key="k", precombine="ver")
    live = {r["k"]: r["grp"] for r in t2.snapshot().collect()}
    assert set(live) == set(range(3, 45))
    assert all(live[k] == 99 for k in (10, 11, 12))
