"""External-reader interop certification for the three format twins.

The tables claim "readable by any external reader". The readers this
sandbox would normally certify with (DuckDB's delta/iceberg
extensions, the deltalake / pyiceberg pip packages) are unavailable
(no network, extensions not baked in), so this file certifies the
claim with the strongest substitutes available:

- Avro manifest/manifest-list layers decode through the JVM
  **org.apache.avro reference library** (external, Apache-official,
  bundled with Spark) — NOT the package's own avro_ocf decoder. A
  writer bug the twin's own reader compensates for fails here.
- Parquet reads go through **pyarrow** directly.
- The Delta JSON log replays with **stdlib json**; checkpoint parquet
  through pyarrow.
- Deletion vectors decode with a **from-spec decoder implemented in
  this file** (Delta protocol: Z85 uuid codec, 1-byte-version DV file
  framing, RoaringBitmapArray portable 64-bit serialization) that
  imports nothing from the package.

The read paths below import NOTHING from
``fda_clinical_etl_pipeline_spark`` — the package is used only to
WRITE the tables under test. Spec deviations found by these readers
are bugs, not test debt.

Matrix (VERDICT r9 task 4): plain tables, deletion vectors, column
mapping, equality deletes (sequence rule), position deletes, Delta
checkpoint replay, hidden-partitioned Iceberg, Hudi COW file-slice
resolution.
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
import uuid as uuid_mod

import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


# =====================================================================
# independent from-spec decoders (no package imports)
# =====================================================================

# ZeroMQ Z85 alphabet (Delta spec: DV descriptors encode the uuid /
# inline bitmap in Base85 using the Z85 character set)
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_VAL = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_decode_ext(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i:i + 5]:
            acc = acc * 85 + _Z85_VAL[c]
        out += acc.to_bytes(4, "big")
    return bytes(out)


def roaring64_decode_ext(data: bytes) -> list[int]:
    """RoaringBitmapArray 'portable' 64-bit format (the DV payload
    delta-spark writes): <i magic=1681511377, <q bucket count, then
    per bucket <i high-32 key + one portable 32-bit roaring bitmap
    (cookie 12346 = no run containers; array containers <= 4096
    entries of uint16, else 8 KiB bitset)."""
    magic, n_hi = struct.unpack_from("<iq", data, 0)
    if magic != 1681511377:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    at = 12
    out: list[int] = []
    for _ in range(n_hi):
        hi = struct.unpack_from("<i", data, at)[0]
        at += 4
        start = at
        cookie = struct.unpack_from("<I", data, at)[0]
        if cookie != 12346:
            raise ValueError(f"unsupported roaring cookie {cookie}")
        n_cont = struct.unpack_from("<I", data, at + 4)[0]
        at += 8
        heads = []
        for _ in range(n_cont):
            key, cm1 = struct.unpack_from("<HH", data, at)
            heads.append((key, cm1 + 1))
            at += 4
        offs = []
        for _ in range(n_cont):
            offs.append(struct.unpack_from("<I", data, at)[0])
            at += 4
        end = at
        for (key, card), off in zip(heads, offs):
            p = start + off
            if card <= 4096:
                lows = struct.unpack_from(f"<{card}H", data, p)
                p += 2 * card
            else:
                bits = data[p:p + 8192]
                p += 8192
                lows = [
                    (bi << 3) | b
                    for bi, byte in enumerate(bits) if byte
                    for b in range(8) if byte & (1 << b)
                ]
            out.extend(
                (hi << 32) | (key << 16) | lo for lo in lows
            )
            end = max(end, p)
        at = end
    return sorted(out)


def dv_positions_ext(table_path: str, desc: dict) -> list[int]:
    """Resolve a deletionVector descriptor to dead row positions —
    storageType 'u' (uuid file under the table, optional path
    prefix) and 'i' (inline) per the Delta protocol."""
    st = desc["storageType"]
    if st == "i":
        data = z85_decode_ext(desc["pathOrInlineDv"])
        data = data[: desc["sizeInBytes"]]
        return roaring64_decode_ext(data)
    if st != "u":
        raise ValueError(f"unsupported DV storageType {st!r}")
    enc = desc["pathOrInlineDv"]
    prefix, enc_uuid = enc[:-20], enc[-20:]
    dv_uuid = uuid_mod.UUID(bytes=z85_decode_ext(enc_uuid))
    fp = os.path.join(
        table_path, prefix, f"deletion_vector_{dv_uuid}.bin"
    ) if prefix else os.path.join(
        table_path, f"deletion_vector_{dv_uuid}.bin"
    )
    with open(fp, "rb") as f:
        blob = f.read()
    if blob[0] != 1:
        raise ValueError(f"unknown DV file version {blob[0]}")
    off = desc["offset"]
    (size,) = struct.unpack_from(">i", blob, off)
    data = blob[off + 4: off + 4 + size]
    if size != desc["sizeInBytes"]:
        raise ValueError("descriptor sizeInBytes != framed size")
    import zlib

    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    if crc != zlib.crc32(data):
        raise ValueError("DV payload CRC mismatch")
    return roaring64_decode_ext(data)


# ------------------------------------------------ JVM Avro (external)
def _j2py(v):
    """GenericRecord / Utf8 / GenericArray / java.util.Map → Python."""
    if v is None or isinstance(v, (int, float, bool, str, bytes)):
        return v
    cls = v.getClass().getName()
    if cls == "org.apache.avro.util.Utf8":
        return v.toString()
    if cls.startswith("org.apache.avro.generic.GenericData$Record"):
        out = {}
        for f in v.getSchema().getFields():
            out[f.name()] = _j2py(v.get(f.name()))
        return out
    if cls.startswith("org.apache.avro.generic.GenericData$Array") or \
            cls.endswith("ArrayList"):
        return [_j2py(x) for x in v]
    if cls.startswith("java.nio.Heap"):  # ByteBuffer (bounds bytes)
        n = v.remaining()
        arr = bytearray(n)
        for i in range(n):
            arr[i] = v.get(v.position() + i) & 0xFF
        return bytes(arr)
    if cls.endswith("HashMap") or cls.endswith("Utf8Map"):
        out = {}
        it = v.entrySet().iterator()
        while it.hasNext():
            e = it.next()
            out[_j2py(e.getKey())] = _j2py(e.getValue())
        return out
    return v


def jvm_avro_rows(spark, path: str) -> list[dict]:
    """Decode an Avro OCF through org.apache.avro's DataFileReader —
    the Apache reference implementation, external to the package."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    out = []
    while reader.hasNext():
        out.append(_j2py(reader.next()))
    reader.close()
    return out


# ------------------------------------------- external Iceberg reader
def read_iceberg_external(spark, path: str) -> pd.DataFrame:
    """Spec-literal Iceberg v2 read: version-hint → metadata JSON →
    manifest list (JVM Avro) → manifests (JVM Avro) → pyarrow parquet
    resolved by PARQUET FIELD ID (the spec's column resolution — name
    changes never matter), position deletes anti-joined on
    (file, pos), equality deletes applied under the sequence rule
    (a delete at seq s kills data rows of files with seq < s)."""
    hint = os.path.join(path, "metadata", "version-hint.text")
    v = int(open(hint).read().strip())
    meta = json.load(open(os.path.join(
        path, "metadata", f"v{v}.metadata.json"
    )))
    sid = meta["current-snapshot-id"]
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == sid
    )
    fields = meta["schemas"][meta["current-schema-id"]]["fields"]
    # spec Column Projection: parquet columns without field ids
    # resolve through schema.name-mapping.default (how UniForm views
    # over Delta/Hudi-written parquet stay readable)
    name_map = {}
    nm = meta.get("properties", {}).get("schema.name-mapping.default")
    if nm:
        for entry in json.loads(nm):
            for n in entry["names"]:
                name_map[n] = entry["field-id"]

    data, pos_del, eq_del = [], [], []
    for m in jvm_avro_rows(spark, snap["manifest-list"]):
        for e in jvm_avro_rows(spark, m["manifest_path"]):
            if e["status"] == 2:
                continue
            seq = e.get("sequence_number")
            if seq is None:  # inherit from the manifest (spec rule)
                seq = m["sequence_number"]
            df_ = e["data_file"]
            content = df_.get("content") or 0
            if content == 0:
                data.append((df_, seq))
            elif content == 1:
                pos_del.append(df_["file_path"])
            else:
                eq_del.append((df_, seq))

    def read_by_field_id(fp: str) -> pd.DataFrame:
        t = pq.read_table(fp)
        by_id = {}
        for i, f in enumerate(t.schema):
            md = f.metadata or {}
            fid = md.get(b"PARQUET:field_id")
            if fid is not None:
                by_id[int(fid)] = i
            elif f.name in name_map:  # name-mapping fallback
                by_id[name_map[f.name]] = i
        cols = {}
        for f in fields:
            i = by_id.get(f["id"])
            cols[f["name"]] = (
                t.column(i).to_pandas() if i is not None
                else pd.Series([None] * len(t))
            )
        out = pd.DataFrame(cols)
        out["__fname"] = os.path.basename(fp)
        out["__pos"] = range(len(out))
        return out

    if not data:
        return pd.DataFrame(
            {f["name"]: pd.Series(dtype=object) for f in fields}
        )
    frames = []
    for df_, seq in data:
        pdf = read_by_field_id(df_["file_path"])
        pdf["__seq"] = seq
        frames.append(pdf)
    all_rows = pd.concat(frames, ignore_index=True)

    if pos_del:
        dels = pd.concat(
            [pq.read_table(p).to_pandas() for p in pos_del],
            ignore_index=True,
        )
        dels["__fname"] = dels["file_path"].map(os.path.basename)
        dead = set(zip(dels["__fname"], dels["pos"]))
        mask = [
            (f, p) not in dead
            for f, p in zip(all_rows["__fname"], all_rows["__pos"])
        ]
        all_rows = all_rows[mask]

    id2name = {f["id"]: f["name"] for f in fields}
    for df_, dseq in eq_del:
        cols = [id2name[i] for i in df_["equality_ids"]]
        vals = pq.read_table(df_["file_path"]).to_pandas()
        victims = set(
            map(tuple, vals[cols].itertuples(index=False))
        )
        keep = []
        for _, row in all_rows.iterrows():
            if row["__seq"] < dseq and tuple(
                row[c] for c in cols
            ) in victims:
                keep.append(False)
            else:
                keep.append(True)
        all_rows = all_rows[keep]

    return all_rows.drop(
        columns=["__fname", "__pos", "__seq"]
    ).reset_index(drop=True)


# --------------------------------------------- external Delta reader
def read_delta_external(path: str) -> pd.DataFrame:
    """Spec-literal Delta read: replay newest checkpoint parquet (if
    any) + JSON commits after it, resolve column-mapping physical
    names from schemaString metadata, reconstruct partition columns
    from add.partitionValues (the spec's source of truth — NOT the
    directory names), and drop DV-dead positions via the from-spec
    decoder above."""
    log_dir = os.path.join(path, "_delta_log")
    versions = sorted(
        int(fn[:20]) for fn in os.listdir(log_dir)
        if fn.endswith(".json") and fn[:20].isdigit()
    )
    cps = sorted(
        int(fn[:20]) for fn in os.listdir(log_dir)
        if fn.endswith(".checkpoint.parquet") and fn[:20].isdigit()
    )
    actions: list[dict] = []
    start = 0
    if cps:
        cp = cps[-1]
        cpt = pq.read_table(os.path.join(
            log_dir, f"{cp:020d}.checkpoint.parquet"
        )).to_pandas()
        for _, r in cpt.iterrows():
            for kind in ("metaData", "protocol", "add", "remove"):
                v = r.get(kind)
                if v is not None and not (
                    isinstance(v, float) and pd.isna(v)
                ):
                    actions.append({kind: json.loads(v) if
                                    isinstance(v, str) else v})
        start = cp + 1
    for v in versions:
        if v < start:
            continue
        with open(os.path.join(log_dir, f"{v:020d}.json")) as f:
            actions += [json.loads(ln) for ln in f if ln.strip()]

    meta: dict = {}
    active: dict[str, dict] = {}
    for a in actions:
        if "metaData" in a:
            meta = a["metaData"]
        elif "add" in a:
            active[a["add"]["path"]] = a["add"]
        elif "remove" in a:
            active.pop(a["remove"]["path"], None)

    schema = json.loads(meta["schemaString"])
    pc = meta.get("partitionColumns")  # numpy array via checkpoint
    part_cols = [] if pc is None else list(pc)

    def phys(fld: dict) -> str:
        return fld.get("metadata", {}).get(
            "delta.columnMapping.physicalName", fld["name"]
        )

    frames = []
    for rel in sorted(active):
        add = active[rel]
        fp = rel if os.path.isabs(rel) else os.path.join(path, rel)
        t = pq.read_table(fp)
        cols = {}
        for fld in schema["fields"]:
            name = fld["name"]
            if name in part_cols:
                raw = (add.get("partitionValues") or {}).get(
                    phys(fld)
                )
                if raw is None:
                    raw = (add.get("partitionValues") or {}).get(name)
                typ = fld["type"]
                val = (
                    None if raw is None
                    else int(raw) if typ in ("long", "integer",
                                             "short", "byte")
                    else float(raw) if typ == "double"
                    else raw
                )
                cols[name] = pd.Series([val] * len(t))
                continue
            p = phys(fld)
            cols[name] = (
                t.column(p).to_pandas()
                if p in t.schema.names
                else pd.Series([None] * len(t))
            )
        pdf = pd.DataFrame(cols)
        dv = add.get("deletionVector")
        if dv is not None:
            dead = set(dv_positions_ext(path, dv))
            if len(dead) != dv["cardinality"]:
                raise ValueError("DV cardinality mismatch")
            pdf = pdf[[i not in dead for i in range(len(pdf))]]
        frames.append(pdf)
    if not frames:
        return pd.DataFrame(
            {f["name"]: pd.Series(dtype=object)
             for f in schema["fields"]}
        )
    return pd.concat(frames, ignore_index=True)


# ---------------------------------------------- external Hudi reader
def read_hudi_cow_external(path: str) -> pd.DataFrame:
    """Spec-literal Hudi COW snapshot: completed instants from the
    .hoodie timeline listing, base files named
    ``{fileId}_{writeToken}_{instant}.parquet``, newest COMPLETED
    instant per (partition dir, fileId) wins."""
    hoodie = os.path.join(path, ".hoodie")
    done = {
        fn.rsplit(".", 1)[0]
        for fn in os.listdir(hoodie)
        if fn.endswith((".commit", ".replacecommit"))
    }
    best: dict[tuple[str, str], tuple[str, str]] = {}
    for root, dirs, files in os.walk(path):
        if ".hoodie" in root:
            continue
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        for fn in files:
            if not fn.endswith(".parquet") or fn.startswith("."):
                continue
            fid, _tok, inst = fn[: -len(".parquet")].rsplit("_", 2)
            if inst not in done:
                continue
            key = (os.path.relpath(root, path), fid)
            if key not in best or inst > best[key][0]:
                best[key] = (inst, os.path.join(root, fn))
    frames = [
        pq.read_table(fp).to_pandas()
        for _inst, fp in sorted(best.values())
    ]
    return pd.concat(frames, ignore_index=True)


# =====================================================================
# the tests (package code WRITES, external code READS)
# =====================================================================

SCHEMA = "k long, bal double, seg string"


def _mk_rows(n=120):
    return [(i, float(i), "a" if i % 2 == 0 else "b")
            for i in range(n)]


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(
        tuple(None if pd.isna(v) else v for v in row)
        for row in pdf[cols].itertuples(index=False)
    )


def _canon_spark(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_delta_external_plain_and_checkpoint(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"),
        spark.createDataFrame(_mk_rows(), SCHEMA)
        .repartitionByRange(3, "k"),
    )
    t.append(spark.createDataFrame([(500, 5.0, "z")], SCHEMA))
    assert _canon(read_delta_external(str(tmp_path / "d"))) == (
        _canon_spark(t.snapshot())
    )
    # checkpoint replay: external readers must start from it
    t.checkpoint()
    t.append(spark.createDataFrame([(501, 5.1, "z")], SCHEMA))
    assert _canon(read_delta_external(str(tmp_path / "d"))) == (
        _canon_spark(t.snapshot())
    )


def test_delta_external_deletion_vectors(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"),
        spark.createDataFrame(_mk_rows(), SCHEMA)
        .repartitionByRange(3, "k"),
    )
    t.delete_where(F.col("k") % 7 == 0, mode="mor")
    t.delete_where(F.col("k") % 11 == 0, mode="mor")  # DV union
    got = read_delta_external(str(tmp_path / "d"))
    assert _canon(got) == _canon_spark(t.snapshot())
    assert len(got) == sum(
        1 for i in range(120) if i % 7 != 0 and i % 11 != 0
    )


def test_delta_external_column_mapping_and_partitions(
    spark, tmp_path
):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"),
        spark.createDataFrame(_mk_rows(), SCHEMA),
        partition_by=["seg"],
    )
    t.rename_column("bal", "balance")  # enables column mapping
    t.append(spark.createDataFrame(
        [(900, 9.0, "c")], "k long, balance double, seg string"
    ))
    got = read_delta_external(str(tmp_path / "d"))
    assert list(sorted(got.columns)) == ["balance", "k", "seg"]
    assert _canon(got) == _canon_spark(t.snapshot())


def test_iceberg_external_plain(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(_mk_rows(), SCHEMA)
        .repartitionByRange(3, "k"),
    )
    t.append(spark.createDataFrame([(500, 5.0, "z")], SCHEMA))
    got = read_iceberg_external(spark, str(tmp_path / "i"))
    assert _canon(got) == _canon_spark(t.snapshot())


def test_iceberg_external_position_deletes(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(_mk_rows(), SCHEMA)
        .repartitionByRange(3, "k"),
    )
    t.delete_where(F.col("k") % 7 == 0, mode="mor")
    got = read_iceberg_external(spark, str(tmp_path / "i"))
    assert _canon(got) == _canon_spark(t.snapshot())
    assert len(got) == sum(1 for i in range(120) if i % 7 != 0)


def test_iceberg_external_equality_deletes_sequence_rule(
    spark, tmp_path
):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(_mk_rows(), SCHEMA),
    )
    t.equality_delete(
        spark.createDataFrame([(5,), (7,)], "k long"), ["k"]
    )
    # re-insert k=5 AFTER the delete: the sequence rule must keep it
    t.append(spark.createDataFrame([(5, 55.0, "x")], SCHEMA))
    got = read_iceberg_external(spark, str(tmp_path / "i"))
    assert _canon(got) == _canon_spark(t.snapshot())
    ks = sorted(got["k"])
    assert 7 not in ks and ks.count(5) == 1
    assert got[got["k"] == 5]["bal"].iloc[0] == 55.0


def test_iceberg_external_rename_resolves_by_field_id(
    spark, tmp_path
):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(_mk_rows(), SCHEMA),
    )
    t.rename_column("bal", "balance")
    t.append(spark.createDataFrame(
        [(900, 9.0, "c")], "k long, balance double, seg string"
    ))
    # files written pre-rename still serve the renamed column: the
    # external reader resolves by parquet field id, never by name
    got = read_iceberg_external(spark, str(tmp_path / "i"))
    assert _canon(got) == _canon_spark(t.snapshot())
    assert got["balance"].notna().all()


def test_iceberg_external_hidden_partitioned(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(_mk_rows(), SCHEMA),
        partition_by=["bucket(4, k)"],
    )
    got = read_iceberg_external(spark, str(tmp_path / "i"))
    assert _canon(got) == _canon_spark(t.snapshot())


def test_hudi_external_cow(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    h = HudiTable.create(
        spark, str(tmp_path / "h"), "ext_tbl", "k", "ver",
        partition_field="seg",
    )
    rows = [(i, 1, float(i), "a" if i % 2 == 0 else "b")
            for i in range(100)]
    h.upsert(spark.createDataFrame(
        rows, "k int, ver int, bal double, seg string"
    ), instant="20240101000000000")
    h.upsert(spark.createDataFrame(
        [(0, 2, 999.0, "a")],
        "k int, ver int, bal double, seg string",
    ), instant="20240102000000000")
    got = read_hudi_cow_external(str(tmp_path / "h"))
    data_cols = ["k", "ver", "bal", "seg"]
    assert _canon(got[data_cols]) == _canon_spark(
        h.snapshot().select(*data_cols)
    )
    assert got[got["k"] == 0]["ver"].iloc[0] == 2


def test_uniform_views_readable_externally(spark, tmp_path):
    """Both uniform directions through EXTERNAL readers: the Iceberg
    view of a Delta table reads with the external Iceberg reader
    (position deletes included), and the reverse Delta view of a
    native Iceberg table reads with the external Delta reader (DVs
    included) — certifying the interop claim end-to-end, not just
    against the package's own readers."""
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform, sync_iceberg_uniform,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"),
        spark.createDataFrame(_mk_rows(), SCHEMA)
        .repartitionByRange(3, "k"),
    )
    t.delete_where(F.col("k") % 9 == 0, mode="mor")
    sync_iceberg_uniform(spark, str(tmp_path / "d"))
    expected = _canon_spark(t.snapshot())
    got_ice = read_iceberg_external(
        spark, str(tmp_path / "d" / "_iceberg")
    )
    assert _canon(got_ice) == expected

    ice = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(_mk_rows(), SCHEMA)
        .repartitionByRange(3, "k"),
    )
    ice.delete_where(F.col("k") % 9 == 0, mode="mor")
    sync_delta_uniform(spark, str(tmp_path / "i"))
    got_delta = read_delta_external(str(tmp_path / "i" / "_delta"))
    assert _canon(got_delta) == _canon_spark(ice.snapshot())


def test_hudi_uniform_view_readable_externally(spark, tmp_path):
    """Hudi -> Iceberg uniform view through the EXTERNAL reader:
    Hudi base files carry no parquet field ids, so the view's
    schema.name-mapping.default is what makes a spec-literal reader
    resolve them (hoodie meta columns simply never map)."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_iceberg_uniform_hudi,
    )

    h = HudiTable.create(
        spark, str(tmp_path / "h"), "extu_tbl", "k", "ver",
    )
    h.upsert(spark.createDataFrame(
        [(i, 1, float(i)) for i in range(80)],
        "k int, ver int, bal double",
    ), instant="20240101000000000")
    h.upsert(spark.createDataFrame(
        [(0, 2, 999.0)], "k int, ver int, bal double",
    ), instant="20240102000000000")
    ice = sync_iceberg_uniform_hudi(spark, str(tmp_path / "h"))
    got = read_iceberg_external(spark, str(tmp_path / "h" / "_iceberg"))
    assert _canon(got) == _canon_spark(
        ice.snapshot().select(*sorted(got.columns))
    )
    assert got[got["k"] == 0]["ver"].iloc[0] == 2


def test_uniform_sync_cli_reverse(spark, tmp_path):
    """CLI verb smoke: iceberg source routes to the reverse sync."""
    import json as _json

    from fda_clinical_etl_pipeline_spark.__main__ import main
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame(_mk_rows(40), SCHEMA),
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["uniform-sync", str(tmp_path / "i")])
    assert rc == 0
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["src_format"] == "iceberg" and out["rows"] == 40
    got = read_delta_external(out["delta"])
    assert len(got) == 40


def test_iceberg_external_row_lineage(spark, tmp_path):
    """v3 Row Lineage derived by an EXTERNAL reader from spec
    constructs only: manifest field 142 (first_row_id) via the JVM
    Avro reference decoder, materialized lineage columns resolved by
    their RESERVED parquet field ids (2147483540 / 2147483539), and
    the spec inheritance rule _row_id = first_row_id + position /
    _lusn = the file's data sequence number. Must equal the engine's
    snapshot_lineage() exactly."""
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartition(1).sortWithinPartitions("k"),
    )
    t.enable_row_lineage()
    t.append(spark.range(20, 30).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).repartition(1).sortWithinPartitions("k"))
    t.upsert(
        spark.createDataFrame([(22, 999.0), (400, 1.0)],
                              "k long, v double"),
        key="k", precombine="v", mode="cow",
    )

    hint = os.path.join(str(tmp_path / "i"), "metadata",
                        "version-hint.text")
    v = int(open(hint).read().strip())
    meta = json.load(open(os.path.join(
        str(tmp_path / "i"), "metadata", f"v{v}.metadata.json"
    )))
    assert meta["format-version"] == 3
    assert "next-row-id" in meta
    sid = meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == sid)
    assert "first-row-id" in snap

    rows = []
    for m in jvm_avro_rows(spark, snap["manifest-list"]):
        if m.get("content", 0) != 0:
            continue
        for e in jvm_avro_rows(spark, m["manifest_path"]):
            if e["status"] == 2:
                continue
            d = e["data_file"]
            seq = e.get("sequence_number") or m["sequence_number"]
            first = d.get("first_row_id")
            tbl = pq.read_table(d["file_path"])
            by_fid = {}
            for i, f in enumerate(tbl.schema):
                fid = (f.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_fid[int(fid)] = i
            n = len(tbl)
            ks = tbl.column(by_fid[1]).to_pylist()  # k is field 1
            mat_rid = (
                tbl.column(by_fid[2147483540]).to_pylist()
                if 2147483540 in by_fid else [None] * n
            )
            mat_lusn = (
                tbl.column(by_fid[2147483539]).to_pylist()
                if 2147483539 in by_fid else [None] * n
            )
            for pos in range(n):
                rid = mat_rid[pos]
                if rid is None and first is not None:
                    rid = first + pos
                lusn = mat_lusn[pos]
                if lusn is None:
                    lusn = seq
                rows.append((ks[pos], rid, lusn))

    expected = sorted(
        (r["k"], r["_row_id"],
         r["_last_updated_sequence_number"])
        for r in t.snapshot_lineage().collect()
    )
    assert sorted(rows, key=lambda x: (x[0],)) == expected
