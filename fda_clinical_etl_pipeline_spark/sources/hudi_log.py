"""Apache Hudi log-file format (HoodieLogFormat) — reader & writer.

Merge-on-read file groups accumulate changes in log files named
``.<fileId>_<baseCommitTime>.log.<version>_<writeToken>`` next to the
base parquet file. Each log file is a sequence of blocks in the public
HoodieLogFormat (format version 1, the layout of Hudi 0.14.x
``HoodieLogFormatWriter.writeBlock``), all multi-byte integers
big-endian (java.io.DataOutputStream):

    MAGIC                          6 bytes ``#HUDI#``
    block length                   int64 — bytes AFTER this field,
                                   including the trailing reverse ptr
    log format version             int32 (= 1)
    block type ordinal             int32 (COMMAND=0, DELETE=1,
                                   CORRUPT=2, AVRO_DATA=3, HFILE=4,
                                   PARQUET=5, CDC=6)
    header map                     int32 count, then per entry:
                                   int32 HeaderMetadataType ordinal
                                   (INSTANT_TIME=0, TARGET_INSTANT_TIME
                                   =1, SCHEMA=2, COMMAND_BLOCK_TYPE=3),
                                   int32 byte length, UTF-8 bytes
    content length                 int64
    content                        (block-type specific, below)
    footer map                     same shape as header (empty here)
    total block length             int64 — whole block incl. MAGIC,
                                   the reverse pointer tail reads use

AVRO_DATA content (``HoodieAvroDataBlock.serializeRecords``):
    int32 content version (= 3), int32 record count, then per record
    int32 byte length + the record in Avro binary encoding under the
    SCHEMA header's writer schema (meta columns included — the twin
    sets ``hoodie.populate.meta.fields=true``).

DELETE content (``HoodieDeleteBlock``):
    int32 content version (= 3), int32 byte length, then an Avro-binary
    ``HoodieDeleteRecordList`` record — array of (recordKey,
    partitionPath, orderingVal) triples. This twin's deletes are
    unconditional (``delete_where`` semantics), so orderingVal is null.

Everything here is driver/executor-agnostic pure bytes — the snapshot
read path parses log files inside ``mapInPandas`` workers, the writer
runs inside ``applyInPandas`` workers, and nothing touches a
SparkSession.
"""

from __future__ import annotations

import io
import json
import struct

from .avro_ocf import _decoder, _encoder

MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1
CONTENT_VERSION = 3

# HoodieLogBlockType ordinals
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3
CDC_DATA_BLOCK = 6  # HFILE=4, PARQUET=5 unimplemented (twin scope)

# HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3

DELETE_RECORD_LIST_SCHEMA = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "HoodieDeleteRecord",
                    "fields": [
                        {"name": "recordKey",
                         "type": ["null", "string"], "default": None},
                        {"name": "partitionPath",
                         "type": ["null", "string"], "default": None},
                        {"name": "orderingVal",
                         "type": ["null", "string"], "default": None},
                    ],
                },
            },
        }
    ],
}


# Change-data-capture record schemas (Hudi RFC-51 / 0.13+,
# ``hoodie.table.cdc.supplemental.logging.mode``): OP_KEY_ONLY logs just
# the operation + record key (images derived at read time by merging
# file-slice states — the MOR mode, since a MOR write never reads the
# base file it would need for a before-image); DATA_BEFORE_AFTER logs
# debezium-shaped full row images as JSON strings (the COW mode — the
# rewrite has both images in hand).
CDC_OP_KEY_ONLY = "op_key_only"
CDC_DATA_BEFORE_AFTER = "data_before_after"

CDC_OP_KEY_SCHEMA = {
    "type": "record",
    "name": "Record",
    "namespace": "org.apache.hudi.cdc",
    "fields": [
        {"name": "op", "type": ["null", "string"], "default": None},
        {"name": "recordKey", "type": ["null", "string"], "default": None},
    ],
}

CDC_BEFORE_AFTER_SCHEMA = {
    "type": "record",
    "name": "Record",
    "namespace": "org.apache.hudi.cdc",
    "fields": [
        {"name": "op", "type": ["null", "string"], "default": None},
        {"name": "ts_ms", "type": ["null", "string"], "default": None},
        {"name": "before", "type": ["null", "string"], "default": None},
        {"name": "after", "type": ["null", "string"], "default": None},
    ],
}

CDC_SCHEMAS = {
    CDC_OP_KEY_ONLY: CDC_OP_KEY_SCHEMA,
    CDC_DATA_BEFORE_AFTER: CDC_BEFORE_AFTER_SCHEMA,
}


def cdc_block(changes: list[dict], instant: str, mode: str) -> bytes:
    """One CDC block (``HoodieCDCDataBlock``): change records under the
    supplemental-logging-mode schema — op ``i``/``u``/``d`` plus either
    the record key (op_key_only) or JSON row images (data_before_after).
    Same content framing as AVRO_DATA; the writer schema travels in the
    SCHEMA header so readers never guess the mode."""
    schema = CDC_SCHEMAS[mode]
    field_names = [f["name"] for f in schema["fields"]]
    enc = _encoder(schema)
    content = bytearray()
    content += struct.pack(">i", CONTENT_VERSION)
    content += struct.pack(">i", len(changes))
    for ch in changes:
        body = bytearray()
        enc(body, {name: ch.get(name) for name in field_names})
        content += struct.pack(">i", len(body))
        content += body
    return _block_bytes(
        CDC_DATA_BLOCK,
        {H_INSTANT_TIME: instant,
         H_SCHEMA: json.dumps(schema, separators=(",", ":"))},
        bytes(content),
    )


def log_file_name(file_id: str, base_instant: str, version: int,
                  write_token: str = "0-0-0") -> str:
    """``.<fileId>_<baseCommitTime>.log.<version>_<writeToken>``."""
    return f".{file_id}_{base_instant}.log.{version}_{write_token}"


def _meta_map_bytes(entries: dict[int, str]) -> bytes:
    out = bytearray()
    out += struct.pack(">i", len(entries))
    for ordinal in sorted(entries):
        raw = entries[ordinal].encode("utf-8")
        out += struct.pack(">i", ordinal)
        out += struct.pack(">i", len(raw))
        out += raw
    return bytes(out)


def _read_meta_map(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out = {}
    for _ in range(n):
        ordinal, ln = struct.unpack(">ii", buf.read(8))
        out[ordinal] = buf.read(ln).decode("utf-8")
    return out


def _block_bytes(block_type: int, headers: dict[int, str],
                 content: bytes) -> bytes:
    header_bytes = _meta_map_bytes(headers)
    footer_bytes = _meta_map_bytes({})
    # block length = everything after the length field itself,
    # including the trailing total-length reverse pointer
    block_len = (
        4 + 4 + len(header_bytes) + 8 + len(content)
        + len(footer_bytes) + 8
    )
    out = bytearray()
    out += MAGIC
    out += struct.pack(">q", block_len)
    out += struct.pack(">i", LOG_FORMAT_VERSION)
    out += struct.pack(">i", block_type)
    out += header_bytes
    out += struct.pack(">q", len(content))
    out += content
    out += footer_bytes
    out += struct.pack(">q", len(MAGIC) + 8 + block_len)  # incl. MAGIC
    return bytes(out)


def data_block(records: list[dict], avro_schema: dict,
               instant: str) -> bytes:
    """One AVRO_DATA block: full rows (meta + data columns) under the
    writer schema, stamped with the deltacommit instant."""
    enc = _encoder(avro_schema)
    content = bytearray()
    content += struct.pack(">i", CONTENT_VERSION)
    content += struct.pack(">i", len(records))
    for rec in records:
        body = bytearray()
        enc(body, rec)
        content += struct.pack(">i", len(body))
        content += body
    return _block_bytes(
        AVRO_DATA_BLOCK,
        {H_INSTANT_TIME: instant,
         H_SCHEMA: json.dumps(avro_schema, separators=(",", ":"))},
        bytes(content),
    )


def delete_block(keys: list[str], partition_path: str,
                 instant: str) -> bytes:
    """One DELETE block: unconditional tombstones for ``keys``."""
    enc = _encoder(DELETE_RECORD_LIST_SCHEMA)
    body = bytearray()
    enc(body, {
        "deleteRecordList": [
            {"recordKey": k, "partitionPath": partition_path or None,
             "orderingVal": None}
            for k in keys
        ]
    })
    content = bytearray()
    content += struct.pack(">i", CONTENT_VERSION)
    content += struct.pack(">i", len(body))
    content += body
    return _block_bytes(
        DELETE_BLOCK, {H_INSTANT_TIME: instant}, bytes(content)
    )


def read_log_file(path: str) -> list[dict]:
    """Parse every block of a Hudi log file.

    Returns dicts: ``{"type": "data", "instant", "schema", "records"}``
    for AVRO_DATA blocks and ``{"type": "delete", "instant",
    "deletes": [{"recordKey", "partitionPath", "orderingVal"}]}`` for
    DELETE blocks. Unknown block types surface as ``{"type": "other",
    "block_type": n}`` so a reader never silently drops data it does
    not understand.
    """
    with open(path, "rb") as f:
        data = f.read()
    return parse_log_bytes(data)


def parse_log_bytes(data: bytes) -> list[dict]:
    blocks: list[dict] = []
    buf = io.BytesIO(data)
    while True:
        magic = buf.read(len(MAGIC))
        if not magic:
            break
        if magic != MAGIC:
            raise ValueError(
                f"bad log block magic {magic!r} at offset "
                f"{buf.tell() - len(magic)}"
            )
        (block_len,) = struct.unpack(">q", buf.read(8))
        block = buf.read(block_len)
        if len(block) != block_len:
            raise ValueError("truncated log block")
        bbuf = io.BytesIO(block)
        version, btype = struct.unpack(">ii", bbuf.read(8))
        if version != LOG_FORMAT_VERSION:
            raise ValueError(f"unsupported log format version {version}")
        headers = _read_meta_map(bbuf)
        (content_len,) = struct.unpack(">q", bbuf.read(8))
        content = bbuf.read(content_len)
        # footer + reverse pointer ignored on forward reads
        instant = headers.get(H_INSTANT_TIME)
        if btype == AVRO_DATA_BLOCK:
            schema = json.loads(headers[H_SCHEMA])
            blocks.append({
                "type": "data", "instant": instant, "schema": schema,
                "records": _decode_data_content(content, schema),
            })
        elif btype == DELETE_BLOCK:
            blocks.append({
                "type": "delete", "instant": instant,
                "deletes": _decode_delete_content(content),
            })
        elif btype == CDC_DATA_BLOCK:
            schema = json.loads(headers[H_SCHEMA])
            blocks.append({
                "type": "cdc", "instant": instant,
                "changes": _decode_data_content(content, schema),
            })
        else:
            blocks.append({"type": "other", "block_type": btype,
                           "instant": instant})
    return blocks


def _decode_data_content(content: bytes, schema: dict) -> list[dict]:
    dec = _decoder(schema)
    buf = io.BytesIO(content)
    version, count = struct.unpack(">ii", buf.read(8))
    if version != CONTENT_VERSION:
        raise ValueError(f"unsupported data block content v{version}")
    records = []
    for _ in range(count):
        (size,) = struct.unpack(">i", buf.read(4))
        records.append(dec(io.BytesIO(buf.read(size))))
    return records


def _decode_delete_content(content: bytes) -> list[dict]:
    dec = _decoder(DELETE_RECORD_LIST_SCHEMA)
    buf = io.BytesIO(content)
    version, size = struct.unpack(">ii", buf.read(8))
    if version != CONTENT_VERSION:
        raise ValueError(f"unsupported delete block content v{version}")
    return dec(io.BytesIO(buf.read(size)))["deleteRecordList"]


def merge_slice_rows(
    base_path: str | None,
    log_paths: list[str],
    names: list[str],
    precombine: str,
) -> dict[str, dict]:
    """Pure-Python merged view of ONE file slice (base parquet ∪ log
    rows): tombstones kill versions written STRICTLY BEFORE their
    instant (the single-instant MERGE composition — this commit's
    replacement rows stand), then one winner per record key by
    (precombine, commit time) — the same fold the COW write path and
    the Spark-side ``_merge_slices`` apply, shared here so the
    external batch reader and the changelog streaming source answer
    identically. Executor-importable: no SparkSession anywhere."""
    rows: list[dict] = []
    if base_path is not None:
        import pyarrow.parquet as pq

        table = pq.read_table(base_path)
        by_name = {
            c: table.column(c).to_pylist()
            for c in table.column_names
        }
        rows = [
            {
                name: (by_name[name][i] if name in by_name else None)
                for name in names
            }
            for i in range(table.num_rows)
        ]
    deletes: dict[str, str] = {}
    for lp in log_paths:
        for blk in read_log_file(lp):
            if blk["type"] == "data":
                for rec in blk["records"]:
                    rows.append({
                        name: rec.get(name) for name in names
                    })
            elif blk["type"] == "delete":
                for d in blk["deletes"]:
                    k = d["recordKey"]
                    if (k not in deletes
                            or blk["instant"] > deletes[k]):
                        deletes[k] = blk["instant"]
    best: dict[str, dict] = {}
    for r in rows:
        k = r["_hoodie_record_key"]
        ct = r["_hoodie_commit_time"]
        if k in deletes and ct < deletes[k]:
            continue
        cur = best.get(k)
        if cur is None or (
            r[precombine], ct
        ) > (cur[precombine], cur["_hoodie_commit_time"]):
            best[k] = r
    return best
