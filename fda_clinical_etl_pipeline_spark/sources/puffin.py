"""Puffin statistics files for the Iceberg twin (public puffin-spec).

Puffin is the Iceberg spec's container for table statistics blobs:

    file   := Magic Blob* Footer
    Footer := Magic FooterPayload FooterPayloadSize(4, LE)
              Flags(4) Magic
    Magic  := 0x50 0x46 0x41 0x31  ("PFA1")

FooterPayload is the FileMetadata JSON: a ``blobs`` list (each entry
carrying type, field ids, snapshot-id, sequence-number, offset, length
and a properties map) plus file-level properties. Table metadata then
references the file from its ``statistics`` list, which is what engines
(e.g. Trino's cost-based optimizer) read to find per-column NDV.

The blob type written here is ``apache-datasketches-theta-v1`` with the
spec's ``ndv`` property carrying the estimate — the property is what
query engines actually consume (they read NDV without deserializing the
sketch). The sketch payload follows the published DataSketches
compact-ordered theta layout (serial version 3: preamble, seed hash,
retained count, sorted 64-bit hashes, theta long in estimation mode)
over the library's murmur3-x64-128/seed-9001 hash family implemented
from the public algorithm. Byte-for-byte parity with the reference
library cannot be verified in this sandbox (no datasketches build to
compare against) — the from-spec reader in tests/ decodes the layout
independently, and the ``ndv`` properties are exact by construction.

Scale: sketch building is one Spark aggregation per column
(approx/exact distinct hashing — map-side partial, no row ever leaves
the executors except the bounded hash set, capped at k=4096 per
column); the Puffin write is driver-side KBs.
"""

from __future__ import annotations

import json
import os
import struct

PUFFIN_MAGIC = b"PFA1"
THETA_BLOB_TYPE = "apache-datasketches-theta-v1"
DEFAULT_K = 4096
_SEED = 9001
_MAX_HASH = (1 << 63) - 1  # theta hashes live in [0, 2^63)


# --------------------------------------------------- murmur3 x64-128
def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    k ^= k >> 33
    return k


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & 0xFFFFFFFFFFFFFFFF


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit variant (Appleby's public algorithm) —
    the hash family DataSketches theta sketches use (seed 9001)."""
    M = 0xFFFFFFFFFFFFFFFF
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    h1 = h2 = seed & M
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * c1) & M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * c2) & M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    for i in range(min(len(tail), 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    if len(tail) > 8:
        k2 = (k2 * c2) & M
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M
        h2 ^= k2
    if tail:
        k1 = (k1 * c1) & M
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2


def theta_hash(value) -> int:
    """Value → 63-bit theta hash: murmur3-x64-128 with seed 9001,
    first 64 bits, top bit cleared (the library's positive-hash rule).
    Longs hash their 8 little-endian bytes; strings their UTF-8
    bytes."""
    if isinstance(value, bool):
        raise TypeError("theta_hash: booleans are not hashed")
    if isinstance(value, int):
        data = struct.pack("<q", value)
    elif isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, bytes):
        data = value
    else:
        raise TypeError(f"theta_hash: unsupported {type(value)}")
    return murmur3_x64_128(data, _SEED)[0] >> 1


def _seed_hash(seed: int = _SEED) -> int:
    h = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if h == 0:
        raise ValueError("seed produces zero seed-hash")
    return h


# ------------------------------------------ theta compact sketches
def theta_sketch_bytes(hashes, k: int = DEFAULT_K) -> bytes:
    """Sorted-distinct 63-bit hashes → compact ordered theta sketch
    bytes (serial version 3). Exact mode while at most ``k`` hashes
    are retained (theta = 1, estimate = retained count — EXACT);
    beyond that the k smallest are retained under theta =
    hashes[k] / 2^63 (the KMV rule the estimation mode is built on)."""
    hs = sorted(set(int(h) for h in hashes))
    if any(h < 0 or h > _MAX_HASH for h in hs):
        raise ValueError("theta hashes must be 63-bit non-negative")
    seed_hash = _seed_hash()
    if not hs:
        # empty: preamble_longs=1, flags EMPTY|READ_ONLY|COMPACT|ORDERED
        return struct.pack("<BBBBBBH", 1, 3, 3, 0, 0, 0b11110,
                           seed_hash)
    if len(hs) <= k:
        theta = None
        retained = hs
    else:
        theta = hs[k]
        retained = hs[:k]
    pre_longs = 2 if theta is None else 3
    flags = 0b11010  # READ_ONLY | COMPACT | ORDERED
    out = bytearray()
    out += struct.pack("<BBBBBBH", pre_longs, 3, 3, 0, 0, flags,
                       seed_hash)
    out += struct.pack("<If", len(retained), 1.0)
    if theta is not None:
        out += struct.pack("<Q", theta)
    for h in retained:
        out += struct.pack("<Q", h)
    return bytes(out)


def theta_sketch_estimate(payload: bytes) -> float:
    """Compact theta sketch bytes → distinct estimate (exact count in
    exact mode; retained/theta otherwise)."""
    if len(payload) < 8:
        raise ValueError("theta sketch: truncated preamble")
    pre_longs, serial, family, _lgk, _lga, flags, seed_hash = (
        struct.unpack_from("<BBBBBBH", payload, 0)
    )
    if serial != 3 or family != 3:
        raise ValueError("theta sketch: not a serial-3 compact sketch")
    if seed_hash != _seed_hash():
        raise ValueError("theta sketch: wrong seed hash")
    if flags & 0b100:  # EMPTY
        return 0.0
    retained, _p = struct.unpack_from("<If", payload, 8)
    if pre_longs == 2:
        return float(retained)
    theta = struct.unpack_from("<Q", payload, 16)[0]
    return retained / (theta / float(1 << 63))


# ------------------------------------------------- puffin container
def write_puffin(path: str, blobs: list[dict],
                 properties: dict | None = None) -> dict:
    """Write a Puffin file. Each blob dict carries ``type``,
    ``fields`` (field-id list), ``snapshot-id``, ``sequence-number``,
    ``payload`` (bytes) and optional ``properties``. Returns the
    metadata the table's ``statistics`` entry needs: file size, footer
    size and the blob-metadata list (offsets resolved)."""
    blob_meta = []
    body = bytearray(PUFFIN_MAGIC)
    for b in blobs:
        payload = b["payload"]
        blob_meta.append({
            "type": b["type"],
            "fields": list(b["fields"]),
            "snapshot-id": b["snapshot-id"],
            "sequence-number": b["sequence-number"],
            "offset": len(body),
            "length": len(payload),
            **({"properties": b["properties"]}
               if b.get("properties") else {}),
        })
        body += payload
    footer_payload = json.dumps(
        {"blobs": blob_meta,
         "properties": {"created-by": "fda-clinical-etl-pipeline-spark",
                        **(properties or {})}},
        separators=(",", ":"),
    ).encode("utf-8")
    footer = (
        PUFFIN_MAGIC + footer_payload
        + struct.pack("<I", len(footer_payload))
        + b"\x00\x00\x00\x00"  # flags: footer payload uncompressed
        + PUFFIN_MAGIC
    )
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(body) + footer)
    return {
        "file-size-in-bytes": len(body) + len(footer),
        "file-footer-size-in-bytes": len(footer),
        "blob-metadata": blob_meta,
    }


def read_puffin(path: str) -> tuple[dict, list[tuple[dict, bytes]]]:
    """Read a Puffin file → (file properties, [(blob metadata,
    payload bytes)]). Validates both magics and the footer frame."""
    data = open(path, "rb").read()
    if data[:4] != PUFFIN_MAGIC or data[-4:] != PUFFIN_MAGIC:
        raise ValueError("puffin: bad magic")
    flags = struct.unpack_from("<I", data, len(data) - 8)[0]
    if flags & 1:
        raise ValueError("puffin: compressed footer not supported")
    payload_size = struct.unpack_from("<I", data, len(data) - 12)[0]
    payload_start = len(data) - 12 - payload_size
    if data[payload_start - 4:payload_start] != PUFFIN_MAGIC:
        raise ValueError("puffin: footer start magic missing")
    meta = json.loads(data[payload_start:payload_start + payload_size])
    out = []
    for bm in meta.get("blobs", []):
        off, length = bm["offset"], bm["length"]
        out.append((bm, data[off:off + length]))
    return meta.get("properties", {}), out


# --------------------------------------------------------------------------
# Iceberg v3 deletion vectors (spec "Deletion Vectors" + Puffin blob
# type `deletion-vector-v1`): deleted row positions for ONE data file,
# stored inside a Puffin file as the Delta-compatible layout so a
# UniForm table can expose the identical bytes to both ecosystems:
#
#   [4-byte big-endian length of (magic + vector)]
#   [magic 0x6439D3D1, stored little-endian: bytes D1 D3 39 64]
#   [64-bit RoaringBitmapArray, "portable" serialization — the exact
#    bytes delta_dv.serialize_positions produces]
#   [4-byte big-endian CRC-32 of (magic + vector)]
#
# Blob metadata MUST carry properties `referenced-data-file` (the data
# file the vector applies to) and `cardinality` (deleted-position
# count); one data file has AT MOST ONE live DV.

DV_BLOB_TYPE = "deletion-vector-v1"
_DV_MAGIC = struct.pack("<I", 1681511377)  # bytes D1 D3 39 64


def frame_dv_vector(vector: bytes) -> bytes:
    """Magic-prefixed RoaringBitmapArray bytes → `deletion-vector-v1`
    blob payload (length frame + CRC). Delta's portable serialization
    ALREADY starts with the magic (delta_dv.serialize_positions packs
    it as its first 4 bytes), and the v3 spec's (magic + vector) is
    defined to byte-equal exactly those bytes — so the input passes
    through VERBATIM, framed once: a UniForm sync lifts a Delta DV
    into an Iceberg blob without re-encoding (or re-prefixing) the
    bitmap."""
    import zlib

    if vector[:4] != _DV_MAGIC:
        raise ValueError("dv: vector bytes missing portable-format magic")
    return (
        struct.pack(">I", len(vector))
        + vector
        + struct.pack(">I", zlib.crc32(vector) & 0xFFFFFFFF)
    )


def encode_dv_payload(positions) -> bytes:
    """Sorted deleted positions (int64) → `deletion-vector-v1` blob
    payload bytes."""
    from .delta_dv import serialize_positions

    return frame_dv_vector(serialize_positions(sorted(positions)))


def decode_dv_payload(payload: bytes) -> list[int]:
    """`deletion-vector-v1` blob payload → sorted deleted positions.
    Verifies the length frame, magic and CRC-32."""
    from .delta_dv import deserialize_positions

    if len(payload) < 12:
        raise ValueError("dv: payload too short")
    (flen,) = struct.unpack(">I", payload[:4])
    framed = payload[4:4 + flen]
    if len(framed) != flen or len(payload) != 4 + flen + 4:
        raise ValueError("dv: length frame mismatch")
    if framed[:4] != _DV_MAGIC:
        raise ValueError("dv: bad magic")
    import zlib

    (crc,) = struct.unpack(">I", payload[4 + flen:])
    if zlib.crc32(framed) & 0xFFFFFFFF != crc:
        raise ValueError("dv: CRC-32 mismatch")
    # framed == Delta's magic-prefixed portable bytes, whole.
    return deserialize_positions(framed)
