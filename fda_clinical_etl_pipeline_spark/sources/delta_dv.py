"""Delta deletion vectors — the protocol's merge-on-read row markers
(delta-io PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Format"):

- positions of deleted rows are stored as a 64-bit **RoaringBitmapArray**
  in its *portable* serialization: int32-LE magic ``1681511377``,
  int64-LE number of 32-bit bitmaps, then per bitmap an int32-LE key
  (the position's high 32 bits) followed by a standard 32-bit Roaring
  bitmap in the *portable* format of the public RoaringFormatSpec
  (cookie 12346, descriptive + offset headers, array containers up to
  4096 values, bitmap containers above);
- a **DV file** (``deletion_vector_<uuid>.bin``) starts with a single
  format-version byte ``1``; each stored DV is an int32-BE length
  prefix, the serialized bitmap bytes, and an int32-BE CRC-32 of those
  bytes. The ``add`` action's descriptor points at it with
  ``{storageType: "u", pathOrInlineDv: <z85-encoded UUID>, offset,
  sizeInBytes, cardinality}`` — ``sizeInBytes`` is the bitmap size
  (prefix and CRC excluded), ``offset`` addresses the length prefix;
- ``storageType "i"`` inlines the z85-encoded bitmap bytes directly in
  the descriptor (read support here);
- the UUID rides in the descriptor z85-encoded (ZeroMQ Base85, 4-byte
  big-endian groups → 5 chars) and canonical in the file name.

No Delta jars ship in this container, so — as with the rest of
``delta_log.py`` — writing the documented bytes is what makes the
format claim real; encode/decode round-trip and structural tests live
in tests/test_delta_dv.py.
"""

from __future__ import annotations

import os
import struct
import uuid
import zlib

MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_ARRAY_MAX = 4096

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        n = struct.unpack(">I", data[i:i + 4])[0]
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            n = n * 85 + _Z85_INV[c]
        out += struct.pack(">I", n)
    return bytes(out)


# ------------------------------------------------ 32-bit roaring
def _serialize_bitmap32(values: list[int]) -> bytes:
    """Portable-format 32-bit Roaring bitmap of sorted ``values``."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    blobs = []
    for k in keys:
        lows = sorted(set(containers[k]))
        containers[k] = lows
        if len(lows) <= _ARRAY_MAX:
            blobs.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            blobs.append(bytes(bits))
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: absolute byte positions of each container
    pos = len(out) + 4 * len(keys)
    for blob in blobs:
        out += struct.pack("<I", pos)
        pos += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def _deserialize_bitmap32(buf: bytes, at: int) -> tuple[list[int], int]:
    """Decode one portable 32-bit bitmap at ``buf[at:]`` → (values,
    bytes consumed)."""
    start = at
    cookie = struct.unpack_from("<I", buf, at)[0]
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        raise ValueError(
            "run-container roaring bitmaps not supported by this "
            "decoder (this writer never emits them)"
        )
    if cookie != _SERIAL_COOKIE_NO_RUN:
        raise ValueError(f"bad roaring cookie {cookie}")
    n = struct.unpack_from("<I", buf, at + 4)[0]
    at += 8
    heads = []
    for _ in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, at)
        heads.append((k, cm1 + 1))
        at += 4
    offsets = []
    for _ in range(n):
        offsets.append(struct.unpack_from("<I", buf, at)[0])
        at += 4
    values: list[int] = []
    end = at
    for (k, card), off in zip(heads, offsets):
        p = start + off
        if card <= _ARRAY_MAX:
            lows = struct.unpack_from(f"<{card}H", buf, p)
            p += 2 * card
        else:
            bits = buf[p:p + 8192]
            p += 8192
            lows = [
                (byte_i << 3) | bit
                for byte_i, b in enumerate(bits) if b
                for bit in range(8) if b & (1 << bit)
            ]
        values.extend((k << 16) | lo for lo in lows)
        end = max(end, p)
    return values, end - start


# ------------------------------------------- 64-bit bitmap array
def serialize_positions(positions: list[int]) -> bytes:
    """Sorted 64-bit row positions → RoaringBitmapArray portable
    bytes (the DV payload delta-spark deserializes)."""
    highs: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        if p < 0:
            raise ValueError(f"negative position {p}")
        highs.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", MAGIC, len(highs)))
    for hi in sorted(highs):
        out += struct.pack("<i", hi)
        out += _serialize_bitmap32(highs[hi])
    return bytes(out)


def deserialize_positions(data: bytes) -> list[int]:
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    at = 12
    out: list[int] = []
    for _ in range(n):
        hi = struct.unpack_from("<i", data, at)[0]
        at += 4
        lows, used = _deserialize_bitmap32(data, at)
        at += used
        out.extend((hi << 32) | lo for lo in lows)
    return sorted(out)


# ------------------------------------------------------ DV files
def dv_file_name(dv_uuid: uuid.UUID) -> str:
    return f"deletion_vector_{dv_uuid}.bin"


def write_dv_file(
    table_path: str, dv_uuid: uuid.UUID, positions: list[int]
) -> dict:
    """Write one DV file holding one vector; returns the add action's
    ``deletionVector`` descriptor."""
    data = serialize_positions(positions)
    fp = os.path.join(table_path, dv_file_name(dv_uuid))
    with open(fp, "wb") as f:
        f.write(b"\x01")  # format version
        offset = f.tell()
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data)))
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(dv_uuid.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


def read_dv_bytes(table_path: str, descriptor: dict) -> bytes:
    """Resolve a descriptor (storageType u/i/p) to the verified RAW
    serialized-bitmap bytes (length/CRC frame checked, frame not
    included). These bytes are what Iceberg v3 deletion-vector-v1
    blobs carry verbatim — the UniForm zero-recode property."""
    st = descriptor["storageType"]
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
        # z85 works in 4-byte groups; sizeInBytes recovers the true
        # length under the codec's zero padding
        size = descriptor.get("sizeInBytes")
        if size is not None:
            data = data[:size]
        return data
    if st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, enc_uuid = enc[:-20], enc[-20:]
        dv_uuid = uuid.UUID(bytes=z85_decode(enc_uuid))
        fp = os.path.join(
            table_path, prefix, dv_file_name(dv_uuid)
        ) if prefix else os.path.join(
            table_path, dv_file_name(dv_uuid)
        )
    elif st == "p":
        fp = descriptor["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    with open(fp, "rb") as f:
        f.seek(descriptor["offset"])
        (size,) = struct.unpack(">i", f.read(4))
        if size != descriptor["sizeInBytes"]:
            raise ValueError(
                f"DV size mismatch: file says {size}, descriptor "
                f"says {descriptor['sizeInBytes']}"
            )
        data = f.read(size)
        (crc,) = struct.unpack(">I", f.read(4))
    if zlib.crc32(data) != crc:
        raise ValueError("DV checksum mismatch")
    return data


def read_dv(table_path: str, descriptor: dict) -> list[int]:
    """Resolve a descriptor (storageType u/i/p) to row positions."""
    positions = deserialize_positions(
        read_dv_bytes(table_path, descriptor)
    )
    if (descriptor["storageType"] != "i"
            and len(positions) != descriptor["cardinality"]):
        raise ValueError(
            f"DV cardinality mismatch: {len(positions)} != "
            f"{descriptor['cardinality']}"
        )
    return positions


def dv_file_of(table_path: str, descriptor: dict) -> str | None:
    """On-disk file a descriptor references (None for inline) — what
    vacuum must treat as live."""
    if descriptor["storageType"] == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, enc_uuid = enc[:-20], enc[-20:]
        dv_uuid = uuid.UUID(bytes=z85_decode(enc_uuid))
        rel = (
            os.path.join(prefix, dv_file_name(dv_uuid))
            if prefix else dv_file_name(dv_uuid)
        )
        return os.path.join(table_path, rel)
    if descriptor["storageType"] == "p":
        return descriptor["pathOrInlineDv"]
    return None
