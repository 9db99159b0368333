"""Baseline JPEG codec — pure Python + numpy, no codec library.

Closes the JPEG half of the env-gated codec boundary the same way PNG
(stdlib zlib) and GIF (pure-Python LZW) were closed: the container has
no PIL/libjpeg, but baseline JFIF is a public, precisely-specified
format (ITU-T T.81), so the codec is implemented directly:

- ``decode_jpeg``: marker parse (DQT/SOF0/DHT/SOS/DRI), canonical
  Huffman entropy decode with byte-unstuffing and restart markers,
  dequantize → inverse zigzag → separable float IDCT (numpy matrix
  product per block batch), chroma upsampling for 4:2:0/4:2:2/4:4:4,
  full-range BT.601 YCbCr→RGB. Grayscale and 3-component images.
  Progressive (SOF2) and arithmetic coding are rejected with
  ValueError — the quarantine contract (multimodal.py) surfaces those
  as error rows.
- ``encode_jpeg``: the test/fixture path (and a real writer): 4:4:4
  baseline with the T.81 Annex K quantization + Huffman tables,
  libjpeg-style quality scaling. Round-trip closeness is pinned in
  tests/test_multimodal.py.

Scale posture: this file is pure per-asset CPU work — it runs inside
the Arrow-batched ``mapInPandas`` operators of multimodal.py, so
parallelism, batching, and quarantine semantics are Spark's; nothing
here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# --- T.81 Annex K tables ----------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) — canonical Huffman, T.81 Annex K.3
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: spatial = C.T @ coeff @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


# --- Huffman ---------------------------------------------------------------


def _build_decode_table(bits, values):
    """Canonical Huffman (code length 1..16) → dict mapping
    (length, code) → symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    enc, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; stops at any
    non-stuffing marker (leaves position on the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker in entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def align_and_consume_restart(self, expected: int):
        """Byte-align, then consume the RSTn marker (after a
        _RestartMarker was raised or at an interval boundary)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                if d[self.pos + 1] != 0xD0 + (expected & 7):
                    raise ValueError("restart marker out of sequence")
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- Decoder ---------------------------------------------------------------


def decode_jpeg(content: bytes):
    """Baseline JFIF → (width, height, pixels) with pixels (h, w, 3)
    uint8 RGB (grayscale replicated). Raises ValueError for anything
    that is not a decodable baseline JPEG — corrupt streams are
    normalized so the mapInPandas quarantine contract holds for ANY
    byte input."""
    try:
        return _decode_checked(content)
    except (struct.error, IndexError, KeyError) as exc:
        raise ValueError(f"corrupt JPEG: {exc}") from exc


def _decode_checked(content: bytes):
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", content[pos + 2:pos + 4])[0]
        body = content[pos + 4:pos + 2 + seg_len]
        nxt = pos + 2 + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    q = np.frombuffer(
                        body[i:i + 64], np.uint8
                    ).astype(np.int64)
                    i += 64
                else:
                    q = np.frombuffer(
                        body[i:i + 128], ">u2"
                    ).astype(np.int64)
                    i += 128
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nvals = sum(bits)
                values = list(body[i + 17:i + 17 + nvals])
                htables[(tc, th)] = _build_decode_table(bits, values)
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/SOF1) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(
                content, nxt, frame, scan, qtables, htables,
                restart_interval,
            )
        pos = nxt
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qtables, htables, dri):
    w, h, comps = frame
    if w == 0 or h == 0:
        raise ValueError("empty image")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # per-component plane buffers at sampled resolution
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8),
                               np.float64)
    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}

    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    restarts_seen = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                try:
                    # marker may already have interrupted _fill;
                    # consume it either way
                    reader.align_and_consume_restart(restarts_seen)
                except ValueError:
                    raise
                restarts_seen += 1
                pred = {cid: 0 for cid in pred}
            try:
                _decode_mcu(
                    reader, comps, scan_by_cid, htables, qtables,
                    planes, pred, mx, my,
                )
            except _RestartMarker:
                raise ValueError("restart marker inside MCU")
            mcu_index += 1

    return _assemble(w, h, comps, planes, hmax, vmax)


def _decode_mcu(reader, comps, scan_by_cid, htables, qtables, planes,
                pred, mx, my):
    for cid, ch, cv, tq in comps:
        dc_tab = htables[(0, scan_by_cid[cid][0])]
        ac_tab = htables[(1, scan_by_cid[cid][1])]
        q = qtables[tq]
        for by in range(cv):
            for bx in range(ch):
                coeff = np.zeros(64, np.int64)
                t = reader.decode_symbol(dc_tab)
                diff = _extend(reader.read_bits(t), t) if t else 0
                pred[cid] += diff
                coeff[0] = pred[cid]
                k = 1
                while k < 64:
                    rs = reader.decode_symbol(ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC index overflow")
                    coeff[k] = _extend(reader.read_bits(s), s)
                    k += 1
                block = (coeff * q)[UNZIGZAG].reshape(8, 8)
                spatial = _C.T @ block @ _C + 128.0
                y0 = (my * cv + by) * 8
                x0 = (mx * ch + bx) * 8
                planes[cid][y0:y0 + 8, x0:x0 + 8] = spatial


def _assemble(w, h, comps, planes, hmax, vmax):
    import numpy as np

    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- Encoder ---------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _encode_block(bw, block, q, dc_enc, ac_enc, pred):
    coeff = _C @ (block - 128.0) @ _C.T
    zz = np.round(coeff.reshape(64)[ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, length = dc_enc[t]
    bw.write(code, length)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(v, t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        mv = v if v > 0 else v + (1 << s) - 1
        bw.write(mv, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(pixels, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 grayscale → baseline JFIF
    bytes (4:4:4, Annex K tables scaled by libjpeg-style quality)."""
    pixels = np.asarray(pixels, np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum = _scale_quant(QUANT_LUM, quality)
    qchrom = _scale_quant(QUANT_CHROM, quality)

    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        rgbf = pixels.astype(np.float64)
        r, g, b = rgbf[:, :, 0], rgbf[:, :, 1], rgbf[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]

    # pad to multiples of 8 by edge replication
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        padded.append(np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge"))

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0/JFIF: version 1.1, aspect-ratio units, density 1x1, no thumb
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x01\x01" + b"\x00" + b"\x00\x01\x00\x01" + b"\x00\x00")
    # DQT (table 0 = lum; table 1 = chrom when color)
    dqt = bytearray()
    dqt += bytes([0x00]) + bytes(qlum[ZIGZAG].astype(np.uint8).tolist())
    if not gray:
        dqt += bytes([0x01]) + bytes(
            qchrom[ZIGZAG].astype(np.uint8).tolist()
        )
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    dht = bytearray()
    tablesets = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        tablesets += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tid, (bits, values) in tablesets:
        dht += bytes([tid]) + bytes(bits) + bytes(values)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_lum_enc = _build_encode_table(*DC_LUM)
    ac_lum_enc = _build_encode_table(*AC_LUM)
    dc_chrom_enc = _build_encode_table(*DC_CHROM)
    ac_chrom_enc = _build_encode_table(*AC_CHROM)
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(ncomp):
                block = padded[c][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                q = qlum if c == 0 else qchrom
                dc_enc = dc_lum_enc if c == 0 else dc_chrom_enc
                ac_enc = ac_lum_enc if c == 0 else ac_chrom_enc
                preds[c] = _encode_block(
                    bw, block, q, dc_enc, ac_enc, preds[c]
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
