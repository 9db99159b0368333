"""Pure-Python FLAC codec (RFC 9639) for the multimodal decode tier.

FLAC is the lossless audio format real multimodal corpora actually
carry (podcast/speech dumps); unlike the env-gated lossy codecs
(MP3/H.264 sample decode needs codec libraries this sandbox lacks),
lossless decode is exactly verifiable end-to-end: encode → decode must
reproduce the PCM bit-for-bit, and STREAMINFO carries the spec's MD5 of
the raw samples as an independent integrity witness.

Decoder implements the full RFC 9639 frame layer: STREAMINFO parse,
frame headers (blocking strategy, coded block-size/sample-rate/sample
numbers, CRC-8), subframe types CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32) with wasted bits, rice-coded residual partitions (both
4-bit and 5-bit parameter methods, escape partitions), stereo
decorrelation (left-side / right-side / mid-side), and the frame
CRC-16. The encoder is the fixture writer: CONSTANT / VERBATIM /
FIXED(0-2) subframes with single-partition rice residuals, independent
or mid-side stereo — enough to exercise every decoder path the tests
pin (LPC and escape partitions are pinned via hand-built bitstreams).

Everything is driver/executor-side pure Python over small assets (the
multimodal decode tier runs inside Arrow-batched mapInPandas; the
Spark plumbing is in operators/multimodal.py). Reference analog: none
(the reference pipeline has no media surface); public spec:
RFC 9639 / xiph.org FLAC format.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# Spec sample-rate code table (frame header, bits 20-23); codes c/d/e
# read explicit values from the header tail.
_RATE_CODES = {
    88200: 0b0001, 176400: 0b0010, 192000: 0b0011, 8000: 0b0100,
    16000: 0b0101, 22050: 0b0110, 24000: 0b0111, 32000: 0b1000,
    44100: 0b1001, 48000: 0b1010, 96000: 0b1011,
}
_RATE_OF_CODE = {v: k for k, v in _RATE_CODES.items()}

_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
               32: 0b111}
_SIZE_OF_CODE = {v: k for k, v in _SIZE_CODES.items()}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc_table(poly: int, width: int) -> tuple[int, ...]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (
                (crc << 1) & mask
            )
        table.append(crc)
    return tuple(table)


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8+x^2+x+1 (0x07), init 0 — the frame
    header CRC per RFC 9639 §9.1.8 (table-driven)."""
    crc = 0
    table = _CRC8_TABLE
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the
    whole-frame CRC per RFC 9639 §9.3 (table-driven)."""
    crc = 0
    table = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ table[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bits(self, arr: np.ndarray) -> None:
        """Append a uint8 0/1 bit array in one packbits call — the bulk
        path the vectorized rice/verbatim encoders use (bit-identical
        to the equivalent sequence of scalar ``write`` calls)."""
        n = int(arr.size)
        if n == 0:
            return
        if self._nbits:
            pend = (
                (self._acc >> np.arange(self._nbits - 1, -1, -1)) & 1
            ).astype(np.uint8)
            arr = np.concatenate([pend, arr])
            n += self._nbits
        nbytes = n >> 3
        if nbytes:
            self._bytes += np.packbits(arr[: nbytes * 8]).tobytes()
        tail = arr[nbytes * 8:]
        self._nbits = int(tail.size)
        acc = 0
        for b in tail:  # at most 7 bits
            acc = (acc << 1) | int(b)
        self._acc = acc

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self._bytes)


def _fixed_width_bits(values: np.ndarray, width: int) -> np.ndarray:
    """MSB-first two's-complement bit image of each value — one row of
    ``width`` bits per value, flattened. int64 in, width <= 32."""
    if width == 0 or values.size == 0:
        return np.zeros(0, dtype=np.uint8)
    vals = values.astype(np.int64) & ((1 << width) - 1)
    shifts = np.arange(width - 1, -1, -1, dtype=np.int64)
    return ((vals[:, None] >> shifts) & 1).astype(np.uint8).ravel()


def _rice_bits(u: np.ndarray, param: int) -> np.ndarray:
    """Bit image of a rice-coded run: for each (already zigzagged)
    value, (u >> param) zero bits, a 1 terminator, then the low
    ``param`` bits — exactly what write_unary + write emit."""
    q = u >> param
    lengths = q + 1 + param
    total = int(lengths.sum())
    ends = np.cumsum(lengths)
    term = ends - param - 1
    arr = np.zeros(total, dtype=np.uint8)
    arr[term] = 1
    if param:
        shifts = np.arange(param - 1, -1, -1, dtype=np.int64)
        rem = ((u[:, None] >> shifts) & 1).astype(np.uint8)
        cols = term[:, None] + 1 + np.arange(param)
        arr[cols] = rem
    return arr


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self._data = data
        self._pos = pos_bytes * 8
        self._bits: np.ndarray | None = None  # lazy np.unpackbits image
        self._ones: np.ndarray | None = None  # positions of all 1-bits
        self._jump: dict[int, np.ndarray] = {}  # per rice param

    def _bit_array(self) -> np.ndarray:
        if self._bits is None:
            self._bits = np.unpackbits(
                np.frombuffer(self._data, dtype=np.uint8)
            )
        return self._bits

    def _ones_index(self) -> np.ndarray:
        """All 1-bit positions, computed ONCE per stream. The previous
        per-call ``flatnonzero(bits[pos:])`` rescanned every remaining
        bit on each rice-partition read — O(partitions x stream bits),
        quadratic on multi-frame files."""
        if self._ones is None:
            self._ones = np.flatnonzero(self._bit_array())
        return self._ones

    def _jump_table(self, param: int) -> np.ndarray:
        """jump[i]: index into the ones array of the first 1 at or
        past ones[i] + 1 + param (the next code's terminator hop) —
        whole-stream, cached per rice parameter."""
        j = self._jump.get(param)
        if j is None:
            ones = self._ones_index()
            j = self._jump[param] = np.searchsorted(
                ones, ones + 1 + param
            )
        return j

    def read_fixed_signed_array(self, count: int, width: int) -> np.ndarray:
        """``count`` two's-complement values of ``width`` bits each, as
        int64 — the bulk VERBATIM / escape-partition read."""
        if count == 0 or width == 0:
            return np.zeros(count, dtype=np.int64)
        p = self._pos
        end = p + count * width
        if end > len(self._data) * 8:
            raise ValueError("flac: truncated bitstream")
        m = self._bit_array()[p:end].reshape(count, width).astype(np.int64)
        weights = np.left_shift(
            1, np.arange(width - 1, -1, -1, dtype=np.int64)
        )
        v = m @ weights
        v -= m[:, 0] << width  # sign bit
        self._pos = end
        return v

    def read_rice_array(self, count: int, param: int) -> np.ndarray:
        """``count`` rice codes with fixed parameter, unzigzagged, as
        int64. Terminator positions come from one flatnonzero over the
        remaining bits plus a precomputed jump table (each 1-bit maps
        to the index of the next code's terminator), so the per-value
        work is a single table hop instead of per-bit Python reads."""
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        bits = self._bit_array()
        p = self._pos
        # absolute 1-bit index + per-param jump table, both computed
        # once per stream; this call only binary-searches its start
        # position and hops count times
        ones = self._ones_index()
        jump = self._jump_table(param)
        i = int(np.searchsorted(ones, p))
        n_ones = int(ones.size)
        idx = np.empty(count, dtype=np.int64)
        for k in range(count):
            if i >= n_ones:
                raise ValueError("flac: truncated bitstream")
            idx[k] = i
            i = int(jump[i])
        t = ones[idx]  # ABSOLUTE terminator positions
        last_end = int(t[-1]) + 1 + param
        if last_end > int(bits.size):
            raise ValueError("flac: truncated bitstream")
        starts = np.empty(count, dtype=np.int64)
        starts[0] = p
        starts[1:] = t[:-1] + 1 + param
        q = t - starts
        if int(q.max()) > 1 << 20:
            raise ValueError("flac: runaway unary code")
        if param:
            cols = t[:, None] + 1 + np.arange(param)
            weights = np.left_shift(
                1, np.arange(param - 1, -1, -1, dtype=np.int64)
            )
            u = (q << param) | (bits[cols].astype(np.int64) @ weights)
        else:
            u = q
        self._pos = last_end
        return (u >> 1) ^ -(u & 1)  # unzigzag

    @property
    def byte_pos(self) -> int:
        assert self._pos % 8 == 0, "unaligned"
        return self._pos // 8

    def read(self, nbits: int) -> int:
        p = self._pos
        end = p + nbits
        if end > len(self._data) * 8:
            raise ValueError("flac: truncated bitstream")
        last = (end + 7) >> 3
        chunk = int.from_bytes(self._data[p >> 3:last], "big")
        self._pos = end
        return (chunk >> ((last << 3) - end)) & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v & (1 << (nbits - 1)):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("flac: runaway unary code")
        return q

    def align(self) -> None:
        rem = self._pos % 8
        if rem:
            self.read(8 - rem)


def _zigzag(res: int) -> int:
    return (res << 1) if res >= 0 else ((-res << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_coded(value: int) -> bytes:
    """The frame header's UTF-8-style coded number (RFC 9639 §9.1.5 —
    UTF-8 extended to 36-bit values)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, first_mask, first_bits in (
        (2, 0xC0, 5), (3, 0xE0, 4), (4, 0xF0, 3), (5, 0xF8, 2),
        (6, 0xFC, 1), (7, 0xFE, 0),
    ):
        if value < 1 << (first_bits + 6 * (nbytes - 1)):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (value & 0x3F)
                value >>= 6
            out[0] = first_mask | value
            return bytes(out)
    raise ValueError("coded number out of range")


def _read_utf8_coded(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x80:
        n += 1
        probe = (probe << 1) & 0xFF
    if n < 2 or n > 7:
        raise ValueError("flac: bad coded number")
    value = first & (0x7F >> n)
    for _ in range(n - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        value = (value << 6) | (b & 0x3F)
    return value


# ------------------------------------------------------------ encode
def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 4096,
    stereo: str = "independent",
    subframe: str = "auto",
) -> bytes:
    """int16 PCM (n,) or (n, channels) → FLAC bytes.

    Fixture-writer scope: 16-bit samples, fixed blocking, subframes
    CONSTANT / FIXED(0-2 with single-partition rice) / VERBATIM
    (``subframe="verbatim"`` forces the latter), channels independent
    or ``stereo="ms"`` mid-side (exercises the decoder's
    decorrelation). STREAMINFO carries the real MD5 of the interleaved
    little-endian PCM, so decoders can verify losslessness without the
    encoder in hand."""
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    samples = samples.astype(np.int64)
    n, channels = samples.shape
    if channels > 8:
        raise ValueError("flac: at most 8 channels")
    if stereo == "ms" and channels != 2:
        raise ValueError("stereo='ms' needs exactly 2 channels")
    if sample_rate >= 1 << 20:
        raise ValueError("flac: sample rate too large for this writer")
    # 16-bit STREAMINFO/frame-header fields silently truncate larger
    # values (corrupt stream); the spec floor is 16 samples.
    if not 16 <= block_size <= 65535:
        raise ValueError("flac: block_size must be in [16, 65535]")

    md5 = hashlib.md5(
        samples.astype("<i2").tobytes(order="C")
    ).digest()

    frames = bytearray()
    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start:start + block_size]
        frames += _encode_frame(
            blk, frame_no, sample_rate, stereo, subframe
        )
        frame_no += 1

    # STREAMINFO (34 bytes): min/max blocksize, min/max framesize
    # (0 = unknown), 20-bit rate, channels-1, bits-1, 36-bit total
    # samples, raw-PCM MD5.
    bw = _BitWriter()
    # fixed blocking: declare min == max == blocksize (the spec exempts
    # the final frame from the minimum)
    bw.write(block_size, 16)
    bw.write(block_size, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(16 - 1, 5)
    bw.write(n, 36)
    info = bw.getvalue() + md5
    header = bytes([0x80, 0, 0, len(info)])  # last-block flag + type 0
    return FLAC_MAGIC + header + info + bytes(frames)


def _encode_frame(blk, frame_no, sample_rate, stereo, subframe):
    nblk = blk.shape[0]
    channels = blk.shape[1]
    if stereo == "ms":
        left, right = blk[:, 0], blk[:, 1]
        chans = [(left + right) >> 1, left - right]
        assignment = 0b1010
        extra_bits = [0, 1]
    else:
        chans = [blk[:, c] for c in range(channels)]
        assignment = channels - 1
        extra_bits = [0] * channels

    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)       # reserved
    bw.write(0, 1)       # fixed blocking strategy
    bw.write(0b0111, 4)  # blocksize: 16-bit value at header end
    rate_code = _RATE_CODES.get(sample_rate)
    if rate_code is None:
        rate_code = 0b1101  # 16-bit Hz at header end
    bw.write(rate_code, 4)
    bw.write(assignment, 4)
    bw.write(_SIZE_CODES[16], 3)
    bw.write(0, 1)       # reserved
    head = bw.getvalue()
    head += _utf8_coded(frame_no)
    bw2 = _BitWriter()
    bw2.write(nblk - 1, 16)
    head += bw2.getvalue()
    if rate_code == 0b1101:
        head += struct.pack(">H", sample_rate)
    head += bytes([_crc8(head)])

    body = _BitWriter()
    for ch, extra in zip(chans, extra_bits):
        _encode_subframe(body, np.asarray(ch), 16 + extra, subframe)
    body.align()
    payload = head + body.getvalue()
    return payload + struct.pack(">H", _crc16(payload))


def _encode_subframe(bw, x, bits, subframe):
    if subframe == "verbatim" or len(x) == 0:
        order = None
    elif np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(int(x[0]), bits)
        return
    else:
        # pick the fixed order (0-2) with the smallest residual energy
        cands = {}
        for o in (0, 1, 2):
            if len(x) <= o:
                continue
            res = x.copy()
            for _ in range(o):
                res = np.diff(res)
            cands[o] = (np.abs(res).sum(), res)
        order = min(cands, key=lambda o: cands[o][0])
        res = cands[order][1]
        if np.abs(res).max(initial=0) >= 1 << 30:
            order = None  # rice would blow up; fall back to verbatim
    if order is None:
        bw.write(0, 1)
        bw.write(0b000001, 6)  # VERBATIM
        bw.write(0, 1)
        bw.write_bits(_fixed_width_bits(np.asarray(x, dtype=np.int64), bits))
        return
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED, order
    bw.write(0, 1)
    for v in x[:order]:
        bw.write_signed(int(v), bits)
    # single rice partition (partition order 0), 4-bit parameter.
    # residuals are < 2^30 here (the verbatim guard above), so the
    # int64 vector zigzag is exact and the float64 mean is too
    # (sum < 2^47 over <= 65535 values).
    res64 = np.asarray(res, dtype=np.int64)
    zz = (res64 << 1) ^ (res64 >> 63)
    mean = int(zz.mean()) if len(zz) else 0
    param = 0
    while (1 << (param + 1)) < mean + 1 and param < 14:
        param += 1
    bw.write(0b00, 2)   # 4-bit rice parameters
    bw.write(0, 4)      # partition order 0
    bw.write(param, 4)
    bw.write_bits(_rice_bits(zz, param))


# ------------------------------------------------------------ decode
def decode_flac(data: bytes):
    """FLAC bytes → (sample_rate, channels, samples int16 (n, ch)).

    Verifies the sync code, header CRC-8 and frame CRC-16 of every
    frame, and the STREAMINFO MD5 of the decoded PCM when present
    (all-zero MD5 = unset per spec). Raises ValueError on anything
    malformed — error rows are the mapInPandas caller's job."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        block = data[pos + 4:pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            info = block
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type 127")
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    br = _BitReader(info)
    br.read(16)  # min blocksize
    br.read(16)  # max blocksize
    br.read(24)
    br.read(24)
    rate = br.read(20)
    channels = br.read(3) + 1
    bits = br.read(5) + 1
    total = br.read(36)
    md5 = info[18:34]
    if bits != 16:
        raise ValueError("flac: this decoder handles 16-bit streams")

    out = []
    got = 0
    fbr = _BitReader(data, pos)  # one reader (and one bit image) for
    while pos < len(data) and (total == 0 or got < total):  # all frames
        blk, pos = _decode_frame(fbr, data, pos, channels, bits, rate)
        out.append(blk)
        got += blk.shape[0]
    samples = (
        np.concatenate(out, axis=0) if out
        else np.zeros((0, channels), dtype=np.int64)
    )
    if total:
        samples = samples[:total]
    pcm = samples.astype("<i2")
    if md5 != b"\x00" * 16 and hashlib.md5(
        pcm.tobytes(order="C")
    ).digest() != md5:
        raise ValueError("flac: decoded PCM fails STREAMINFO md5")
    return rate, channels, pcm


def _decode_frame(br, data, pos, channels, stream_bits, stream_rate):
    frame_start = pos
    br._pos = pos * 8
    if br.read(14) != 0b11111111111110:
        raise ValueError("flac: lost frame sync")
    if br.read(1) != 0:
        raise ValueError("flac: reserved bit set")
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    rate_code = br.read(4)
    assignment = br.read(4)
    size_code = br.read(3)
    if br.read(1) != 0:
        raise ValueError("flac: reserved bit set")
    _read_utf8_coded(br)
    if bs_code == 0:
        raise ValueError("flac: reserved block size code")
    elif bs_code == 1:
        nblk = 192
    elif bs_code <= 5:
        nblk = 576 << (bs_code - 2)
    elif bs_code == 6:
        nblk = br.read(8) + 1
    elif bs_code == 7:
        nblk = br.read(16) + 1
    else:
        nblk = 256 << (bs_code - 8)
    if rate_code == 0:
        pass  # from STREAMINFO
    elif rate_code in _RATE_OF_CODE:
        pass
    elif rate_code == 0b1100:
        br.read(8)
    elif rate_code in (0b1101, 0b1110):
        br.read(16)
    else:
        raise ValueError("flac: invalid sample rate code")
    crc_end = br.byte_pos
    if _crc8(data[frame_start:crc_end]) != br.read(8):
        raise ValueError("flac: frame header CRC-8 mismatch")

    if size_code == 0:
        bits = stream_bits  # 0b000: bits-per-sample from STREAMINFO
    elif size_code in _SIZE_OF_CODE:
        bits = _SIZE_OF_CODE[size_code]
    else:  # 0b011 is reserved per RFC 9639 §9.1.3
        raise ValueError("flac: reserved bits-per-sample code")
    if assignment <= 7:
        nch = assignment + 1
        extra = [0] * nch
    elif assignment in (8, 9, 10):
        nch = 2
        extra = [0, 1] if assignment != 9 else [1, 0]
    else:
        raise ValueError("flac: reserved channel assignment")
    if nch != channels:
        raise ValueError("flac: frame/stream channel mismatch")

    chans = [
        _decode_subframe(br, nblk, bits + extra[c])
        for c in range(nch)
    ]
    br.align()
    crc_pos = br.byte_pos
    if _crc16(data[frame_start:crc_pos]) != br.read(16):
        raise ValueError("flac: frame CRC-16 mismatch")

    if assignment == 8:    # left/side
        left = chans[0]
        right = left - chans[1]
        blk = np.stack([left, right], axis=1)
    elif assignment == 9:  # side/right
        right = chans[1]
        left = right + chans[0]
        blk = np.stack([left, right], axis=1)
    elif assignment == 10:  # mid/side
        side = chans[1]
        mid = (chans[0] << 1) | (side & 1)
        blk = np.stack([(mid + side) >> 1, (mid - side) >> 1], axis=1)
    else:
        blk = np.stack(chans, axis=1)
    return blk, br.byte_pos


def _decode_subframe(br, nblk, bits):
    if br.read(1) != 0:
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bits - wasted
    if stype == 0b000000:
        x = np.full(nblk, br.read_signed(eff), dtype=np.int64)
    elif stype == 0b000001:
        x = br.read_fixed_signed_array(nblk, eff)
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0x07
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, nblk, order)
        x = _fixed_reconstruct(warm, res, nblk, order)
    elif stype & 0b100000:
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coef = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, nblk, order)
        x = np.empty(nblk, dtype=np.int64)
        x[:order] = warm
        for i in range(order, nblk):
            pred = sum(
                c * x[i - 1 - j] for j, c in enumerate(coef)
            ) >> shift
            x[i] = pred + res[i - order]
    else:
        raise ValueError(f"flac: reserved subframe type {stype:06b}")
    return x << wasted if wasted else x


def _fixed_reconstruct(warm, res, nblk, order):
    """Invert the fixed predictor: x's order-th difference sequence is
    ``res``, seeded by the warm-up samples — i.e. ``order`` nested
    cumulative sums. Each level checks a safe int64 bound before
    summing; anything hotter falls back to the scalar recurrence
    (which raises OverflowError exactly as the original loop did)."""
    if order == 0:
        return np.asarray(res, dtype=np.int64)
    x = np.empty(nblk, dtype=np.int64)
    x[:order] = warm
    if nblk > order:
        # inits[k] = last warm-up value of the k-th difference sequence
        d = np.asarray(warm, dtype=np.int64)
        inits = []
        for _ in range(order):
            inits.append(int(d[-1]))
            d = np.diff(d)
        cur = np.asarray(res, dtype=np.int64)
        n = cur.size
        for lvl in range(order, 0, -1):
            init = inits[lvl - 1]
            bound = int(np.abs(cur).max(initial=0)) + abs(init)
            if bound * (n + 1) >= 1 << 62:  # cumsum could wrap int64
                coef = _FIXED_COEFFS[order]
                for i in range(order, nblk):
                    pred = sum(
                        c * x[i - 1 - j] for j, c in enumerate(coef)
                    )
                    x[i] = pred + res[i - order]
                return x
            cur = init + np.cumsum(cur)
        x[order:] = cur
    return x


def _decode_residual(br, nblk, order):
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if nblk % nparts:
        # spec: the block size must divide evenly into partitions
        raise ValueError("flac: bad partition order")
    out = []
    for p in range(nparts):
        count = (nblk >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("flac: partition smaller than order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.append(
                br.read_fixed_signed_array(count, raw) if raw
                else np.zeros(count, dtype=np.int64)
            )
        else:
            out.append(br.read_rice_array(count, param))
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)


def probe_flac(content: bytes) -> dict:
    """Header-only STREAMINFO probe (no frame decode): the cheap
    metadata pass of the probe tier, mirroring probe_mpeg_audio /
    probe_mp4 — rate, channels, bit depth, declared sample count."""
    if content[:4] != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    if len(content) < 4 + 4 + 34 or (content[4] & 0x7F) != 0:
        raise ValueError("flac: first metadata block must be STREAMINFO")
    br = _BitReader(content, 8)
    br.read(16)
    br.read(16)
    br.read(24)
    br.read(24)
    rate = br.read(20)
    channels = br.read(3) + 1
    bits = br.read(5) + 1
    total = br.read(36)
    return {
        "sample_rate": rate, "channels": channels, "bits": bits,
        "total_samples": total,
        "duration_s": round(total / rate, 3) if rate and total else None,
    }
