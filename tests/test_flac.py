"""FLAC codec (RFC 9639): lossless round-trips through every encoder
path, decoder-only paths (LPC, escape partitions, left/right-side
stereo) pinned via hand-built bitstreams, and corruption detection via
the three integrity layers (CRC-8, CRC-16, STREAMINFO MD5)."""

from __future__ import annotations

import numpy as np
import pytest

from fda_clinical_etl_pipeline_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    _zigzag,
    decode_flac,
    encode_flac,
)


def _rnd(n, lo=-2000, hi=2000, seed=3):
    return np.random.RandomState(seed).randint(
        lo, hi, size=n
    ).astype(np.int16)


def test_roundtrip_mono_fixed():
    pcm = np.cumsum(_rnd(5000, -50, 50)).astype(np.int16)
    blob = encode_flac(pcm, sample_rate=8000, block_size=1024)
    rate, ch, out = decode_flac(blob)
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], pcm)
    # fixed-order prediction must actually compress smooth signals
    assert len(blob) < pcm.nbytes


def test_roundtrip_verbatim_and_constant():
    noise = _rnd(700, -32768, 32767, seed=9)
    blob = encode_flac(noise, block_size=256, subframe="verbatim")
    _, _, out = decode_flac(blob)
    assert np.array_equal(out[:, 0], noise)

    const = np.full(500, -12345, dtype=np.int16)
    _, _, out = decode_flac(encode_flac(const, block_size=128))
    assert np.array_equal(out[:, 0], const)


def test_roundtrip_stereo_independent_and_midside():
    left = np.cumsum(_rnd(3000, -30, 30, seed=1)).astype(np.int16)
    right = (left // 2 + _rnd(3000, -5, 5, seed=2)).astype(np.int16)
    pcm = np.stack([left, right], axis=1)
    for stereo in ("independent", "ms"):
        blob = encode_flac(
            pcm, sample_rate=44100, block_size=512, stereo=stereo
        )
        rate, ch, out = decode_flac(blob)
        assert (rate, ch) == (44100, 2)
        assert np.array_equal(out, pcm), stereo
    # correlated stereo: mid-side must beat independent coding
    ind = encode_flac(pcm, block_size=512, stereo="independent")
    ms = encode_flac(pcm, block_size=512, stereo="ms")
    assert len(ms) < len(ind)


def test_roundtrip_odd_lengths_and_nonstandard_rate():
    for n in (1, 63, 1024, 1025):
        pcm = _rnd(n, seed=n)
        rate, ch, out = decode_flac(
            encode_flac(pcm, sample_rate=11025, block_size=64)
        )
        assert rate == 11025
        assert np.array_equal(out[:, 0], pcm), n


def _handmade_stream(channels, bits, frame_payload_fn, nblk, n_total,
                     assignment=None):
    """Build STREAMINFO + one frame whose subframe bits come from
    frame_payload_fn(bitwriter) — used to pin decoder-only paths.
    ``assignment`` overrides the frame's channel-assignment nibble
    (for the stereo-decorrelation modes the encoder never emits)."""
    import struct

    bw = _BitWriter()
    bw.write(nblk, 16)
    bw.write(nblk, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(8000, 20)
    bw.write(channels - 1, 3)
    bw.write(bits - 1, 5)
    bw.write(n_total, 36)
    info = bw.getvalue() + b"\x00" * 16  # md5 unset
    head = bytes([0x80, 0, 0, len(info)]) + info

    fh = _BitWriter()
    fh.write(0b11111111111110, 14)
    fh.write(0, 2)
    fh.write(0b0111, 4)       # 16-bit blocksize at end of header
    fh.write(0b0100, 4)       # 8000 Hz
    fh.write(channels - 1 if assignment is None else assignment, 4)
    fh.write(0b100, 3)        # 16-bit samples
    fh.write(0, 1)
    hdr = fh.getvalue() + _utf8_coded(0)
    bw2 = _BitWriter()
    bw2.write(nblk - 1, 16)
    hdr += bw2.getvalue()
    hdr += bytes([_crc8(hdr)])

    body = _BitWriter()
    frame_payload_fn(body)
    body.align()
    frame = hdr + body.getvalue()
    frame += struct.pack(">H", _crc16(frame))
    return b"fLaC" + head + frame


def test_decoder_lpc_subframe():
    """Hand-built LPC subframe (order 2, precision 4, shift 1,
    coefficients [3, -1]): the decoder must reproduce the recurrence
    x[i] = ((3*x[i-1] - x[i-2]) >> 1) + res[i]."""
    warm = [100, 110]
    res = [5, -3, 0, 7, -2, 1]
    nblk = len(warm) + len(res)

    def payload(bw):
        bw.write(0, 1)
        bw.write(0b100000 | (2 - 1), 6)  # LPC order 2
        bw.write(0, 1)
        for w in warm:
            bw.write_signed(w, 16)
        bw.write(4 - 1, 4)    # precision 4
        bw.write_signed(1, 5)  # shift 1
        bw.write_signed(3, 4)
        bw.write_signed(-1, 4)
        bw.write(0b00, 2)     # rice, 4-bit params
        bw.write(0, 4)        # partition order 0
        bw.write(2, 4)        # rice parameter 2
        for r in res:
            u = _zigzag(r)
            bw.write_unary(u >> 2)
            bw.write(u, 2)

    blob = _handmade_stream(1, 16, payload, nblk, nblk)
    _, _, out = decode_flac(blob)
    x = list(warm)
    for r in res:
        x.append(((3 * x[-1] - x[-2]) >> 1) + r)
    assert out[:, 0].tolist() == x


def test_decoder_escape_partition_and_rice2():
    """Escape partitions store raw residuals (param = all-ones, then a
    5-bit raw size); method 01 uses 5-bit rice parameters. Both via a
    hand-built FIXED order-0 subframe with partition order 1."""
    res = [40000, -40000, 123, -7]  # too hot for rice

    def payload(bw):
        bw.write(0, 1)
        bw.write(0b001000, 6)  # FIXED order 0
        bw.write(0, 1)
        bw.write(0b01, 2)      # rice2: 5-bit parameters
        bw.write(1, 4)         # partition order 1 -> 2 partitions
        bw.write(0b11111, 5)   # escape
        bw.write(17, 5)        # 17-bit raw residuals
        bw.write_signed(res[0], 17)
        bw.write_signed(res[1], 17)
        bw.write(0, 5)         # second partition: rice param 0
        for r in res[2:]:
            u = _zigzag(r)
            bw.write_unary(u)

    blob = _handmade_stream(1, 16, payload, len(res), len(res))
    _, _, out = decode_flac(blob)
    # the 17-bit escape values exceed the 16-bit output range and wrap
    # on the int16 cast; the in-range rice values come back exact
    assert out[0, 0] == 40000 - 65536
    assert out[1, 0] == -40000 + 65536
    assert out[2, 0] == 123 and out[3, 0] == -7


def test_decoder_left_and_right_side_stereo():
    """Channel assignments 8 (left/side) and 9 (side/right), which the
    fixture encoder never emits, reconstruct the original channels."""
    left = [100, 200, -50, 7]
    right = [90, 180, -60, 3]
    side = [l - r for l, r in zip(left, right)]

    for assignment, ch0, ch1, extra in (
        (8, left, side, (0, 1)),
        (9, side, right, (1, 0)),
    ):
        def payload(bw, ch0=ch0, ch1=ch1, extra=extra):
            for vals, eb in ((ch0, extra[0]), (ch1, extra[1])):
                bw.write(0, 1)
                bw.write(0b000001, 6)  # VERBATIM
                bw.write(0, 1)
                for v in vals:
                    bw.write_signed(v, 16 + eb)

        blob = _handmade_stream(
            2, 16, payload, 4, 4, assignment=assignment
        )
        _, _, out = decode_flac(blob)
        assert out[:, 0].tolist() == left, assignment
        assert out[:, 1].tolist() == right, assignment


def test_corruption_detected():
    pcm = np.cumsum(_rnd(2000, -40, 40)).astype(np.int16)
    blob = bytearray(encode_flac(pcm, block_size=512))
    # flip one PCM-affecting bit mid-stream
    blob[len(blob) // 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC|md5|flac"):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"not a flac stream")


def test_media_probe_dispatches_flac(spark):
    """media_stream_probe recognizes the fLaC magic and reports the
    STREAMINFO shape header-only; garbage still error-captures."""
    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        media_stream_probe,
    )

    pcm = np.cumsum(_rnd(4000, -20, 20)).astype(np.int16)
    blob = encode_flac(
        np.stack([pcm, pcm], axis=1), sample_rate=16000,
        block_size=1024,
    )
    assets = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"fLaC???"))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in media_stream_probe(assets).collect()}
    assert rows[1]["codec"] == "flac"
    assert rows[1]["profile"] == "pcm16-2ch"
    assert rows[1]["n_units"] == 4000
    assert rows[1]["duration_s"] == 0.25
    assert rows[1]["err"] is None
    assert rows[2]["codec"] == "error" and rows[2]["err"]


def test_audio_features_decodes_flac(spark):
    """FLAC joins PCM16/ADPCM/G.711 in the audio feature path: same
    rate/channels/frames/RMS contract, computed from the LOSSLESSLY
    decoded samples (RMS must equal the WAV-encoded twin exactly)."""
    import struct

    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        audio_features,
    )

    pcm = np.cumsum(_rnd(3000, -40, 40)).astype(np.int16)
    flac_blob = encode_flac(pcm, sample_rate=16000, block_size=512)
    # minimal PCM16 WAV twin of the same samples
    data = pcm.astype("<i2").tobytes()
    wav_blob = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000,
                                32000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assets = spark.createDataFrame(
        [(1, bytearray(flac_blob)), (2, bytearray(wav_blob))],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(assets).collect()}
    assert rows[1]["decode_error"] is None
    assert rows[2]["decode_error"] is None
    assert rows[1]["sample_rate"] == rows[2]["sample_rate"] == 16000
    assert rows[1]["n_frames"] == rows[2]["n_frames"] == 3000
    assert rows[1]["rms"] == rows[2]["rms"]


def test_encode_rejects_out_of_range_block_size():
    """16-bit STREAMINFO/frame-header fields would silently truncate
    block sizes over 65535 (corrupt stream); the spec floor is 16."""
    pcm = np.zeros(64, dtype=np.int16)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(pcm, block_size=8)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(pcm, block_size=65536)
    # boundary values still encode/decode losslessly
    for bs in (16, 65535):
        _sr, _ch, out = decode_flac(encode_flac(pcm, block_size=bs))
        assert out.shape[0] == 64


def test_decode_rejects_reserved_size_code():
    """Frame-header bits-per-sample code 0b011 is reserved (RFC 9639
    §9.1.3) — must refuse, not silently fall back to STREAMINFO bits."""
    pcm = np.arange(64, dtype=np.int16)
    blob = bytearray(encode_flac(pcm, block_size=192))
    sync = 4 + 4 + 34  # magic + STREAMINFO block header + payload
    assert blob[sync:sync + 2] == b"\xff\xf8"
    # byte sync+3 packs assignment(4) | size_code(3) | reserved(1)
    blob[sync + 3] = (blob[sync + 3] & 0xF1) | (0b011 << 1)
    # re-stamp the header CRC-8 so the reserved code is what trips:
    # frame number 0 is a single utf8 byte; extra blocksize/rate bytes
    # follow per their codes
    bs_code, rate_code = blob[sync + 2] >> 4, blob[sync + 2] & 0xF
    assert blob[sync + 4] == 0  # frame 0, one coded byte
    p = sync + 5
    p += 1 if bs_code == 6 else 2 if bs_code == 7 else 0
    p += 1 if rate_code == 0b1100 else 2 if rate_code in (13, 14) else 0
    blob[p] = _crc8(bytes(blob[sync:p]))
    with pytest.raises(ValueError, match="reserved bits-per-sample"):
        decode_flac(bytes(blob))
