"""Multimodal decode: REAL decoders for uncompressed formats (PPM P6
images, RIFF/WAVE PCM16 audio — pure numpy/struct, no codec library),
driven through the Arrow-batched mapInPandas operators with synthesized
binary fixtures. Compressed codecs stay a declared stub (real_decode)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fda_clinical_etl_pipeline_spark.operators.multimodal import (
    audio_features,
    decode_ppm,
    decode_wav_pcm16,
    image_features,
    real_decode,
    resize_image_nn,
)


def make_ppm(w: int, h: int, seed: int = 0) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    header = f"P6\n# test fixture\n{w} {h}\n255\n".encode()
    return header + px.tobytes(), px


def make_wav(rate: int, channels: int, frames: int, seed: int = 0
             ) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(seed)
    samples = rng.integers(-30000, 30000, size=(frames, channels),
                           dtype=np.int16)
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body, samples


def test_ppm_decode_exact():
    content, px = make_ppm(5, 3)
    w, h, decoded = decode_ppm(content)
    assert (w, h) == (5, 3)
    assert np.array_equal(decoded, px)


def test_ppm_resize_nearest_neighbor():
    content, px = make_ppm(8, 8)
    _, _, decoded = decode_ppm(content)
    small = resize_image_nn(decoded, 4, 4)
    assert small.shape == (4, 4, 3)
    # NN with exact 2x downscale picks every other pixel
    assert np.array_equal(small, px[::2, ::2])


def test_wav_decode_exact():
    content, samples = make_wav(16000, 2, 100)
    rate, channels, decoded = decode_wav_pcm16(content)
    assert (rate, channels) == (16000, 2)
    assert np.array_equal(decoded, samples)


def test_real_decode_still_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG...")


def test_image_features_operator(spark):
    good, px = make_ppm(6, 4, seed=7)
    rows = [(1, bytearray(good)), (2, bytearray(b"not an image"))]
    assets = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in image_features(assets).collect()}
    r = out[1]
    assert (r["width"], r["height"]) == (6, 4)
    means = px.reshape(-1, 3).mean(axis=0)
    assert abs(r["mean_r"] - means[0]) < 1e-9
    assert r["decode_error"] is None and r["thumb_sha"]
    # corrupt asset becomes an error row, not a job failure
    bad = out[2]
    assert bad["width"] is None and "PPM" in bad["decode_error"]


def test_audio_features_operator(spark):
    good, samples = make_wav(8000, 1, 64, seed=3)
    rows = [(1, bytearray(good)), (2, bytearray(b"RIFFxxxx"))]
    assets = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in audio_features(assets).collect()}
    r = out[1]
    assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (8000, 1, 64)
    rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
    assert abs(r["rms"] - round(rms, 6)) < 1e-6
    assert out[2]["decode_error"] is not None
