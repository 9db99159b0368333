"""Multimodal columns (north-star extension): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

Decode is REAL for uncompressed formats — `decode_ppm` (P6 images) and
`decode_wav_pcm16` (RIFF/WAVE PCM16 audio) are pure numpy/struct parsers
needing no codec library, driven through `image_features` /
`audio_features` mapInPandas operators with per-row error capture
(corrupt assets quarantine as error rows, never kill the job). Only
COMPRESSED codecs (JPEG/PNG/MP3/H.264) remain a declared stub
(`real_decode` raises; no PIL/librosa/ffmpeg in this container), with
`fake_decode_features` as the deterministic any-bytes test path. The
Spark-side plumbing is identical either way and is what matters at
100 TB:

- assets travel as one ``binary`` column + metadata struct, so the scan
  is a plain parquet/binaryFile scan with column pruning (a query that
  only needs metadata never reads the bytes);
- decode/feature-extract runs as ``mapInPandas``: Arrow batches in, Arrow
  batches out, schema declared up-front, per-batch vectorized work;
- partitioning: batches are bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
  sized by config, not by the largest file.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ._util import tables

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feat_sum", T.LongType()),
        T.StructField("feat_first", T.LongType()),
    ]
)


def real_decode(content: bytes) -> object:
    """Placeholder for COMPRESSED-codec decode (JPEG/PNG/MP3/H.264 via
    PIL/librosa/ffmpeg).

    Not available in this container — any caller that needs compressed
    decode must run where codecs exist. UNCOMPRESSED formats decode for
    real here: ``decode_ppm`` (P6 images) and ``decode_wav_pcm16`` (PCM
    audio) are pure numpy, no codec library involved.
    """
    raise NotImplementedError(
        "compressed-media codecs are not installed; PPM/WAV decode is real "
        "(decode_ppm / decode_wav_pcm16); use fake_decode_features for the "
        "deterministic any-bytes test path"
    )


def decode_ppm(content: bytes):
    """REAL image decode for binary PPM (P6) — header parse + numpy
    reshape, no codec library. Returns (width, height, pixels) with
    pixels shaped (h, w, 3) uint8. Raises ValueError on non-P6 input."""
    import numpy as np

    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> raster
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(content) and content[i:i + 1].isspace():
            i += 1
        if content[i:i + 1] == b"#":  # comment line
            while i < len(content) and content[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j:j + 1].isspace():
            j += 1
        fields.append(content[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    raster = np.frombuffer(content, dtype=np.uint8,
                           count=width * height * 3, offset=i)
    return width, height, raster.reshape(height, width, 3)


def resize_image_nn(pixels, out_w: int, out_h: int):
    """REAL nearest-neighbor resize — numpy index grids, no library.
    pixels (h, w, 3) → (out_h, out_w, 3)."""
    import numpy as np

    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return pixels[rows[:, None], cols[None, :]]


def decode_wav_pcm16(content: bytes):
    """REAL audio decode for 16-bit PCM RIFF/WAVE — struct header walk +
    numpy view, no codec library. Returns (sample_rate, n_channels,
    samples) with samples shaped (n_frames, n_channels) int16."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos:pos + 4], struct.unpack(
            "<I", content[pos + 4:pos + 8]
        )[0]
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, channels, samples.reshape(-1, channels)


def fake_decode_features(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode + feature extraction: byte-sum
    and first byte (exact integers — no float rounding ambiguity across
    engines). Replace with a real decoder in production."""
    if not content:
        return 0, -1
    return sum(content), content[0]


def decode_binary_assets(assets: DataFrame) -> DataFrame:
    """assets(doc_id: long, content: binary) → decoded feature rows.

    mapInPandas: each Arrow batch is a pandas DataFrame; output schema is
    fixed (DECODED_SCHEMA) so downstream plans are stable regardless of
    the decoder implementation.
    """
    import hashlib

    import pandas as pd

    # NOTE: the closure must be self-contained (no references to
    # module-level functions of this package): executors unpickle it in a
    # fresh worker process that may not have the package on PYTHONPATH.
    # configure_runtime's addPyFile covers the engine's own sessions; this
    # keeps the operator safe under ANY session.
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_features(content: bytes) -> tuple[int, int]:
            if not content:
                return 0, -1
            return sum(content), content[0]

        for pdf in batches:
            contents = pdf["content"]
            feats = [fake_features(c) for c in contents]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in contents],
                    "content_sha": [
                        hashlib.sha256(c or b"").hexdigest() for c in contents
                    ],
                    "feat_sum": [f[0] for f in feats],
                    "feat_first": [f[1] for f in feats],
                }
            )

    return assets.mapInPandas(decode, DECODED_SCHEMA)


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("thumb_sha", T.StringType()),  # 8x8 NN thumbnail
        T.StructField("decode_error", T.StringType()),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def image_features(assets: DataFrame) -> DataFrame:
    """assets(doc_id, content: binary PPM) → real decoded image features
    (dimensions, per-channel means, sha of an 8x8 nearest-neighbor
    thumbnail). Bad inputs yield a row with decode_error instead of
    failing the batch — at 100 TB a corrupt asset must quarantine, not
    kill the job. Closure is self-contained (see decode_binary_assets)."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def ppm(content):
            if not content.startswith(b"P6"):
                raise ValueError("not a P6 PPM")
            fields, i = [], 2
            while len(fields) < 3:
                while i < len(content) and content[i:i + 1].isspace():
                    i += 1
                if content[i:i + 1] == b"#":
                    while i < len(content) and content[i:i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < len(content) and not content[j:j + 1].isspace():
                    j += 1
                fields.append(content[i:j])
                i = j
            i += 1
            w, h, maxval = (int(f) for f in fields)
            if maxval > 255:
                raise ValueError("16-bit PPM unsupported")
            px = np.frombuffer(content, dtype=np.uint8, count=w * h * 3,
                               offset=i).reshape(h, w, 3)
            return w, h, px

        def resize_nn(px, ow, oh):
            h, w = px.shape[:2]
            rows = (np.arange(oh) * h // oh).astype(np.int64)
            cols = (np.arange(ow) * w // ow).astype(np.int64)
            return px[rows[:, None], cols[None, :]]

        for pdf in batches:
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, px = ppm(content or b"")
                    means = px.reshape(-1, 3).mean(axis=0)
                    thumb = resize_nn(px, 8, 8)
                    out.append((doc_id, w, h, float(means[0]),
                                float(means[1]), float(means[2]),
                                hashlib.sha256(thumb.tobytes()).hexdigest(),
                                None))
                except Exception as exc:
                    out.append((doc_id, None, None, None, None, None, None,
                                str(exc)[:200]))
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_SCHEMA.fields]
            )

    return assets.mapInPandas(run, IMAGE_SCHEMA)


def audio_features(assets: DataFrame) -> DataFrame:
    """assets(doc_id, content: binary WAV/PCM16) → real decoded audio
    features (rate, channels, frames, RMS). Same error-row contract as
    image_features."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def wav(content):
            if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE file")
            pos, rate, channels, data = 12, None, None, None
            while pos + 8 <= len(content):
                cid = content[pos:pos + 4]
                size = struct.unpack("<I", content[pos + 4:pos + 8])[0]
                body = content[pos + 8:pos + 8 + size]
                if cid == b"fmt ":
                    fmt, channels, rate = struct.unpack("<HHI", body[:8])
                    bits = struct.unpack("<H", body[14:16])[0]
                    if fmt != 1 or bits != 16:
                        raise ValueError("only 16-bit PCM supported")
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)
            if rate is None or data is None:
                raise ValueError("missing fmt/data chunk")
            return rate, channels, np.frombuffer(
                data, dtype="<i2"
            ).reshape(-1, channels)

        for pdf in batches:
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    rate, ch, samples = wav(content or b"")
                    rms = float(
                        np.sqrt((samples.astype(np.float64) ** 2).mean())
                    )
                    out.append((doc_id, rate, ch, samples.shape[0],
                                round(rms, 6), None))
                except Exception as exc:
                    out.append((doc_id, None, None, None, None,
                                str(exc)[:200]))
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return assets.mapInPandas(run, AUDIO_SCHEMA)


@register(
    "multimodal_decode_features",
    """
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           sha256(text)                               AS content_sha,
           CASE WHEN LENGTH(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(list_sum(list_transform(
                       range(1, LENGTH(text) + 1),
                       i -> CAST(ascii(text[i]) AS BIGINT))) AS BIGINT)
           END AS feat_sum,
           CASE WHEN LENGTH(text) = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(ascii(text[1]) AS BIGINT)
           END AS feat_first
    FROM documents
    """,
    doc="Multimodal plumbing demo: documents.text treated as opaque bytes "
        "(binary column), decoded via Arrow-batched mapInPandas with a "
        "deterministic fake decoder. Schema/partitioning/batching are the "
        "real production shape; only the codec is stubbed.",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    assets = documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return decode_binary_assets(assets)
