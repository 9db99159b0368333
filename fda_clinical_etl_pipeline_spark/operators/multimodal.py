"""Multimodal columns (north-star extension): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

This container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (`fake_decode_features`) — but the
Spark-side plumbing is real and is what matters at 100 TB:

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
    """Placeholder for a real image/audio decode (PIL/librosa/ffmpeg).

    Not available in this container — any caller that needs true decoded
    pixels/samples must run where codecs exist.
    """
    raise NotImplementedError(
        "media codecs are not installed; use fake_decode_features for the "
        "deterministic test path"
    )


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
