#!/usr/bin/env python3
"""Round-12 probe: the container-probe tier at growing asset count.

media_stream_probe is the pass a 100 TB media ingest runs FIRST: one
mapInPandas over (doc_id, content) that reads only headers (PSI/PCR
for TS, ADTS frame headers, MP4 box tree, Ogg page lattice, EBML
Segment/Info/Tracks, FLAC STREAMINFO) and emits one structured row per
asset. The scale posture: wall time linear in asset count, per-row
error capture (no poison asset kills a partition), driver sees only
aggregates. The probe grows a mixed-container corpus 8x twice and
reports wall time and the per-codec row distribution.

Usage:
    python scale_probe_r12b.py
"""

from __future__ import annotations

import time


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def assets(n: int):
        import pandas as pd

        def synth(batches):
            from fda_clinical_etl_pipeline_spark.operators.multimodal \
                import (
                    encode_adts_stub,
                    encode_matroska_stub,
                    encode_mp4_stub,
                    encode_mpegts_stub,
                    encode_ogg_stream,
                )

            for pdf in batches:
                rows = []
                for doc_id in pdf["id"]:
                    d = int(doc_id)
                    kind = d % 6
                    if kind == 0:
                        c = encode_mpegts_stub(
                            200 * (1 + d % 9),
                            n_video=5 + d % 7, n_audio=4 + d % 5)
                    elif kind == 1:
                        c = encode_adts_stub(
                            3 + d % 6,
                            sample_rate=(48000, 44100, 32000,
                                         24000)[d % 4])
                    elif kind == 2:
                        c = encode_mp4_stub(
                            duration_ms=500 * (1 + d % 7),
                            n_samples=10 + d % 20,
                            width=16 * (12 + d % 15),
                            height=16 * (9 + d % 8))
                    elif kind == 3:
                        c = encode_ogg_stream(
                            codec="opus", n_audio_pages=3 + d % 4,
                            samples_per_page=960, preskip=0)
                    elif kind == 4:
                        c = encode_matroska_stub()
                    else:
                        c = bytes([0x42] * 16 + [d % 256] * 16)  # junk
                    rows.append((d, c))
                yield pd.DataFrame(rows, columns=["doc_id", "content"])

        return (
            spark.range(n)
            .repartition(16)
            .mapInPandas(synth, "doc_id long, content binary")
        )

    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        media_stream_probe,
    )

    print("| assets | probe wall | rows/s | error rows |")
    print("|---|---|---|---|")
    for n in (20_000, 160_000, 1_280_000):
        src = assets(n).persist()
        src.count()
        t0 = time.perf_counter()
        dist = (
            media_stream_probe(src)
            .groupBy("codec").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        wall = time.perf_counter() - t0
        errors = sum(r["n"] for r in dist if r["codec"] == "error")
        assert errors == sum(1 for d in range(n) if d % 6 == 5)
        src.unpersist()
        print(f"| {n:,} | {wall:.2f}s | {n / wall:,.0f} | {errors:,} |")

    spark.stop()


if __name__ == "__main__":
    main()
