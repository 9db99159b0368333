"""Scale probe for the r14 optimization round's two biggest rewrites.

1. FLAC round-trip machinery at 1x and 64x document count (synthetic
   doc_id frames through the same mapInPandas body the gate uses):
   wall should scale ~linearly with docs/cores (embarrassingly
   parallel), driver RSS flat.
2. exact_scored cosine scoring at 1x and 64x corpus size, GEMM
   (mapInArrow) vs the old posexplode/hash-agg relational shape.
   Measured outcome: BOTH shapes scale linearly in corpus size (the
   old one is a partial-agg, not quadratic); GEMM wins a constant
   factor per element plus the removed plan overhead (2 exchanges,
   3 broadcast builds) — the honest claim, recorded in SCALING.md.

Usage: python scale_probe_r14opt.py   (writes stderr log; appends
nothing — numbers go to SCALING.md by hand)
"""

from __future__ import annotations

import os
import resource
import sys
import time

import numpy as np


def main() -> None:
    from pyspark.sql import functions as F
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe-r14opt",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "0"))
        or 32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def rss_mb() -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    # ---- probe 1: FLAC round-trip at 1x / 64x -------------------------
    import pandas as pd
    import pyspark.sql.types as T

    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        FLAC_RT_SCHEMA,
    )

    def run(batches):
        from fda_clinical_etl_pipeline_spark.operators.flac import (
            decode_flac,
            encode_flac,
        )

        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                i = np.arange(200 + d % 50, dtype=np.int64)
                pcm = ((d * 31 + i * 17) % 4096 - 2048).astype(np.int16)
                blob = encode_flac(pcm, sample_rate=8000, block_size=128)
                rate, _ch, dec = decode_flac(blob)
                out.append((d, int(dec.shape[0]),
                            int(dec.astype(np.int64).sum()), int(rate)))
            yield pd.DataFrame(
                out, columns=[f.name for f in FLAC_RT_SCHEMA.fields]
            )

    base = 5_000
    for mult in (1, 64):
        n = base * mult
        docs = spark.range(n).select(F.col("id").alias("doc_id")) \
            .repartition(par, "doc_id")
        df = docs.mapInPandas(run, FLAC_RT_SCHEMA)
        df.count()  # warm
        t0 = time.perf_counter()
        cnt = df.count()
        dt = time.perf_counter() - t0
        print(
            f"# flac x{mult}: {cnt} docs in {dt:.2f}s "
            f"({cnt / dt:,.0f} docs/s), driver rss {rss_mb():.0f} MB",
            file=sys.stderr,
        )

    # ---- probe 2: cosine scoring, GEMM vs posexplode at 1x / 64x ------
    dim, nq = 64, 5
    rng = np.random.default_rng(7)
    qm = rng.normal(size=(nq, dim))
    q_ids = np.arange(nq, dtype=np.int64)
    q_norms = np.sqrt((qm * qm).sum(axis=1))

    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("c_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def gemm(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            m = b.column("emb").flatten().to_numpy(
                zero_copy_only=False
            ).astype(np.float64).reshape(-1, dim)
            cos = (m @ qm.T) / (
                np.sqrt((m * m).sum(axis=1))[:, None] * q_norms[None, :]
            )
            nn, _ = cos.shape
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.broadcast_to(q_ids, (nn, nq)).ravel()),
                 pa.array(np.repeat(ids.astype(np.int64), nq)),
                 pa.array(np.round(cos.ravel(), 4))],
                ["q_id", "c_id", "cosine"],
            )

    for mult in (1, 64):
        n = 2_000 * mult
        vecs = (
            spark.range(n)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: (
                        F.hash(F.col("id"), i).cast("double") / 2147483647.0
                    ),
                ).alias("emb"),
            )
            .repartition(par, "vec_id")
            .persist()
        )
        vecs.count()

        g = vecs.mapInArrow(gemm, schema)
        g.count()
        t0 = time.perf_counter(); g.count(); t_g = time.perf_counter() - t0

        # old relational shape: posexplode + broadcast join + hash agg
        v = vecs.select("vec_id", F.posexplode("emb").alias("pos", "x"))
        qdf = spark.createDataFrame(
            [(int(q), p, float(qm[q, p]))
             for q in range(nq) for p in range(dim)],
            "q_id long, pos int, qx double",
        )
        dots = (
            v.join(F.broadcast(qdf), ["pos"])
            .groupBy("q_id", "vec_id")
            .agg(F.sum(F.col("x") * F.col("qx")).alias("dot"))
        )
        dots.count()
        t0 = time.perf_counter(); dots.count(); t_e = time.perf_counter() - t0
        print(
            f"# cosine x{mult}: {n} vecs — GEMM {t_g:.2f}s vs "
            f"posexplode/agg {t_e:.2f}s ({t_e / max(t_g, 1e-9):.1f}x), "
            f"driver rss {rss_mb():.0f} MB",
            file=sys.stderr,
        )
        vecs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
