"""Round-9 sf10 spot-probe (VERDICT r7/r8 task: 100x sf0.1) of the
three queries with the highest sf1/sf0.1 ratios in the r7 record —
``agg_max_by_precombine`` (6.1x), ``dedup_minhash_lsh`` (3.45x),
``join_left_order_counts`` (3.28x). The question: do those ratios stay
sublinear from 10x to 100x rows, or was sf1 hiding a superlinear term?

sf10 is synthesized with the same replicate-inside-the-data method as
``scale_probe_r7.py`` (testdata is read-only and ships no sf10), but
only for the tables these queries actually read — orders, customer,
documents — at 100 disjoint-keyspace replicas (~15M orders, 1.5M
customers, 500k salted docs). Foreign keys move together so the
customer⋈orders fan-out stays exactly 1x; document text is salted per
replica so MinHash sees a naturally-grown corpus, not 100 exact
copies of every doc.

Usage:
    python scale_probe_r9.py generate    # build /tmp/fda_sf10
    python scale_probe_r9.py bench       # sf0.1 vs sf1 vs sf10 table

The bench step runs the three queries in-process (one warmed session
per scale, best-of-2, same posture as bench.py: AQE off, shuffle
partitions following the data 4 -> 32 -> 64).
"""

from __future__ import annotations

import json
import os
import sys
import time

SRC = "/root/testdata/sf0.1"
SF1 = "/tmp/fda_sf1"
DST = "/tmp/fda_sf10"
REPLICAS = 100
QUERIES = (
    "agg_max_by_precombine",
    "dedup_minhash_lsh",
    "join_left_order_counts",
)
TABLES = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
}


def generate() -> None:
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=64)
    os.makedirs(DST, exist_ok=True)
    units: dict[str, int] = {}

    def unit(tbl: str, col: str) -> int:
        if tbl not in units:
            mx = (
                spark.read.parquet(f"{SRC}/{tbl}.parquet")
                .agg(F.max(col)).collect()[0][0]
            )
            units[tbl] = int(mx) + 1
        return units[tbl]

    for t, keys in TABLES.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for col, (utbl, ucol) in keys.items():
            rep = rep.withColumn(
                col, F.col(col) + F.col("_r") * F.lit(unit(utbl, ucol))
            )
        if t == "documents":
            # SIMILARITY-BREAKING salt: each replica rewrites ALL
            # occurrences of a per-replica half of the VOCABULARY
            # (hash-selected), so cross-replica token-set Jaccard
            # falls to ~1/7 (<< the 0.5 near-dup threshold) while
            # within-replica similarity structure — the thing being
            # measured — is preserved exactly. Duplicate-CLUSTER
            # sizes then stay constant as the corpus scales, as in a
            # naturally-grown corpus. Occurrence-level salting does
            # NOT work here: the synthetic docs draw from a tiny
            # vocabulary, so perturbing every k-th occurrence leaves
            # the distinct-token sets (what verify_jaccard compares)
            # nearly identical. The r7 suffix salt kept replicas
            # ~identical outright, making the true pair count
            # quadratic in the replica count — that output-bound
            # variant is recorded separately in SCALING.md (42.1M
            # pairs at sf10, 674k verified pairs/s).
            rep = rep.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x: F.when(
                                F.abs(F.xxhash64(x, F.col("_r")))
                                % 2 == 0,
                                F.concat(
                                    x, F.lit("r"),
                                    F.col("_r").cast("string"),
                                ),
                            ).otherwise(x),
                        ),
                        " ",
                    )
                ),
            )
        rep.drop("_r").repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"wrote {t}: {n} rows")
    spark.stop()


def bench() -> None:
    from fda_clinical_etl_pipeline_spark.registry import all_queries
    from fda_clinical_etl_pipeline_spark.session import get_spark

    scales = [("sf0.1", SRC, 4), ("sf10", DST, 64)]
    if os.path.isdir(SF1):
        scales.insert(1, ("sf1", SF1, 32))
    out: dict[str, dict[str, float]] = {}
    for label, sf_dir, shuffle in scales:
        spark = get_spark(
            app_name=f"probe-{label}", master="local[32]",
            shuffle_partitions=shuffle,
            extra_conf={
                "spark.sql.adaptive.enabled": "false",
                "spark.locality.wait": "0s",
                "spark.ui.showConsoleProgress": "false",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        qs = all_queries()
        out[label] = {}
        for name in QUERIES:
            qs[name].fn(spark, "/root/testdata/sf0.001").count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                n = qs[name].fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out[label][name] = round(best, 3)
            print(f"# {label} {name}: {best:.3f}s ({n} rows)",
                  file=sys.stderr)
        spark.stop()
    rec: dict = {"scales": out}
    if "sf10" in out:
        base = "sf1" if "sf1" in out else "sf0.1"
        factor = 10 if base == "sf1" else 100
        rec["ratios_vs_" + base] = {
            q: round(out["sf10"][q] / max(out[base][q], 1e-9), 2)
            for q in QUERIES
        }
        rec["rows_factor"] = factor
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    {"generate": generate, "bench": bench}[cmd]()
