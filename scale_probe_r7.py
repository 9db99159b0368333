"""Round-7 scale record: the 16 bench.py HEADLINE queries run once at
sf1 (~6M lineitem) vs sf0.1, confirming the job-floor explanation for
the high small-scale ratios with suite-level data (VERDICT r6 task 4).

sf1 is synthesized locally (testdata is read-only and ships no sf1):
each sf0.1 table replicated 10x with disjoint key offsets, the same
replicate-inside-the-data method as the earlier per-family probes —
foreign keys stay consistent (customer/orders/lineitem/supplier/part
offsets move together), tiny dims (region/nation) are shared, and
document text is salted per replica so the dedup families see a
naturally-grown corpus instead of 10 exact copies of every doc.

Usage:
    python scale_probe_r7.py generate   # build /tmp/fda_sf1
    python scale_probe_r7.py bench      # run both scales, print table

The bench step shells out to bench.py (same harness, same load guard)
with SPARK_GRAFT_SF_DIR switched, shuffle partitions raised to follow
the data (4 -> 32), and AQE left in the bench harness's posture.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SRC = "/root/testdata/sf0.1"
DST = "/tmp/fda_sf1"
REPLICAS = 10

# key columns to offset, per table; offset unit = max(key)+1 of the
# FK-owning table so every replica's keyspace is disjoint but joins
# keep their exact 1x fan-out
KEYED = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_suppkey": "supplier",
        "l_partkey": "part",
    },
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events_id", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
SHARED_DIMS = ("region", "nation")


def generate() -> None:
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=32)
    os.makedirs(DST, exist_ok=True)

    units: dict[str, int] = {}

    def unit(name: str) -> int:
        if name not in units:
            tbl, col = {
                "customer": ("customer", "c_custkey"),
                "orders": ("orders", "o_orderkey"),
                "supplier": ("supplier", "s_suppkey"),
                "part": ("part", "p_partkey"),
                "events_id": ("events", "event_id"),
                "events_user": ("events", "user_id"),
                "documents": ("documents", "doc_id"),
                "embeddings": ("embeddings", "vec_id"),
            }[name]
            mx = (
                spark.read.parquet(f"{SRC}/{tbl}.parquet")
                .agg(F.max(col)).collect()[0][0]
            )
            units[name] = int(mx) + 1
        return units[name]

    for t in SHARED_DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
        print(f"copied dim {t}")

    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for col, u in keys.items():
            rep = rep.withColumn(
                col, F.col(col) + F.col("_r") * F.lit(unit(u))
            )
        if t == "documents":
            # salt replicas so the corpus grows with distinct docs
            rep = rep.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" r"),
                             F.col("_r").cast("string"))
                ),
            )
        rep.drop("_r").repartition(16).write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"wrote {t}: {n} rows")
    spark.stop()


def bench() -> None:
    out = {}
    for label, sf_dir, shuffle in (
        ("sf0.1", SRC, "4"),
        ("sf1", DST, "32"),
    ):
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["SPARK_GRAFT_SHUFFLE"] = shuffle
        r = subprocess.run(
            [sys.executable, "bench.py"], env=env,
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.abspath(__file__)),
        )
        line = [
            ln for ln in r.stdout.splitlines() if ln.startswith("{")
        ]
        if not line:
            print(r.stdout, r.stderr, file=sys.stderr)
            raise SystemExit(f"bench at {label} produced no record")
        out[label] = json.loads(line[-1])
        print(f"# {label}: total {out[label]['value']}s")
    ratios = {
        q: round(out["sf1"]["queries"][q] /
                 max(out["sf0.1"]["queries"][q], 1e-9), 2)
        for q in out["sf0.1"]["queries"]
    }
    print(json.dumps({
        "sf01": out["sf0.1"], "sf1": out["sf1"], "ratios": ratios,
    }, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    {"generate": generate, "bench": bench}[cmd]()
