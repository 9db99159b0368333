"""Round-10 scale probes.

1. AQE cluster posture (VERDICT r9 task 6): the headline plans timed
   at sf0.1 under BOTH postures — the bench's local-latency posture
   (AQE off, 4 shuffle partitions) and the cluster posture (AQE on,
   200 shuffle partitions, coalescing on). The claim: the cluster
   posture costs only bounded per-stage overhead locally (AQE stage
   re-planning) and NEVER changes results; on a real cluster it is
   the correct default.

2. Equality-delete density (VERDICT r9 task 7): a CDC-heavy table
   shape — ~10 equality-delete FILES per data file — must keep read
   planning metadata-bounded and the read itself near-linear in the
   surviving rows, because the strict-sequence filter is a per-group
   broadcast join, not an all-pairs probe. The probe grows delete
   density 1x -> 10x at fixed table size and reports snapshot() wall
   time and the planning job count (must be zero).

Usage:
    python scale_probe_r10.py
"""

from __future__ import annotations

import os
import shutil
import time

BASE = "/tmp/fda_probe_r10"

POSTURE_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "window_latest_per_key",
    "dedup_exact",
    "sim_cosine_topk",
    "agg_max_by_precombine",
    "join_left_order_counts",
)


def aqe_postures(spark) -> None:
    from fda_clinical_etl_pipeline_spark.registry import all_queries

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = all_queries()
    postures = {
        "bench (AQE off, shuffle=4)": {
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "4",
        },
        "cluster (AQE on, shuffle=200)": {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.shuffle.partitions": "200",
        },
    }
    results: dict[str, dict[str, float]] = {}
    canon: dict[str, dict[str, int]] = {}
    for pname, confs in postures.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        ts, cs = {}, {}
        for n in POSTURE_QUERIES:
            qs[n].fn(spark, sf).count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                cnt = qs[n].fn(spark, sf).count()
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
            cs[n] = cnt
        results[pname] = ts
        canon[pname] = cs
    names = list(postures)
    assert canon[names[0]] == canon[names[1]], "row counts diverged!"
    print("\n| query | " + " | ".join(names) + " | ratio |")
    print("|---|---|---|---|")
    for n in POSTURE_QUERIES:
        a, b = results[names[0]][n], results[names[1]][n]
        print(f"| {n} | {a:.3f}s | {b:.3f}s | {b / a:.2f}x |")
    ta = sum(results[names[0]].values())
    tb = sum(results[names[1]].values())
    print(f"| TOTAL | {ta:.3f}s | {tb:.3f}s | {tb / ta:.2f}x |")


def eq_delete_density(spark) -> None:
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    n_rows, n_files = 200_000, 20
    rows = []
    for density in (1, 5, 10):
        root = os.path.join(BASE, f"eqd{density}")
        shutil.rmtree(root, ignore_errors=True)
        df = spark.range(0, n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.5).alias("bal"),
        ).repartitionByRange(n_files, "k")
        t = IcebergTable.create(spark, root, df)
        # density x n_files equality-delete COMMITS, each killing a
        # handful of keys — the CDC-heavy shape where delete files
        # outnumber data files
        n_commits = density * n_files
        for i in range(n_commits):
            t.equality_delete(
                spark.createDataFrame(
                    [(int(j),) for j in range(i * 7, i * 7 + 3)],
                    "k long",
                ),
                ["k"],
            )
        sc = spark.sparkContext
        sc.setJobGroup(f"eqd-plan-{density}", "plan probe")
        dfq = t.snapshot()
        sc.setJobGroup(f"eqd-exec-{density}", "exec probe")
        plan_jobs = list(
            sc.statusTracker().getJobIdsForGroup(f"eqd-plan-{density}")
        )
        dfq.count()  # warm
        t0 = time.perf_counter()
        n = t.snapshot().count()
        dt = time.perf_counter() - t0
        rows.append((density, n_commits, plan_jobs, n, dt))
        print(
            f"| {density}x ({n_commits} delete files / {n_files} "
            f"data files) | plan jobs={len(plan_jobs)} | "
            f"{n} rows | {dt:.3f}s |"
        )
    d1, d10 = rows[0][-1], rows[-1][-1]
    print(
        f"# 10x delete density costs {d10 / d1:.2f}x read time "
        f"(superlinear would be >=10x)"
    )


def uniform_resync_delta(spark) -> None:
    """Reverse-uniform re-sync cost vs table size: after the O(delta)
    rework, advancing the Delta view of a 10x-bigger Iceberg table by
    ONE appended file must cost ~the same wall time and log actions —
    not 10x. (First sync is O(files) by necessity: every file needs
    an add action once.)"""
    import json as _json

    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.uniform import (
        sync_delta_uniform,
    )

    for n_files in (20, 200):
        root = os.path.join(BASE, f"usync{n_files}")
        shutil.rmtree(root, ignore_errors=True)
        df = spark.range(0, n_files * 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("bal"),
        ).repartitionByRange(n_files, "k")
        t = IcebergTable.create(spark, root, df)
        t0 = time.perf_counter()
        d = sync_delta_uniform(spark, root)
        first = time.perf_counter() - t0
        t.append(spark.createDataFrame([(10_000_000, 1.0)],
                                       "k long, bal double"))
        t0 = time.perf_counter()
        d = sync_delta_uniform(spark, root)
        resync = time.perf_counter() - t0
        with open(d._commit_file(d.latest_version())) as f:
            acts = [_json.loads(ln) for ln in f if ln.strip()]
        n_add = sum(1 for a in acts if "add" in a)
        n_rm = sum(1 for a in acts if "remove" in a)
        print(
            f"| {n_files} files | first sync {first:.3f}s | "
            f"re-sync {resync:.3f}s | actions {n_add} add / "
            f"{n_rm} remove |"
        )


def semdedup_scale(spark) -> None:
    """SemDeDup scaling: within-cluster pairing is quadratic in
    CLUSTER size, so the operating rule (the paper's) is k grows with
    the corpus. At constant average cluster size (N/k fixed), 10x
    vectors should cost ~10x wall, not 100x."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.operators.similarity import (
        _portable_sem_centroids,
        semantic_dedup,
    )

    rows = []
    for n, k in ((5_000, 4), (50_000, 40)):
        df = spark.range(0, n).select(
            F.col("id").alias("vec_id"),
            F.array(*[
                F.round(F.rand(seed=100 + j) * 2 - 1, 6)
                for j in range(64)
            ]).alias("emb"),
        ).persist()
        df.count()
        cents = _portable_sem_centroids(n=k)
        t0 = time.perf_counter()
        out = semantic_dedup(df, cents, cut=0.35)
        kept = out.agg(
            F.sum("is_kept").alias("k"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        dt = time.perf_counter() - t0
        df.unpersist()
        rows.append((n, k, dt))
        print(
            f"| {n} vecs / {k} centroids | {dt:.2f}s | kept "
            f"{kept['k']}/{kept['n']} |"
        )
    print(
        f"# 10x vectors at constant cluster size: "
        f"{rows[1][2] / rows[0][2]:.1f}x wall (quadratic would be ~100x)"
    )


def main() -> None:
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="probe_r10",
        master="local[32]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import sys

    which = set(sys.argv[1:]) or {"aqe", "eqd", "usync", "semd"}
    if "aqe" in which:
        print("== AQE posture comparison (sf0.1) ==")
        aqe_postures(spark)
    if "eqd" in which:
        print("\n== Equality-delete density (fixed 200k rows) ==")
        eq_delete_density(spark)
    if "usync" in which:
        print("\n== Reverse-uniform re-sync at 10x files ==")
        uniform_resync_delta(spark)
    if "semd" in which:
        print("\n== SemDeDup at constant cluster size ==")
        semdedup_scale(spark)


if __name__ == "__main__":
    main()
