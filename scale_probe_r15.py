"""r15 measurement harness: per-query plan-build vs execution split,
job counts, best-of-2 cache-honest execution timings for this round's
optimization targets (VERDICT r14 "Next round" items 3-6 plus the
residual >0.5 s tail of the r14 sweep).

Not a bench of record — a profiler. Methodology matches the fixed
bench.py: every timed execution starts from clearCache() + a fresh
plan; the plan build is timed separately (py4j construction cost).

Usage: python scale_probe_r15.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

TARGETS = [
    "iceberg_changelog_scan",
    "iceberg_changelog_net",
    "iceberg_compact_roundtrip",
    "lakehouse_convert_replay",
    "hudi_changelog_net",
    "dedup_substring_spans",
    "llm_unigram_train",
    "dedup_simhash",
    "graph_triangle_count",
    "text_bm25_topk",
]


def main() -> None:
    names = sys.argv[1:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fda_clinical_etl_pipeline_spark import registry as _registry
    from fda_clinical_etl_pipeline_spark.registry import all_queries
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="profile_r15",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.enabled": os.environ.get(
                "SPARK_GRAFT_BENCH_AQE", "false"
            ),
            "spark.locality.wait": "0s",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        q = queries[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            q.fn(spark, sf_dir).count()  # warm: scratch build + JIT
        except Exception as exc:
            out[name] = {"err": str(exc)[:200]}
            continue
        samples = []
        build_times = []
        jobs = 0
        for i in range(2):
            spark.catalog.clearCache()
            entry = _registry._plan_cache.get(id(spark))
            if entry is not None:
                entry[1].pop((name, sf_dir), None)
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            build_times.append(t1 - t0)
            before = set(tracker.getJobIdsForGroup())
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            jobs = len(set(tracker.getJobIdsForGroup()) - before)
            samples.append(t3 - t2)
        out[name] = {
            "build_s": round(min(build_times), 4),
            "exec_best_s": round(min(samples), 4),
            "exec_all": [round(s, 4) for s in samples],
            "jobs": jobs,
        }
        print(f"{name}: build {out[name]['build_s']:.3f}s "
              f"exec {out[name]['exec_best_s']:.3f}s "
              f"(runs {out[name]['exec_all']}, {jobs} jobs)",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
