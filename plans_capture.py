"""Capture .explain('formatted') output for registered queries.

Usage:
  python plans_capture.py <tag> [query ...]      # default: bench.py HEADLINE
  python plans_capture.py before                 # plans/r14/<q>_before.txt

Writes plans/r14/<query>_<tag>.txt. Plans are deterministic (no timing),
so this can run on a busy box. Uses the same session posture as bench.py
(AQE off locally, shuffle=4) so the captured plan is the one the bench
executes.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE

    if not names:
        names = list(HEADLINE)

    from fda_clinical_etl_pipeline_spark.registry import all_queries
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"plans-{tag}",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "0")) or 4,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.enabled": os.environ.get(
                "SPARK_GRAFT_BENCH_AQE", "false"
            ),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        q = queries[name]
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
