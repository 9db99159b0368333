"""r15 VERDICT task 8: verify, at RUNTIME under the production AQE
posture (session.get_spark defaults: AQE on, broadcast thresholds at
engine defaults), which join strategies the statically-SMJ/BNLJ-flagged
plans actually execute. For each flagged query: run it once, then read
the FINAL adaptive plan (isFinalPlan=true) and count join nodes.

Usage: python plans_aqe_verify.py [query ...]  -> one line per query.
"""

from __future__ import annotations

import re
import sys

FLAGGED = [
    "dedup_clusters_largestar",
    "dedup_incremental_minhash",
    "dedup_incremental_portable",
    "dedup_semantic",
    "sim_ann_ivf_topk",
    "sim_ann_lsh_topk",
    "q20_part_promotion_suppliers",
    "q21_waiting_suppliers",
    "rfm_segmentation",
    "graph_pagerank",
    "hudi_changelog_net",
    "iceberg_changelog_net",
    "iceberg_changelog_scan",
    "iceberg_compact_roundtrip",
    "iceberg_dv_roundtrip",
    "iceberg_eq_delete_roundtrip",
    "iceberg_merge_roundtrip",
    "lakehouse_convert_replay",
    "lakehouse_uniform_reverse",
    "training_corpus_prep",
    "training_corpus_prep_portable",
]


def main() -> None:
    names = sys.argv[1:] or FLAGGED
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from fda_clinical_etl_pipeline_spark.registry import all_queries
    from fda_clinical_etl_pipeline_spark.session import get_spark

    # PRODUCTION posture: get_spark defaults (AQE on, default shuffle
    # sizing) — exactly what a deployment runs, unlike the bench's
    # latency posture (AQE off, 4 shuffle partitions)
    spark = get_spark(app_name="aqe_verify", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        q = queries[name]
        try:
            df = q.fn(spark, sf_dir)
            df.count()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name}: ERR {str(exc)[:120]}")
            continue
        counts = {
            label: len(re.findall(rf"\b{label}\b", plan))
            for label in (
                "SortMergeJoin", "BroadcastHashJoin",
                "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
        }
        final = "isFinalPlan=true" in plan
        shown = ", ".join(f"{k}={v}" for k, v in counts.items() if v)
        print(f"{name}: {shown or 'no joins'}"
              f"{' [final adaptive plan]' if final else ''}")
    spark.stop()


if __name__ == "__main__":
    main()
