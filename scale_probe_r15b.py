"""Scale probe for the r15 serial-scan-spread rewrites.

Question the r14 verdict's finding 3 raised for every gated
repartition this round added: do the spreads behave at scale — i.e.
(a) does the gate SKIP the exchange when the input is already
parallel, and (b) does the operator scale ~linearly in input volume
once the scan parallelizes?

Method: synthesize the documents/orders tables at 1x and 64x row
count, written as 32 parquet files each (a properly-split scan), into
a scratch sf_dir layout; run the rewritten operators through the SAME
registered entry points; assert via the physical plan that NO
repartition exchange was inserted above the scan (the gate held);
record wall times.

Usage: python scale_probe_r15b.py   (stderr log; numbers land in
OPTIMIZATION_r15.md by hand)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    from pyspark.sql import functions as F
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe-r15b",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # small split target so the 64x multi-file input scans as
            # >= core-count partitions — exercising the spread gates'
            # SKIP branch the way a real large scan would
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = tempfile.mkdtemp(prefix="scale_r15b_")

    def synth(scale: int) -> str:
        out = os.path.join(root, f"x{scale}")
        os.makedirs(out, exist_ok=True)
        docs = spark.read.parquet(f"{src}/documents.parquet")
        reps = spark.range(scale).select(
            F.col("id").alias("_rep")
        )
        big_docs = (
            docs.crossJoin(reps)
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("_rep") * 1_000_000,
            )
            .drop("_rep")
            .repartition(32)
        )
        big_docs.write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )
        orders = spark.read.parquet(f"{src}/orders.parquet")
        big_orders = (
            orders.crossJoin(reps)
            .withColumn(
                "o_orderkey",
                F.col("o_orderkey") + F.col("_rep") * 100_000_000,
            )
            .drop("_rep")
            .repartition(32)
        )
        big_orders.write.mode("overwrite").parquet(
            f"{out}/orders.parquet"
        )
        return out

    from fda_clinical_etl_pipeline_spark.operators.substring import (
        dedup_substring_spans,
    )
    from fda_clinical_etl_pipeline_spark.operators.variant import (
        variant_shred_rollup,
    )
    from fda_clinical_etl_pipeline_spark.operators.llmprep import (
        llm_decontaminate,
    )

    ops = {
        "dedup_substring_spans": dedup_substring_spans,
        "variant_shred_rollup": variant_shred_rollup,
        "llm_decontaminate": llm_decontaminate,
    }
    try:
        for scale in (1, 64):
            d = synth(scale)
            for name, fn in ops.items():
                df = fn(spark, d)
                plan = df._jdf.queryExecution().executedPlan().toString()
                spread_fired = "REPARTITION_BY_NUM" in plan
                t0 = time.perf_counter()
                n = df.count()
                dt = time.perf_counter() - t0
                scan_parts = spark.read.parquet(
                    f"{d}/documents.parquet"
                ).rdd.getNumPartitions()
                print(
                    f"x{scale} {name}: {dt:.2f}s rows={n} "
                    f"(doc scan partitions={scan_parts}; "
                    f"spread-gate fired: "
                    f"{'YES' if spread_fired else 'no'})",
                    file=sys.stderr,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
