"""r13b probe: lineage-read cost vs table size.

Row tracking / row lineage reads add, on top of the plain snapshot
scan: the `_metadata.row_index` projection, ONE broadcast join of an
O(files) constants relation (exact string key — the uuid basename),
and a per-row coalesce. The right metric is the PER-ROW increment:
the plan is shuffle-free and embarrassingly parallel, so the cost
must stay a flat nanoseconds-per-row tax as the table grows — never
a superlinear term. PASS = (lineage_wall - plain_wall) / rows flat
(±2x) across a 64× row blow-up at fixed file count.

Alternatives measured and rejected (16M rows, 32 files, local[8]):
join on basename string 1.69 s; join on full path 1.34 s (breaks on
filesystem scheme prefixes); xxhash64(basename) long-key join 1.19 s
(a 64-bit collision would silently mis-assign identity — exactness
wins); per-file union with literal constants 0.81 s (plan size grows
with file count — unusable at 100 TB file counts). The exact
basename join keeps the plan O(1) in file count and the cost linear.
"""

import os
import time

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.session import get_spark
from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


def run(spark, root, n_rows):
    t = DeltaProtocolTable.create(
        spark, root,
        spark.range(0).select(F.col("id").alias("k"),
                              (F.col("id") * 1.0).alias("v")),
        key="k", precombine="v",
    )
    t.enable_row_tracking()
    t.append(
        spark.range(n_rows).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartitionByRange(32, "k")
    )

    def best(fn, n=3):
        fn()
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    plain = best(lambda: t.snapshot().selectExpr(
        "count(*)", "sum(k)").collect())
    lin = best(lambda: t.snapshot_row_tracking().selectExpr(
        "count(*)", "sum(k)", "sum(_row_id)").collect())
    return plain, lin


def main():
    import shutil
    import tempfile

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    for n in (250_000, 16_000_000):
        d = tempfile.mkdtemp(prefix="probe_r13b_")
        try:
            plain, lin = run(spark, os.path.join(d, "t"), n)
            print(
                f"rows={n:>9}  plain={plain:6.3f}s  lineage={lin:6.3f}s"
                f"  increment={(lin - plain) / n * 1e9:6.1f} ns/row"
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
