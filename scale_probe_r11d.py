"""Round-11 continuation probe: Puffin NDV stats at growing cardinality.

compute_table_stats' contract is that the DRIVER never sees more than
k+1 hash rows per column (TakeOrdered over the distinct-hash relation)
no matter how many distinct values the table holds; the cluster pays
one distinct aggregation + Arrow hashing per column. The probe grows
distinct cardinality 10x across runs and reports wall time, the
resulting sketch mode (exact vs KMV estimation), the estimate error,
and the driver-collected row bound.

Usage:
    python scale_probe_r11d.py
"""

from __future__ import annotations

import os
import tempfile
import time


def main() -> None:
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.session import get_spark
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.puffin import DEFAULT_K

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print(f"k = {DEFAULT_K} (driver rows bounded at k+1 per column)")
    print("distinct | rows | wall | mode | ndv | err%")
    for distinct, rows in ((3_000, 30_000), (30_000, 300_000),
                          (300_000, 3_000_000)):
        d = tempfile.mkdtemp()
        df = spark.range(rows).select(
            (F.col("id") % distinct).alias("key"),
            (F.col("id") % 7).alias("grp"),
        )
        t = IcebergTable.create(spark, os.path.join(d, "ice"), df)
        t0 = time.monotonic()
        t.compute_table_stats(columns=["key"])
        wall = time.monotonic() - t0
        ndv = t.table_stats()["key"]
        mode = "exact" if distinct <= DEFAULT_K else "kmv"
        err = abs(ndv - distinct) / distinct * 100
        print(f"{distinct:>8} | {rows:>9,} | {wall:4.1f}s | {mode:>5} "
              f"| {ndv:>7} | {err:4.1f}%")


if __name__ == "__main__":
    main()
