#!/usr/bin/env python3
"""Round-12 probe: Iceberg v3 deletion vectors at growing delete
cardinality.

The DV read contract: the driver ships O(DV entries) blob descriptors
(puffin path, offset, size); EXECUTORS byte-range-read and expand the
roaring bitmaps. The probe grows the deleted-row count 8x twice on a
fixed-size table and reports the DV bytes on disk, the snapshot-read
wall, and the descriptor count — driver-side state must stay flat
while deleted positions grow.

Usage:
    python scale_probe_r12c.py
"""

from __future__ import annotations

import os
import tempfile
import time


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = 2_000_000
    print("| deleted rows | DV bytes | descriptors | read wall "
          "| live rows |")
    print("|---|---|---|---|---|")
    for mod in (128, 16, 2):
        root = tempfile.mkdtemp(prefix=f"dv_probe_{mod}_")
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("grp")
        )
        t = IcebergTable.create(spark, os.path.join(root, "t"), df)
        t.delete_where(F.col("k") % mod == 0, mode="dv")
        snap = t._snapshot_by(t.metadata(), None)
        dvs = t._dv_entries_of_snapshot(snap)
        dv_bytes = sum(d["content_size_in_bytes"] for d in dvs)
        deleted = sum(d["record_count"] for d in dvs)
        t0 = time.perf_counter()
        live = t.snapshot().count()
        wall = time.perf_counter() - t0
        assert live == n - deleted
        print(f"| {deleted:,} | {dv_bytes:,} | {len(dvs)} "
              f"| {wall:.2f}s | {live:,} |")

    spark.stop()


if __name__ == "__main__":
    main()
