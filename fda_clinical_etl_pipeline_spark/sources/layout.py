"""Physical data layout: partitioning and bucketing (100 TB posture).

The reference's layout is timestamp directories (K6). At scale, layout IS
the query plan: a canonical table partitioned by (source, visit month)
prunes scans to the slices a query touches, and bucketing the record key
pre-shuffles once at write time so every downstream join/dedup on that
key is exchange-free.

- ``write_partitioned``   hive-style directory partitioning; readers get
  partition pruning (PartitionFilters in the scan) for free.
- ``write_bucketed``      bucketBy(record key) + sortBy, saved as a table;
  a join between two tables bucketed the same way plans with NO Exchange
  on either side — the Hudi-upsert merge (K7/J4) done shuffle-once-ever.
- ``compact_small_files`` the maintenance half of partitioning: many tiny
  writer outputs → few right-sized files per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """K6 generalized: hive-style partitioned parquet. Partition columns
    should be low-cardinality (source, date bucket) — one directory per
    value; high-cardinality keys belong in bucketing, not partitioning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist bucketed-by-key (requires a table in the session catalog —
    bucketing metadata lives in the metastore, not the files). Joins and
    aggregations on ``bucket_col`` between same-bucketed tables skip the
    exchange entirely."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_cols: list[str] | None = None,
) -> None:
    """Rewrite a parquet dataset into ~target-sized files. The writer-side
    fix for the small-files problem incremental pipelines accumulate."""
    df = spark.read.parquet(path)
    total_bytes = (
        spark._jsparkSession.sessionState()
        .executePlan(df._jdf.queryExecution().logical(), df._jdf.queryExecution().mode())
        .optimizedPlan()
        .stats()
        .sizeInBytes()
    )
    n_files = max(1, int(total_bytes) // (target_file_mb * 1024 * 1024))
    out = df.repartition(n_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_cols:
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    else:
        out.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (driver-side; object stores would use a manifest)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
