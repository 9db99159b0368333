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


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> "F.Column":
    """Z-order (Morton) interleaved-bit sort key over N columns.

    Numeric/timestamp columns are bucketized ORDER-PRESERVINGLY into
    2^bits equal-width cells (min/max from one tiny driver agg) so range
    predicates benefit; string columns fall back to hash buckets, which
    cluster equality predicates only (documented trade: true rank
    bucketing of strings needs a quantile pass). The bit planes then
    interleave: sorting by the key keeps rows that are close in EVERY
    dimension inside the same parquet row groups, so min/max stats prune
    multi-column predicates — Z-ORDER BY for plain parquet.
    """
    n_cells = 2 ** bits
    numeric_types = {"int", "bigint", "smallint", "tinyint", "double",
                     "float", "date", "timestamp", "timestamp_ntz"}
    dtypes = dict(df.dtypes)
    needs_stats = [c for c in cols if dtypes.get(c, "") in numeric_types
                   or dtypes.get(c, "").startswith("decimal")]
    stats = {}
    if needs_stats:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in needs_stats],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in needs_stats],
        ).collect()[0]
        stats = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in needs_stats}

    normalized = []
    for c in cols:
        if c in stats:
            mn, mx = stats[c]
            span = (mx - mn) or 1.0
            bucket = F.least(
                F.lit(n_cells - 1),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * n_cells
                ),
            ).cast("long")
        else:
            bucket = (F.abs(F.xxhash64(F.col(c))) % n_cells).cast("long")
        normalized.append(F.coalesce(bucket, F.lit(0)))

    key = F.lit(0).cast("long")
    for bit in range(bits):
        for i, n in enumerate(normalized):
            pos = bit * len(cols) + i
            key = key + F.shiftleft(
                F.shiftrightunsigned(n, bit).bitwiseAND(F.lit(1)), pos
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster-by-Z-order write: range-partition then sort by the Morton
    key so each output file covers a compact multi-dimensional cell."""
    key = zorder_key(df, zorder_cols)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


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
