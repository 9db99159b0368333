"""Shared physical-layout transformations for the table-format twins.

``zorder_frame`` is the multi-column clustering core both OPTIMIZE
ZORDER (Delta twin, ``delta_log.DeltaProtocolTable.compact``) and the
Iceberg twin's ``rewrite_data_files(zorder_by=...)`` run: order rows
along the Z-curve over the given columns and range-split into one
partition per output file, so every file's [min, max] bounds are tight
on EVERY z-ordered column and single-column data skipping prunes on
any of them — the multi-dimensional counterpart of a plain sorted
rewrite (tight on one column only).

Reference analog: none (the reference rewrites whole datasets); this
is 100 TB layout hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8


def zorder_frame(
    df: DataFrame, cols: list[str], target_files: int,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Order ``df`` along the Z-curve over ``cols`` and range-split
    it into ``target_files`` partitions (one output file each).

    Per-column bucket ids come from the range-partition-id trick
    (repartitionByRange + spark_partition_id — partition ids are
    monotone in the column under RangePartitioner), giving each row a
    0..2^bits-1 rank bucket with one shuffle per column and no global
    window. Bucket bits interleave JVM-side into the z-value. Cost:
    len(cols)+1 shuffles of the rewritten data — maintenance-op
    economics."""
    n_buckets = 1 << bits
    work = df
    for i, c in enumerate(cols):
        work = (
            work.repartitionByRange(n_buckets, F.col(c))
            .withColumn(f"__zb{i}", F.spark_partition_id())
        )
    # interleave: output bit (bit*k + j) takes bit `bit` of col j —
    # built as a static JVM expression, no Python in the hot path
    k = len(cols)
    zval = F.lit(0).cast("long")
    for bit in range(bits):
        for j in range(k):
            zval = zval + F.shiftleft(
                F.shiftright(F.col(f"__zb{j}"), bit).bitwiseAND(1),
                bit * k + j,
            ).cast("long")
    return (
        work.withColumn("__zval", zval)
        .repartitionByRange(target_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval", *[f"__zb{i}" for i in range(k)])
    )
