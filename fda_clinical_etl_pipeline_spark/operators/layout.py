"""Shared physical-layout transformations for the table-format twins.

``zorder_frame`` is the multi-column clustering core both OPTIMIZE
ZORDER (Delta twin, ``delta_log.DeltaProtocolTable.compact``) and the
Iceberg twin's ``rewrite_data_files(zorder_by=...)`` run: order rows
along the Z-curve over the given columns and range-split into one
partition per output file, so every file's [min, max] bounds are tight
on EVERY z-ordered column and single-column data skipping prunes on
any of them — the multi-dimensional counterpart of a plain sorted
rewrite (tight on one column only).

``hilbert_frame`` is the same construction along the Hilbert curve —
the space-filling curve Delta Lake's clustered tables ("liquid
clustering") use instead of the Z-curve, because consecutive Hilbert
indexes are ALWAYS grid neighbors (the Z-curve takes long diagonal
jumps at power-of-two boundaries), so per-file bounding boxes come out
tighter on average.

Reference analog: none (the reference rewrites whole datasets); this
is 100 TB layout hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8


def zorder_value_apply(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS,
    out: str = "__zval",
) -> DataFrame:
    """Add column ``out`` = Z-curve value of ``cols``.

    Per-column bucket ids come from the range-partition-id trick
    (repartitionByRange + spark_partition_id — partition ids are
    monotone in the column under RangePartitioner), giving each row a
    0..2^bits-1 rank bucket with one shuffle per column and no global
    window. Bucket bits interleave JVM-side into the z-value."""
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
    return work.withColumn(out, zval).drop(
        *[f"__zb{i}" for i in range(k)]
    )


def zorder_frame(
    df: DataFrame, cols: list[str], target_files: int,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Order ``df`` along the Z-curve over ``cols`` and range-split
    it into ``target_files`` partitions (one output file each). Cost:
    len(cols)+1 shuffles of the rewritten data — maintenance-op
    economics."""
    return (
        zorder_value_apply(df, cols, bits=bits, out="__zval")
        .repartitionByRange(target_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Driver-side reference: Hilbert index of grid cell (x, y) on the
    2^bits x 2^bits grid (the classic iterative xy→d with per-level
    rotation). The Spark expression in ``hilbert_index_apply`` is this
    loop unrolled; tests pin the two equal cell-for-cell."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_index_apply(
    df: DataFrame, xcol: str, ycol: str, bits: int = ZORDER_BITS,
    out: str = "__hd",
) -> DataFrame:
    """Add column ``out`` = Hilbert index of integer grid coordinates
    (``xcol``, ``ycol``) in [0, 2^bits). The per-level rotation loop is
    unrolled into ``bits`` simultaneous column updates (withColumns
    evaluates every expression against the PRE-update row, matching the
    reference's read-then-rotate order), so the whole index is one
    codegen'd projection — no UDF, no Python in the hot path."""
    hx, hy = f"{out}_x", f"{out}_y"
    work = (
        df.withColumn(hx, F.col(xcol).cast("long"))
        .withColumn(hy, F.col(ycol).cast("long"))
        .withColumn(out, F.lit(0).cast("long"))
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        x, y = F.col(hx), F.col(hy)
        rx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, i).bitwiseAND(F.lit(1))
        work = work.withColumns({
            out: F.col(out)
            + (F.lit(s * s) * (rx * 3).bitwiseXOR(ry)).cast("long"),
            # ry==1: no rotation; ry==0 & rx==1: flip both then swap;
            # ry==0 & rx==0: plain swap
            hx: F.when(ry == 1, x)
            .when(rx == 1, F.lit(s - 1) - y)
            .otherwise(y),
            hy: F.when(ry == 1, y)
            .when(rx == 1, F.lit(s - 1) - x)
            .otherwise(x),
        })
    return work.drop(hx, hy)


def hilbert_frame(
    df: DataFrame, cols: list[str], target_files: int,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Order ``df`` along the Hilbert curve over exactly TWO columns
    and range-split into ``target_files`` partitions (one output file
    each) — the clustered-table ("liquid clustering") counterpart of
    ``zorder_frame``, same bucketing construction: per-column rank
    buckets from repartitionByRange + spark_partition_id (monotone in
    the column under RangePartitioner, one shuffle per column, no
    global window), then the unrolled Hilbert index and one final range
    partition. Cost: 3 shuffles of the rewritten data.

    Two columns only: the d-dimensional compact Hilbert index needs
    per-level reflections that don't unroll cleanly; for other arities
    use ``zorder_frame`` (any k) or a plain sorted rewrite (k=1)."""
    return (
        hilbert_value_apply(df, cols, bits=bits, out="__hd")
        .repartitionByRange(target_files, F.col("__hd"))
        .sortWithinPartitions("__hd")
        .drop("__hd")
    )


def hilbert_value_apply(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS,
    out: str = "__hd",
) -> DataFrame:
    """Add column ``out`` = Hilbert index over exactly TWO columns'
    range-rank buckets (same bucketing construction as
    ``zorder_value_apply``, then the unrolled index)."""
    if len(cols) != 2:
        raise ValueError(
            "hilbert layout clusters exactly 2 columns; got "
            f"{cols!r} — use zorder_frame for other arities"
        )
    n_buckets = 1 << bits
    work = df
    for i, c in enumerate(cols):
        work = (
            work.repartitionByRange(n_buckets, F.col(c))
            .withColumn(f"__hb{i}", F.spark_partition_id())
        )
    return hilbert_index_apply(
        work, "__hb0", "__hb1", bits=bits, out=out
    ).drop("__hb0", "__hb1")
