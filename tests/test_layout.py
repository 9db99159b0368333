"""Physical-layout tests: partition pruning actually prunes (plan shows
PartitionFilters and skips directories) and bucketed joins actually skip
the exchange."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)


def explain_str(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_partition_pruning(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["order_year"])

    years = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("order_year=")
    )
    assert len(years) >= 3  # hive-style directories exist

    pruned = spark.read.parquet(path).filter(F.col("order_year") == 1996)
    plan = explain_str(pruned)
    assert "PartitionFilters: [isnotnull(order_year" in plan
    # correctness: only 1996 rows
    assert pruned.select(F.min("order_year"), F.max("order_year")).collect()[0] == (
        1996, 1996,
    )


def test_zorder_clusters_row_groups(spark, sf_dir, tmp_path):
    """Z-ordered files must actually skip: after clustering orders by
    (o_custkey, o_totalprice), a selective predicate on either column
    touches a small fraction of files (parquet footer min/max check)."""
    import glob

    import pyarrow.parquet as pq

    from fda_clinical_etl_pipeline_spark.sources.layout import write_zordered

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_z")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], num_files=16)

    back = spark.read.parquet(path)
    assert back.count() == orders.count()  # lossless

    def files_matching(col, lo, hi):
        hits = 0
        files = glob.glob(path + "/part-*.parquet")
        for f in files:
            md = pq.read_metadata(f)
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema: md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                }
                st = cols[col].statistics
                if st.min <= hi and st.max >= lo:
                    hits += 1
                    break
        return hits, len(files)

    # narrow custkey range → most files skippable via footer stats
    hit, total = files_matching("o_custkey", 10, 12)
    assert total >= 8
    assert hit <= total // 2, f"custkey range hit {hit}/{total} files"
    hit2, _ = files_matching("o_totalprice", 0.0, 20000.0)
    assert hit2 <= total // 2 + 2, f"price range hit {hit2}/{total} files"


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    # warehouse dir is static config; the session default (spark-warehouse
    # under cwd) is fine for the scratch tables dropped in finally
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")
    try:
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, F.col("o_orderkey") == F.col("l_orderkey")).groupBy(
            "o_orderstatus"
        ).agg(F.sum("l_quantity").alias("q"))
        # force a sort-merge plan (no broadcast) to expose bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = explain_str(joined)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        join_section = plan.split("HashAggregate")[0]
        # bucketed co-located join: no Exchange below the join
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # and the result matches the plain join
        plain = (
            orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("q"))
        )
        got = {r["o_orderstatus"]: r["q"] for r in joined.collect()}
        want = {r["o_orderstatus"]: r["q"] for r in plain.collect()}
        assert got.keys() == want.keys()
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_hilbert_index_matches_reference(spark):
    """The unrolled Spark Hilbert expression must equal the driver-side
    reference cell-for-cell on the full 64x64 grid (bits=6), be a
    bijection onto [0, 4096), and take ONLY unit steps (consecutive
    indexes are grid neighbors) — the property that distinguishes a
    true Hilbert curve from a z-curve (which jumps at power-of-two
    boundaries)."""
    from fda_clinical_etl_pipeline_spark.operators.layout import (
        hilbert_index_apply,
        hilbert_xy2d,
    )

    bits, n = 6, 64
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["__hd"]
        for r in hilbert_index_apply(grid, "x", "y", bits=bits).collect()
    }
    assert len(set(got.values())) == n * n  # bijection
    cell_of = {}
    for (x, y), d in got.items():
        assert d == hilbert_xy2d(bits, x, y)
        cell_of[d] = (x, y)
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = cell_of[d], cell_of[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps only


def test_hilbert_frame_refuses_wrong_arity(spark):
    from fda_clinical_etl_pipeline_spark.operators.layout import (
        hilbert_frame,
    )

    df = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"),
        (F.col("id") * 3).alias("c"),
    )
    with pytest.raises(ValueError, match="exactly 2"):
        hilbert_frame(df, ["a"], 4)
    with pytest.raises(ValueError, match="exactly 2"):
        hilbert_frame(df, ["a", "b", "c"], 4)


def test_curve_frames_preserve_rows(spark):
    """zorder_frame and hilbert_frame are pure REORDERINGS: the laid-out
    frame must hold exactly the input multiset (duplicates included) in
    the requested number of non-empty partitions."""
    from fda_clinical_etl_pipeline_spark.operators.layout import (
        hilbert_frame,
        zorder_frame,
    )

    df = spark.range(0, 5000).select(
        ((F.col("id") * 7919) % 500).alias("x"),
        ((F.col("id") * 104729) % 500).alias("y"),
        (F.col("id") % 97).alias("payload"),
    )
    want = sorted(tuple(r) for r in df.collect())
    for frame in (zorder_frame, hilbert_frame):
        laid = frame(df, ["x", "y"], 16)
        assert sorted(tuple(r) for r in laid.collect()) == want
        n_parts = laid.rdd.getNumPartitions()
        assert n_parts == 16, frame.__name__
