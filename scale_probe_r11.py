"""Round-11 scale probe: net_changes under hot-key skew (VERDICT r10
task 8).

CDC feeds are hot-key skewed in practice — one entity churning while a
million others write once. ``sources/cdc.net_changes`` is a single
groupBy(key).agg(min_by, max_by); the claim under test is that PARTIAL
(map-side) aggregation absorbs the hot key: each map task folds its
slice of the hot key's events into ONE partial row, so the reducer that
owns the hot key receives at most n_input_partitions rows for it, not
the full event count. If that holds, wall time for a skewed feed tracks
the uniform feed of the same TOTAL size, and the plan carries a
partial aggregate before the exchange.

Shapes (both 1.1M events total):
- uniform: 1.1M keys x 1 insert event
- skewed:  1M keys x 1 event + ONE key with 100k delete/insert churn

Usage:
    python scale_probe_r11.py
"""

from __future__ import annotations

import contextlib
import io
import time


def main() -> None:
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.session import get_spark
    from fda_clinical_etl_pipeline_spark.sources.cdc import net_changes

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def churn_uniform(n: int):
        return (
            spark.range(n).select(
                F.col("id").alias("k"),
                F.lit("insert").alias("_change_type"),
                F.lit(0).alias("_change_ordinal"),
                (F.col("id") % 97).alias("val"),
            )
        )

    def churn_skewed(n_cold: int, n_hot: int):
        cold = churn_uniform(n_cold)
        # one key, n_hot alternating delete/insert events with rising
        # ordinals — the worst case: every event is a distinct version
        hot = spark.range(n_hot).select(
            F.lit(-1).cast("long").alias("k"),
            F.when((F.col("id") % 2) == 0, "delete")
            .otherwise("insert").alias("_change_type"),
            F.col("id").cast("int").alias("_change_ordinal"),
            (F.col("id") % 97).alias("val"),
        )
        return cold.unionByName(hot)

    def run(df, label: str) -> float:
        out = net_changes(df, keys=["k"])
        out.count()  # warm
        t0 = time.perf_counter()
        n = out.count()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s ({n} net rows)")
        return dt

    # plan shape: partial aggregate BEFORE the exchange
    plan_df = net_changes(churn_skewed(1000, 1000), keys=["k"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    has_partial = "partial_min_by" in plan or "partial_min" in plan
    print(f"plan has map-side partial aggregation: {has_partial}")
    assert has_partial, "no partial aggregate before the exchange"

    uni = run(churn_uniform(1_100_000), "uniform 1.1M keys x 1 event")
    skew = run(
        churn_skewed(1_000_000, 100_000),
        "skewed 1M keys + 1 key x 100k events",
    )
    print(f"skew/uniform wall ratio: {skew / uni:.2f}x "
          "(partial agg absorbs the hot key)")


if __name__ == "__main__":
    main()
