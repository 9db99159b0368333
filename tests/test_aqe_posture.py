"""Cluster-posture regression (VERDICT r9 task 6): bench runs with
AQE off and 4 shuffle partitions (local-latency posture), but a real
1000-executor deployment runs AQE ON with
``spark.sql.shuffle.partitions`` in the hundreds. These tests pin
that the engine's plans stay CORRECT and shuffle-sane under the
cluster posture — results identical, skew routed through AQE's
runtime splitting rather than relying on the manual salt helpers.

All confs toggled here are runtime-settable, so the shared test
session is reconfigured around each test and restored after.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"

# representative headline plans: scan-agg, 3-way join + top-k, join
# spine with broadcast dims, window dedup, exact dedup (groupBy),
# similarity (posexplode + partial agg), max-by, left-join counts
POSTURE_QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "window_latest_per_key",
    "dedup_exact",
    "sim_cosine_topk",
    "agg_max_by_precombine",
    "join_left_order_counts",
)

CLUSTER_POSTURE = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.shuffle.partitions": "200",
}


@contextlib.contextmanager
def _posture(spark, confs: dict[str, str]):
    old: dict[str, str | None] = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _canon(df) -> list[tuple]:
    """Order- and ulp-tolerant canonical rows: partitioning changes
    reorder float reductions, so compare at 1e-6 relative grain."""
    cols = sorted(df.columns)

    def norm(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    return sorted(
        tuple(norm(r[c]) for c in cols) for r in df.collect()
    )


def test_headline_results_stable_under_cluster_posture(spark):
    qs = all_queries()
    base = {
        n: _canon(qs[n].fn(spark, SF_DIR)) for n in POSTURE_QUERIES
    }
    with _posture(spark, CLUSTER_POSTURE):
        for n in POSTURE_QUERIES:
            got = _canon(qs[n].fn(spark, SF_DIR))
            assert got == base[n], (
                f"{n}: AQE-on/200-partition posture changed the "
                "result"
            )


def test_aqe_coalesces_oversized_shuffles(spark):
    """200 post-shuffle partitions over sf0.01 data must COALESCE at
    runtime (the static count is a cluster-sized default, not a
    promise) — otherwise every small stage pays 200-task scheduling
    at every scale below the conf's design point."""
    with _posture(spark, CLUSTER_POSTURE):
        qs = all_queries()
        df = qs["q1_pricing_summary"].fn(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "AQEShuffleRead coalesced" in plan, plan[:2000]


def test_skewed_join_routed_through_aqe_skew_split(spark):
    """A hot key holding 50% of the left side must be SPLIT by AQE's
    skew-join handling (SortMergeJoin(skew=true) + skewed shuffle
    reads) — the cluster-posture alternative to the manual salting
    helper, with no query rewrite."""
    confs = {
        **CLUSTER_POSTURE,
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # sized to the probe's ~MB shuffle so the hot partition
        # trips the detector exactly as a hot TB would on a cluster
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin."
        "skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    with _posture(spark, confs):
        left = spark.range(0, 400000).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id")).alias("k"),
            (F.col("id") % 97).alias("x"),
        )
        right = spark.range(0, 2000).select(
            F.col("id").alias("k"), F.lit("d").alias("tag"),
        )
        j = left.join(right, "k")
        rows = j.count()
        assert rows == 200000 + 1000  # hot key 0 + odd keys < 2000
        j2 = left.join(right, "k")
        got = len(j2.collect())
        assert got == rows
        plan = j2._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead ... and skewed