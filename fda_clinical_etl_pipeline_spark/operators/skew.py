"""Skew-handling utilities (100 TB posture; SURVEY.md §4.4).

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime; these helpers cover the cases AQE can't: skewed aggregations and
broadcast-ineligible skewed joins where you know the hot keys (or don't,
and salt uniformly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import money, tables


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with uniform salting: the skewed (left) side gets a
    random-ish salt derived from a stable row fingerprint; the small-ish
    (right) side is replicated ``salt_buckets`` times. Hot keys spread
    over ``salt_buckets`` reducers instead of one.

    Use when: right side is too big to broadcast, left key distribution
    is heavy-tailed, and AQE's skew splitting can't kick in (e.g. the
    shuffle feeds a window, not a join).
    """
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in left.columns])) % salt_buckets)
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_salted, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: phase 1 aggregates (key, salt) partials,
    phase 2 merges partials per key. Only decomposable aggregates
    (sum/count/min/max) qualify — the merge function must equal the
    partial function.

    ``agg_exprs``: {column: fn} with fn ∈ {sum, count, min, max}.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn in agg_exprs.values():
        if fn not in merge_fn:
            raise ValueError(f"{fn} is not decomposable; use plain groupBy")
    salt = (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt_buckets)
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            *[
                getattr(F, fn)(c).alias(f"_p_{c}")
                for c, fn in agg_exprs.items()
            ]
        )
    )
    return phase1.groupBy(key).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{c}").alias(f"{fn}_{c}")
            for c, fn in agg_exprs.items()
        ]
    )


@register(
    "skew_salted_join_agg",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Salting-preserves-semantics gate: the engine runs salted_join "
        "(left salted on a row fingerprint, right replicated 16x) and the "
        "oracle runs the PLAIN join — identical aggregates prove the skew "
        "mitigation never changes results, only the shuffle layout.",
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    joined = salted_join(
        orders.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"),
        customer.select("c_custkey", "c_mktsegment"),
        "c_custkey",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money(F.sum("o_totalprice")).alias("revenue"),
    )


@register(
    "skew_two_phase_agg",
    """
    SELECT o_orderstatus,
           ROUND(SUM(o_totalprice), 2) AS sum_o_totalprice,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_o_orderkey
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Two-phase (salted) aggregation gate: partials per (key, salt) "
        "then merge per key must equal the plain GROUP BY the oracle "
        "runs — decomposable-aggregate correctness under skew salting.",
)
def skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    out = two_phase_agg(
        orders, "o_orderstatus",
        {"o_totalprice": "sum", "o_orderkey": "max"},
    )
    return out.select(
        "o_orderstatus",
        money(F.col("sum_o_totalprice")).alias("sum_o_totalprice"),
        F.col("max_o_orderkey").cast("long").alias("max_o_orderkey"),
    )


def key_histogram(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Diagnostic: the hot-key histogram you look at before choosing a
    strategy — top keys by row count plus their share of the table.
    Single plan: the total is a 1-row aggregate cross-joined in, not a
    separate driver-side count."""
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    return (
        df.groupBy(key)
        .count()
        .crossJoin(total)
        .withColumn("share", F.round(F.col("count") / F.col("_total"), 4))
        .drop("_total")
        .orderBy(F.col("count").desc())
        .limit(top_n)
    )


# --- runtime Bloom-filter join pruning (semi-join reduction) ----------------
#
# The third leg of the shuffle-reduction toolkit next to broadcasting
# and salting: when the dim side carries a selective predicate but is
# too big (or too late-bound) to broadcast, Catalyst can inject a
# Bloom filter built from the dim keys UNDER the fact side's shuffle,
# so non-matching fact rows die at the scan instead of being shuffled.
# This is pure optimizer work — the join itself stays declarative; the
# helper below only scopes the configs that govern injection, because
# the local-mode defaults (10 GB application-side scan threshold) are
# sized for clusters and would never fire on test data.


from contextlib import contextmanager


@contextmanager
def runtime_bloom_filters(
    spark: SparkSession,
    creation_side_max: str = "10MB",
    application_side_min: str = "10GB",
):
    """Scoped enablement of Catalyst runtime Bloom-filter injection
    (`spark.sql.optimizer.runtime.bloomFilter.*`). Defaults mirror the
    cluster-sized stock thresholds; tests pass tiny ones so injection
    fires on fixture data. Restores prior values on exit — plans must
    be EXECUTED inside the scope (optimization happens at action time).

    At 100 TB: leave the defaults on. A selective dim predicate then
    prunes the fact side's 100 TB scan down to matching keys before the
    shuffle — the same effect DPP has for partition columns, extended
    to arbitrary join keys.
    """
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            creation_side_max,
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": application_side_min,
    }
    prior = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
