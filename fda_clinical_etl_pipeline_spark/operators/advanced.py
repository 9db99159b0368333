"""Advanced relational operators: pivot, percentiles, batch
sessionization, range joins, sketches, ordered string aggregation —
rounding out SURVEY.md §2.5–§2.6's "comes free in Spark" generalizations
with oracle-checked implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..cache import persist_tracked
from ._util import money, tables

ORDER_STATUSES = ("F", "O", "P")


@register(
    "pivot_status_priority",
    """
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS status_F,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS status_O,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS status_P,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS rev_F,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS rev_O,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS rev_P
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (wide aggregation): groupBy().pivot() with an explicit "
        "value list — one pass, no per-value scans; explicit values keep "
        "the schema static (no discovery job).",
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("rev"),
        )
    )
    cols = [F.col("o_orderpriority")]
    for s in ORDER_STATUSES:
        cols.append(F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"status_{s}"))
    for s in ORDER_STATUSES:
        cols.append(money(F.coalesce(F.col(f"{s}_rev"), F.lit(0))).alias(f"rev_{s}"))
    return pivoted.select(*cols)


@register(
    "unpivot_customer_metrics",
    """
    SELECT c_custkey, metric, ROUND(value, 2) AS value
    FROM (
      SELECT c_custkey,
             c_acctbal        AS acctbal,
             CAST(c_nationkey AS DOUBLE) AS nationkey,
             CAST(LENGTH(c_name) AS DOUBLE) AS name_len
      FROM customer
    )
    UNPIVOT (value FOR metric IN (acctbal, nationkey, name_len))
    """,
    doc="UNPIVOT (melt) — the inverse reshape of pivot: wide metric "
        "columns to (key, metric, value) long form via DataFrame.unpivot; "
        "narrow operation, no shuffle.",
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    wide = customer.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
        F.length("c_name").cast("double").alias("name_len"),
    )
    return wide.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey", "name_len"],
        variableColumnName="metric",
        valueColumnName="value",
    ).select("c_custkey", "metric", money("value").alias("value"))


@register(
    "percentile_prices",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           ROUND(MIN(o_totalprice), 4) AS min_price,
           ROUND(MAX(o_totalprice), 4) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (SQL percentile_cont semantics). "
        "Exact percentile needs the group's values together — fine for "
        "grouped stats; the streaming/sketch path is approx_distinct_users.",
)
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        money(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        money(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        money(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        money(F.min("o_totalprice"), 4).alias("min_price"),
        money(F.max("o_totalprice"), 4).alias("max_price"),
    )


@register(
    "batch_sessionize_events",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
               AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS value_sum
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Batch sessionization (gap = 30 min): lag → new-session flag → "
        "running sum as session id → grouped rollup. The batch twin of "
        "streaming/pipeline.py::sessionize — same sessions, one window "
        "shuffle on user_id.",
)
def batch_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_ok = (
        F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    ) <= 1800
    marked = events.select(
        "user_id", "ts", "value",
        F.when(gap_ok, 0).otherwise(1).alias("new_session"),
    )
    numbered = marked.select(
        "user_id", "ts", "value",
        F.sum("new_session").over(w_run).alias("session_id"),
    )
    return (
        numbered.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum("value")).alias("value_sum"),
        )
    )


@register(
    "session_window_native",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
               AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS value_sum
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Spark's NATIVE session_window (30-min gap) hash-checked against "
        "the lag/cumsum SQL formulation — proves the built-in gap-window "
        "semantics equal the hand-rolled ones (and the streaming "
        "sessionizer's). Single shuffle on (user_id).",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum("value")).alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


@register(
    "range_join_price_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 1000.0), ('mid', 1000.0, 10000.0),
             ('high', 10000.0, 100000.0), ('lux', 100000.0, 1e12)
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    doc="Range (non-equi) join against a tiny bands dimension: broadcast "
        "nested-loop — each fact row tests 4 intervals in codegen; never a "
        "shuffle. The general range-join pattern for interval enrichment.",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    # SQL VALUES (not createDataFrame): a true LocalRelation — Python
    # local data becomes an RDD-backed plan that costs a full pickled-row
    # job per action (~0.3 s floor measured) and blocks codegen collapse.
    bands = spark.sql(
        "SELECT * FROM VALUES "
        "('budget', 0.0D, 1000.0D), ('mid', 1000.0D, 10000.0D), "
        "('high', 10000.0D, 100000.0D), ('lux', 100000.0D, 1e12D) "
        "AS bands(band, lo, hi)"
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("o_totalprice")).alias("total"),
        )
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++) per event_type — the "
        "sketch path for 100 TB cardinality (constant memory per group "
        "vs the exact path's full key set). Self-validating oracle gate: "
        "the HLL value itself is engine-specific, so the result carries "
        "the exact count plus within_tol = |approx-exact|/exact <= 5% "
        "(2.5 sigma at rsd=0.02) computed Spark-side; DuckDB emits "
        "literal TRUE, so the hash matches iff the sketch is accurate.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.countDistinct("user_id")
            )
            / F.countDistinct("user_id")
            <= F.lit(0.05)
        ).alias("within_tol"),
    )


@register(
    "approx_percentile_sketch",
    """
    SELECT o_orderstatus,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice),
                 4) AS p50_exact,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS within_tol
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_percentile (Greenwald-Khanna, accuracy=1000) vs the exact "
        "interpolated percentile — the constant-memory percentile path "
        "for unbounded groups at 100 TB. Self-validating oracle gate: "
        "the GK sketch value is algorithm-specific, so the result carries "
        "the exact p50 plus within_tol = |approx-exact|/exact <= 2% "
        "computed Spark-side; DuckDB emits literal TRUE, so the hash "
        "matches iff the sketch lands within tolerance.",
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        money(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50_exact"),
        F.count(F.lit(1)).alias("n"),
        (
            F.abs(
                F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000))
                - F.percentile("o_totalprice", F.lit(0.5))
            )
            / F.percentile("o_totalprice", F.lit(0.5))
            <= F.lit(0.02)
        ).alias("within_tol"),
    )


@register(
    "listagg_top_customers",
    """
    WITH ranked AS (
      SELECT c_mktsegment, c_name,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    SELECT c_mktsegment,
           STRING_AGG(c_name, ',' ORDER BY rn) AS top3_names
    FROM ranked WHERE rn <= 3
    GROUP BY c_mktsegment
    """,
    doc="Ordered string aggregation (LISTAGG): rank-filter then "
        "sorted collect_list + array_join — deterministic order baked in.",
)
def listagg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    ranked = customer.select(
        "c_mktsegment", "c_name", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    return ranked.groupBy("c_mktsegment").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("c_name")))
                ),
                lambda s: s["c_name"],
            ),
            ",",
        ).alias("top3_names")
    )


@register(
    "grouping_sets_explicit",
    """
    SELECT COALESCE(o_orderstatus, 'ALL')               AS status,
           COALESCE(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT), -1) AS order_year,
           CAST(COUNT(*) AS BIGINT)                     AS n,
           ROUND(SUM(o_totalprice), 2)                  AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)), ())
    """,
    doc="Explicit GROUPING SETS (neither rollup nor cube): per-status, "
        "per-year, and grand total in one Expand pass — SQL-level syntax "
        "through spark.sql over a temp view.",
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL')             AS status,
               COALESCE(YEAR(o_orderdate), -1)            AS order_year,
               COUNT(*)                                   AS n,
               ROUND(SUM(o_totalprice), 2)                AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (YEAR(o_orderdate)), ())
        """
    )


@register(
    "anomaly_zscore_events",
    """
    WITH stats AS (
      SELECT event_id, event_type, value,
             AVG(value)         OVER (PARTITION BY event_type) AS mu,
             STDDEV_SAMP(value) OVER (PARTITION BY event_type) AS sigma
      FROM events
    )
    SELECT event_id, event_type, ROUND(value, 2) AS value,
           ROUND((value - mu) / sigma, 4) AS zscore
    FROM stats
    WHERE sigma > 0 AND ABS((value - mu) / sigma) > 2.5
    """,
    doc="Anomaly detection: per-event-type z-score via an unordered "
        "analytic window (one shuffle on event_type, stats computed once "
        "per partition) — flags |z| > 2.5 outliers. The data-quality "
        "monitor shape for streams.",
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    sigma = F.stddev_samp("value").over(w)
    z = (F.col("value") - F.avg("value").over(w)) / sigma
    # filter on the UNROUNDED z (same expression as the oracle); rounding
    # only the projected output — filtering on the rounded value would
    # disagree with the oracle at the 2.5 boundary
    return (
        events.select(
            "event_id", "event_type",
            money("value").alias("value"),
            z.alias("_z"), sigma.alias("_sigma"),
        )
        .filter((F.col("_sigma") > 0) & (F.abs("_z") > 2.5))
        .select(
            "event_id", "event_type", "value",
            F.round("_z", 4).alias("zscore"),
        )
    )


@register(
    "funnel_conversion",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS users_total,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS stage_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
    FROM per_user
    """,
    doc="Funnel analysis (signup → first later click → first later "
        "purchase): conditional MIN per stage in ONE grouped pass over the "
        "event stream, then ordered-stage predicates — no joins, no "
        "self-union; shuffle = one row per user.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.sum(F.when(signed, 1).otherwise(0)).cast("long").alias("stage_signup"),
        F.sum(F.when(clicked, 1).otherwise(0)).cast("long").alias("stage_click"),
        F.sum(F.when(purchased, 1).otherwise(0)).cast("long").alias(
            "stage_purchase"
        ),
    )


@register(
    "subquery_above_avg",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM (
      SELECT *, AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders
    )
    WHERE o_totalprice > 1.5 * cust_avg
    """,
    doc="Correlated-subquery pattern (orders above 1.5× their customer's "
        "average) decorrelated into a window — one shuffle on the "
        "correlation key instead of a per-row subquery.",
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey", "o_custkey", money("o_totalprice").alias("total_price")
        )
    )


@register(
    "cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id,
             MIN(DATE_TRUNC('week', CAST(ts AS DATE))) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id,
             DATE_TRUNC('week', CAST(ts AS DATE)) AS active_week
      FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(DATE_DIFF('day', cohort_week, active_week) // 7 AS INT)
             AS weeks_since,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention: users bucketed by first-seen week x weeks-"
        "since-cohort activity — two grouped aggs + one join on user_id "
        "(the cohort map is per-user-small and broadcastable at scale). "
        "The standard growth-analytics triangle.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts").cast("date")).cast("date")
    first_seen = (
        events.select("user_id", week.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_week"))
    )
    activity = events.select("user_id", week.alias("active_week")).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy("cohort_week", (
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("weeks_since")
        ))
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "weeks_since",
            "n_active_users",
        )
    )


@register(
    "histogram_prices",
    """
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 13
                     ELSE FLOOR(o_totalprice / 50000) + 1 END AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket — one partial+final agg, "
        "KBs of shuffle regardless of input size; the profiling "
        "primitive behind range-constraint tuning and skew detection.",
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    bucket = F.width_bucket(
        F.col("o_totalprice"), F.lit(0), F.lit(600000), F.lit(12)
    ).cast("int")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.min("o_totalprice")).alias("lo"),
            money(F.max("o_totalprice")).alias("hi"),
        )
    )


@register(
    "hopping_window_events",
    """
    WITH expanded AS (
      SELECT e.event_id, e.value,
             to_timestamp(epoch(date_trunc('minute', e.ts))
               - (epoch(date_trunc('minute', e.ts)) % 900) - k.k * 900)
               AS win_start
      FROM events e,
           (SELECT UNNEST(RANGE(0, 4)) AS k) k
      WHERE epoch(e.ts) - (epoch(date_trunc('minute', e.ts))
            - (epoch(date_trunc('minute', e.ts)) % 900) - k.k * 900) < 3600
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS value_sum
    FROM expanded
    GROUP BY 1
    """,
    doc="Hopping (sliding) window aggregation: 1-hour windows every 15 "
        "min — each event lands in 4 windows via F.window(slide), the "
        "batch twin of the streaming hop. Shuffle = 4x events into "
        "window-keyed aggs; the oracle expands the same 4 windows "
        "arithmetically.",
)
def hopping_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        events.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum("value")).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "value_sum",
        )
    )


def global_ntile(
    df: DataFrame,
    k: int,
    *order_cols: str,
    num_partitions: int | None = None,
    out_col: str = "_ntile",
) -> DataFrame:
    """Exact NTILE(k) over a total order WITHOUT a single-partition
    window — the distributed two-phase ranking pattern:

    1. ``repartitionByRange`` on the order columns: non-overlapping,
       ordered key ranges per partition (one shuffle, plus Spark's
       boundary-sampling pass);
    2. ``row_number`` windowed BY PARTITION ID — every partition ranks
       its own range in parallel;
    3. per-partition row counts (a ``num_partitions``-row relation)
       turn into global rank offsets via a bounded triangular self-join
       (NOT a window, so no unpartitioned Window node exists anywhere
       in this plan), broadcast back onto the ranked rows;
    4. the exact NTILE remainder rule (first ``n % k`` buckets take one
       extra row) applied arithmetically to global rank + total count.

    The per-task state is one partition's range, never the whole table:
    this is the plan that survives a 10^12-row total order, while
    agreeing row-for-row with ``NTILE(k) OVER (ORDER BY ...)``. Catalyst
    reuses the range exchange across the rank/count subtrees
    (ReusedExchange), so the input is shuffled once.

    ``order_cols`` must form a UNIQUE key (add a tiebreak column) — range
    partitioning never splits equal keys across partitions only when keys
    are distinct, and NTILE itself is nondeterministic without one.

    CORRECTNESS INVARIANT — one physical range exchange: ``with_pid``
    feeds both the rank subtree and the counts/offsets subtree, and
    RangePartitioner samples its boundaries with an RDD-id-derived seed,
    so TWO materializations could draw different boundaries and pair
    local ranks with the wrong offsets (silently wrong buckets). Under
    default config Catalyst's ReusedExchange guarantees one exchange
    (plan-asserted in tests/test_plan_quality.py); when
    ``spark.sql.exchange.reuse`` is disabled we pin the invariant by
    persisting the pid assignment instead.
    """
    if num_partitions is None:
        # track the session's parallelism: one range per core locally,
        # thousands of ranges on a real cluster — the knob that keeps
        # per-partition state bounded at any scale without hand-tuning
        # (fixed 64 measured 1.4-1.6x slower than matched-parallelism
        # on local[16/32] from pure task-scheduling overhead)
        num_partitions = max(
            df.sparkSession.sparkContext.defaultParallelism, 2
        )
    ranged = df.repartitionByRange(num_partitions, *order_cols)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    reuse_on = str(
        df.sparkSession.conf.get("spark.sql.exchange.reuse", "true")
    ).lower() == "true"
    if not reuse_on:
        with_pid = persist_tracked(with_pid)
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    local = with_pid.withColumn("_local_rn", F.row_number().over(w_local))
    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = (
        counts.alias("a")
        .join(counts.alias("b"), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_offset"))
    )
    total = counts.agg(F.sum("_cnt").alias("_n_total"))
    ranked = (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .withColumn("_r", F.col("_offset") + F.col("_local_rn"))
        .withColumn("_q", F.expr(f"_n_total div {k}"))
        .withColumn("_rem", F.col("_n_total") % k)
        # rows 1.._rem*(_q+1) fall in the big buckets; the rest in small
        .withColumn("_big", F.col("_rem") * (F.col("_q") + 1))
    )
    # integer ceil-division via `div` keeps bucket math exact at any n
    # (float division would wobble at boundary ranks near 2^53)
    bucket = F.when(
        F.col("_r") <= F.col("_big"),
        F.expr("(_r - 1) div (_q + 1) + 1"),
    ).otherwise(F.expr("_rem + ((_r - _big - 1) div _q) + 1"))
    # long, not int: DuckDB/ANSI NTILE returns BIGINT, and the driver's
    # Arrow-level hash is result-type-sensitive (strict_verify.py pins
    # the whole suite's schemas int64-for-int64)
    return ranked.withColumn(out_col, bucket.cast("long")).drop(
        "_pid", "_local_rn", "_offset", "_n_total", "_r", "_q", "_rem", "_big"
    )


@register(
    "ntile_price_deciles",
    """
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    GROUP BY decile
    """,
    doc="Decile bucketing with exact NTILE semantics and an explicit "
        "orderkey tiebreak, computed via distributed two-phase ranking "
        "(range repartition + per-partition row_number + broadcast "
        "offsets) — no single-partition window anywhere in the plan; "
        "the oracle's NTILE window proves row-exact parity.",
)
def ntile_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    deciled = global_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        10,
        "o_totalprice",
        "o_orderkey",
        out_col="decile",
    )
    return (
        deciled
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.min("o_totalprice")).alias("lo"),
            money(F.max("o_totalprice")).alias("hi"),
        )
    )


@register(
    "stats_price_by_status",
    """
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS price_stddev,
           ROUND(VAR_SAMP(o_totalprice), 4) AS price_var,
           ROUND(CORR(o_totalprice, CAST(o_custkey AS DOUBLE)), 4)
             AS corr_cust,
           ROUND(SKEWNESS(o_totalprice), 4) AS price_skew
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Statistical aggregates (stddev/variance/correlation/skewness) — "
        "all single-pass partial+final moments; KBs of shuffle from any "
        "input size. The profiling layer under anomaly thresholds.",
)
def stats_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    n = F.count(F.lit(1)).cast("double")
    # Spark's skewness is the population moment g1; DuckDB reports the
    # bias-corrected sample statistic G1 = g1 * sqrt(n(n-1)) / (n-2)
    sample_skew = (
        F.skewness("o_totalprice") * F.sqrt(n * (n - 1)) / (n - 2)
    )
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("o_totalprice"), 4).alias("price_var"),
        F.round(
            F.corr(F.col("o_totalprice"), F.col("o_custkey").cast("double")),
            4,
        ).alias("corr_cust"),
        F.round(sample_skew, 4).alias("price_skew"),
    )


@register(
    "mad_anomaly_events",
    """
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    ),
    dev AS (
      SELECT e.user_id, e.value, m.med,
             ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (user_id)
    ),
    mad AS (
      SELECT user_id, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY user_id
    )
    SELECT d.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           ROUND(MAX(m.mad), 4) AS mad
    FROM dev d JOIN mad m USING (user_id)
    GROUP BY d.user_id
    HAVING SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) > 0
    """,
    doc="Robust anomaly detection via median absolute deviation: per-user "
        "median -> absolute deviations -> per-user MAD -> flag |v-med| > "
        "3*MAD. Unlike the z-score variant, immune to the outliers it "
        "hunts. Two grouped percentile passes + joins on the user key "
        "(same shuffle key throughout — co-partitioned at scale).",
)
def mad_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    med = events.groupBy("user_id").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = events.join(med, "user_id").select(
        "user_id", "value", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("user_id").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.round(F.max("mad"), 4).alias("mad"),
        )
        .filter(F.col("n_outliers") > 0)
    )


@register(
    "approx_heavy_hitters",
    """
    WITH tot AS (SELECT COUNT(*) AS total FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS exact_cnt,
           TRUE AS within_tol
    FROM events CROSS JOIN tot
    GROUP BY user_id, total
    HAVING COUNT(*) >= 0.005 * total
    """,
    doc="Heavy hitters (users with >= 0.5% of all events) with a "
        "sample-based frequency estimate validated against the exact "
        "count — the 100 TB pattern where exact per-key counting is the "
        "verifier and a deterministic 25% hash sample (xxhash64 of the "
        "event id, no RNG state) is the cheap first pass. Relative "
        "error scales as 1/sqrt(f*n): loose (0.6) at these tiny SFs, "
        "tight at production counts. Self-validating gate: the sample "
        "estimate is engine-hash-specific, so DuckDB emits literal TRUE "
        "and the hash matches iff every estimate lands within "
        "tolerance.",
)
def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    total = events.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        events.crossJoin(F.broadcast(total))
        .groupBy("user_id", "total")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .filter(F.col("exact_cnt") >= 0.005 * F.col("total"))
    )
    est = (
        events.filter(F.expr("pmod(xxhash64(event_id), 4) = 0"))
        .groupBy("user_id")
        .agg((F.count(F.lit(1)) * 4).alias("est_cnt"))
    )
    return (
        exact.join(est, "user_id", "left")
        .select(
            "user_id",
            "exact_cnt",
            (
                F.abs(F.coalesce("est_cnt", F.lit(0)) - F.col("exact_cnt"))
                / F.col("exact_cnt")
                <= F.lit(0.6)
            ).alias("within_tol"),
        )
    )


@register(
    "ts_gapfill_ffill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             ROUND(AVG(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    j AS (
      SELECT grid.user_id, grid.h, hourly.v
      FROM grid LEFT JOIN hourly
        ON grid.user_id = hourly.user_id AND grid.h = hourly.h
    )
    SELECT user_id,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_filled,
           v IS NOT NULL AS observed
    FROM j
    """,
    doc="Time-series regularization: per-user hourly resample with "
        "gap-filled forward-fill — the dense-grid shape feature stores "
        "and monitoring rollups need. Grid = sequence(min,max) exploded "
        "per user (no driver loop); fill = last(v, ignorenulls) over a "
        "running frame (O(1) window state, partition bounded by one "
        "user's span). First grid point always observed by "
        "construction, so fill never emits NULL.",
)
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("h")
        ).agg(F.round(F.avg("value"), 6).alias("v"))
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    j = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNotNull().alias("observed"),
    )


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str],
) -> DataFrame:
    """Deequ-style one-pass column profile → long-format
    ``(column, metric, value: double)``.

    Every metric for every column computes in a SINGLE aggregate pass
    over the table (one scan, one reduce — at 100 TB the profile costs
    exactly one read, not one per column), then pivots to long form
    with ``stack`` (a narrow projection). Numerics get
    n/n_null/n_distinct/min/max/avg/stddev; categoricals get
    n/n_null/n_distinct plus min/max length — the shape a data-quality
    gate consumes before accepting a new corpus drop.
    """
    aggs, stack_items = [], []

    def add(col: str, metric: str, expr) -> None:
        name = f"{col}__{metric}"
        aggs.append(expr.alias(name))
        stack_items.append((col, metric, name))

    for c in numeric_cols:
        add(c, "n", F.count(F.lit(1)).cast("double"))
        add(c, "n_null",
            F.sum(F.col(c).isNull().cast("long")).cast("double"))
        add(c, "n_distinct", F.count_distinct(F.col(c)).cast("double"))
        add(c, "min", F.min(c).cast("double"))
        add(c, "max", F.max(c).cast("double"))
        add(c, "avg", F.round(F.avg(c), 6))
        add(c, "stddev", F.round(F.stddev_samp(c), 6))
    for c in categorical_cols:
        add(c, "n", F.count(F.lit(1)).cast("double"))
        add(c, "n_null",
            F.sum(F.col(c).isNull().cast("long")).cast("double"))
        add(c, "n_distinct", F.count_distinct(F.col(c)).cast("double"))
        add(c, "min_len", F.min(F.length(c)).cast("double"))
        add(c, "max_len", F.max(F.length(c)).cast("double"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', '{metric}', `{name}`"
        for col, metric, name in stack_items
    )
    return wide.select(
        F.expr(
            f"stack({len(stack_items)}, {stack_args}) "
            "AS (column_name, metric, value)"
        )
    )


@register(
    "profile_table_stats",
    """
    WITH w AS (
      SELECT COUNT(*)::DOUBLE AS a_n,
             SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::DOUBLE AS a_null,
             COUNT(DISTINCT o_totalprice)::DOUBLE AS a_nd,
             MIN(o_totalprice)::DOUBLE AS a_min,
             MAX(o_totalprice)::DOUBLE AS a_max,
             ROUND(AVG(o_totalprice), 6) AS a_avg,
             ROUND(STDDEV_SAMP(o_totalprice), 6) AS a_sd,
             COUNT(*)::DOUBLE AS k_n,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::DOUBLE AS k_null,
             COUNT(DISTINCT o_custkey)::DOUBLE AS k_nd,
             MIN(o_custkey)::DOUBLE AS k_min,
             MAX(o_custkey)::DOUBLE AS k_max,
             ROUND(AVG(o_custkey), 6) AS k_avg,
             ROUND(STDDEV_SAMP(o_custkey), 6) AS k_sd,
             COUNT(*)::DOUBLE AS s_n,
             SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::DOUBLE AS s_null,
             COUNT(DISTINCT o_orderstatus)::DOUBLE AS s_nd,
             MIN(LENGTH(o_orderstatus))::DOUBLE AS s_minl,
             MAX(LENGTH(o_orderstatus))::DOUBLE AS s_maxl,
             COUNT(*)::DOUBLE AS p_n,
             SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::DOUBLE AS p_null,
             COUNT(DISTINCT o_orderpriority)::DOUBLE AS p_nd,
             MIN(LENGTH(o_orderpriority))::DOUBLE AS p_minl,
             MAX(LENGTH(o_orderpriority))::DOUBLE AS p_maxl
      FROM orders
    )
    SELECT column_name, metric, value FROM (
      SELECT 'o_totalprice' AS column_name, 'n' AS metric, a_n AS value FROM w
      UNION ALL SELECT 'o_totalprice', 'n_null', a_null FROM w
      UNION ALL SELECT 'o_totalprice', 'n_distinct', a_nd FROM w
      UNION ALL SELECT 'o_totalprice', 'min', a_min FROM w
      UNION ALL SELECT 'o_totalprice', 'max', a_max FROM w
      UNION ALL SELECT 'o_totalprice', 'avg', a_avg FROM w
      UNION ALL SELECT 'o_totalprice', 'stddev', a_sd FROM w
      UNION ALL SELECT 'o_custkey', 'n', k_n FROM w
      UNION ALL SELECT 'o_custkey', 'n_null', k_null FROM w
      UNION ALL SELECT 'o_custkey', 'n_distinct', k_nd FROM w
      UNION ALL SELECT 'o_custkey', 'min', k_min FROM w
      UNION ALL SELECT 'o_custkey', 'max', k_max FROM w
      UNION ALL SELECT 'o_custkey', 'avg', k_avg FROM w
      UNION ALL SELECT 'o_custkey', 'stddev', k_sd FROM w
      UNION ALL SELECT 'o_orderstatus', 'n', s_n FROM w
      UNION ALL SELECT 'o_orderstatus', 'n_null', s_null FROM w
      UNION ALL SELECT 'o_orderstatus', 'n_distinct', s_nd FROM w
      UNION ALL SELECT 'o_orderstatus', 'min_len', s_minl FROM w
      UNION ALL SELECT 'o_orderstatus', 'max_len', s_maxl FROM w
      UNION ALL SELECT 'o_orderpriority', 'n', p_n FROM w
      UNION ALL SELECT 'o_orderpriority', 'n_null', p_null FROM w
      UNION ALL SELECT 'o_orderpriority', 'n_distinct', p_nd FROM w
      UNION ALL SELECT 'o_orderpriority', 'min_len', p_minl FROM w
      UNION ALL SELECT 'o_orderpriority', 'max_len', p_maxl FROM w
    )
    """,
    doc="One-pass deequ-style table profile: every metric for every "
        "column in a single aggregate over one scan, pivoted long via "
        "stack. The data-quality gate a pipeline runs before accepting "
        "a corpus drop.",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return profile_columns(
        orders,
        numeric_cols=["o_totalprice", "o_custkey"],
        categorical_cols=["o_orderstatus", "o_orderpriority"],
    )


@register(
    "rfm_segmentation",
    """
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT custkey,
             NTILE(5) OVER (ORDER BY last_order, custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, custkey)  AS f_score,
             NTILE(5) OVER (ORDER BY monetary, custkey)   AS m_score
      FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored
    GROUP BY 1, 2, 3
    """,
    doc="RFM customer segmentation: per-customer recency/frequency/"
        "monetary quintiles, each computed with the distributed "
        "two-phase global_ntile (range repartition + per-partition "
        "row_number + broadcast offsets — no single-partition window "
        "for ANY of the three rankings), then segment counts. The "
        "oracle's three NTILE windows prove row-exact parity of all "
        "three rankings at once.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    # Persist the O(customers) aggregate: each global_ntile runs a
    # boundary-sampling pass plus the rank/offset subtrees over its
    # input — chaining the three rankings made ranking k re-execute
    # the k-1 rankings before it (3 range exchanges nested three
    # deep). Over the cached frame the three rankings are independent
    # O(customers) subtrees, joined back on the unique custkey.
    per_cust = orders.groupBy(
        F.col("o_custkey").alias("custkey")
    ).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        money(F.sum("o_totalprice")).alias("monetary"),
    )
    per_cust = persist_tracked(per_cust)
    scored = None
    for col, score in (("last_order", "r_score"),
                       ("frequency", "f_score"),
                       ("monetary", "m_score")):
        ranked = global_ntile(
            per_cust.select("custkey", col), 5, col, "custkey",
            out_col=score,
        ).select("custkey", score)
        scored = ranked if scored is None else scored.join(
            ranked, "custkey"
        )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "supplier_pareto_8020",
    """
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT suppkey, revenue,
             SUM(revenue) OVER (
               ORDER BY revenue DESC, suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_rev,
             SUM(revenue) OVER () AS total_rev,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, suppkey) AS rk
      FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_top_suppliers,
           CAST(MAX(rk) AS BIGINT)  AS deepest_rank,
           ROUND(MAX(cum_rev), 2)   AS covered_revenue,
           ROUND(MAX(cum_rev) / MAX(total_rev), 4) AS covered_share
    FROM ranked
    WHERE cum_rev - revenue < 0.8 * total_rev
    """,
    doc="Pareto concentration analysis: the smallest prefix of "
        "suppliers (by descending revenue) covering 80% of total "
        "revenue. Cumulative share via a running-sum window over the "
        "per-supplier aggregate — the window runs over O(suppliers) "
        "pre-aggregated rows, never the fact table, and the 1-row "
        "global total broadcasts. Prefix rule (cum - own < 0.8*total) "
        "includes exactly the supplier that crosses the threshold.",
)
def supplier_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    rev = lineitem.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        money(F.sum(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")))).alias("revenue")
    )
    w = Window.orderBy(F.desc("revenue"), F.col("suppkey"))
    # suppliers are O(thousands) after pre-agg — a single-partition
    # window over the AGGREGATE is the right plan (the fact table never
    # enters a window); at 10^7+ suppliers switch to global_ntile-style
    # two-phase ranking, same as rfm_segmentation does
    ranked = (
        rev.withColumn("cum_rev",
                       F.sum("revenue").over(
                           w.rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("total_rev",
                    F.sum("revenue").over(
                        Window.partitionBy()))
    )
    top = ranked.where(
        F.col("cum_rev") - F.col("revenue")
        < 0.8 * F.col("total_rev")
    )
    return top.agg(
        F.count(F.lit(1)).alias("n_top_suppliers"),
        F.max("rk").cast("long").alias("deepest_rank"),
        money(F.max("cum_rev")).alias("covered_revenue"),
        F.round(F.max("cum_rev") / F.max("total_rev"), 4)
        .alias("covered_share"),
    )


@register(
    "basket_association_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM items),
    item_s AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM items GROUP BY 1
    ),
    pair_c AS (
      SELECT a.item AS u, b.item AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2
    )
    SELECT u, v, c,
           ROUND(c * 1.0 / n, 6)             AS support,
           ROUND(c * 1.0 / su.s, 6)          AS confidence_u_v,
           ROUND(c * 1.0 * n / (su.s * sv.s), 6) AS lift
    FROM pair_c
    JOIN item_s su ON su.item = u
    JOIN item_s sv ON sv.item = v
    CROSS JOIN nb
    WHERE c >= 3
    ORDER BY lift DESC, u, v
    LIMIT 100
    """,
    doc="Market-basket association rules over order contents: pair "
        "support, confidence and lift with a min-support gate and a "
        "deterministic top-100 by lift. Pair counts come from the "
        "bounded per-basket self-join (order size caps fan-out, the "
        "same guarantee the triangle gate uses); item supports join "
        "back broadcast-sized; the global basket count is a 1-row "
        "cross join, never a collect.",
)
def basket_association_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    # ONE shuffle groups each basket's distinct items into a sorted
    # array; supports, basket count and pair generation all read the
    # persisted O(baskets) frame. Pairs come from an in-array
    # combinations expression (bounded by basket size, same guarantee
    # as the self-join it replaces) — no join, no second exchange of
    # the item relation.
    baskets = lineitem.groupBy(F.col("l_orderkey")).agg(
        F.array_sort(F.collect_set("l_partkey")).alias("arr")
    )
    # the in-array pair explode + (u,v) partial agg downstream are
    # CPU-bound and run on baskets' post-shuffle partition count;
    # spread when the session's shuffle sizing leaves that below the
    # core count (same gate as the triangle intersect stage)
    sess = lineitem.sparkSession
    par = sess.sparkContext.defaultParallelism
    if int(sess.conf.get("spark.sql.shuffle.partitions", "200")) < par:
        baskets = baskets.repartition(par, "l_orderkey")
    baskets = persist_tracked(baskets.select("arr"))
    nb = baskets.agg(F.count(F.lit(1)).alias("n"))
    item_s = (
        baskets.select(F.explode("arr").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    exploded = (
        baskets.filter(F.size("arr") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(arr) - 1), "
                    "i -> transform(slice(arr, i + 1, size(arr) - i), "
                    "x -> struct(element_at(arr, i) AS u, x AS v))))"
                )
            ).alias("p")
        )
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    )
    # pairs are near-unique (partial agg barely reduces them), so the
    # (u, v) count shuffles ~O(pairs) rows; under the latency posture
    # that lands the whole final aggregation on shuffle.partitions
    # tasks — widen the exchange to the core count when it is narrower
    # (measured 0.54 -> 0.39 s; a production shuffle sizing skips this)
    if int(sess.conf.get("spark.sql.shuffle.partitions", "200")) < par:
        exploded = exploded.repartition(par, "u", "v")
    pair_c = (
        exploded.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 3)
    )
    # item supports are vocabulary-sized (O(distinct parts)) — always
    # broadcast-safe, like the triangle gate's degree relation; the
    # static planner has no stats over the persisted frame and would
    # otherwise sort-merge both support joins
    su = F.broadcast(
        item_s.withColumnRenamed("item", "u")
        .withColumnRenamed("s", "su")
    )
    sv = F.broadcast(
        item_s.withColumnRenamed("item", "v")
        .withColumnRenamed("s", "sv")
    )
    out = (
        pair_c.join(su, "u").join(sv, "v").crossJoin(F.broadcast(nb))
        .select(
            "u", "v", "c",
            F.round(F.col("c") / F.col("n"), 6).alias("support"),
            F.round(F.col("c") / F.col("su"), 6).alias("confidence_u_v"),
            F.round(
                F.col("c") * F.col("n") / (F.col("su") * F.col("sv")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "u", "v")
        .limit(100)
    )
    return out
