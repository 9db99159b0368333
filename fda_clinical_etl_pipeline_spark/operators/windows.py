"""Window functions & time-series operators (SURVEY.md §2.6, W1/W2 +
ranking/analytic/frame generalizations, plus the as-of join extension).

W1 is the load-bearing one: Hudi precombine semantics
(hudi/register_hudi.py:64-66 — on duplicate ``patient_id`` keep the row
with the greatest ``visit_date``) becomes row_number over a
partitionBy(key).orderBy(desc(ts)) window. At 100 TB that is one shuffle
on the record key — the same shuffle the upsert itself needs, so dedup
rides along for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import money, tables


@register(
    "window_latest_per_key",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           CAST(o_orderdate AS DATE) AS latest_orderdate,
           ROUND(o_totalprice, 2) AS latest_totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    doc="W1: latest-version-per-key — the Hudi precombine dedup "
        "(hudi/register_hudi.py:64-66) with a deterministic tiebreak. "
        "This is the versioning engine's MERGE pre-step.",
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.to_date("o_orderdate").alias("latest_orderdate"),
            money("o_totalprice").alias("latest_totalprice"),
        )
    )


@register(
    "window_topn_per_group",
    """
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
    doc="W2: latest-N-per-source (api/app.py:122-132 LIMIT-per-source "
        "endpoint) — rank-and-filter, one shuffle on the group key.",
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.select(
            "c_mktsegment", "c_custkey", "c_name",
            money("c_acctbal").alias("acctbal"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "window_running_total",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
    FROM events
    """,
    doc="Frame-spec window: per-user cumulative sum over the event stream "
        "(rowsBetween unboundedPreceding→currentRow), deterministic order "
        "by (ts, event_id).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("user_id").orderBy(*order)
    return events.select(
        "event_id",
        "user_id",
        money(F.sum("value").over(w)).alias("running_value"),
        F.row_number().over(w_rn).cast("long").alias("seq"),
    )


@register(
    "window_lag_lead_rank",
    """
    SELECT event_id, user_id, event_type,
           ROUND(value, 2) AS value,
           ROUND(COALESCE(LAG(value)  OVER w, -1), 2) AS prev_value,
           ROUND(COALESCE(LEAD(value) OVER w, -1), 2) AS next_value,
           CAST(RANK()       OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS value_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS type_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Analytic functions: lag/lead over the per-user timeline plus "
        "rank/dense_rank — SURVEY.md §2.6 generalization over events.",
)
def window_lag_lead_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        money("value").alias("value"),
        money(F.coalesce(F.lag("value").over(w), F.lit(-1))).alias("prev_value"),
        money(F.coalesce(F.lead("value").over(w), F.lit(-1))).alias("next_value"),
        F.rank().over(w_val).cast("long").alias("value_rank"),
        F.dense_rank().over(w_type).cast("long").alias("type_rank"),
    )


@register(
    "window_tumbling_events",
    """
    SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2)     AS value_sum,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling time-window aggregation over the event stream — the "
        "batch twin of the Structured Streaming windowed agg in "
        "streaming/pipeline.py (same logical plan, readStream source).",
)
def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("value")).alias("value_sum"),
            F.countDistinct("user_id").alias("users"),
        )
    )


@register(
    "window_range_frame",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id
             ORDER BY CAST(epoch(ts) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
             AS rolling_1h_sum,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id
             ORDER BY CAST(epoch(ts) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling_1h_n
    FROM events
    """,
    doc="Value-range frame (RANGE BETWEEN): per-user rolling 1-hour sum — "
        "the time-decay aggregation shape. Ordered on epoch seconds so "
        "both engines share frame semantics exactly; ties in the ORDER BY "
        "key are in the same frame by RANGE definition, so results are "
        "deterministic without a tiebreak.",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    epoch = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        money(F.sum("value").over(w)).alias("rolling_1h_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("rolling_1h_n"),
    )


@register(
    "union_missing_columns",
    """
    SELECT o_orderkey AS id, o_orderpriority AS priority,
           ROUND(o_totalprice, 2) AS amount, NULL AS segment
    FROM orders WHERE o_orderstatus = 'P'
    UNION ALL
    SELECT c_custkey, NULL, NULL, c_mktsegment
    FROM customer WHERE c_acctbal < 0
    """,
    doc="unionByName(allowMissingColumns=True): schema-evolving union — "
        "absent columns NULL-padded by NAME, not position (the multi-"
        "source canonical-union robustness case).",
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    a = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderpriority").alias("priority"),
        money("o_totalprice").alias("amount"),
    )
    b = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "asof_join_events",
    """
    SELECT e.event_id, e.user_id,
           CAST(p.event_id AS BIGINT) AS last_purchase_id,
           ROUND(COALESCE(p.value, -1), 2) AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="As-of join (reference lacks it; SURVEY.md §2.4 names it as the "
        "natural events extension): for each click, the most recent prior "
        "purchase per user. Implemented shuffle-once: union both sides "
        "tagged, one window pass carries the last purchase forward — no "
        "range-join explosion. DuckDB oracle uses native ASOF JOIN. "
        "Tie rule (equal ts): purchase sorts before click so a same-ts "
        "purchase is visible, matching ASOF's >= semantics; among "
        "equal-ts purchases the greatest event_id wins.",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # Tag and union: purchases get side=0 so at equal ts they precede clicks
    # in the window order (ASOF >= includes same-instant matches).
    tagged = purchases.select(
        "user_id", "ts",
        F.lit(0).alias("side"),
        F.col("event_id"),
        F.col("value"),
    ).unionByName(
        clicks.select(
            "user_id", "ts",
            F.lit(1).alias("side"),
            F.col("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "*",
        F.last(F.when(F.col("side") == 0, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("last_purchase_id"),
        F.last(F.when(F.col("side") == 0, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("last_purchase_value"),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("last_purchase_id").cast("long").alias("last_purchase_id"),
        money(F.coalesce(F.col("last_purchase_value"), F.lit(-1))).alias(
            "last_purchase_value"
        ),
    )


@register(
    "asof_join_tolerance",
    """
    SELECT e.event_id, e.user_id,
           CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= 3600000000
                THEN CAST(p.event_id AS BIGINT) END AS purchase_id_1h,
           CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= 3600000000
                THEN CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT)
                END AS micros_since
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (
      SELECT user_id, ts,
             MAX(event_id) OVER (PARTITION BY user_id, ts) AS event_id
      FROM events WHERE event_type = 'purchase'
    ) p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="As-of join with TOLERANCE (pandas merge_asof semantics): each "
        "click matches its most recent prior purchase only when it lies "
        "within 1 hour; staler matches null out. Same shuffle-once "
        "union+window plan as asof_join_events — the tolerance is a "
        "post-carry filter, not a range join. Equal-ts purchase ties "
        "resolve to the greatest event_id on both engines.",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    tol_us = 3_600_000_000  # 1 hour
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("side"), F.col("event_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("side"), F.col("event_id")
    )
    tagged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "*",
        F.last(F.when(F.col("side") == 0, F.col("event_id")), ignorenulls=True)
        .over(w).alias("p_id"),
        F.last(
            F.when(F.col("side") == 0, F.unix_micros(F.col("ts"))),
            ignorenulls=True,
        ).over(w).alias("p_us"),
    )
    within = (
        F.col("p_us").isNotNull()
        & ((F.unix_micros(F.col("ts")) - F.col("p_us")) <= tol_us)
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.when(within, F.col("p_id")).cast("long").alias("purchase_id_1h"),
        F.when(within, F.unix_micros(F.col("ts")) - F.col("p_us"))
        .cast("long").alias("micros_since"),
    )


@register(
    "window_percent_rank_cume",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
             AS pct_rank,
           ROUND(CUME_DIST() OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
             AS cume
    FROM orders
    """,
    doc="Relative-standing analytics: PERCENT_RANK and CUME_DIST per "
        "priority class. Both are tie-stable (equal o_totalprice rows "
        "get equal values regardless of physical order), so no "
        "tiebreak column is needed for determinism — unlike the "
        "row_number family. Partitioned on a bounded key (5 priority "
        "classes): each window partition is 1/5 of orders, which is "
        "the documented limit of the plain-Window formulation; a "
        "per-key-unbounded variant would use the global_ntile "
        "range-partition construction (operators/advanced.py).",
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type,
           event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (
             PARTITION BY prev_type
           ), 6) AS p
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="First-order event-transition (Markov) matrix: per-user "
        "event sequences via a lag window (partitions bounded by one "
        "user's history, event_id tiebreak for determinism), then "
        "transition counts and row-normalized probabilities — the "
        "share-of-total window runs over the O(types^2) aggregate, "
        "never the event stream.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type",
                         F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    share = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n") / F.sum("n").over(share), 6).alias("p"),
    )


@register(
    "event_sequence_pattern",
    """
    WITH s AS (
      SELECT user_id,
             STRING_AGG(SUBSTR(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(LENGTH(seq) AS BIGINT) AS n_events,
           CAST((LENGTH(seq) - LENGTH(REPLACE(seq, 'vcp', ''))) / 3
                AS BIGINT) AS n_vcp_runs,
           CAST(STRPOS(seq, 'p') AS BIGINT) AS first_purchase_pos
    FROM s
    """,
    doc="CEP-style sequence pattern detection (the MATCH_RECOGNIZE "
        "shape): per user the totally-ordered event-initial string "
        "(ts + event_id tiebreak), then occurrences of the strict "
        "view→click→purchase run and the position of the first "
        "purchase — one groupBy whose state is bounded by a single "
        "user's history; the pattern scan is a string expression over "
        "the per-user aggregate, never a self-join over the stream.",
)
def event_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            )
        )
    )
    seq = F.concat_ws("", F.transform(arr, lambda x: x["c"]))
    grouped = events.groupBy("user_id").agg(seq.alias("seq"))
    return grouped.select(
        "user_id",
        F.length("seq").cast("long").alias("n_events"),
        ((F.length("seq")
          - F.length(F.replace(F.col("seq"), F.lit("vcp"), F.lit(""))))
         / 3).cast("long").alias("n_vcp_runs"),
        F.instr("seq", "p").cast("long").alias("first_purchase_pos"),
    )


@register(
    "user_growth_curve",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS h0
      FROM events GROUP BY 1
    ),
    hourly AS (
      SELECT h0, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY 1
    )
    SELECT strftime(h0, '%Y-%m-%d %H:%M:%S') AS hour,
           new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY h0
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM hourly
    """,
    doc="User growth curve: first-seen hour per user (one grouped "
        "pass over the event stream), hourly new-user counts, and a "
        "running cumulative total — the cumsum window runs over "
        "O(hours) aggregate rows, never the stream. Hour rendered as "
        "a string for cross-engine timestamp parity.",
)
def user_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0")
    )
    hourly = first_seen.groupBy("h0").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("h0").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hourly.select(
        F.date_format("h0", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@register(
    "ts_resample_ohlc",
    """
    WITH b AS (
      SELECT event_type, value, ts, event_id,
             DATE_TRUNC('minute', ts)
               - TO_MINUTES(CAST(EXTRACT(minute FROM ts) AS BIGINT) % 15)
               AS bucket
      FROM events
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rd
      FROM b
    )
    SELECT event_type,
           STRFTIME(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS volume
    FROM r
    GROUP BY 1, 2
    """,
    doc="Time-series downsampling to OHLC bars: 15-minute buckets per "
        "event_type with open/close picked by (ts, event_id) rank — an "
        "explicit total order, so first/last are deterministic under "
        "any partitioning. Bucketing is FIELD arithmetic "
        "(date_trunc minus minute%15), not epoch math, so the result "
        "is session-timezone-independent on both engines. The rank "
        "windows partition by (type, bucket) — per-task state is one "
        "bucket's events, never a global sort.",
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    b = events.withColumn(
        "bucket",
        F.expr(
            "date_trunc('minute', ts) "
            "- make_interval(0, 0, 0, 0, 0, minute(ts) % 15, 0)"
        ),
    )
    w_a = Window.partitionBy("event_type", "bucket").orderBy(
        "ts", "event_id"
    )
    w_d = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = (
        b.withColumn("ra", F.row_number().over(w_a))
        .withColumn("rd", F.row_number().over(w_d))
    )
    return (
        r.groupBy(
            "event_type",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss")
            .alias("bucket_start"),
        )
        .agg(
            F.max(F.when(F.col("ra") == 1, F.col("value")))
            .alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rd") == 1, F.col("value")))
            .alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
    )


@register(
    "scd2_user_state",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(ts) OVER w AS next_ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rrk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(STRFTIME(next_ts, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           CAST(rrk = 1 AS BOOLEAN) AS is_current
    FROM ordered
    """,
    doc="SCD Type-2 interval builder: each user event becomes a "
        "[valid_from, valid_to) state row — valid_to is the next "
        "event's timestamp (lead over the per-user timeline, explicit "
        "(ts, event_id) tiebreak), the open-ended current row gets the "
        "warehouse sentinel. One shuffle on the dimension key; at "
        "100 TB this is the standard dimension-history build and the "
        "window state is one key's timeline. Timestamps rendered at "
        "second precision as strings for cross-engine parity.",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w), fmt),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        (F.row_number().over(w_desc) == 1).alias("is_current"),
    )


@register(
    "ts_ewma_per_user",
    """
    WITH per_user AS (
      SELECT user_id,
             LIST(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1
    )
    SELECT user_id,
           CAST(LENGTH(vals) AS BIGINT) AS n_events,
           ROUND(list_reduce(vals, (a, b) -> a * 0.5 + b * 0.5), 10)
             AS ewma_last
    FROM per_user
    """,
    doc="Per-key EWMA (alpha = 0.5, adjust-free recursion "
        "y_t = 0.5*y_{t-1} + 0.5*x_t) folded entirely in JVM "
        "higher-order expressions: collect the ordered timeline per "
        "key, fold with aggregate(). alpha = 1/2 is chosen so BOTH "
        "float ops are exact/deterministic in IEEE 754 (halving is "
        "exact; addition is deterministic given the fold order, which "
        "the explicit (ts, event_id) sort fixes) — the oracle's "
        "list_reduce reproduces the recursion bit-for-bit, making a "
        "sequential stateful computation fully oracle-gated with no "
        "UDF. Per-task state is one key's timeline (the sessionize "
        "contract); the fold itself is O(events) with no shuffle "
        "beyond the groupBy.",
)
def ts_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "ts", "event_id",
                    F.col("value").cast("double").alias("v"),
                )
            )
        ).alias("arr")
    )
    return per_user.select(
        "user_id",
        F.expr("size(arr)").cast("long").alias("n_events"),
        F.expr(
            "round(aggregate("
            "  slice(transform(arr, s -> s.v), 2, size(arr) - 1),"
            "  element_at(transform(arr, s -> s.v), 1),"
            "  (acc, x) -> acc * 0.5D + x * 0.5D"
            "), 10)"
        ).alias("ewma_last"),
    )
