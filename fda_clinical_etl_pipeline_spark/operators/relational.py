"""Core relational operators (SURVEY.md §2.3–§2.5, §2.7–§2.9).

The reference has no query engine — its "operators" are status filters,
per-key point lookups and Python loops (SURVEY.md §2.4: joins exist only
implicitly). Here every one of them is a declarative DataFrame plan so
Catalyst provides pushdown, pruning, join selection and whole-stage
codegen. Each query is registered with a DuckDB oracle for the driver's
sf0.01 hash-compare.

Scale notes (100 TB posture) are given per query; the common rules:
- broadcast-hint policy: mandatory F.broadcast() ONLY on tables whose
  size is bounded by construction (region=5, nation=25 rows, metadata,
  literal band tables). Tables that grow with scale factor (customer,
  part, supplier) get NO hint — the autoBroadcast threshold + AQE
  broadcast them while they fit and fall back to shuffle joins at real
  scale, where a mandatory hint would OOM the executors;
- aggregations rely on partial (map-side) aggregation: groupBy over
  low-cardinality keys moves only one row per key per partition;
- top-k uses orderBy+limit which Catalyst plans as TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import money, tables


# ---------------------------------------------------------------------------
# Flagship + TPC-H-style analytics (scan + filter + join + agg + top-k)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: wide hash aggregation with partial agg; exercises "
        "A1-style counting generalized to grouped metrics.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money(F.sum("l_extendedprice")).alias("sum_base_price"),
            money(F.sum(disc_price)).alias("sum_disc_price"),
            money(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            money(F.avg("l_quantity"), 4).alias("avg_qty"),
            money(F.avg("l_extendedprice"), 4).alias("avg_price"),
            money(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE)                         AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> fact joins -> grouped "
        "revenue -> deterministic top-k (TakeOrderedAndProject).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # customer GROWS with scale factor: no mandatory broadcast
            # hint — the threshold/AQE broadcasts it while it fits and
            # falls back to shuffle join at real scale
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"), "o_orderpriority")
        .agg(money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
    )


@register(
    "q5_revenue_by_nation",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    doc="Flagship (SURVEY.md §7.1): the full join spine "
        "lineitem⋈orders⋈customer⋈nation⋈region with broadcast dims.",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation, region = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    asia_nations = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        lineitem
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer scales with SF (threshold decides); nation set is fixed
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume — the supplier-side join "
        "spine (lineitem⋈supplier⋈orders⋈customer⋈nation×2) with "
        "cross-filtered nation pairs; all dims broadcast.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, orders, customer, nation = tables(
        spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    joined = (
        lineitem
        # supplier/customer scale with SF — no mandatory hints
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: revenue lost to returns per customer — "
        "selective fact filter (returnflag pushdown), broadcast dims, "
        "deterministic top-20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem, nation = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                F.col("o_orderdate")
                >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: argmax over an aggregate (top supplier by "
        "quarterly revenue, ties kept) — the scalar-subquery max becomes "
        "an unpartitioned analytic max over the tiny aggregated set, "
        "never a second scan of the fact table.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier = tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("total_revenue")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # global: revenue has ≤ |suppliers| rows
    top = revenue.withColumn(
        "_mx", F.max("total_revenue").over(w)
    ).filter(F.col("total_revenue") == F.col("_mx"))
    return (
        supplier.join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q4_order_priority_check",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a cross-table predicate "
        "(lineitem shipped after its order date) — planned as a left-semi "
        "join with the correlated condition in the join clause.",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    semi = o.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q18_large_orders_having",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(total_qty), 2) AS total_qty
    FROM (
      SELECT o_custkey, o_orderkey, SUM(l_quantity) AS total_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey, o_orderkey
      HAVING SUM(l_quantity) > 150
    )
    GROUP BY o_custkey
    HAVING COUNT(*) >= 2
    """,
    doc="TPC-H Q18 shape: HAVING at two levels — per-order quantity floor, "
        "then per-customer repeat-large-order floor. Post-aggregation "
        "filters stay after the partial+final agg (no extra scan).",
)
def q18_large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    per_order = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey", "o_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        per_order.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.sum("total_qty")).alias("total_qty"),
        )
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "q12_shipmode_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: conditional counting over a fact-fact join — "
        "CASE aggregation classifies the joined rows in the same pass "
        "that counts them (one shuffle for the join, partial agg after).",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)   AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional-revenue ratio in a single global "
        "aggregate — numerator and denominator computed in one pass, no "
        "second scan or self-join for the percentage.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = tables(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            ),
            money(F.sum(rev)).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Filters / predicates (P5–P14)
# ---------------------------------------------------------------------------

@register(
    "filter_eq_status",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="P5/P6: equality predicate, pushed to the parquet scan "
        "(PushedFilters in .explain).",
)
def filter_eq_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", money("o_totalprice").alias("total_price"))
    )


@register(
    "filter_like_failed",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '%HIGH%'
    """,
    doc="P8: LIKE-pattern filter (the reference's status LIKE 'FAILED_%' "
        "monitoring query, README.md:219) — StartsWith/Contains pushdown.",
)
def filter_like_failed(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("%HIGH%")
        )
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "filter_in_conjunctive",
    """
    SELECT c_custkey, c_name, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_acctbal > 0
    """,
    doc="P7: dynamic conjunctive predicates (api/app.py:136-151 search "
        "endpoint) as chained filters; IN-list + range pushdown.",
)
def filter_in_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    return (
        customer
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_name", "c_mktsegment", money("c_acctbal").alias("acctbal"))
    )


@register(
    "proj_rename_canonical",
    """
    SELECT c_custkey AS patient_id,
           c_name    AS patient_name,
           c_mktsegment AS diagnosis,
           'hospital_a' AS source
    FROM customer
    """,
    doc="P1/P2: rename-projection canonicalization (etl/transform.py:46-78) "
        "— pure select/alias/lit, zero-cost at plan time.",
)
def proj_rename_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("patient_id"),
        F.col("c_name").alias("patient_name"),
        F.col("c_mktsegment").alias("diagnosis"),
        F.lit("hospital_a").alias("source"),
    )


# ---------------------------------------------------------------------------
# Joins (J1–J5 generalized; semi/anti per SURVEY.md §2.4)
# ---------------------------------------------------------------------------

@register(
    "join_inner_enrich",
    """
    SELECT p_brand,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="J1-style enrichment: fact ⋈ small dim. Broadcast hash join — the "
        "part table ships to every executor; no lineitem shuffle.",
)
def join_inner_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = tables(spark, sf_dir, "lineitem", "part")
    return (
        # part scales with SF too: threshold-driven broadcast, no hint
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@register(
    "join_left_order_counts",
    """
    SELECT c_custkey, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS order_cnt,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="J3 generalized: left outer join preserving zero-order customers "
        "(lineage per batch even when no steps exist, api/app.py:93-118).",
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            money(F.coalesce(F.sum("o_totalprice"), F.lit(0))).alias("total_spend"),
        )
    )


@register(
    "join_semi_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
    doc="Left-semi join (EXISTS): customers having a large order. "
        "No row duplication, no payload from the probe side.",
)
def join_semi_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 100000)
    return (
        customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti_no_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): the quarantine-complement pattern — "
        "rows with no matching batch/steps.",
)
def join_anti_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# Aggregations (A1–A7)
# ---------------------------------------------------------------------------

@register(
    "agg_count_distinct",
    """
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT)                  AS order_cnt,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
           CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS active_days
    FROM orders GROUP BY o_orderstatus
    """,
    doc="A3/A4: distinct-set accumulation as grouped COUNT(DISTINCT) — "
        "Catalyst expands to two-phase partial aggregation.",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.countDistinct(F.to_date("o_orderdate")).alias("active_days"),
    )


@register(
    "agg_max_by_precombine",
    """
    SELECT o_custkey,
           ARG_MAX(o_orderkey, printf('%020.2f-%012d', o_totalprice, o_orderkey))
               AS best_orderkey,
           ROUND(MAX(o_totalprice), 2) AS best_price
    FROM orders GROUP BY o_custkey
    """,
    doc="A6: Hudi precombine semantics (hudi/register_hudi.py:64-66 — keep "
        "the record with the greatest precombine value per key) as a "
        "single-pass max_by. Fixed-width sort key makes ties deterministic "
        "on both engines.",
)
def agg_max_by_precombine(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    sort_key = F.format_string("%020.2f-%012d", F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", sort_key).alias("best_orderkey"),
        money(F.max("o_totalprice")).alias("best_price"),
    )


@register(
    "agg_error_sample",
    """
    SELECT o_orderstatus,
           ARRAY_TO_STRING(LIST_SORT(LIST(o_orderkey))[1:5], ',') AS sample_keys,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice < 1000
    GROUP BY o_orderstatus
    """,
    doc="A5: bounded error sampling (first-20 error examples, "
        "etl/validate.py:123) as slice(sort_array(collect_list)): bounded, "
        "deterministic, no driver collect.",
)
def agg_error_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") < 1000)
        .groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.slice(F.sort_array(F.collect_list("o_orderkey")), 1, 5), ","
            ).alias("sample_keys"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "hash_row_integrity",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT row_sha) AS BIGINT) AS distinct_hashes,
           MIN(row_sha) AS min_sha, MAX(row_sha) AS max_sha
    FROM (
      SELECT l_returnflag,
             sha256(concat_ws('|', l_orderkey, l_linenumber, l_returnflag,
                              l_linestatus, strftime(l_shipdate, '%Y-%m-%d'))) AS row_sha
      FROM lineitem
    ) GROUP BY l_returnflag
    """,
    doc="A7/F14: the reference's SHA-256 integrity hashing "
        "(etl/ingest.py:18-25) distributed — row-level sha2 plus an "
        "order-insensitive aggregate (distinct count + min/max) instead of "
        "a driver-side byte stream at 100 TB.",
)
def hash_row_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    row_sha = F.sha2(
        F.concat_ws(
            "|",
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.date_format("l_shipdate", "yyyy-MM-dd"),
        ),
        256,
    )
    # Explicit hash-distinct first: countDistinct's planner expansion
    # carries the string min/max through BOTH aggregate levels, forcing
    # SortAggregate + full-data sorts map- and reduce-side (string
    # buffers are not hash-aggregable). Deduplicating (flag, sha) in a
    # HashAggregate first confines the unavoidable sort-based min/max
    # to the second level — two fewer whole-stream sorts, identical
    # rows (count over distinct pairs == countDistinct).
    return (
        lineitem.select("l_returnflag", row_sha.alias("row_sha"))
        .dropDuplicates(["l_returnflag", "row_sha"])
        .groupBy("l_returnflag")
        .agg(
            F.count("row_sha").alias("distinct_hashes"),
            F.min("row_sha").alias("min_sha"),
            F.max("row_sha").alias("max_sha"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1–O6)
# ---------------------------------------------------------------------------

@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="O2: ORDER BY ... DESC LIMIT n (api/app.py:124-131). Catalyst plans "
        "TakeOrderedAndProject — per-partition heaps, k rows to the driver, "
        "never a global sort.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", money("o_totalprice").alias("total_price"))
    )


# ---------------------------------------------------------------------------
# Set operations (§2.8: multi-source canonical union)
# ---------------------------------------------------------------------------

@register(
    "setop_union_canonical",
    """
    SELECT c_name AS entity_name, c_nationkey AS nationkey,
           ROUND(c_acctbal, 2) AS acctbal, 'customer' AS source
    FROM customer
    UNION ALL
    SELECT s_name, s_nationkey, ROUND(s_acctbal, 2), 'supplier' FROM supplier
    """,
    doc="§2.8: the canonical-schema union the reference implies "
        "(hospital_a ∪ clinic_b ∪ hospital_c_hl7 into one QLM table, "
        "etl/transform.py:46-60) — unionByName over renamed projections.",
)
def setop_union_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, supplier = tables(spark, sf_dir, "customer", "supplier")
    cust = customer.select(
        F.col("c_name").alias("entity_name"),
        F.col("c_nationkey").alias("nationkey"),
        money("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("source"),
    )
    supp = supplier.select(
        F.col("s_name").alias("entity_name"),
        F.col("s_nationkey").alias("nationkey"),
        money("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("source"),
    )
    return cust.unionByName(supp)


@register(
    "setop_except_intersect",
    """
    WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
         building    AS (SELECT c_custkey AS k FROM customer
                         WHERE c_mktsegment = 'BUILDING')
    SELECT k, 'no_orders' AS tag
    FROM (SELECT c_custkey AS k FROM customer EXCEPT SELECT k FROM with_orders)
    UNION ALL
    SELECT k, 'building_with_orders'
    FROM (SELECT k FROM building INTERSECT SELECT k FROM with_orders)
    """,
    doc="§2.8: EXCEPT + INTERSECT (the P11 column-set-diff idea applied to "
        "rows). Both compile to aggregate+join under Catalyst.",
)
def setop_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    with_orders = orders.select(F.col("o_custkey").alias("k")).distinct()
    all_cust = customer.select(F.col("c_custkey").alias("k"))
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    no_orders = all_cust.exceptAll(with_orders).withColumn("tag", F.lit("no_orders"))
    both = building.intersect(with_orders).withColumn(
        "tag", F.lit("building_with_orders")
    )
    return no_orders.unionByName(both)


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (§2.5 generalization)
# ---------------------------------------------------------------------------

@register(
    "grouping_rollup_region",
    """
    SELECT COALESCE(r_name, 'ALL')   AS region,
           COALESCE(n_name, 'ALL')   AS nation,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(COUNT(*) AS BIGINT)  AS customers,
           ROUND(SUM(c_acctbal), 2)  AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="Hierarchical rollup region→nation→grand-total; one shuffle, "
        "Expand handles the grouping-set replication.",
)
def grouping_rollup_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    joined = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("customers"),
            money(F.sum("c_acctbal")).alias("acctbal_sum"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "g_region", "g_nation", "customers", "acctbal_sum",
        )
    )


@register(
    "grouping_cube_orders",
    """
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over status × priority — all 4 grouping sets in one pass.",
)
def grouping_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
            money(F.sum("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "g_status", "g_priority", "n", "total",
        )
    )


# ---------------------------------------------------------------------------
# Scalar functions (§2.9, F1–F16 — string / date / json)
# ---------------------------------------------------------------------------

@register(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name)                                   AS name_upper,
           TRIM(p_name)                                    AS name_trim,
           LENGTH(p_name)                                  AS name_len,
           SPLIT_PART(p_name, ' ', 1)                      AS first_word,
           CONCAT_WS('_', p_brand, p_type)                 AS brand_type,
           REPLACE(p_brand, '#', '_')                      AS brand_safe,
           CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo,
           SUBSTRING(p_name, 1, 4)                         AS name_prefix
    FROM part
    """,
    doc="F5–F8/F16: split/element_at, concat_ws, upper/trim, replace, "
        "startswith, substring — the string kernel used by HL7 parsing and "
        "batch-id construction, all whole-stage-codegen'd.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = tables(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.trim("p_name").alias("name_trim"),
        F.length("p_name").cast("long").alias("name_len"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.concat_ws("_", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "#", "_").alias("brand_safe"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("is_promo"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
    )


@register(
    "scalar_date_parts",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)  AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2, 3
    """,
    doc="F9/F10 family: date part extraction + truncation (UTC session tz) "
        "feeding a grouped aggregate — the versioned-path timestamping "
        "semantics (etl/transform.py:149) done relationally.",
)
def scalar_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("o_totalprice")).alias("total"),
        )
    )


@register(
    "scalar_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
    doc="F12: JSON parse of the events.props payload (the reference's JSONB "
        "details column, db/init.sql:25) via get_json_object — no UDF.",
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy((k % 10).alias("k_bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("value")).alias("value_sum"),
        )
    )


@register(
    "variant_semi_structured",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.absent')
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_absent
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured VARIANT path (Spark 4): events.props parsed ONCE "
        "to VariantType (the engine's binary semi-structured encoding — "
        "the shredded-storage representation at scale, vs per-access "
        "string re-parsing in get_json_object), then typed extracts via "
        "try_variant_get with missing-path null semantics. Counterpart "
        "of the reference's JSONB details column (db/init.sql:25).",
)
def variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    absent = F.try_variant_get(v, "$.absent", "long")
    return (
        events.select("event_type", k.alias("k"), absent.alias("a"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum(F.when(F.col("a").isNull(), 1).otherwise(0))
            .cast("long").alias("n_absent"),
        )
    )


@register(
    "date_lenient_parse",
    """
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 3
               WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
               ELSE        strftime(o_orderdate, '%Y%m%d')
             END AS raw_date
      FROM orders
    )
    SELECT o_orderkey, raw_date,
           CAST(COALESCE(try_strptime(raw_date, '%Y-%m-%d'),
                         try_strptime(raw_date, '%d/%m/%Y'),
                         try_strptime(raw_date, '%Y%m%d')) AS DATE) AS parsed
    FROM raw
    """,
    doc="F10: the reference's lenient dateutil.parser.parse "
        "(etl/validate.py:28) as a coalesce over try_to_timestamp formats — "
        "native, null-safe under ANSI, no UDF.",
)
def date_lenient_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = tables(spark, sf_dir, "orders")
    raw = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .otherwise(F.date_format("o_orderdate", "yyyyMMdd"))
        .alias("raw_date"),
    )
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("raw_date"), F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.col("raw_date"), F.lit("dd/MM/yyyy")),
        F.try_to_timestamp(F.col("raw_date"), F.lit("yyyyMMdd")),
    ).cast("date")
    return raw.select("o_orderkey", "raw_date", parsed.alias("parsed"))


@register(
    "fk_integrity_audit",
    """
    SELECT 'lineitem.l_orderkey -> orders' AS edge,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer cu
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = cu.c_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
           CAST((SELECT COUNT(*) FROM supplier s
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = s.s_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'nation.n_regionkey -> region',
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT),
           CAST((SELECT COUNT(*) FROM nation na
                 WHERE NOT EXISTS (SELECT 1 FROM region r
                                   WHERE r.r_regionkey = na.n_regionkey))
                AS BIGINT)
    """,
    doc="Referential-integrity profiler: orphan counts across the "
        "schema's five FK edges, each an anti-join count (left_anti + "
        "count — one shuffle per edge, broadcast where the parent is a "
        "dim). The data-quality audit a pipeline runs before trusting "
        "joins; the reference's validation stage has per-column checks "
        "but no cross-table referential audit.",
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, customer, supplier, orders, lineitem = tables(
        spark, sf_dir,
        "region", "nation", "customer", "supplier", "orders",
        "lineitem",
    )

    def edge(name, child, parent, ck, pk):
        orphans = child.join(
            parent, child[ck] == parent[pk], "left_anti"
        )
        return child.agg(
            F.lit(name).alias("edge"),
            F.count(F.lit(1)).alias("n_child"),
        ).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        )

    frames = [
        edge("lineitem.l_orderkey -> orders", lineitem, orders,
             "l_orderkey", "o_orderkey"),
        edge("orders.o_custkey -> customer", orders, customer,
             "o_custkey", "c_custkey"),
        edge("customer.c_nationkey -> nation", customer, nation,
             "c_nationkey", "n_nationkey"),
        edge("supplier.s_nationkey -> nation", supplier, nation,
             "s_nationkey", "n_nationkey"),
        edge("nation.n_regionkey -> region", nation, region,
             "n_regionkey", "r_regionkey"),
    ]
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out
