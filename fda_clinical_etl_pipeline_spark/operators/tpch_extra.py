"""Deeper TPC-H-family analytics (SURVEY.md §2.5/§2.7 generalizations).

The reference's analytics surface is per-source counts and status
filters (SURVEY.md §2.5); rounds 1–4 generalized that to the TPC-H
shapes q1/q3/q4/q5/q7/q10/q12/q14/q15/q18. This module closes the
remaining classic shapes expressible over the trimmed testdata schema
(no partsupp/l_shipmode/c_phone columns exist, so Q8/Q13/Q17/Q19/Q22
are adapted, same plan structure):

- q8_market_share   — nation market share: 6-table join, conditional
                      revenue ratio per year.
- q13_custdist      — customer order-count distribution: outer join
                      with a join-clause predicate, double aggregation.
- q17_small_qty_revenue — correlated scalar subquery (per-part average)
                      decorrelated into a co-partitioned self-join.
- q19_disjunctive_revenue — OR-of-ANDs predicate with manual factoring
                      so both scan sides still prune.
- q22_idle_balance  — global scalar threshold + anti join.

Scale notes follow relational.py's common rules: mandatory broadcast
only for bounded tables (region=5 rows, nation=25 rows); fact-fact
joins shuffle on their keys with AQE left to pick the strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import money, tables


@register(
    "q8_market_share",
    """
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS total_revenue
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n1.n_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY YEAR(o_orderdate)
    """,
    doc="TPC-H Q8 shape: national market share — the deepest join tree "
        "in the suite (lineitem-part-supplier-nation-orders-customer-"
        "nation-region). Conditional-revenue ratio computed in the same "
        "aggregation pass as the denominator. nation/region are "
        "bounded-by-construction (25/5 rows): mandatory broadcast; "
        "part/supplier/customer are scale-factor tables left to AQE. "
        "The two nation joins use independent aliases, as the reference "
        "schema's self-joined dim would require.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier, orders, customer, nation, region = tables(
        spark, sf_dir,
        "lineitem", "part", "supplier", "orders", "customer", "nation",
        "region",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("s_nation"),
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem
        .join(part.filter(F.col("p_type") == "PROMO"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nkey") == F.col("s_nationkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate")
                 >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate")
                   < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nkey") == F.col("c_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("c_rkey"),
        )
    )
    national = F.when(F.col("s_nation") == "NATION_3", rev).otherwise(0.0)
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(F.sum(national) / F.sum(rev), 4).alias("mkt_share"),
            money(F.sum(rev)).alias("total_revenue"),
        )
    )


@register(
    "q13_custdist",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — LEFT "
        "OUTER join with a predicate in the JOIN clause (not WHERE: "
        "customers with only excluded orders must still appear with "
        "count 0), then a second aggregation over the first's result. "
        "COUNT(o_orderkey) counts non-null matches only. Both "
        "aggregations are partial-agg friendly; the second one's input "
        "is one row per customer, its output one row per distinct "
        "count — tiny at any scale.",
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@register(
    "q17_small_qty_revenue",
    """
    WITH a AS (
      SELECT l_partkey AS a_partkey, ROUND(AVG(l_quantity), 2) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT)             AS n_small_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN a    ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery (each lineitem "
        "compared to ITS part's average quantity) decorrelated into an "
        "aggregate-then-join: per-part averages are one partial-agg "
        "shuffle on l_partkey, and the join back to lineitem reuses the "
        "same key, so AQE can co-locate both sides. The per-part average "
        "is rounded to 2dp on BOTH sides before the 0.2x comparison so "
        "the engines' different summation orders cannot flip a boundary "
        "row in or out (registry parity rule #2 applied to a predicate).",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = tables(spark, sf_dir, "lineitem", "part")
    a = lineitem.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.round(F.avg("l_quantity"), 2).alias("avg_qty")
    )
    return (
        lineitem
        .join(part.filter(F.col("p_brand") == "Brand#3"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(a, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_small_lines"),
        )
    )


# The three (brand, max size, quantity band) disjuncts of the Q19-shape
# predicate. Factored constants shared by the Spark plan and the oracle.
_Q19_BANDS = (
    ("Brand#1", 15, 1, 11),
    ("Brand#2", 25, 10, 20),
    ("Brand#3", 35, 20, 30),
)


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT)                          AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = '{_Q19_BANDS[0][0]}' AND p_size BETWEEN 1 AND {_Q19_BANDS[0][1]}
           AND l_quantity BETWEEN {_Q19_BANDS[0][2]} AND {_Q19_BANDS[0][3]})
       OR (p_brand = '{_Q19_BANDS[1][0]}' AND p_size BETWEEN 1 AND {_Q19_BANDS[1][1]}
           AND l_quantity BETWEEN {_Q19_BANDS[1][2]} AND {_Q19_BANDS[1][3]})
       OR (p_brand = '{_Q19_BANDS[2][0]}' AND p_size BETWEEN 1 AND {_Q19_BANDS[2][1]}
           AND l_quantity BETWEEN {_Q19_BANDS[2][2]} AND {_Q19_BANDS[2][3]})
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive bands across BOTH "
        "join sides. Catalyst does not factor single-side implications "
        "out of a mixed OR, so the plan seeds them manually: part is "
        "pre-filtered to the brand/size superset and lineitem to the "
        "quantity superset (semantics-preserving weakenings of the OR) "
        "— both scans prune before the join instead of shipping every "
        "row to evaluate the disjunction after it.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = tables(spark, sf_dir, "lineitem", "part")
    disjunct = None
    for brand, max_size, qlo, qhi in _Q19_BANDS:
        term = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )
        disjunct = term if disjunct is None else (disjunct | term)
    # single-side supersets implied by the OR — pushed to the scans
    brands = [b for b, _, _, _ in _Q19_BANDS]
    max_size = max(s for _, s, _, _ in _Q19_BANDS)
    qlo = min(lo for _, _, lo, _ in _Q19_BANDS)
    qhi = max(hi for _, _, _, hi in _Q19_BANDS)
    part_side = part.filter(
        F.col("p_brand").isin(brands) & F.col("p_size").between(1, max_size)
    )
    line_side = lineitem.filter(F.col("l_quantity").between(qlo, qhi))
    return (
        line_side
        .join(part_side, F.col("p_partkey") == F.col("l_partkey"))
        .filter(disjunct)
        .agg(
            money(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q22_idle_balance",
    """
    WITH ab AS (
      SELECT ROUND(AVG(c_acctbal), 2) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer, ab
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: customers with above-average balances and no "
        "urgent orders — a global scalar aggregate (broadcast as a "
        "1-row relation, never collected to the driver) gating the "
        "scan, then a left-anti join against a filtered fact subset. "
        "(Textbook Q22 anti-joins ALL orders; this testdata gives every "
        "customer at least one order, which would make the gate "
        "trivially empty — the priority filter keeps the plan shape and "
        "a non-empty result.) The anti join shuffles on the customer "
        "key only after the balance filter has cut the probe side. "
        "Average rounded 2dp on both sides before the comparison (same "
        "boundary-determinism rule as q17).",
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    ab = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            money(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
