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

Late round 5 closes the remaining seven (see the section comment below
for the partsupp adaptation): q2 (decorrelated MIN + dim chain + top-k),
q6 (pure scan-filter-agg pushdown canary), q9 (star join with derived
cost), q11 (fraction-of-global-sum HAVING), q16 (negated predicates +
NOT IN as anti join + COUNT DISTINCT), q20 (semi join on agg-HAVING
subquery), q21 (double-correlated EXISTS/NOT EXISTS as semi+anti).
All 22 classic TPC-H shapes are now registered and oracle-gated.

Scale notes follow relational.py's common rules: mandatory broadcast
only for bounded tables (region=5 rows, nation=25 rows); fact-fact
joins shuffle on their keys with AQE left to pick the strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..cache import persist_tracked
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


# --- Completing the 22 classic shapes ---------------------------------------
#
# The remaining TPC-H queries (Q2/Q6/Q9/Q11/Q16/Q20/Q21) all reference the
# partsupp table or commit/receipt dates, neither of which exists in the
# trimmed testdata schema. Each is adapted to preserve the PLAN SHAPE that
# makes the query a classic — the part-supplier relation is derived from
# lineitem history (the "ps proxy": per (partkey, suppkey) average unit
# price and total shipped quantity), and Q21's lateness predicate uses
# l_shipdate vs o_orderdate + 60 days in place of receipt-vs-commit.


def _ps_proxy(lineitem: DataFrame) -> DataFrame:
    """The partsupp stand-in: one row per observed (l_partkey, l_suppkey)
    pair with the MINIMUM observed unit price as ps_supplycost and total
    shipped quantity as ps_qty. MIN (not AVG+ROUND): each per-row
    division produces bit-identical doubles in every engine and MIN is
    summation-order-independent, so the proxy is exactly reproducible —
    AVG's engine-specific summation order was measured flipping 2dp
    roundings at hundreds of (part, supp) keys. One partial-agg shuffle
    on the composite key; at 100 TB this is the bounded "relationship
    table" materialization every catalog keeps anyway."""
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity"))
        .alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_qty"),
    )


_PS_PROXY_SQL = """
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost,
             SUM(l_quantity) AS ps_qty
      FROM lineitem GROUP BY 1, 2
    )"""


@register(
    "q2_min_cost_supplier",
    f"""
    WITH {_PS_PROXY_SQL},
    eur AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost,
             s_acctbal, s_name, n_name
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    minc AS (
      SELECT ps_partkey AS m_partkey, MIN(ps_supplycost) AS min_cost
      FROM eur GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
    FROM part
    JOIN eur  ON ps_partkey = p_partkey
    JOIN minc ON m_partkey = p_partkey AND ps_supplycost = min_cost
    WHERE p_size = 15 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: minimum-cost supplier. The correlated MIN "
        "subquery is expressed the Spark-first way: a per-part window "
        "MIN over the eur relation with an equality filter — one shuffle "
        "on ps_partkey replaces the oracle's aggregate-plus-join-back "
        "(identical semantics incl. ties: every supplier achieving the "
        "min survives, exactly what the equality join kept). Dims "
        "broadcast; top-100 by a total order (acctbal desc, nation, "
        "supplier, part) via TakeOrderedAndProject.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier, nation, region = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    eur = (
        _ps_proxy(lineitem)
        .join(supplier, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("ps_partkey", "ps_suppkey", "ps_supplycost",
                "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    cheapest = (
        eur.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
    )
    return (
        part.filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
        .join(cheapest, F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey",
                "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT)                    AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: forecasting-revenue-change — a pure scan-filter-"
        "aggregate with every predicate pushed to the parquet scan "
        "(date range + discount band + quantity cap all appear in "
        "PushedFilters) and no shuffle at all beyond the final 1-row "
        "partial-agg collapse. The canary query for scan efficiency: at "
        "100 TB its cost is IO-bound and column pruning (3 columns of "
        "11) is the whole game.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "q9_profit_by_nation",
    f"""
    WITH {_PS_PROXY_SQL}
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - ps_supplycost * l_quantity), 2) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN ps       ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
    doc="TPC-H Q9 shape: product-type profit by nation and year — the "
        "classic 6-relation star join with a derived cost column "
        "(extendedprice·(1-disc) − supplycost·qty). Spark-first cost "
        "derivation: instead of the oracle's aggregate-then-join-back "
        "(which scans lineitem twice), ps_supplycost is a window MIN "
        "over (l_partkey, l_suppkey) computed in the same lineitem "
        "pass — one composite-key shuffle, identical values on every "
        "row. Window BEFORE the part filter so the min ranges over the "
        "pair's full history, matching the ps relation. nation is "
        "broadcast; the p_name LIKE filter prunes part before the join.",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier, orders, nation = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    w = Window.partitionBy("l_partkey", "l_suppkey")
    priced = lineitem.withColumn(
        "ps_supplycost",
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).over(w),
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        priced
        .join(part.filter(F.col("p_name").like("%gear%")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(money(F.sum(amount)).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    f"""
    WITH {_PS_PROXY_SQL},
    natps AS (
      SELECT ps_partkey, ROUND(SUM(ps_supplycost * ps_qty), 2) AS value
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY ps_partkey
    ),
    thr AS (SELECT ROUND(SUM(value) * 0.002, 2) AS cutoff FROM natps)
    SELECT ps_partkey, value
    FROM natps, thr
    WHERE value > cutoff
    """,
    doc="TPC-H Q11 shape: important stock — per-part inventory value in "
        "one nation, kept only when it exceeds a FRACTION OF THE GLOBAL "
        "SUM. The global scalar is computed once and broadcast as a "
        "1-row relation (never collected to the driver); the HAVING-"
        "over-global-aggregate shape is the one Q22 does not cover "
        "(ratio-of-total, not above-average). Both the per-part value "
        "and the cutoff are rounded 2dp before comparison.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation = tables(
        spark, sf_dir, "lineitem", "supplier", "nation"
    )
    natps = (
        _ps_proxy(lineitem)
        .join(supplier, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy("ps_partkey")
        .agg(
            F.round(F.sum(F.col("ps_supplycost") * F.col("ps_qty")), 2)
            .alias("value")
        )
        # persisted: feeds both the 0.2% cutoff aggregate and the
        # filtered output — one per-part aggregation instead of two
        # (guide §5 reuse rule); O(parts) rows
    )
    natps = persist_tracked(natps)
    thr = natps.agg(
        F.round(F.sum("value") * 0.002, 2).alias("cutoff")
    )
    return (
        natps.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("cutoff"))
        .select("ps_partkey", "value")
    )


@register(
    "q16_supplier_part_counts",
    f"""
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: parts/supplier relationship counts — DISTINCT "
        "supplier count per (brand, type, size) with negated predicates "
        "(<>, NOT LIKE, IN-list) and a NOT IN subquery realized as a "
        "left-anti join (the excluded-supplier key set is non-nullable "
        "by construction, so anti-join and NOT IN agree). The distinct "
        "pair derivation is one shuffle; COUNT(DISTINCT) expands then "
        "collapses on the grouping key — both partial-agg friendly.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier = tables(
        spark, sf_dir, "lineitem", "part", "supplier"
    )
    pairs = lineitem.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    part_f = part.filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    excluded = supplier.filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        pairs.join(excluded, "ps_suppkey", "left_anti")
        .join(part_f, F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt")
        )
    )


@register(
    "q20_part_promotion_suppliers",
    """
    WITH shipped AS (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 30
    )
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_12', 'NATION_22')
      AND s_suppkey IN (SELECT l_suppkey FROM shipped)
    """,
    doc="TPC-H Q20 shape: part-promotion suppliers — a semi-join against "
        "an aggregate-HAVING subquery (suppliers who moved >30 units of "
        "a small-part in 1996, per part). The HAVING aggregate shuffles "
        "on (suppkey, partkey) with map-side partial sums; the outer "
        "IN realizes as left-semi, so supplier rows are never "
        "duplicated; nation is broadcast.",
)
def q20_part_promotion_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem, part, supplier, nation = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    shipped = (
        lineitem
        .join(part.filter(F.col("p_name").like("small%")),
              F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            (F.col("l_shipdate")
             >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate")
               < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        supplier
        .join(
            F.broadcast(nation.filter(
                F.col("n_name").isin("NATION_2", "NATION_12", "NATION_22")
            )),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(shipped, "s_suppkey", "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_2', 'NATION_12')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape: suppliers who kept orders waiting — the "
        "double-correlated EXISTS / NOT EXISTS realized as a left-semi "
        "join (some OTHER supplier has a line on the order) plus a "
        "left-anti join (no OTHER supplier was ALSO late), both keyed on "
        "l_orderkey with an inequality residual. Lateness adapts "
        "receipt-vs-commit to shipdate > orderdate + 60 days (no "
        "commit/receipt columns in this schema). The late subset is "
        "computed once and reused by both the probe and the anti side.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, nation = tables(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    late = (
        lineitem
        .join(orders.filter(F.col("o_orderstatus") == "F"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        # persisted: the late subset anchors the probe side AND the
        # anti side, so without it the lineitem x orders join runs
        # twice (guide §5 reuse rule); two small key columns only
    )
    late = persist_tracked(late)
    l1 = late.alias("l1")
    other_line = lineitem.select("l_orderkey", "l_suppkey").alias("l2")
    other_late = late.alias("l3")
    return (
        l1
        .join(
            other_line,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(
                F.col("n_name").isin("NATION_2", "NATION_12")
            )),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
