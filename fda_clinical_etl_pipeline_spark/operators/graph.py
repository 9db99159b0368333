"""Iterative graph analytics over relational data (engine extension).

The reference has no graph operators; a training-data pipeline does:
dedup clustering is connected components (operators/dedup.py), and
source-quality weighting at corpus scale is PageRank over a
document/source link graph. This module implements fixed-iteration
PageRank the Spark way — a driver loop over bounded DataFrame
iterations, each one a join + partial-agg shuffle on the edge list,
nothing per-row on the driver.

Determinism contract: ranks are integer MICRO-UNITS (total mass 10^12)
with truncating integer division everywhere. Float PageRank sums in
engine-specific order and never hash-matches across engines; integer
arithmetic is associative, so the DuckDB oracle (the same three
iterations unrolled as CTEs) matches bit-for-bit. This also makes the
operator resumable mid-run at scale: checkpointed integer ranks have
no accumulated float drift.

Graph for the gate query: the bipartite customer↔supplier graph
observed in order history (distinct (o_custkey, l_suppkey) pairs),
customers as even node ids (2k), suppliers odd (2k+1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables

TOTAL_MASS = 1_000_000_000_000  # 10^12 micro-units of rank
DAMPING_NUM, DAMPING_DEN = 85, 100  # d = 0.85 as an exact ratio


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    total_mass: int = TOTAL_MASS,
) -> DataFrame:
    """``edges(src, dst)`` (directed; pass both directions for an
    undirected graph) → ``(node, rank)`` after ``iterations`` rounds of
    integer-arithmetic PageRank.

    Per round: one join of the current rank vector against the edge
    list (shuffle keyed on src — the rank vector is O(nodes), tiny
    next to the edges) and one partial-agg groupBy on dst. Nodes are
    those appearing in the edge list, so every node has degree ≥ 1 and
    no dangling-mass redistribution is needed. The bounded iteration
    count keeps the logical plan shallow (3 rounds ≈ 6 joins); for
    deeper runs, localCheckpoint per round like connected_components.
    """
    edges = edges.select("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n1 = nodes.agg(F.count(F.lit(1)).alias("n"))

    # base teleport share, computed in-plan from the 1-row count
    # relation (broadcast; never collected to the driver)
    base = F.expr(f"{total_mass} div n")
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", base.alias("rank"), "n"
    )
    for _ in range(iterations):
        contrib = (
            edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.expr(
                        f"(({DAMPING_DEN - DAMPING_NUM}) * "
                        f"({total_mass} div n)) div {DAMPING_DEN}"
                    )
                    + F.expr(
                        f"({DAMPING_NUM} * coalesce(inflow, 0L)) "
                        f"div {DAMPING_DEN}"
                    )
                ).alias("rank"),
                "n",
            )
        )
    return ranks.select("node", "rank")


@register(
    "graph_pagerank",
    """
    WITH eo AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    und AS (
      SELECT src, dst FROM eo UNION ALL SELECT dst, src FROM eo
    ),
    nodes AS (SELECT DISTINCT src AS node FROM und),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (
      SELECT node, 1000000000000 // n AS rank FROM nodes CROSS JOIN nn
    ),
    i1 AS (
      SELECT u.dst AS node, SUM(r.rank // d.deg) AS inflow
      FROM und u JOIN r0 r ON r.node = u.src JOIN deg d ON d.node = u.src
      GROUP BY 1
    ),
    r1 AS (
      SELECT nodes.node,
             (15 * (1000000000000 // n)) // 100
             + (85 * COALESCE(i1.inflow, 0)) // 100 AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN i1 ON i1.node = nodes.node
    ),
    i2 AS (
      SELECT u.dst AS node, SUM(r.rank // d.deg) AS inflow
      FROM und u JOIN r1 r ON r.node = u.src JOIN deg d ON d.node = u.src
      GROUP BY 1
    ),
    r2 AS (
      SELECT nodes.node,
             (15 * (1000000000000 // n)) // 100
             + (85 * COALESCE(i2.inflow, 0)) // 100 AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN i2 ON i2.node = nodes.node
    ),
    i3 AS (
      SELECT u.dst AS node, SUM(r.rank // d.deg) AS inflow
      FROM und u JOIN r2 r ON r.node = u.src JOIN deg d ON d.node = u.src
      GROUP BY 1
    ),
    r3 AS (
      SELECT nodes.node,
             (15 * (1000000000000 // n)) // 100
             + (85 * COALESCE(i3.inflow, 0)) // 100 AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN i3 ON i3.node = nodes.node
    )
    SELECT node, rank FROM r3
    """,
    doc="Fixed-iteration (3) integer-arithmetic PageRank over the "
        "bipartite customer↔supplier order graph. Exact cross-engine "
        "parity by construction: rank lives in 10^12 micro-units with "
        "truncating integer division, so the DuckDB oracle (the same "
        "iterations unrolled as CTEs) matches bit-for-bit — no float "
        "summation-order exposure. Each round is one edge-list join + "
        "one partial-agg shuffle; the rank vector is O(nodes).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    eo = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    und = eo.union(eo.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    return pagerank(und, iterations=3)
