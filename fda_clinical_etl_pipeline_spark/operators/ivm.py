"""Incremental view maintenance for additive rollups (engine extension).

At 100 TB the nightly FULL recompute of a rollup is the bottleneck a
pipeline dies on; the fix is keeping re-aggregable PARTIAL STATE per
group (sums, counts, mins, maxes — Spark's own partial-aggregation
buffers, persisted) and folding each batch's delta in:

    state' = merge(state, agg_state(delta))

which costs a shuffle of O(groups + delta rows) — never a rescan of
the base corpus. Derived metrics (averages, rates) are finalized from
state at read time, exactly how Spark finalizes ``avg`` from its own
(sum, count) buffer.

Algebra, stated honestly:
- sum/count fold under both inserts and RETRACTIONS (fold a negated
  state — ``negate_state`` — to remove a bad batch);
- min/max fold under inserts only: a retraction that removes the
  current extremum needs a rescan of that group (or a sketch). This is
  the standard IVM limitation, surfaced in the API docs rather than
  hidden.

The gate query proves the contract end-to-end: lineitem is split
deterministically into a "prior corpus" and a "late-arriving delta",
aggregated separately, merged — and the DuckDB oracle computes the
single-pass aggregate over the FULL table. Hash-match means
incremental == full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import money, tables

# metric kinds and their merge functions over partial states
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summation
    "min": F.min,
    "max": F.max,
}


def agg_state(df: DataFrame, keys: list[str], specs: dict[str, tuple]) -> DataFrame:
    """One partial-state row per group. ``specs`` maps state column ->
    (kind, source expression), kind in {sum, count, min, max}; e.g.
    ``{"sum_qty": ("sum", F.col("l_quantity")), "n": ("count", None)}``.
    """
    aggs = []
    for name, (kind, expr) in specs.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        else:
            aggs.append(_MERGE[kind](expr).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    states: list[DataFrame], keys: list[str], specs: dict[str, tuple]
) -> DataFrame:
    """Fold partial states: union + one groupBy on the grouping key.
    Shuffle size is O(total groups across inputs) — independent of the
    base corpus size, which is the whole point."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs = [
        _MERGE[kind](name).alias(name)
        for name, (kind, _expr) in specs.items()
    ]
    return merged.groupBy(*keys).agg(*aggs)


def negate_state(state: DataFrame, specs: dict[str, tuple]) -> DataFrame:
    """Negate a state's sum/count columns so merging it RETRACTS the
    batch it was built from. Raises if the spec carries min/max — those
    do not fold under deletion (document-standard IVM limitation)."""
    bad = [n for n, (k, _) in specs.items() if k in ("min", "max")]
    if bad:
        raise ValueError(
            f"min/max state cannot be retracted incrementally: {bad}; "
            "rescan the affected groups instead"
        )
    return state.select(
        *[c for c in state.columns if c not in specs],
        *[(-F.col(n)).alias(n) for n in specs],
    )


_KEYS = ["l_returnflag", "l_linestatus"]


def _rollup_specs() -> dict[str, tuple]:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return {
        "sum_qty": ("sum", F.col("l_quantity")),
        "sum_base_price": ("sum", F.col("l_extendedprice")),
        "sum_disc_price": ("sum", disc_price),
        "n_rows": ("count", None),
        "min_price": ("min", F.col("l_extendedprice")),
        "max_price": ("max", F.col("l_extendedprice")),
    }


def finalize_rollup(state: DataFrame) -> DataFrame:
    """State -> the published rollup: money-rounded sums (absorbing
    float summation-order differences, SURVEY.md §7.4 #6) and avg
    derived from (sum, count) exactly like Spark's own avg buffer."""
    return state.select(
        *_KEYS,
        money(F.col("sum_qty")).alias("sum_qty"),
        money(F.col("sum_base_price")).alias("sum_base_price"),
        money(F.col("sum_disc_price")).alias("sum_disc_price"),
        money(F.col("sum_base_price") / F.col("n_rows"), 4).alias(
            "avg_price"
        ),
        F.col("n_rows"),
        money(F.col("min_price")).alias("min_price"),
        money(F.col("max_price")).alias("max_price"),
    )


@register(
    "ivm_incremental_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
           ROUND(SUM(l_extendedprice) / COUNT(*), 4)          AS avg_price,
           CAST(COUNT(*) AS BIGINT)                           AS n_rows,
           ROUND(MIN(l_extendedprice), 2)                     AS min_price,
           ROUND(MAX(l_extendedprice), 2)                     AS max_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Incremental view maintenance: lineitem split into a prior "
        "corpus (7/8 of orders) and a late delta (1/8), aggregated to "
        "partial state separately, merged by state fold — while the "
        "oracle computes the single-pass aggregate over the full "
        "table. Hash-match proves incremental refresh == full "
        "recompute; the fold itself shuffles O(groups), not O(corpus).",
)
def ivm_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    specs = _rollup_specs()
    prior = lineitem.where(F.col("l_orderkey") % 8 != 0)
    delta = lineitem.where(F.col("l_orderkey") % 8 == 0)
    state = merge_states(
        [agg_state(prior, _KEYS, specs), agg_state(delta, _KEYS, specs)],
        _KEYS,
        specs,
    )
    return finalize_rollup(state)
