"""Incremental view maintenance: fold algebra, retraction, and the
incremental == full-recompute contract (operators/ivm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.operators.ivm import (
    agg_state,
    finalize_rollup,
    merge_states,
    negate_state,
)

SF_DIR = "/root/testdata/sf0.001"

def SPECS():
    # lazy: F.col needs an active session
    return {"s": ("sum", F.col("l_quantity")), "n": ("count", None)}


def FULL_SPECS():
    return {
        **SPECS(),
        "mn": ("min", F.col("l_extendedprice")),
        "mx": ("max", F.col("l_extendedprice")),
    }


KEYS = ["l_returnflag", "l_linestatus"]


def _li(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_way_fold_equals_full_aggregate(spark):
    fs = FULL_SPECS()
    li = _li(spark)
    parts = [li.where(F.col("l_orderkey") % 3 == i) for i in range(3)]
    folded = merge_states(
        [agg_state(p, KEYS, fs) for p in parts], KEYS, fs
    )
    full = agg_state(li, KEYS, fs)
    # sums are integral-ish here (quantity is whole units in testdata),
    # but guard float order anyway by rounding
    r = lambda df: _rows(
        df.select(*KEYS, F.round("s", 6).alias("s"), "n", "mn", "mx")
    )
    assert r(folded) == r(full)


def test_retraction_removes_a_batch(spark):
    sp = SPECS()
    li = _li(spark)
    base = li.where(F.col("l_orderkey") % 4 != 0)
    bad = li.where(F.col("l_orderkey") % 4 == 0)
    state = merge_states(
        [agg_state(base, KEYS, sp), agg_state(bad, KEYS, sp)],
        KEYS, sp,
    )
    # retract the bad batch: fold its negated state back in
    repaired = merge_states(
        [state, negate_state(agg_state(bad, KEYS, sp), sp)],
        KEYS, sp,
    )
    want = agg_state(base, KEYS, sp)
    r = lambda df: _rows(df.select(*KEYS, F.round("s", 6).alias("s"), "n"))
    assert r(repaired) == r(want)


def test_minmax_state_refuses_retraction(spark):
    fs = FULL_SPECS()
    li = _li(spark)
    st = agg_state(li, KEYS, fs)
    with pytest.raises(ValueError, match="min/max"):
        negate_state(st, fs)


def test_finalized_rollup_matches_single_pass(spark):
    from fda_clinical_etl_pipeline_spark.operators.ivm import (
        _rollup_specs,
        ivm_incremental_rollup,
    )

    incremental = _rows(ivm_incremental_rollup(spark, SF_DIR))
    single = _rows(
        finalize_rollup(agg_state(_li(spark), KEYS, _rollup_specs()))
    )
    assert incremental == single and len(incremental) > 0


def test_fold_shuffles_groups_not_corpus(spark):
    """The merge's exchange must be keyed on the grouping key over the
    (tiny) state relations — assert no exchange re-reads the base
    table's full row set by checking partial aggregation happens below
    every shuffle (each input is pre-aggregated before union)."""
    import contextlib
    import io

    from fda_clinical_etl_pipeline_spark.operators.ivm import (
        ivm_incremental_rollup,
    )

    df = ivm_incremental_rollup(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # partial HashAggregate below the exchange on both branches
    assert plan.count("HashAggregate") >= 4
    assert "Exchange" in plan
