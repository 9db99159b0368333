"""Model-based property test for MERGE INTO: a random sequence of
merge statements (update+delete+insert clauses with a value-driven
delete condition) against the Delta twin — in BOTH physical modes —
and the Iceberg twin must match a 15-line Python dictionary model of
the clause semantics. The model cannot tell copy-on-write from
deletion vectors from equality-delete files, which is the point."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)

SCHEMA = "k long, val long"

# a merge source = unique keys (ambiguous sources refuse by design),
# each with a value; val < 0 drives the delete clause
src_batch = st.dictionaries(
    st.integers(min_value=0, max_value=9),       # key
    st.integers(min_value=-20, max_value=99),    # val
    min_size=1, max_size=6,
)
merges_strategy = st.lists(src_batch, min_size=2, max_size=4)


def _model(initial: dict[int, int], merges) -> dict[int, int]:
    """MERGE semantics: matched & val<0 -> delete; matched -> update
    to val; not matched & val>=0 -> insert; negative-val inserts are
    condition-gated away."""
    state = dict(initial)
    for src in merges:
        for k, val in src.items():
            if k in state:
                if val < 0:
                    del state[k]
                else:
                    state[k] = val
            elif val >= 0:
                state[k] = val
    return state


INITIAL = {i: i * 10 for i in range(0, 6)}


def _run(spark, table, merges, mode_kw) -> dict[int, int]:
    for src in merges:
        table.merge(
            spark.createDataFrame(
                sorted(src.items()), SCHEMA
            ),
            on="k",
            when_matched_delete="s.val < 0",
            when_matched_update={"val": "s.val"},
            when_not_matched_insert="all",
            not_matched_insert_condition="s.val >= 0",
            **mode_kw,
        )
    return {
        r["k"]: r["val"] for r in table.snapshot().collect()
    }


@settings(max_examples=5, deadline=None)
@given(merges=merges_strategy)
def test_delta_merge_matches_model_both_modes(
    spark, tmp_path_factory, merges
):
    expected = _model(INITIAL, merges)
    for mode in ("cow", "mor"):
        base = tmp_path_factory.mktemp(f"dm_{mode}")
        t = DeltaProtocolTable.create(
            spark, str(base / "t"),
            spark.createDataFrame(sorted(INITIAL.items()), SCHEMA),
        )
        got = _run(spark, t, merges, {"mode": mode})
        assert got == expected, f"mode={mode}"


@settings(max_examples=5, deadline=None)
@given(merges=merges_strategy)
def test_iceberg_merge_matches_model(
    spark, tmp_path_factory, merges
):
    expected = _model(INITIAL, merges)
    base = tmp_path_factory.mktemp("im")
    t = IcebergTable.create(
        spark, str(base / "t"),
        spark.createDataFrame(sorted(INITIAL.items()), SCHEMA),
    )
    got = _run(spark, t, merges, {})
    assert got == expected
    # and compaction must not move a value
    t.purge_deletes()
    t.rewrite_data_files()
    assert {
        r["k"]: r["val"] for r in t.snapshot().collect()
    } == expected


@settings(max_examples=3, deadline=None)
@given(merges=merges_strategy)
def test_hudi_merge_matches_model(spark, tmp_path_factory, merges):
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    expected = _model(INITIAL, merges)
    base = tmp_path_factory.mktemp("hm")
    t = HudiTable.create(
        spark, str(base / "t"), "prop_merge_tbl", "k", "val"
    )
    t.upsert(spark.createDataFrame(sorted(INITIAL.items()), SCHEMA))
    for src in merges:
        t.merge(
            spark.createDataFrame(sorted(src.items()), SCHEMA),
            when_matched_delete="s.val < 0",
            when_matched_update={"val": "s.val"},
            when_not_matched_insert="all",
            not_matched_insert_condition="s.val >= 0",
        )
    got = {
        r["k"]: r["val"]
        for r in t.snapshot().select("k", "val").collect()
    }
    assert got == expected

    # single-instant atomicity: each merge commits at most ONE
    # timeline instant, and a reader AT any completed instant (the
    # state a concurrent reader can observe) sees exactly one of the
    # model's committed states — deleted-but-not-yet-merged state is
    # unobservable, matching the atomic Delta/Iceberg merges
    states = [dict(INITIAL)]
    for src in merges:
        states.append(_model(states[-1], [src]))
    valid = [frozenset(s.items()) for s in states]
    commits = t.commits()
    assert len(commits) <= 1 + len(merges)
    for inst in commits:
        seen = frozenset(
            (r["k"], r["val"])
            for r in t.snapshot(as_of_instant=inst)
            .select("k", "val").collect()
        )
        assert seen in valid, f"reader at {inst} saw torn state"
