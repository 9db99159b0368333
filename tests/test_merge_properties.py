"""Model-based property test for MERGE INTO: a random sequence of
merge statements (update+delete+insert clauses with a value-driven
delete condition) against the Delta twin — in BOTH physical modes —
and the Iceberg twin must match a short Python dictionary model of
the clause semantics. The model cannot tell copy-on-write from
deletion vectors from equality-delete files, which is the point.

Two orthogonal dimensions stress the write paths:

* ``cap_mode``: every test runs once with the default driver-side
  key collect and once with ``SPARK_GRAFT_KEY_COLLECT_CAP=0``, which
  forces the fully distributed key→file prune
  (``sources/keyindex.py``) that a 100 TB-posture batch takes — the
  results must be bit-identical to the collect path.
* NULL merge keys: source batches may carry a NULL key. SQL equality
  never matches NULL, so a NULL-key source row can only INSERT, and
  every NULL insert adds a NEW row (two NULL rows never merge). The
  model tracks NULL rows as a multiset next to the keyed dict.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

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
# each with a value; val < 0 drives the delete clause. One key per
# batch may be NULL (dict keys are unique, so at most one None).
src_batch = st.dictionaries(
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    st.integers(min_value=-20, max_value=99),    # val
    min_size=1, max_size=6,
)
merges_strategy = st.lists(src_batch, min_size=2, max_size=4)

# Hudi record keys must be NON-NULL (real Hudi raises
# HoodieKeyException; the twin refuses identically — pinned by
# test_hudi_null_record_key_refused below), so its strategy draws
# integer keys only.
nn_src_batch = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=-20, max_value=99),
    min_size=1, max_size=6,
)
nn_merges_strategy = st.lists(nn_src_batch, min_size=2, max_size=4)

CAP_MODES = ("collect", "distributed")


@contextmanager
def _cap(mode: str):
    """Force the distributed keyindex path for the duration."""
    if mode == "collect":
        yield
        return
    old = os.environ.get("SPARK_GRAFT_KEY_COLLECT_CAP")
    os.environ["SPARK_GRAFT_KEY_COLLECT_CAP"] = "0"
    try:
        yield
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_KEY_COLLECT_CAP", None)
        else:
            os.environ["SPARK_GRAFT_KEY_COLLECT_CAP"] = old


def _sorted_items(src: dict):
    """dict items sorted with None first (None is not orderable)."""
    return sorted(
        src.items(),
        key=lambda kv: (kv[0] is not None, kv[0] or 0),
    )


def _model(initial: dict[int, int], merges):
    """MERGE semantics: matched & val<0 -> delete; matched -> update
    to val; not matched & val>=0 -> insert; negative-val inserts are
    condition-gated away. NULL keys never match (SQL equality), so
    they can only insert — each time a fresh row."""
    state = dict(initial)
    nulls: list[int] = []
    for src in merges:
        for k, val in src.items():
            if k is None:
                if val >= 0:
                    nulls.append(val)
            elif k in state:
                if val < 0:
                    del state[k]
                else:
                    state[k] = val
            elif val >= 0:
                state[k] = val
    return state, sorted(nulls)


def _observed(rows):
    state = {r["k"]: r["val"] for r in rows if r["k"] is not None}
    nulls = sorted(r["val"] for r in rows if r["k"] is None)
    return state, nulls


INITIAL = {i: i * 10 for i in range(0, 6)}


def _run(spark, table, merges, mode_kw):
    for src in merges:
        table.merge(
            spark.createDataFrame(_sorted_items(src), SCHEMA),
            on="k",
            when_matched_delete="s.val < 0",
            when_matched_update={"val": "s.val"},
            when_not_matched_insert="all",
            not_matched_insert_condition="s.val >= 0",
            **mode_kw,
        )
    return _observed(table.snapshot().collect())


@pytest.mark.parametrize("cap_mode", CAP_MODES)
@settings(max_examples=5, deadline=None)
@given(merges=merges_strategy)
def test_delta_merge_matches_model_both_modes(
    spark, tmp_path_factory, cap_mode, merges
):
    expected = _model(INITIAL, merges)
    with _cap(cap_mode):
        for mode in ("cow", "mor"):
            base = tmp_path_factory.mktemp(f"dm_{mode}")
            t = DeltaProtocolTable.create(
                spark, str(base / "t"),
                spark.createDataFrame(
                    sorted(INITIAL.items()), SCHEMA
                ),
            )
            got = _run(spark, t, merges, {"mode": mode})
            assert got == expected, f"mode={mode} cap={cap_mode}"


@pytest.mark.parametrize("cap_mode", CAP_MODES)
@settings(max_examples=5, deadline=None)
@given(merges=merges_strategy)
def test_iceberg_merge_matches_model(
    spark, tmp_path_factory, cap_mode, merges
):
    expected = _model(INITIAL, merges)
    base = tmp_path_factory.mktemp("im")
    t = IcebergTable.create(
        spark, str(base / "t"),
        spark.createDataFrame(sorted(INITIAL.items()), SCHEMA),
    )
    with _cap(cap_mode):
        got = _run(spark, t, merges, {})
    assert got == expected
    # and compaction must not move a value
    t.purge_deletes()
    t.rewrite_data_files()
    assert _observed(t.snapshot().collect()) == expected


@pytest.mark.parametrize("cap_mode", CAP_MODES)
@settings(max_examples=3, deadline=None)
@given(merges=nn_merges_strategy)
def test_hudi_merge_matches_model(
    spark, tmp_path_factory, cap_mode, merges
):
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    expected = _model(INITIAL, merges)
    base = tmp_path_factory.mktemp("hm")
    t = HudiTable.create(
        spark, str(base / "t"), "prop_merge_tbl", "k", "val"
    )
    with _cap(cap_mode):
        t.upsert(
            spark.createDataFrame(sorted(INITIAL.items()), SCHEMA)
        )
        for src in merges:
            t.merge(
                spark.createDataFrame(_sorted_items(src), SCHEMA),
                when_matched_delete="s.val < 0",
                when_matched_update={"val": "s.val"},
                when_not_matched_insert="all",
                not_matched_insert_condition="s.val >= 0",
            )
    got = _observed(t.snapshot().select("k", "val").collect())
    assert got == expected

    # single-instant atomicity: each merge commits at most ONE
    # timeline instant, and a reader AT any completed instant (the
    # state a concurrent reader can observe) sees exactly one of the
    # model's committed states — deleted-but-not-yet-merged state is
    # unobservable, matching the atomic Delta/Iceberg merges
    states = [(dict(INITIAL), [])]
    for src in merges:
        prev_state, prev_nulls = states[-1]
        nxt_state, new_nulls = _model(prev_state, [src])
        states.append((nxt_state, sorted(prev_nulls + new_nulls)))
    valid = [
        (frozenset(s.items()), tuple(n)) for s, n in states
    ]
    commits = t.commits()
    assert len(commits) <= 1 + len(merges)
    for inst in commits:
        st_, nl = _observed(
            t.snapshot(as_of_instant=inst)
            .select("k", "val").collect()
        )
        seen = (frozenset(st_.items()), tuple(nl))
        assert seen in valid, f"reader at {inst} saw torn state"


def test_hudi_null_record_key_refused(spark, tmp_path):
    """NULL record keys refuse loudly on Hudi upsert AND merge —
    parity with real Hudi's HoodieKeyException (a NULL key has no
    file-group identity; silently writing it let NULL rows collapse
    under the precombine fold in some paths and coexist in others)."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    t = HudiTable.create(
        spark, str(tmp_path / "t"), "null_key_tbl", "k", "val"
    )
    t.upsert(spark.createDataFrame([(1, 10)], SCHEMA))

    with pytest.raises(Exception, match="record key.*NULL"):
        t.upsert(spark.createDataFrame([(None, 5), (2, 20)], SCHEMA))
    with pytest.raises(Exception, match="record key.*NULL"):
        t.merge(
            spark.createDataFrame([(None, 5)], SCHEMA),
            when_matched_update={"val": "s.val"},
            when_not_matched_insert="all",
        )
    # nothing committed by the refused writes; non-null writes work
    assert {r["k"]: r["val"]
            for r in t.snapshot().select("k", "val").collect()} \
        == {1: 10}
    t.upsert(spark.createDataFrame([(2, 20)], SCHEMA))
    assert {r["k"]: r["val"]
            for r in t.snapshot().select("k", "val").collect()} \
        == {1: 10, 2: 20}
