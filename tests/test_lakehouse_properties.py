"""Model-based property tests for the three table-format twins: a
random sequence of upsert batches against each format must match a
20-line Python dictionary model of Hudi upsert semantics (greatest
precombine wins per key; ties → the later batch; within a batch the
greatest precombine survives). Exercises whichever physical strategy
the auto mode picks per step (COW rewrites, Delta deletion vectors,
Iceberg position deletes, fresh Hudi file slices) — the model cannot
tell them apart, which is the point."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.hudi_table import HudiTable
from fda_clinical_etl_pipeline_spark.sources.iceberg import IcebergTable

# a run = 2-4 batches of (key, precombine, payload) rows
row = st.tuples(
    st.integers(min_value=0, max_value=9),      # key
    st.integers(min_value=0, max_value=5),      # precombine
    st.integers(min_value=0, max_value=99),     # payload
)
batches_strategy = st.lists(
    st.lists(row, min_size=1, max_size=6), min_size=2, max_size=4
)


def _model(batches):
    """The Hudi upsert contract, independent of any storage layer."""
    state: dict[int, tuple[int, int]] = {}
    for batch in batches:
        # within a batch: greatest precombine wins; among equal
        # precombine values the twins keep a deterministic winner —
        # make the expectation unambiguous by keeping the max payload
        # as tiebreak below and feeding each engine pre-deduped rows
        best: dict[int, tuple[int, int]] = {}
        for k, pc, val in batch:
            cur = best.get(k)
            if cur is None or (pc, val) > cur:
                best[k] = (pc, val)
        for k, (pc, val) in best.items():
            cur = state.get(k)
            if cur is None or pc >= cur[0]:  # ties -> incoming
                state[k] = (pc, val)
    return state


def _dedup(batch):
    best = {}
    for k, pc, val in batch:
        cur = best.get(k)
        if cur is None or (pc, val) > cur:
            best[k] = (pc, val)
    return [(k, pc, val) for k, (pc, val) in best.items()]


def _df(spark, batch):
    return spark.createDataFrame(
        _dedup(batch), "k long, pc long, val long"
    )


def _check(table_rows, batches):
    expected = {
        (k, pc, val) for k, (pc, val) in _model(batches).items()
    }
    assert table_rows == expected


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "hudi"])
@settings(max_examples=6, deadline=None)
@given(batches=batches_strategy)
def test_upsert_sequence_matches_model(spark, tmp_path_factory,
                                       fmt, batches):
    base = tmp_path_factory.mktemp(f"prop_{fmt}")
    path = str(base / "t")
    first = _df(spark, batches[0])
    if fmt == "delta":
        t = DeltaProtocolTable.create(
            spark, path, first, key="k", precombine="pc"
        )
        for b in batches[1:]:
            t.upsert(_df(spark, b))
        got = {
            (r.k, r.pc, r.val) for r in t.snapshot().collect()
        }
    elif fmt == "iceberg":
        t = IcebergTable.create(spark, path, first)
        for b in batches[1:]:
            t.upsert(_df(spark, b), key="k", precombine="pc")
        got = {
            (r.k, r.pc, r.val) for r in t.snapshot().collect()
        }
    else:
        t = HudiTable.create(spark, path, "prop", "k", "pc")
        t.upsert(first)
        for b in batches[1:]:
            t.upsert(_df(spark, b))
        got = {
            (int(r.k), r.pc, r.val)
            for r in t.snapshot().select("k", "pc", "val").collect()
        }
    _check(got, batches)


# ---------------------------------------- MOR + deletes, model-based
op_strategy = st.one_of(
    st.tuples(st.just("upsert"),
              st.lists(row, min_size=1, max_size=6)),
    st.tuples(st.just("delete"),
              st.sets(st.integers(min_value=0, max_value=9),
                      min_size=1, max_size=4)),
    st.tuples(st.just("compact"), st.none()),
)
ops_strategy = st.lists(op_strategy, min_size=2, max_size=5)


def _model_with_deletes(ops, first):
    state: dict[int, tuple[int, int]] = {}
    for k, pc, val in _dedup(first):
        state[k] = (pc, val)
    for kind, arg in ops:
        if kind == "upsert":
            for k, pc, val in _dedup(arg):
                cur = state.get(k)
                if cur is None or pc >= cur[0]:
                    state[k] = (pc, val)
        elif kind == "delete":
            for k in arg:
                state.pop(k, None)
        # compact: never changes answers
    return {(k, pc, val) for k, (pc, val) in state.items()}


@settings(max_examples=4, deadline=None)
@given(first=st.lists(row, min_size=1, max_size=6), ops=ops_strategy)
def test_mor_sequence_with_deletes_matches_model(
    spark, tmp_path_factory, first, ops
):
    """A random upsert/delete/compact sequence against a MERGE_ON_READ
    Hudi table (log blocks, tombstones, log folds) must match the
    storage-free dictionary model — and a COW twin fed the identical
    sequence must agree with the MOR table row for row, which pins
    that the table type changes write economics, never answers."""
    base = tmp_path_factory.mktemp("prop_mor")
    tables = {}
    for kind_name, ttype in (("mor", "MERGE_ON_READ"),
                             ("cow", "COPY_ON_WRITE")):
        t = HudiTable.create(
            spark, str(base / kind_name), kind_name, "k", "pc",
            table_type=ttype,
        )
        t.upsert(_df(spark, first))
        for kind, arg in ops:
            if kind == "upsert":
                t.upsert(_df(spark, arg))
            elif kind == "delete":
                t.delete_where(F.col("k").isin(sorted(arg)))
            elif kind == "compact" and kind_name == "mor":
                try:
                    t.compact()
                except ValueError:
                    pass  # nothing to compact yet — valid state
        tables[kind_name] = t
    expected = _model_with_deletes(ops, first)
    for kind_name, t in tables.items():
        got = {
            (r.k, r.pc, r.val)
            for r in t.snapshot().select("k", "pc", "val").collect()
        }
        assert got == expected, f"{kind_name} diverged from model"
