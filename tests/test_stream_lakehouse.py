"""Exactly-once streaming sinks into the Hudi and Iceberg twins.

foreachBatch may replay a batch with the same id after a failure (or
after a checkpoint loss, simulated here with a fresh checkpoint dir).
Each format records the (app, batch) id atomically with the data via
its own spec mechanism — Hudi's ``deltastreamer.checkpoint.key``
commit metadata, Iceberg's snapshot summary properties — so the
replayed batch is a no-op: no duplicate rows, no extra commits.
The Delta twin's ``txn``-action path is pinned in test_streaming.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    HudiTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)
from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
    stream_upsert,
)

SCHEMA = "k int, ver int, bal double"


def _seed(spark):
    return spark.createDataFrame(
        [(i, 1, float(i)) for i in range(10)], SCHEMA
    )


def _write_batches(src):
    src.mkdir()
    (src / "b1.json").write_text(json.dumps(
        {"k": 0, "ver": 2, "bal": 100.0}))
    (src / "b2.json").write_text(json.dumps(
        {"k": 20, "ver": 1, "bal": 20.0}))


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )


def test_hudi_stream_exactly_once(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "h"), "s_tbl", "k", "ver",
        table_type="MERGE_ON_READ",
    )
    t.upsert(_seed(spark))
    src = tmp_path / "src"
    _write_batches(src)
    stream_upsert(
        _stream(spark, src), t, str(tmp_path / "ck1"), app_id="app1"
    )
    commits = t.commits()
    state = sorted(
        (r["k"], r["ver"], r["bal"]) for r in t.snapshot().collect()
    )
    assert (0, 2, 100.0) in state and (20, 1, 20.0) in state
    assert t.last_streaming_batch("app1") == 1
    # checkpoint loss: a fresh dir replays every batch id from 0 —
    # the recorded high-water must no-op them all
    stream_upsert(
        _stream(spark, src), t, str(tmp_path / "ck2"), app_id="app1"
    )
    assert t.commits() == commits
    assert sorted(
        (r["k"], r["ver"], r["bal"]) for r in t.snapshot().collect()
    ) == state
    # a direct replayed upsert no-ops too; a NEW batch id applies
    t.upsert(
        spark.createDataFrame([(0, 9, -1.0)], SCHEMA),
        checkpoint=("app1", 1),
    )
    assert (0, 2, 100.0) in sorted(
        (r["k"], r["ver"], r["bal"]) for r in t.snapshot().collect()
    )
    t.upsert(
        spark.createDataFrame([(0, 9, -1.0)], SCHEMA),
        checkpoint=("app1", 2),
    )
    got = {r["k"]: r["ver"] for r in t.snapshot().collect()}
    assert got[0] == 9
    assert t.last_streaming_batch("app1") == 2
    # other apps keep their own high-water
    assert t.last_streaming_batch("other") is None


def test_iceberg_stream_exactly_once_upsert(spark, tmp_path):
    t = IcebergTable.create(spark, str(tmp_path / "i"), _seed(spark))
    src = tmp_path / "src"
    _write_batches(src)
    stream_upsert(
        _stream(spark, src), t, str(tmp_path / "ck1"),
        app_id="q1", key="k", precombine="ver",
    )
    n_snaps = len(t.metadata()["snapshots"])
    state = sorted(
        (r["k"], r["ver"], r["bal"]) for r in t.snapshot().collect()
    )
    assert (0, 2, 100.0) in state and (20, 1, 20.0) in state
    assert t.last_streaming_batch("q1") == 1
    # summary props landed on the streaming snapshots (spec shape)
    stamped = [
        s for s in t.metadata()["snapshots"]
        if s["summary"].get("streaming-app-id") == "q1"
    ]
    assert {s["summary"]["streaming-batch-id"] for s in stamped} == {
        "0", "1"
    }
    # replay with a lost checkpoint: no new snapshots, no dup rows
    stream_upsert(
        _stream(spark, src), t, str(tmp_path / "ck2"),
        app_id="q1", key="k", precombine="ver",
    )
    assert len(t.metadata()["snapshots"]) == n_snaps
    assert sorted(
        (r["k"], r["ver"], r["bal"]) for r in t.snapshot().collect()
    ) == state


def test_iceberg_stream_append_mode(spark, tmp_path):
    """Without key/precombine the sink appends; replay still no-ops."""
    t = IcebergTable.create(spark, str(tmp_path / "i"), _seed(spark))
    src = tmp_path / "src"
    _write_batches(src)
    stream_upsert(
        _stream(spark, src), t, str(tmp_path / "ck1"), app_id="qa"
    )
    assert t.snapshot().count() == 12
    stream_upsert(
        _stream(spark, src), t, str(tmp_path / "ck2"), app_id="qa"
    )
    assert t.snapshot().count() == 12
    # without app_id, appends duplicate (documented at-least-once)
    stream_upsert(
        _stream(spark, src), t, str(tmp_path / "ck3")
    )
    assert t.snapshot().count() == 14


def test_iceberg_summary_is_one_shot(spark, tmp_path):
    t = IcebergTable.create(spark, str(tmp_path / "i"), _seed(spark))
    t.set_commit_summary({"streaming-app-id": "x",
                          "streaming-batch-id": "7"})
    t.append(spark.createDataFrame([(50, 1, 5.0)], SCHEMA))
    t.append(spark.createDataFrame([(51, 1, 5.0)], SCHEMA))
    snaps = t.metadata()["snapshots"]
    assert snaps[-2]["summary"].get("streaming-app-id") == "x"
    # consumed by the first commit; the next one is unstamped
    assert "streaming-app-id" not in snaps[-1]["summary"]
    assert t.last_streaming_batch("x") == 7


# ------------------------------------------------- streaming MERGE
CDC_SCHEMA = "k long, bal double, op string"


def _write_cdc_batches(src):
    src.mkdir()
    (src / "b1.json").write_text(json.dumps(
        {"k": 0, "bal": 500.0, "op": "U"}))      # update
    (src / "b2.json").write_text("\n".join([
        json.dumps({"k": 1, "bal": 0.0, "op": "D"}),    # tombstone
        json.dumps({"k": 50, "bal": 5.0, "op": "I"}),   # insert
    ]))


def _cdc_stream(spark, src):
    return (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )


def _cdc_seed(spark):
    return spark.createDataFrame(
        [(i, float(i), "seed") for i in range(10)], CDC_SCHEMA
    )


def test_delta_stream_merge_exactly_once(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_merge,
    )

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _cdc_seed(spark)
    )
    src = tmp_path / "cdc"
    _write_cdc_batches(src)
    clauses = dict(
        when_matched_delete="s.op = 'D'",
        when_matched_update={"bal": "s.bal"},
        when_not_matched_insert="all",
    )
    stream_merge(
        _cdc_stream(spark, src), t, str(tmp_path / "ck1"),
        on="k", app_id="cdc1", **clauses,
    )
    state = {r["k"]: r["bal"] for r in t.snapshot().collect()}
    assert state[0] == 500.0 and 1 not in state and state[50] == 5.0
    v = t.latest_version()
    # checkpoint loss: replayed batch ids must no-op via txn stamps
    stream_merge(
        _cdc_stream(spark, src), t, str(tmp_path / "ck2"),
        on="k", app_id="cdc1", **clauses,
    )
    assert t.latest_version() == v
    assert {r["k"]: r["bal"]
            for r in t.snapshot().collect()} == state


def test_iceberg_stream_merge_exactly_once(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_merge,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _cdc_seed(spark)
    )
    src = tmp_path / "cdc"
    _write_cdc_batches(src)
    clauses = dict(
        when_matched_delete="s.op = 'D'",
        when_matched_update={"bal": "s.bal"},
        when_not_matched_insert="all",
    )
    stream_merge(
        _cdc_stream(spark, src), t, str(tmp_path / "ck1"),
        on="k", app_id="cdc2", **clauses,
    )
    state = {r["k"]: r["bal"] for r in t.snapshot().collect()}
    assert state[0] == 500.0 and 1 not in state and state[50] == 5.0
    n_snaps = len(t.metadata()["snapshots"])
    stream_merge(
        _cdc_stream(spark, src), t, str(tmp_path / "ck2"),
        on="k", app_id="cdc2", **clauses,
    )
    assert len(t.metadata()["snapshots"]) == n_snaps
    assert {r["k"]: r["bal"]
            for r in t.snapshot().collect()} == state


def test_hudi_stream_merge_exactly_once(spark, tmp_path):
    """Streaming MERGE into Hudi — possible since the merge became a
    single timeline instant (combined DELETE+AVRO_DATA log blocks):
    each micro-batch is ONE deltacommit stamped with the
    ``deltastreamer.checkpoint.key`` batch id, so a replayed batch
    no-ops exactly like the Delta/Iceberg legs."""
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_merge,
    )

    t = HudiTable.create(
        spark, str(tmp_path / "h"), "sm_tbl", "k", "bal",
        table_type="MERGE_ON_READ",
    )
    t.upsert(_cdc_seed(spark))
    src = tmp_path / "cdc"
    _write_cdc_batches(src)
    clauses = dict(
        when_matched_delete="s.op = 'D'",
        when_matched_update={"bal": "s.bal"},
        when_not_matched_insert="all",
    )
    stream_merge(
        _cdc_stream(spark, src), t, str(tmp_path / "ck1"),
        on="k", app_id="cdc3", **clauses,
    )
    state = {r["k"]: r["bal"] for r in t.snapshot().collect()}
    assert state[0] == 500.0 and 1 not in state and state[50] == 5.0
    n_commits = len(t.commits())
    assert n_commits == 1 + 2  # seed + ONE instant per CDC batch
    # checkpoint loss: replayed batch ids must no-op via the stamp
    stream_merge(
        _cdc_stream(spark, src), t, str(tmp_path / "ck2"),
        on="k", app_id="cdc3", **clauses,
    )
    assert len(t.commits()) == n_commits
    assert {r["k"]: r["bal"]
            for r in t.snapshot().collect()} == state
