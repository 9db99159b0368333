"""Structured Streaming tests: file-source ingest, watermarked windowed
aggregation, applyInPandasWithState sessionization, foreachBatch
provenance hook — all drained with availableNow triggers."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
    foreach_batch_provenance,
    run_to_memory,
    sessionize,
    stream_ingest_csv,
    windowed_event_counts,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _events_stream(spark, tmp_path, rows):
    src = tmp_path / "events_src"
    src.mkdir(parents=True)
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "batch0"))
    return (
        spark.readStream.schema(df.schema).parquet(str(src / "batch0"))
    )


ROWS = [
    (1, "2024-01-01 10:00:00", 1, "click", 1.0),
    (2, "2024-01-01 10:10:00", 1, "click", 2.0),
    (3, "2024-01-01 11:05:00", 1, "view", 3.0),   # > 30 min gap → new session
    (4, "2024-01-01 10:20:00", 2, "click", 4.0),
    (5, "2024-01-01 13:00:00", 2, "view", 5.0),   # watermark pusher
]


def _to_ts(rows):
    import datetime

    return [
        (i, datetime.datetime.fromisoformat(ts), u, et, v)
        for i, ts, u, et, v in rows
    ]


def test_stream_ingest_csv(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "a.csv").write_text("patient_id,notes\nP1,hello\nP2,world\n")
    (src / "b.csv").write_text("patient_id,notes\nP3,again\n")
    schema = T.StructType(
        [
            T.StructField("patient_id", T.StringType()),
            T.StructField("notes", T.StringType()),
        ]
    )
    stream = stream_ingest_csv(spark, str(src), schema)
    assert stream.isStreaming
    run_to_memory(
        stream, "ingested", checkpoint_dir=str(tmp_path / "ckpt_ingest")
    )
    out = spark.sql("SELECT * FROM ingested").collect()
    assert len(out) == 3
    files = {r["_input_file"].split("/")[-1] for r in out}
    assert files == {"a.csv", "b.csv"}


def test_windowed_event_counts(spark, tmp_path):
    stream = _events_stream(spark, tmp_path, _to_ts(ROWS))
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    run_to_memory(
        agg, "win_counts", output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt_win"),
    )
    rows = spark.sql(
        "SELECT * FROM win_counts ORDER BY window_start, event_type"
    ).collect()
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["value_sum"])
        for r in rows
    }
    # 13:00 event holds the watermark at 11:00 → the 10:00 and (closed)
    # windows emit; availableNow flushes what the watermark allows
    assert got[("2024-01-01 10:00:00", "click")] == (3, 7.0)


def test_sessionize_closes_on_gap(spark, tmp_path):
    stream = _events_stream(spark, tmp_path, _to_ts(ROWS))
    sessions = sessionize(stream, gap_seconds=1800, watermark="10 minutes")
    run_to_memory(
        sessions, "sessions", output_mode="append",
        checkpoint_dir=str(tmp_path / "ckpt_sess"),
    )
    rows = spark.sql(
        "SELECT * FROM sessions ORDER BY user_id, session_start"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: first session (10:00–10:10, 2 events) closed by the 11:05
    # event arriving past the 30-min gap
    u1 = by_user[1][0]
    assert str(u1["session_start"]) == "2024-01-01 10:00:00"
    assert str(u1["session_end"]) == "2024-01-01 10:10:00"
    assert u1["n_events"] == 2 and u1["value_sum"] == 3.0
    # user 2: 10:20 session closed by the 13:00 event (gap > 30 min)
    u2 = by_user[2][0]
    assert u2["n_events"] == 1 and u2["value_sum"] == 4.0


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once upstream replays collapse: duplicate event_ids
    arriving within the watermark horizon are dropped with BOUNDED state
    (dropDuplicatesWithinWatermark)."""
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import stream_dedup

    replayed = ROWS + [
        (1, "2024-01-01 10:00:30", 1, "click", 1.0),   # replay of event 1
        (4, "2024-01-01 10:20:10", 2, "click", 4.0),   # replay of event 4
    ]
    stream = _events_stream(spark, tmp_path, _to_ts(replayed))
    deduped = stream_dedup(stream, ["event_id"], "ts", "2 hours")
    run_to_memory(deduped, "dedup_events", "append",
                  str(tmp_path / "dedup_ckpt"))
    out = spark.sql("SELECT event_id FROM dedup_events").collect()
    ids = sorted(r["event_id"] for r in out)
    assert ids == [1, 2, 3, 4, 5]


def test_stream_upsert_into_versioned_table(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.operators.versioning import (
        VersionedTable,
    )
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import stream_upsert

    t = VersionedTable(spark, str(tmp_path / "vt"), "patient_id", "visit_date")
    schema = "patient_id string, visit_date string, note string"

    src = tmp_path / "updates"
    src.mkdir()
    spark.createDataFrame(
        [("P1", "2025-01-01", "v1"), ("P2", "2025-01-01", "p2")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    stream_upsert(stream, t, str(tmp_path / "ck"))
    snap1 = {r["patient_id"]: r["note"] for r in t.snapshot().collect()}
    assert snap1 == {"P1": "v1", "P2": "p2"}

    # second wave of updates → second micro-batch → new version
    spark.createDataFrame(
        [("P1", "2025-06-01", "v2"), ("P3", "2025-02-01", "p3")], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream_upsert(stream, t, str(tmp_path / "ck"))
    snap2 = {r["patient_id"]: r["note"] for r in t.snapshot().collect()}
    assert snap2 == {"P1": "v2", "P2": "p2", "P3": "p3"}
    # time travel back to the first micro-batch's state
    v0 = {r["patient_id"]: r["note"] for r in t.version_as_of(0).collect()}
    assert v0 == {"P1": "v1", "P2": "p2"}


def test_stream_stream_interval_join(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        interval_join_streams,
    )

    clicks = _events_stream(
        spark, tmp_path / "a",
        _to_ts([
            (1, "2024-01-01 10:30:00", 1, "click", 1.0),
            (2, "2024-01-01 14:00:00", 1, "click", 2.0),
        ]),
    ).select("event_id", "ts", "user_id")
    purchases = _events_stream(
        spark, tmp_path / "b",
        _to_ts([
            (10, "2024-01-01 10:00:00", 1, "purchase", 9.0),  # within 1h of click 1
            (11, "2024-01-01 11:00:00", 1, "purchase", 8.0),  # 3h before click 2 → out
        ]),
    ).select(F.col("event_id").alias("p_id"), "ts", "user_id")
    joined = interval_join_streams(clicks, purchases, "user_id").select(
        "event_id", "p_id"
    )
    run_to_memory(
        joined, "sjoin", "append", str(tmp_path / "ckpt_sjoin")
    )
    pairs = {(r["event_id"], r["p_id"]) for r in spark.sql("SELECT * FROM sjoin").collect()}
    assert pairs == {(1, 10)}  # only the in-interval purchase matched


def test_stream_static_enrichment(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        enrich_stream_static,
    )

    stream = _events_stream(spark, tmp_path, _to_ts(ROWS))
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    enriched = enrich_stream_static(stream, dim, "user_id").groupBy(
        "tier"
    ).agg(F.count(F.lit(1)).alias("n"))
    run_to_memory(
        enriched, "enriched", output_mode="complete",
        checkpoint_dir=str(tmp_path / "ckpt_enrich"),
    )
    got = {r["tier"]: r["n"] for r in spark.sql("SELECT * FROM enriched").collect()}
    assert got == {"gold": 3, "silver": 2}


def test_foreach_batch_provenance(spark, tmp_path):
    stream = _events_stream(spark, tmp_path, _to_ts(ROWS))
    seen: list[tuple[int, int]] = []

    def sink(df, batch_id: int):
        seen.append((batch_id, df.count()))

    foreach_batch_provenance(stream, sink, str(tmp_path / "ckpt_feb"))
    assert seen and sum(n for _, n in seen) == 5


def test_stream_near_dup(spark, tmp_path):
    """Streaming near-dup twin: micro-batch 2's near-copy of a batch-1
    doc is dropped using ONLY the signature store (batch-1 text is gone
    by then); genuinely new docs survive; the store accumulates exactly
    the survivors' signatures."""
    import json

    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_near_dup,
    )

    src = tmp_path / "src"
    src.mkdir()
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from every hunter"
    )
    b1 = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": "completely different words about spark "
                              "query engines and shuffle partitioning "
                              "strategies for large scale data systems"},
    ]
    # near-copy of doc 1 (one word changed -> jaccard >> 0.5) + a new doc
    b2 = [
        {"doc_id": 3, "text": base.replace("green", "blue")},
        {"doc_id": 4, "text": "entirely novel content mentioning neither "
                              "foxes nor engines just a list of fruit "
                              "apple banana cherry date elderberry fig"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    sig_store = str(tmp_path / "sigs")
    out = str(tmp_path / "out")
    stream_near_dup(stream, sig_store, out, str(tmp_path / "ckpt"))

    # two separate micro-batch commits — otherwise doc 3 would have been
    # dropped by IN-batch dedup and the signature store never exercised
    commits = [
        c for c in (tmp_path / "ckpt" / "commits").iterdir()
        if not c.name.startswith(".")
    ]
    assert len(commits) == 2, "expected one micro-batch per input file"

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 1 in kept and 2 in kept, "batch-1 distinct docs must survive"
    assert 3 not in kept, "near-copy must be dropped via the sig store"
    assert 4 in kept, "novel doc must survive"
    sigs = spark.read.parquet(sig_store)
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == kept
    assert len(sigs.columns) == 33  # doc_id + h0..h31


def test_stream_running_topk_merges_across_batches(spark, tmp_path):
    """Two commits into the source: the second batch's ranking must
    reflect state carried from the first (cross-batch top-k merge)."""
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_running_topk,
    )

    src = tmp_path / "topk_src"
    src.mkdir(parents=True)
    schema = "event_id long, user_id long, value double"
    b0 = spark.createDataFrame(
        [(1, 1, 5.0), (2, 1, 9.0), (3, 1, 2.0), (4, 2, 7.0)], schema
    )
    b0.coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(b0.schema).parquet(str(src / "*"))
    out = stream_running_topk(stream, k=3)

    def drain():
        got = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                got[(r.user_id, r.rank)] = r.value

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "topk_ckpt"))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination(120)
        return got

    first = drain()
    assert first[(1, 1)] == 9.0 and first[(1, 2)] == 5.0
    assert first[(2, 1)] == 7.0

    b1 = spark.createDataFrame([(5, 1, 7.5), (6, 2, 1.0)], schema)
    b1.coalesce(1).write.parquet(str(src / "b1"))
    second = drain()
    # user 1: 7.5 slots between the carried 9.0 and 5.0
    assert second[(1, 1)] == 9.0
    assert second[(1, 2)] == 7.5
    assert second[(1, 3)] == 5.0
    # user 2: carried 7.0 still ranks above the new 1.0
    assert second[(2, 1)] == 7.0 and second[(2, 2)] == 1.0


def test_stream_ivm_refresh_exactly_once(spark, tmp_path):
    """Streaming IVM: micro-batches fold into a Delta-format state
    table (O(groups) per refresh, corpus never rescanned). Exactly-once
    is scoped to one checkpoint lineage: the txn appId binds the
    checkpoint location, so crash replays / re-runs under the SAME
    checkpoint no-op, while a FRESH checkpoint is a new stream lineage
    that reprocesses the source (standard foreachBatch semantics) —
    genuinely new batches are never silently discarded just because
    their batch ids restarted at 0."""
    import json as _json

    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.operators.ivm import agg_state
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )
    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_ivm_refresh,
    )

    src = tmp_path / "ivm_src"
    src.mkdir()
    rows1 = [{"grp": "a", "x": 1}, {"grp": "b", "x": 10}]
    rows2 = [{"grp": "a", "x": 5}, {"grp": "c", "x": 7}]
    (src / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows1))
    (src / "b2.json").write_text(
        "\n".join(_json.dumps(r) for r in rows2))

    def specs():
        return {"s": ("sum", F.col("x")), "n": ("count", None)}

    empty = spark.createDataFrame([], "grp string, s bigint, n bigint")
    table = DeltaProtocolTable.create(
        spark, str(tmp_path / "ivm_state"), empty
    )

    def run(ckpt):
        stream = (
            spark.readStream
            .schema("grp string, x long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        stream_ivm_refresh(
            stream, table, ["grp"], specs(),
            str(tmp_path / ckpt), app_id="ivm-test",
        )

    run("ck1")
    got = {r.grp: (r.s, r.n) for r in table.snapshot().collect()}
    assert got == {"a": (6, 2), "b": (10, 1), "c": (7, 1)}
    v_after = table.latest_version()

    # re-run under the SAME checkpoint: source fully consumed, and any
    # foreachBatch redelivery no-ops via the txn high-water mark
    run("ck1")
    again = {r.grp: (r.s, r.n) for r in table.snapshot().collect()}
    assert again == got, "same-checkpoint replay double-counted"
    assert table.latest_version() == v_after, "replay committed anyway"

    # direct redelivery of an already-committed batch id (the crash-
    # replay shape foreachBatch can produce): txn marker no-ops it
    ck1_app = f"ivm-test:{os.path.abspath(str(tmp_path / 'ck1'))}"
    hw = table.last_txn_version(ck1_app)
    assert hw >= 0
    table.overwrite(
        spark.createDataFrame([("zz", 1, 1)],
                              "grp string, s bigint, n bigint"),
        txn=(ck1_app, hw),
    )
    assert {r.grp: (r.s, r.n) for r in table.snapshot().collect()} \
        == got, "redelivered batch id was not no-opped"

    # a FRESH checkpoint is a new lineage: batch ids restart at 0 but
    # its batches are genuinely new to this lineage and MUST apply —
    # the old global (app_id, batch_id) key silently discarded them.
    # Same source re-folded => every aggregate exactly doubles.
    run("ck2")
    doubled = {r.grp: (r.s, r.n) for r in table.snapshot().collect()}
    assert doubled == {g: (s * 2, n * 2) for g, (s, n) in got.items()}, (
        "fresh-checkpoint batches were discarded or mis-folded"
    )
