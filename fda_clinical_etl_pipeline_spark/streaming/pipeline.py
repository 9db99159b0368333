"""Structured Streaming equivalents of the reference's polling pipeline
(SURVEY.md §2.10).

The reference is a hand-rolled incremental pipeline: each stage polls
Postgres for batches in the prior status (etl/validate.py:42-50), state
lives in status columns, idempotency comes from ON CONFLICT DO NOTHING.
The streaming engine maps each piece onto the Spark-native equivalent:

| reference                        | engine                                  |
|----------------------------------|------------------------------------------|
| ingest polling a source dir      | ``readStream`` file source (S2 streamed) |
| status-machine state in Postgres | checkpoint + state store                 |
| per-batch provenance inserts     | ``foreachBatch`` hook                    |
| at-least-once + idempotent insert| exactly-once sink semantics w/ batchId   |

Watermarked windowed aggregation and ``applyInPandasWithState``
sessionization have no reference counterpart — they are engine
extensions over the ``events`` shape (ts, user_id, value), flagged as
such (SURVEY.md §2.10).

Scale posture: the file source lists incrementally (maxFilesPerTrigger
bounds each micro-batch); windowed state is keyed by (window, group) and
pruned by the watermark, so state size is bounded by the lateness budget,
not the stream length.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession) -> bool:
    """Switch stateful streaming to the RocksDB state store (state spills
    to local disk instead of living on the executor heap — the config
    that makes 10^8-key session/window state viable, SCALING.md).
    Runtime-settable; returns False if the build lacks RocksDB."""
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
        return True
    except Exception:
        return False


def stream_ingest_csv(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """Streaming twin of IngestPipeline.ingest_sources (etl/ingest.py:52-114):
    every new file in the source dir becomes part of a micro-batch; the
    per-file identity the reference's batch_id carries survives as
    ``_input_file``."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("header", True)
        .csv(source_dir)
        .withColumn("_input_file", F.input_file_name())
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    the streaming twin of the batch ``window_tumbling_events`` query (the
    two share the logical plan shape; only the source differs)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("value_sum"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n", "value_sum", "approx_users",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    session windows closed after ``gap_seconds`` of inactivity. Emits one
    row per closed session (timeout-driven), exactly the shape a
    status-machine-style incremental pipeline needs when 'batch' boundaries
    are behavioral rather than file-based."""
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()  # ns → µs
        vals = rows["value"].tolist()

        # Fold batch events into sessions, seeded with carried-over state;
        # sessions closed by an in-batch gap are emitted immediately, the
        # trailing open session goes back into state.
        if state.exists:
            cur = list(state.get)  # [start_us, last_us, n, vsum]
        else:
            cur = None
        closed: list[list] = []
        for t, v in zip(ts_us, vals):
            if cur is None:
                cur = [t, t, 1, float(v)]
            elif t - cur[1] > gap_us:
                closed.append(cur)
                cur = [t, t, 1, float(v)]
            else:
                cur = [cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(v)]
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s[0], unit="us") for s in closed],
                    "session_end": [pd.Timestamp(s[1], unit="us") for s in closed],
                    "n_events": [s[2] for s in closed],
                    "value_sum": [s[3] for s in closed],
                }
            )
        state.update(tuple(cur))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_seconds * 1000)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    interval_seconds: int = 3600,
) -> DataFrame:
    """Stream-stream inner join with an event-time interval: right events
    within [left.ts - interval, left.ts]. Both sides carry watermarks so
    the join state is bounded — buffered rows age out once the watermark
    passes the interval window (without the time bound the state grows
    forever; Spark rejects unbounded stream-stream joins in append mode).

    Column convention: both inputs need (``key``, ts, ...); output keeps
    left columns plus right's suffixed.
    """
    l = left.withWatermark("ts", left_watermark).alias("l")
    r = (
        right.withWatermark("ts", right_watermark)
        .withColumnRenamed("ts", "r_ts")
        .alias("r")
    )
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.r_ts") >= F.col("l.ts") - F.expr(f"INTERVAL {interval_seconds} SECONDS"))
        & (F.col("r.r_ts") <= F.col("l.ts"))
    )
    return l.join(r, cond, "inner")


def enrich_stream_static(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension
    (J1/J2's streaming twin — schema metadata / user dims joined to the
    live stream). The static side re-reads per micro-batch, so a
    Delta/parquet dim picks up updates without restarting the query;
    Spark plans it as a broadcast join when the dim is small."""
    return events.join(dim, on, how)


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    watermark_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    hash-groupBy dedup (operators/dedup.dedup_exact): duplicates of the
    same key arriving within the watermark horizon are dropped; state is
    BOUNDED because keys older than the watermark are evicted
    (dropDuplicatesWithinWatermark). The 100 TB ingest-dedup shape: an
    at-least-once upstream (Kafka replays, retried batches) becomes
    effectively-once without unbounded state."""
    return stream.withWatermark(
        watermark_col, watermark
    ).dropDuplicatesWithinWatermark(keys)


def stream_upsert(
    stream: DataFrame,
    table,
    checkpoint_dir: str,
    available_now: bool = True,
    app_id: str | None = None,
    key: str | None = None,
    precombine: str | None = None,
):
    """Streaming CDC into a versioned table: each micro-batch upserts
    into a ``VersionedTable`` or ``DeltaProtocolTable`` (precombine
    semantics per batch), giving a continuously-maintained current
    snapshot WITH time travel across micro-batches — the streaming twin
    of the Hudi flow the reference runs by hand (parquet →
    register_hudi).

    Exactly-once: foreachBatch may replay a batch with the same id
    after a failure. Pass ``app_id`` and each table format records the
    batch id atomically with the data, via ITS OWN spec mechanism, so
    a replayed id becomes a no-op:

    - ``DeltaProtocolTable`` — the spec's ``txn`` action
      (appId, version=batch_id), the transactional-writer protocol;
    - ``HudiTable`` — ``deltastreamer.checkpoint.key`` in commit
      metadata, DeltaStreamer's checkpoint convention;
    - ``IcebergTable`` — ``streaming-app-id``/``streaming-batch-id``
      snapshot summary properties, the pattern Iceberg's own
      streaming sink uses (``key``/``precombine`` route the batch
      through ``upsert``; without them it appends).

    Without ``app_id`` the replay merely applies a redundant
    (same-winners) batch.
    """
    from ..sources.hudi_table import HudiTable
    from ..sources.iceberg import IcebergTable

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if isinstance(table, HudiTable):
            table.upsert(
                batch_df,
                checkpoint=(
                    (app_id, batch_id) if app_id is not None else None
                ),
            )
        elif isinstance(table, IcebergTable):
            if app_id is not None:
                last = table.last_streaming_batch(app_id)
                if last is not None and batch_id <= last:
                    return
                table.set_commit_summary({
                    "streaming-app-id": app_id,
                    "streaming-batch-id": str(batch_id),
                })
            if key is not None:
                table.upsert(
                    batch_df, key=key,
                    precombine=precombine or key,
                )
            else:
                table.append(batch_df)
        elif app_id is not None:
            table.upsert(batch_df, txn=(app_id, batch_id))
        else:
            table.upsert(batch_df)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
    return q


def run_to_memory(
    streaming_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> None:
    """Drain a streaming DataFrame into an in-memory table with
    availableNow (process-everything-then-stop) — the test/CI harness
    path; production would writeStream to parquet/Delta with the same
    plan."""
    writer = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()


def foreach_batch_provenance(
    streaming_df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> None:
    """foreachBatch ≅ the reference's per-batch provenance writes
    (etl/provenance_recorder.py): the hook receives (batch_df, batch_id);
    Spark replays a failed batch with the SAME id, so an idempotent sink
    (the reference's ON CONFLICT DO NOTHING) gives exactly-once effect."""
    q = (
        streaming_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_near_dup(
    stream: DataFrame,
    sig_store_path: str,
    out_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
) -> None:
    """Streaming NEAR-dup dedup — the streaming twin of
    ``operators/dedup.incremental_minhash_dedup`` and the continuous
    form of the corpus-versioning release flow: every micro-batch is a
    "delta" deduplicated against the accumulated MinHash SIGNATURE
    STORE (parquet, O(docs x K longs)), never against previously-seen
    text. Survivors append to ``out_path``; their signatures append to
    the store, so state grows by signatures only — the property that
    lets this run forever over a 100 TB ingest firehose.

    Per batch: band-join the delta's signatures against the store
    (cross-version, MinHash-estimate similarity) and against themselves
    (in-batch LSH + exact Jaccard, cluster-resolved) — identical
    semantics to the batch operator, so batch and streaming modes agree.

    Replay note: foreachBatch may replay a failed batch with the same
    id; a replay re-appends the same signatures, and duplicate rows in
    the signature store are HARMLESS for dedup decisions (a doc matching
    one copy matches both) — the store can be compacted offline with
    dedup_exact semantics. Output appends are the usual at-least-once
    file-sink caveat; at scale write via a transactional table format.
    """
    from pyspark.sql import types as T

    from ..operators.dedup import (
        NUM_MINHASHES,
        incremental_minhash_dedup,
        minhash_signatures,
    )

    sig_schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [T.StructField(f"h{j}", T.LongType()) for j in range(NUM_MINHASHES)]
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            return
        try:
            prior = spark.read.schema(sig_schema).parquet(sig_store_path)
            prior.head(1)
        except Exception:
            prior = spark.createDataFrame([], sig_schema)
        survivors = incremental_minhash_dedup(batch, prior, threshold)
        # two passes over the (small) delta survivors; persist so the
        # dedup plan (band joins + verify) runs once
        survivors = survivors.persist()
        survivors.write.mode("append").parquet(out_path)
        minhash_signatures(survivors).write.mode("append").parquet(
            sig_store_path
        )
        survivors.unpersist()

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


TOPK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_TOPK_STATE_SCHEMA = T.StructType(
    [T.StructField("values", T.ArrayType(T.DoubleType()))]
)


def stream_running_topk(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-key streaming top-k: each micro-batch merges the batch's
    values into the carried top-k list (state is O(k) per key — bounded
    regardless of stream length) and emits the updated ranking. The
    canonical "leaderboard" stateful shape: monotone state, update
    output mode, no timers.

    API note: Spark 4's ``transformWithStateInPandas`` (StatefulProcessor
    + ValueState) is the successor API for exactly this operator, but its
    Python worker protocol requires the ``protobuf`` package, absent in
    this container — probed and env-gated, same policy as the codec
    stubs. ``applyInPandasWithState`` expresses identical semantics and
    runs here; the state layout (one array<double> column) is chosen so
    a port to ValueState is a mechanical swap."""
    import pandas as pd

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        vals: list[float] = []
        for pdf in pdfs:
            vals.extend(float(v) for v in pdf["value"])
        cur = list(state.get[0]) if state.exists else []
        merged = sorted(cur + vals, reverse=True)[:k]
        state.update((merged,))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(merged),
                "rank": list(range(1, len(merged) + 1)),
                "value": merged,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TOPK_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_ivm_refresh(
    stream: DataFrame,
    table,
    keys: list,
    specs: dict,
    checkpoint_dir: str,
    app_id: str = "ivm",
    available_now: bool = True,
):
    """Continuously-maintained rollup: each micro-batch is reduced to
    IVM partial state (``operators/ivm.agg_state``) and folded into the
    state table — a ``DeltaProtocolTable`` holding one row per group —
    with ``merge_states``. The streaming composition of three pieces
    this engine already certifies separately: IVM fold algebra
    (incremental == full recompute, oracle-gated), Delta atomic commits,
    and the spec's txn markers for exactly-once.

    Per micro-batch cost: one partial agg over the batch + an overwrite
    of the O(groups) state table — the corpus is never rescanned.
    Replayed batches (foreachBatch redelivery after a crash) no-op via
    the txn high-water mark, so state never double-counts.

    The txn appId is derived as ``{app_id}:{checkpoint_dir}``: batch
    ids restart at 0 under a NEW checkpoint directory, so keying the
    high-water mark on app_id alone would make the no-op guard
    silently discard the first batches after an intentional checkpoint
    reset. Binding the checkpoint location into the appId scopes
    exactly-once to one checkpoint lineage — crash replays within a
    checkpoint still no-op; a fresh checkpoint gets a fresh mark.
    """
    from fda_clinical_etl_pipeline_spark.operators.ivm import (
        agg_state,
        merge_states,
    )

    txn_app_id = f"{app_id}:{os.path.abspath(checkpoint_dir)}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta_state = agg_state(batch_df, keys, specs)
        if table.latest_version() >= 0 and table.snapshot().count() > 0:
            folded = merge_states(
                [table.snapshot(), delta_state], keys, specs
            )
        else:
            folded = delta_state
        # state tables are O(groups) — localCheckpoint materializes the
        # fold BEFORE overwrite removes the files it was read from
        table.overwrite(
            folded.localCheckpoint(eager=True),
            txn=(txn_app_id, batch_id),
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
    return q


def stream_merge(
    stream: DataFrame,
    table,
    checkpoint_dir: str,
    on: str,
    available_now: bool = True,
    app_id: str | None = None,
    **merge_clauses,
):
    """Streaming MERGE INTO: each micro-batch runs one ``merge``
    against a ``DeltaProtocolTable`` or ``IcebergTable`` with the
    given clause arguments (``when_matched_update``,
    ``when_matched_delete``, ``when_not_matched_insert``, ... — see
    ``plans/merge_clauses``). This is the CDC-apply shape a change
    stream needs beyond precombine upserts: tombstones in the batch
    can DELETE (``when_matched_delete="s.op = 'D'"``) while the rest
    update/insert, in one atomic commit per batch.

    Exactly-once mirrors ``stream_upsert``: Delta stamps the spec
    ``txn`` action; Iceberg stamps streaming-app/batch snapshot
    summary properties; Hudi stamps ``deltastreamer.checkpoint.key``
    on the merge's single timeline instant (the combined
    DELETE+AVRO_DATA log-block commit); a replayed batch id is a
    no-op on all three."""
    from ..sources.hudi_table import HudiTable
    from ..sources.iceberg import IcebergTable

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if isinstance(table, HudiTable):
            table.merge(
                batch_df, on=on,
                checkpoint=((app_id, batch_id)
                            if app_id is not None else None),
                **merge_clauses,
            )
        elif isinstance(table, IcebergTable):
            if app_id is not None:
                last = table.last_streaming_batch(app_id)
                if last is not None and batch_id <= last:
                    return
                table.set_commit_summary({
                    "streaming-app-id": app_id,
                    "streaming-batch-id": str(batch_id),
                })
            table.merge(batch_df, on=on, **merge_clauses)
        else:
            table.merge(
                batch_df, on=on,
                txn=((app_id, batch_id)
                     if app_id is not None else None),
                **merge_clauses,
            )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
    return q
