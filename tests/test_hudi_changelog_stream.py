"""Streaming changelog source over Hudi: the micro-batch feed must
agree row-for-row with the batch ``HudiTable.changelog``, survive
checkpoint recovery without re-emitting, and keep compaction
invisible — on BOTH table types (the shared merge fold guarantees
COW == MOR)."""

from __future__ import annotations

import pytest

from fda_clinical_etl_pipeline_spark.sources.hudi_changelog_stream import (  # noqa: E501
    HudiChangelogStreamSource,
)
from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    HudiTable,
)

SCHEMA = "k int, ver int, bal double"
I1, I2, I3, I4, I5 = (
    "20240101000000000", "20240102000000000", "20240103000000000",
    "20240104000000000", "20240105000000000",
)


def _mk(spark, tmp_path, ttype):
    t = HudiTable.create(
        spark, str(tmp_path / "h"), "cds", "k", "ver",
        table_type=ttype,
    )
    t.upsert(spark.createDataFrame(
        [(i, 1, float(i)) for i in range(10)], SCHEMA
    ), instant=I1)
    t.upsert(spark.createDataFrame(
        [(0, 2, 99.0), (50, 1, 5.0)], SCHEMA
    ), instant=I2)
    t.delete_keys(spark.createDataFrame([(3,)], "k int"), instant=I3)
    t.merge(
        spark.createDataFrame(
            [(1, 9, 111.0), (60, 1, 6.0), (0, 0, 0.0)], SCHEMA
        ),
        when_matched_update="all",
        when_matched_delete="s.bal < 1.0",
        when_not_matched_insert="all",
        instant=I4,
    )
    return t


def _drain(spark, path, ckpt, starting_instant=None):
    spark.dataSource.register(HudiChangelogStreamSource)
    got = []

    def sink(batch_df, _bid):
        got.extend(
            (r["_change_type"], r["k"], r["ver"], r["bal"])
            for r in batch_df.collect()
        )

    reader = (
        spark.readStream.format("hudi_changelog_stream")
        .option("path", path)
    )
    if starting_instant is not None:
        reader = reader.option("starting_instant", starting_instant)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(got)


def _batch(t, from_instant=""):
    return sorted(
        (r["_change_type"], r["k"], r["ver"], r["bal"])
        for r in t.changelog(from_instant=from_instant).collect()
    )


@pytest.mark.parametrize("ttype", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_stream_matches_batch_changelog(spark, tmp_path, ttype):
    t = _mk(spark, tmp_path, ttype)
    got = _drain(spark, str(tmp_path / "h"), str(tmp_path / "ck"))
    assert got == _batch(t)  # full history, row for row
    # spot semantics: update pre/post, tombstone, merge delete
    assert ("delete", 0, 1, 0.0) in got
    assert ("insert", 0, 2, 99.0) in got
    assert ("delete", 3, 1, 3.0) in got
    assert ("delete", 0, 2, 99.0) in got  # merge matched-delete
    assert ("insert", 60, 1, 6.0) in got


def test_stream_checkpoint_recovery_and_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path, "MERGE_ON_READ")
    ck = str(tmp_path / "ck")
    got1 = _drain(spark, str(tmp_path / "h"), ck)
    assert len(got1) > 0
    # same checkpoint, no new commits: nothing re-emits
    assert _drain(spark, str(tmp_path / "h"), ck) == []
    # compaction is data-identical: still nothing
    t.compact(instant=I5)
    assert _drain(spark, str(tmp_path / "h"), ck) == []
    # a real commit streams exactly its delta
    t.delete_keys(
        spark.createDataFrame([(4,)], "k int"),
        instant="20240106000000000",
    )
    assert _drain(spark, str(tmp_path / "h"), ck) == [
        ("delete", 4, 1, 4.0)
    ]


def test_stream_starting_instant_skips_history(spark, tmp_path):
    t = _mk(spark, tmp_path, "MERGE_ON_READ")
    got = _drain(
        spark, str(tmp_path / "h"), str(tmp_path / "ck3"),
        starting_instant=I3,
    )
    assert got == _batch(t, from_instant=I3)
    assert all(r[0] in ("insert", "delete") for r in got)
    assert ("insert", 1, 9, 111.0) in got  # only the merge window
    assert ("insert", 50, 1, 5.0) not in got  # I2 skipped


def test_stream_replays_recorded_cdc_blocks(spark, tmp_path):
    """A cdc-enabled COW table streams its changelog straight from the
    recorded data_before_after blocks (one partition per -cdc file, no
    slice reads) — and still agrees row-for-row with the batch reader
    AND with a cdc-disabled twin of the same history. A timestamp
    column exercises the JSON-image type converters."""
    import datetime

    schema = "k int, ver int, bal double, ts timestamp"
    t0 = datetime.datetime(2024, 1, 1, 10, 30, 0)

    def mk(root, cdc):
        t = HudiTable.create(
            spark, root, "cds", "k", "ver", cdc_enabled=cdc,
        )
        t.upsert(spark.createDataFrame(
            [(i, 1, float(i), t0) for i in range(8)], schema
        ), instant=I1)
        t.upsert(spark.createDataFrame(
            [(0, 2, 99.0, t0 + datetime.timedelta(hours=1)),
             (50, 1, 5.0, None)], schema
        ), instant=I2)
        t.delete_keys(spark.createDataFrame([(3,)], "k int"),
                      instant=I3)
        return t

    t = mk(str(tmp_path / "cdc"), True)
    plain = mk(str(tmp_path / "plain"), False)

    def drain4(path, ckpt):
        spark.dataSource.register(HudiChangelogStreamSource)
        got = []

        def sink(batch_df, _bid):
            got.extend(
                (r["_change_type"], r["k"], r["ver"], r["bal"],
                 r["ts"], r["_change_ordinal"])
                for r in batch_df.collect()
            )

        q = (
            spark.readStream.format("hudi_changelog_stream")
            .option("path", path).load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got, key=str)

    rec = drain4(str(tmp_path / "cdc"), str(tmp_path / "ck1"))
    der = drain4(str(tmp_path / "plain"), str(tmp_path / "ck2"))
    assert rec == der
    # and both match the batch reader on the cdc table
    batch = sorted(
        ((r["_change_type"], r["k"], r["ver"], r["bal"], r["ts"],
          r["_change_ordinal"])
         for r in t.changelog().collect()),
        key=str,
    )
    assert rec == batch
    # the timestamp image round-tripped through JSON exactly
    assert ("insert", 0, 2, 99.0,
            t0 + datetime.timedelta(hours=1), 1) in rec
    assert ("insert", 50, 1, 5.0, None, 1) in rec
