"""Streaming changelog source over Iceberg: the micro-batch feed must
agree row-for-row with the batch ``changelog_scan``, survive
checkpoint recovery without re-emitting, and keep compaction
invisible."""

from __future__ import annotations

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg_changelog_stream import (  # noqa: E501
    IcebergChangelogStreamSource,
)

SCHEMA = "k long, bal double, seg string"


def _mk(spark, path, n=40):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(n)],
        SCHEMA,
    ).coalesce(1)
    return IcebergTable.create(spark, str(path), df)


def _mutate(spark, t):
    t.append(spark.createDataFrame([(100, 1.0, "z")], SCHEMA))
    t.delete_where(F.col("k") == 3, mode="mor")  # position delete
    t.merge(
        spark.createDataFrame(
            [(0, 999.0, "a"), (1, -1.0, "b"), (500, 5.0, "n")],
            SCHEMA,
        ),
        on="k",
        when_matched_update="all",
        when_matched_delete="s.bal < 0",
        when_not_matched_insert="all",
    )
    t.rewrite_data_files()  # must stay invisible


def _drain(spark, path, ckpt, starting_version=None):
    spark.dataSource.register(IcebergChangelogStreamSource)
    got = []

    def sink(batch_df, _bid):
        got.extend(
            (r["k"], r["bal"], r["_change_type"])
            for r in batch_df.collect()
        )

    reader = (
        spark.readStream.format("iceberg_changelog_stream")
        .option("path", path)
    )
    if starting_version is not None:
        reader = reader.option("starting_version", starting_version)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(got)


def _changes(df):
    return sorted(
        (r["k"], r["bal"], r["_change_type"]) for r in df.collect()
    )


def test_stream_matches_batch_changelog(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    _mutate(spark, t)
    got = _drain(spark, str(tmp_path / "ice"), str(tmp_path / "ck"))
    assert got == _changes(t.changelog_scan())  # full history
    # spot semantics: merge delete, position delete, update pre/post
    assert (3, 3.0, "delete") in got
    assert (0, 0.0, "delete") in got and (0, 999.0, "insert") in got
    assert (1, 1.0, "delete") in got
    assert (500, 5.0, "insert") in got


def test_stream_checkpoint_recovery_no_reemit(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice", n=10)
    ck = str(tmp_path / "ck")
    got1 = _drain(spark, str(tmp_path / "ice"), ck)
    assert len(got1) == 10  # the create's inserts
    # same checkpoint, no new commits: nothing re-emits
    assert _drain(spark, str(tmp_path / "ice"), ck) == []
    # a new commit streams exactly its delta
    t.equality_delete(
        spark.createDataFrame([(4,)], "k long"), ["k"]
    )
    assert _drain(spark, str(tmp_path / "ice"), ck) == [
        (4, 4.0, "delete")
    ]


def test_stream_starting_version_skips_history(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice", n=10)
    v_after_create = t.current_version()
    t.append(spark.createDataFrame([(99, 9.0, "z")], SCHEMA))
    got = _drain(
        spark, str(tmp_path / "ice"), str(tmp_path / "ck3"),
        starting_version=v_after_create + 1,
    )
    assert got == [(99, 9.0, "insert")]
