"""Timestamp columns through the pure-Python streaming sources.

Parquet written under the engine's UTC session stores session-naive
timestamps; a Python DataSource materializing rows into a
``TimestampType`` column must hand Arrow tz-AWARE values or every
micro-batch dies with ``Cannot convert tz-naive Timestamp`` — a bug
class the r11 Hudi CDC work surfaced (the shared fix is
``sources/_pyrows.ts_fixer``). These tests pin it for every format's
append AND changelog stream; the drained instants must equal the
written ones exactly (UTC round-trip, no tz shift)."""

from __future__ import annotations

import datetime

SCHEMA = "k int, ver int, ts timestamp"
T0 = datetime.datetime(2024, 3, 1, 7, 45, 30)


def _drain(spark, fmt, path, ckpt, cols):
    got = []

    def sink(batch_df, _bid):
        got.extend(tuple(r[c] for c in cols) for r in batch_df.collect())

    q = (
        spark.readStream.format(fmt).option("path", path).load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(got, key=str)


def test_iceberg_streams_carry_timestamps(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.iceberg_changelog_stream import (  # noqa: E501
        IcebergChangelogStreamSource,
    )
    from fda_clinical_etl_pipeline_spark.sources.iceberg_stream import (
        IcebergStreamSource,
    )

    spark.dataSource.register(IcebergStreamSource)
    spark.dataSource.register(IcebergChangelogStreamSource)
    root = str(tmp_path / "ice")
    t = IcebergTable.create(
        spark, root,
        spark.createDataFrame([(1, 1, T0), (2, 1, None)], SCHEMA),
    )
    t.append(spark.createDataFrame(
        [(3, 1, T0 + datetime.timedelta(minutes=5))], SCHEMA
    ))

    app = _drain(spark, "iceberg_append_stream", root,
                 str(tmp_path / "ck_a"), ["k", "ts"])
    assert (1, T0) in app and (2, None) in app
    assert (3, T0 + datetime.timedelta(minutes=5)) in app

    chg = _drain(spark, "iceberg_changelog_stream", root,
                 str(tmp_path / "ck_c"), ["k", "ts", "_change_type"])
    assert (1, T0, "insert") in chg


def test_delta_streams_carry_timestamps(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaCdfStreamSource,
        DeltaStreamSource,
    )

    spark.dataSource.register(DeltaStreamSource)
    spark.dataSource.register(DeltaCdfStreamSource)
    root = str(tmp_path / "dl")
    t = DeltaProtocolTable.create(
        spark, root,
        spark.createDataFrame([(1, 1, T0), (2, 1, None)], SCHEMA),
        enable_cdf=True,
    )
    t.append(spark.createDataFrame(
        [(3, 1, T0 + datetime.timedelta(minutes=5))], SCHEMA
    ))

    app = _drain(spark, "delta_log_stream", root,
                 str(tmp_path / "ck_a"), ["k", "ts"])
    assert (1, T0) in app and (2, None) in app

    cdf = _drain(spark, "delta_cdf_stream", root,
                 str(tmp_path / "ck_c"), ["k", "ts", "_change_type"])
    assert (1, T0, "insert") in cdf


def test_hudi_append_stream_carries_timestamps(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.hudi_stream import (
        HudiStreamSource,
    )
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    spark.dataSource.register(HudiStreamSource)
    root = str(tmp_path / "hu")
    t = HudiTable.create(spark, root, "tsprobe", "k", "ver",
                         table_type="MERGE_ON_READ")
    t.upsert(spark.createDataFrame([(1, 1, T0), (2, 1, None)], SCHEMA),
             instant="20240101000000000")
    # a MOR update travels through the Avro log-block branch
    t.upsert(spark.createDataFrame(
        [(1, 2, T0 + datetime.timedelta(minutes=5))], SCHEMA
    ), instant="20240102000000000")

    app = _drain(spark, "hudi_append_stream", root,
                 str(tmp_path / "ck"), ["k", "ver", "ts"])
    assert (1, 1, T0) in app and (2, 1, None) in app
    assert (1, 2, T0 + datetime.timedelta(minutes=5)) in app
