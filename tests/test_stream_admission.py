"""Admission control for the five custom streaming sources
(``max_versions_per_batch`` / ``max_files_per_batch``) — the
``SupportsAdmissionControl`` semantics real Delta/Kafka sources
implement, here through the Python DataSource API.

The scale story under test: a cold start (or recovery after downtime)
against a backlogged table must NOT plan the entire backlog as one
micro-batch. With a limit of 5 versions, 20 backlogged commits process
in >= 4 micro-batches; checkpoint recovery stays exactly-once (each
availableNow re-run IS a restart: a fresh reader learns the committed
offset only through Spark's AcceptsLatestSeenOffset handshake); and
the union of all bounded batches equals the unbounded run's output.
"""

from __future__ import annotations

import pytest

from fda_clinical_etl_pipeline_spark.sources._admission import (
    AdmissionControl,
)
from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)

SCHEMA = "k int, v int"


# --------------------------------------------------------- unit level
def test_admission_unit_version_cap():
    adm = AdmissionControl({"max_versions_per_batch": "5"}, "version", -1)
    versions = list(range(20))
    pend = lambda lo, hi: [v for v in versions if lo < v <= hi]
    assert adm.admit(19, pend) == 4      # (-1, 4] = 5 versions
    assert adm.admit(19, pend) == 9      # base advanced by the grant
    assert adm.admit(19, pend) == 14
    assert adm.admit(19, pend) == 19
    assert adm.admit(19, pend) == 19     # caught up: echo, don't stall


def test_admission_unit_file_cap_admits_at_least_one():
    # one commit with 100 files must still stream under a cap of 10
    adm = AdmissionControl({"max_files_per_batch": "10"}, "version", -1)
    pend = lambda lo, hi: [v for v in range(lo + 1, hi + 1)]
    assert adm.admit(3, pend, lambda v: 100) == 0
    assert adm.admit(3, pend, lambda v: 100) == 1


def test_admission_unit_file_cap_cuts_cumulatively():
    adm = AdmissionControl({"max_files_per_batch": "5"}, "version", -1)
    files = {0: 2, 1: 2, 2: 2, 3: 2}
    pend = lambda lo, hi: [v for v in range(lo + 1, hi + 1)]
    # 2+2+2 >= 5 at v=2 -> granted through v=2
    assert adm.admit(3, pend, files.__getitem__) == 2
    assert adm.admit(3, pend, files.__getitem__) == 3


def test_admission_unit_restart_handshake_guards_backward():
    """A fresh reader (restart) whose first knowledge of the
    checkpoint arrives via partitions(o, o) must never grant an
    offset behind it."""
    adm = AdmissionControl({"max_versions_per_batch": "2"}, "version", -1)
    adm.note_seen({"version": 10}, {"version": 10})  # the handshake
    pend = lambda lo, hi: [v for v in range(lo + 1, hi + 1)]
    assert adm.admit(20, pend) == 12
    # table behind the checkpoint (rolled back): echo the base
    adm2 = AdmissionControl({"max_versions_per_batch": "2"}, "version", -1)
    adm2.note_seen({"version": 10})
    assert adm2.admit(7, pend) == 10


def test_admission_unit_unbounded_passthrough():
    adm = AdmissionControl({}, "version", -1)
    assert adm.unbounded
    assert adm.admit(99, lambda lo, hi: range(lo + 1, hi + 1)) == 99


def test_admission_unit_rejects_nonpositive():
    with pytest.raises(ValueError):
        AdmissionControl({"max_versions_per_batch": "0"}, "version", -1)
    with pytest.raises(ValueError):
        AdmissionControl({"max_files_per_batch": "-3"}, "version", -1)


# ------------------------------------------------------ source level
def _drain_bounded(spark, fmt, path, ck, options, row_of, max_runs=40):
    """Loop availableNow runs over one checkpoint until a run delivers
    nothing — every loop iteration is a RESTART (fresh reader, fresh
    handshake). Returns (rows, per-run batch counts)."""
    all_rows, runs = [], []
    for _ in range(max_runs):
        got = []

        def sink(batch_df, _bid):
            rows = [row_of(r) for r in batch_df.collect()]
            if rows:
                got.append(rows)

        reader = spark.readStream.format(fmt).option("path", path)
        for k, v in options.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if not got:
            break
        runs.append(sum(len(b) for b in got))
        for b in got:
            all_rows.extend(b)
    return all_rows, runs


def test_delta_stream_admission_versions(spark, tmp_path):
    """20 backlogged commits under max_versions_per_batch=5 stream in
    >= 4 bounded micro-batches whose union equals the unbounded run."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaStreamSource,
    )

    spark.dataSource.register(DeltaStreamSource)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(0, 0)], SCHEMA),
        key="k", precombine="v",
    )
    for i in range(1, 20):
        t.append(spark.createDataFrame([(i, i)], SCHEMA))
    assert t.latest_version() == 19  # the 20-commit backlog

    rows, runs = _drain_bounded(
        spark, "delta_log_stream", t.path, str(tmp_path / "ck_b"),
        {"max_versions_per_batch": "5"}, lambda r: (r.k, r.v),
    )
    unbounded, _ = _drain_bounded(
        spark, "delta_log_stream", t.path, str(tmp_path / "ck_u"),
        {}, lambda r: (r.k, r.v),
    )
    assert sorted(rows) == sorted(unbounded) == [
        (i, i) for i in range(20)
    ]
    # each availableNow run is one bounded micro-batch (and a restart)
    assert len(runs) >= 4
    assert max(runs) <= 5  # one row per commit here


def test_delta_stream_admission_files(spark, tmp_path):
    """max_files_per_batch cuts on cumulative ADD count; a single
    over-wide commit still streams (at-least-one)."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaStreamSource,
    )

    spark.dataSource.register(DeltaStreamSource)
    # commit 0: 4 files (repartition(4)); commits 1-3: 1 file each
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "tf"),
        spark.createDataFrame(
            [(i, 0) for i in range(4)], SCHEMA
        ).repartition(4),
        key="k", precombine="v",
    )
    for i in range(1, 4):
        t.append(spark.createDataFrame([(100 + i, i)], SCHEMA))

    rows, runs = _drain_bounded(
        spark, "delta_log_stream", t.path, str(tmp_path / "ckf"),
        {"max_files_per_batch": "2"}, lambda r: (r.k, r.v),
    )
    expect = sorted([(i, 0) for i in range(4)]
                    + [(100 + i, i) for i in range(1, 4)])
    assert sorted(rows) == expect
    assert len(runs) >= 3  # wide commit alone, then the rest in cuts


def test_delta_stream_admission_single_query_catches_up(spark, tmp_path):
    """Under a continuous trigger ONE query catches up over several
    bounded micro-batches — no restart loop needed."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaStreamSource,
    )

    spark.dataSource.register(DeltaStreamSource)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "tq"),
        spark.createDataFrame([(0, 0)], SCHEMA),
        key="k", precombine="v",
    )
    for i in range(1, 12):
        t.append(spark.createDataFrame([(i, i)], SCHEMA))

    batches = []

    def sink(batch_df, bid):
        rows = [(r.k, r.v) for r in batch_df.collect()]
        if rows:
            batches.append(rows)

    q = (
        spark.readStream.format("delta_log_stream")
        .option("path", t.path)
        .option("max_versions_per_batch", "4")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckq"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if sum(len(b) for b in batches) >= 12:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert sorted(r for b in batches for r in b) == [
        (i, i) for i in range(12)
    ]
    assert len(batches) >= 3          # 12 commits / 4 per batch
    assert max(len(b) for b in batches) <= 4


def test_delta_cdf_stream_admission(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaCdfStreamSource,
    )

    spark.dataSource.register(DeltaCdfStreamSource)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "tc"),
        spark.createDataFrame([(0, 0)], SCHEMA),
        key="k", precombine="v", enable_cdf=True,
    )
    for i in range(1, 10):
        t.append(spark.createDataFrame([(i, i)], SCHEMA))

    rows, runs = _drain_bounded(
        spark, "delta_cdf_stream", t.path, str(tmp_path / "ckc"),
        {"max_versions_per_batch": "3"},
        lambda r: (r.k, r.v, r._change_type),
    )
    unbounded, _ = _drain_bounded(
        spark, "delta_cdf_stream", t.path, str(tmp_path / "ckcu"),
        {}, lambda r: (r.k, r.v, r._change_type),
    )
    assert sorted(rows) == sorted(unbounded)
    assert len(runs) >= 4  # 10 commits / 3 per batch


def test_iceberg_stream_admission(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.iceberg_stream import (
        IcebergStreamSource,
    )

    spark.dataSource.register(IcebergStreamSource)
    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame([(0, 0)], SCHEMA),
    )
    for i in range(1, 10):
        t.append(spark.createDataFrame([(i, i)], SCHEMA))

    rows, runs = _drain_bounded(
        spark, "iceberg_append_stream", t.path, str(tmp_path / "cki"),
        {"max_versions_per_batch": "3"}, lambda r: (r.k, r.v),
    )
    unbounded, _ = _drain_bounded(
        spark, "iceberg_append_stream", t.path, str(tmp_path / "ckiu"),
        {}, lambda r: (r.k, r.v),
    )
    assert sorted(rows) == sorted(unbounded) == [
        (i, i) for i in range(10)
    ]
    assert len(runs) >= 4


def test_hudi_stream_admission(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.hudi_stream import (
        HudiStreamSource,
    )
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    spark.dataSource.register(HudiStreamSource)
    t = HudiTable.create(
        spark, str(tmp_path / "h"), "adm_tbl", "k", "v"
    )
    for i in range(10):
        t.upsert(spark.createDataFrame([(i, i)], SCHEMA))

    rows, runs = _drain_bounded(
        spark, "hudi_append_stream", t.path, str(tmp_path / "ckh"),
        {"max_versions_per_batch": "3"}, lambda r: (r.k, r.v),
    )
    unbounded, _ = _drain_bounded(
        spark, "hudi_append_stream", t.path, str(tmp_path / "ckhu"),
        {}, lambda r: (r.k, r.v),
    )
    assert sorted(rows) == sorted(unbounded) == [
        (i, i) for i in range(10)
    ]
    assert len(runs) >= 4


def test_iceberg_changelog_stream_admission(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )
    from fda_clinical_etl_pipeline_spark.sources \
        .iceberg_changelog_stream import IcebergChangelogStreamSource

    spark.dataSource.register(IcebergChangelogStreamSource)
    t = IcebergTable.create(
        spark, str(tmp_path / "ic"),
        spark.createDataFrame([(0, 0)], SCHEMA),
    )
    for i in range(1, 10):
        t.append(spark.createDataFrame([(i, i)], SCHEMA))

    row_of = lambda r: (r.k, r.v, r._change_type)
    rows, runs = _drain_bounded(
        spark, "iceberg_changelog_stream", t.path,
        str(tmp_path / "ckic"),
        {"max_versions_per_batch": "3"}, row_of,
    )
    unbounded, _ = _drain_bounded(
        spark, "iceberg_changelog_stream", t.path,
        str(tmp_path / "ckicu"), {}, row_of,
    )
    assert sorted(rows) == sorted(unbounded)
    assert len(runs) >= 4


def test_hudi_changelog_stream_admission(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources \
        .hudi_changelog_stream import HudiChangelogStreamSource
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiTable,
    )

    spark.dataSource.register(HudiChangelogStreamSource)
    t = HudiTable.create(
        spark, str(tmp_path / "hc"), "admc_tbl", "k", "v"
    )
    for i in range(10):
        t.upsert(spark.createDataFrame([(i, i)], SCHEMA))

    row_of = lambda r: (r.k, r.v, r._change_type)
    rows, runs = _drain_bounded(
        spark, "hudi_changelog_stream", t.path, str(tmp_path / "ckhc"),
        {"max_versions_per_batch": "3"}, row_of,
    )
    unbounded, _ = _drain_bounded(
        spark, "hudi_changelog_stream", t.path,
        str(tmp_path / "ckhcu"), {}, row_of,
    )
    assert sorted(rows) == sorted(unbounded)
    assert len(runs) >= 4
