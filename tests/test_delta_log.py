"""Delta-protocol table: structural conformance of the transaction log
against the public Delta spec (delta-io/delta PROTOCOL.md) plus the
Hudi-parity semantics (upsert precombine, time travel, COW delete,
vacuum) through the log-replay reader. No delta jar exists in this
environment, so spec conformance is what makes the format claim real:
any external Delta reader consumes exactly these files."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)


def _rows(spark, data):
    return spark.createDataFrame(
        data, "patient_id string, visit_date string, note string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    df = _rows(
        spark,
        [("p1", "2024-01-01", "a"), ("p2", "2024-01-02", "b"),
         ("p3", "2024-01-03", "c")],
    )
    return DeltaProtocolTable.create(spark, str(tmp_path / "tbl"), df)


def test_log_structure_conforms_to_spec(table):
    log = os.path.join(table.path, "_delta_log")
    files = sorted(os.listdir(log))
    assert files == ["00000000000000000000.json"], "20-digit zero-padded"
    actions = [
        json.loads(line)
        for line in open(os.path.join(log, files[0]))
        if line.strip()
    ]
    # exactly one recognized action type per line
    for a in actions:
        keys = set(a) & {"protocol", "metaData", "add", "remove",
                         "commitInfo"}
        assert len(keys) == 1, a
    protocol = next(a["protocol"] for a in actions if "protocol" in a)
    assert protocol == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == []
    assert meta["id"]
    # schemaString is Spark StructType JSON — parseable, field-for-field
    schema = json.loads(meta["schemaString"])
    assert [f["name"] for f in schema["fields"]] == [
        "patient_id", "visit_date", "note"
    ]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds, "create must add data files"
    for add in adds:
        assert not add["path"].startswith("/"), "paths must be relative"
        fp = os.path.join(table.path, add["path"])
        assert os.path.isfile(fp)
        assert add["size"] == os.path.getsize(fp)
        assert add["partitionValues"] == {}
        assert add["dataChange"] is True


def test_snapshot_and_append(spark, table):
    assert table.snapshot().count() == 3
    v = table.append(_rows(spark, [("p4", "2024-01-04", "d")]))
    assert v == 1
    assert table.snapshot().count() == 4
    assert table.snapshot(version=0).count() == 3  # time travel


def test_upsert_precombine_and_pruning(spark, table):
    inc = _rows(
        spark,
        [
            ("p1", "2024-06-01", "newer"),   # newer visit → replaces
            ("p2", "2020-01-01", "older"),   # older visit → loses
            ("p9", "2024-06-02", "insert"),  # new key → inserts
        ],
    )
    v = table.upsert(inc, key="patient_id", precombine="visit_date")
    snap = {r["patient_id"]: r for r in table.snapshot().collect()}
    assert len(snap) == 4
    assert snap["p1"]["note"] == "newer"
    assert snap["p2"]["note"] == "b", "older precombine must lose"
    assert snap["p9"]["note"] == "insert"
    # prior version unchanged (time travel across the merge)
    old = {r["patient_id"]: r for r in table.snapshot(version=v - 1).collect()}
    assert old["p1"]["note"] == "a" and "p9" not in old


def test_upsert_tie_prefers_incoming(spark, table):
    inc = _rows(spark, [("p1", "2024-01-01", "tie-incoming")])
    table.upsert(inc, key="patient_id", precombine="visit_date")
    snap = {r["patient_id"]: r["note"] for r in table.snapshot().collect()}
    assert snap["p1"] == "tie-incoming"


def test_overwrite_emits_removes(spark, table):
    table.overwrite(_rows(spark, [("px", "2025-01-01", "only")]))
    assert [r["patient_id"] for r in table.snapshot().collect()] == ["px"]
    last = os.path.join(
        table.path, "_delta_log", f"{table.latest_version():020d}.json"
    )
    actions = [json.loads(line) for line in open(last) if line.strip()]
    assert any("remove" in a for a in actions)
    assert any("add" in a for a in actions)
    for a in actions:
        if "remove" in a:
            assert a["remove"]["dataChange"] is True
            assert a["remove"]["deletionTimestamp"] > 0


def test_delete_where_cow(spark, table):
    v = table.delete_where(F.col("patient_id") == "p2")
    ids = sorted(r["patient_id"] for r in table.snapshot().collect())
    assert ids == ["p1", "p3"]
    assert sorted(
        r["patient_id"] for r in table.snapshot(version=v - 1).collect()
    ) == ["p1", "p2", "p3"]


def test_history_and_vacuum(spark, table):
    table.append(_rows(spark, [("p4", "2024-01-04", "d")]))
    table.overwrite(_rows(spark, [("pz", "2025-01-01", "z")]))
    hist = table.history()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[0]["operation"] == "CREATE TABLE AS SELECT"
    assert hist[2]["n_removed"] > 0
    deleted = table.vacuum()
    assert deleted, "vacuum must delete the overwritten files"
    assert table.snapshot().count() == 1  # latest still readable


def test_concurrent_commit_is_put_if_absent(spark, table):
    # simulate a racing writer landing the same version first
    nxt = table.latest_version() + 1
    with open(os.path.join(
        table.path, "_delta_log", f"{nxt:020d}.json"
    ), "w") as f:
        f.write('{"commitInfo":{"timestamp":0,"operation":"WRITE"}}\n')
    with pytest.raises(FileExistsError):
        table._write_commit(nxt, [{"commitInfo": {"timestamp": 1}}])


def test_timestamp_as_of(spark, table):
    import time

    time.sleep(0.01)
    cut = time.time()
    time.sleep(0.01)
    table.append(_rows(spark, [("p4", "2024-01-04", "d")]))
    assert table.timestamp_as_of(cut).count() == 3
    assert table.snapshot().count() == 4


def test_streaming_cdc_into_delta_table(spark, tmp_path):
    """Streaming CDC -> open Delta format: stream_upsert drives the
    table one micro-batch at a time; time travel spans micro-batches
    and the final snapshot reflects precombine winners across them."""
    import json as _json

    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        stream_upsert,
    )

    table = DeltaProtocolTable.create(
        spark,
        str(tmp_path / "cdc_tbl"),
        _rows(spark, [("p1", "2024-01-01", "base")]),
        key="patient_id",
        precombine="visit_date",
    )
    src = tmp_path / "cdc_src"
    src.mkdir()
    (src / "b1.json").write_text(_json.dumps(
        {"patient_id": "p1", "visit_date": "2024-06-01", "note": "upd"}))
    (src / "b2.json").write_text(_json.dumps(
        {"patient_id": "p2", "visit_date": "2024-06-02", "note": "new"}))
    stream = (
        spark.readStream
        .schema("patient_id string, visit_date string, note string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    stream_upsert(stream, table, str(tmp_path / "cdc_ckpt"))

    snap = {r["patient_id"]: r["note"] for r in table.snapshot().collect()}
    assert snap == {"p1": "upd", "p2": "new"}
    assert table.latest_version() >= 2, "one commit per micro-batch"
    v0 = {r["patient_id"]: r["note"]
          for r in table.snapshot(version=0).collect()}
    assert v0 == {"p1": "base"}


def test_compact_is_data_change_false(spark, table):
    """OPTIMIZE semantics: compaction rewrites files without changing
    content — remove/add actions carry dataChange: false per the spec,
    rows identical before and after, old version still time-travels."""
    table.append(_rows(spark, [("p4", "2024-01-04", "d")]))
    table.append(_rows(spark, [("p5", "2024-01-05", "e")]))
    before = {r["patient_id"] for r in table.snapshot().collect()}
    v = table.compact(target_files=1)
    actions = [
        json.loads(line)
        for line in open(os.path.join(
            table.path, "_delta_log", f"{v:020d}.json"))
        if line.strip()
    ]
    for a in actions:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
    assert {r["patient_id"] for r in table.snapshot().collect()} == before
    # single active file now
    _, active = table._replay(v)
    assert len(active) == 1
    # pre-compaction version still readable (vacuum not yet run)
    assert {r["patient_id"]
            for r in table.snapshot(version=v - 1).collect()} == before


def test_txn_action_makes_replays_idempotent(spark, table):
    """Delta spec txn action: an upsert stamped (appId, version) that
    the log already records is a no-op — the exactly-once mechanism for
    streaming writers, verified by replaying the same batch twice."""
    table.key, table.precombine = "patient_id", "visit_date"
    inc = _rows(spark, [("p1", "2024-06-01", "v1")])
    v1 = table.upsert(inc, txn=("app-x", 7))
    # the commit carries the txn action
    actions = [
        json.loads(line)
        for line in open(os.path.join(
            table.path, "_delta_log", f"{v1:020d}.json"))
        if line.strip()
    ]
    txns = [a["txn"] for a in actions if "txn" in a]
    assert txns == [dict(txns[0], appId="app-x", version=7)]
    assert table.last_txn_version("app-x") == 7
    assert table.last_txn_version("other-app") == -1

    # replay: same app, same batch version -> no new commit, no change
    v2 = table.upsert(_rows(spark, [("p1", "2099-01-01", "dup")]),
                      txn=("app-x", 7))
    assert v2 == v1
    snap = {r["patient_id"]: r["note"] for r in table.snapshot().collect()}
    assert snap["p1"] == "v1"
    # a LATER batch version commits normally
    v3 = table.upsert(_rows(spark, [("p1", "2099-01-01", "later")]),
                      txn=("app-x", 8))
    assert v3 == v1 + 1
    assert {r["patient_id"]: r["note"]
            for r in table.snapshot().collect()}["p1"] == "later"


def test_cli_delta_register(spark, tmp_path, capsys):
    """The reference's register_hudi flow end-to-end through the CLI:
    latest qlm_ready artifact -> Delta table create, second run ->
    upsert with precombine; commit listing mirrors the reference's
    commit query."""
    import json as _json

    from fda_clinical_etl_pipeline_spark.__main__ import main

    lake = tmp_path / "lake"
    a1 = lake / "qlm_ready" / "hospital_a" / "20240101T000000" / "b1"
    _rows(spark, [("p1", "2024-01-01", "a"),
                  ("p2", "2024-01-02", "b")]).write.parquet(str(a1))
    assert main(["delta-register", "--lake", str(lake),
                 "--source", "hospital_a"]) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["rows"] == 2 and out1["n_commits"] == 1

    a2 = lake / "qlm_ready" / "hospital_a" / "20240202T000000" / "b2"
    _rows(spark, [("p1", "2024-06-01", "newer"),
                  ("p9", "2024-06-02", "ins")]).write.parquet(str(a2))
    assert main(["delta-register", "--lake", str(lake),
                 "--source", "hospital_a"]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows"] == 3 and out2["n_commits"] == 2
    assert out2["latest_commit"]["operation"] == "MERGE"

    tbl = DeltaProtocolTable(spark, out2["table"])
    snap = {r["patient_id"]: r["note"] for r in tbl.snapshot().collect()}
    assert snap == {"p1": "newer", "p2": "b", "p9": "ins"}


def test_add_actions_carry_spec_stats(table):
    """Every add action must carry the spec's per-file stats JSON
    string: numRecords + min/max/nullCount per skippable column —
    the index external Delta readers use for data skipping."""
    log = os.path.join(table.path, "_delta_log")
    adds = []
    for fn in sorted(os.listdir(log)):
        for line in open(os.path.join(log, fn)):
            if line.strip():
                a = json.loads(line)
                if "add" in a:
                    adds.append(a["add"])
    assert adds
    for add in adds:
        stats = json.loads(add["stats"])  # a JSON *string*, per spec
        assert stats["numRecords"] >= 1
        for c in ("patient_id", "visit_date", "note"):
            assert c in stats["minValues"] and c in stats["maxValues"]
            assert stats["nullCount"][c] == 0
    total = sum(json.loads(a["stats"])["numRecords"] for a in adds)
    assert total == 3


def _ranged_table(spark, tmp_path):
    """A table whose two files hold disjoint key ranges (k000-k049 /
    k050-k099), so stats pruning decisions are provable."""
    df = spark.createDataFrame(
        [(f"k{i:03d}", "2024-01-01", f"v{i}") for i in range(100)],
        "patient_id string, visit_date string, note string",
    ).repartitionByRange(2, "patient_id")
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "ranged"), df,
        key="patient_id", precombine="visit_date",
    )


def test_upsert_prunes_files_from_log_stats(spark, tmp_path):
    """An upsert touching only the low key range must leave the high
    file's add action untouched: its remove actions name exactly one
    file, and the survivor file path persists across the commit."""
    t = _ranged_table(spark, tmp_path)
    _, active0 = t._replay(t.latest_version())
    assert len(active0) == 2
    inc = spark.createDataFrame(
        [("k010", "2024-06-01", "new")],
        "patient_id string, visit_date string, note string",
    )
    # pin copy-on-write explicitly (auto picks merge-on-read for a
    # 1-key batch — that path is covered in test_delta_dv)
    v = t.upsert(inc, mode="cow")
    removed = [
        json.loads(line)["remove"]["path"]
        for line in open(t._commit_file(v))
        if line.strip() and "remove" in json.loads(line)
    ]
    assert len(removed) == 1, "stats pruning must spare the other file"
    _, active1 = t._replay(v)
    survivors = set(active0) & set(active1)
    assert len(survivors) == 1
    snap = {r["patient_id"]: r["note"] for r in t.snapshot().collect()}
    assert snap["k010"] == "new" and len(snap) == 100


def test_upsert_log_pruning_jobs_independent_of_file_count(
    spark, tmp_path
):
    """Candidate selection must come from the log, not from opening
    files: the job count of a 1-key upsert must NOT grow with the
    number of table files (the old per-file probe pattern was O(files)
    jobs). AQE splits each action into several jobs, so the assertion
    is relative — 16 files may cost at most one job more than 2."""

    def upsert_jobs(n_files: int, name: str) -> int:
        df = spark.createDataFrame(
            [(f"k{i:03d}", "2024-01-01", f"v{i}") for i in range(160)],
            "patient_id string, visit_date string, note string",
        ).repartitionByRange(n_files, "patient_id")
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / name), df,
            key="patient_id", precombine="visit_date",
        )
        inc = spark.createDataFrame(
            [("k010", "2024-06-01", "new")],
            "patient_id string, visit_date string, note string",
        )
        # count in a DEDICATED job group: the default-group delta
        # (before/after lengths) miscounts once the shared session has
        # run enough jobs for the status tracker's retained-jobs
        # eviction to fire between the two reads
        sc = spark.sparkContext
        group = f"upsert-jobcount-{name}"
        sc.setJobGroup(group, "job-count pin")
        try:
            t.upsert(inc)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    jobs_small = upsert_jobs(2, "small")
    jobs_large = upsert_jobs(16, "large")
    assert jobs_large <= jobs_small + 1, (
        f"{jobs_large} jobs at 16 files vs {jobs_small} at 2 — "
        "pruning is reading files instead of the log"
    )


def test_stats_prune_values_and_all_null_handling(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    _, active = t._replay(t.latest_version())
    # keys entirely outside both ranges prune everything
    assert t._prune_by_values(active, "patient_id", ["z999"]) == []
    # a key in the low range keeps exactly one candidate
    assert len(t._prune_by_values(active, "patient_id", ["k001"])) == 1
    # one key per range keeps both
    assert len(
        t._prune_by_values(active, "patient_id", ["k001", "k099"])
    ) == 2


def test_read_range_skips_files(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    cands, skipped = t.skipped_files("patient_id", "k000", "k020")
    assert len(cands) == 1 and len(skipped) == 1
    rows = t.read_range("patient_id", "k000", "k020").collect()
    assert sorted(r["patient_id"] for r in rows) == [
        f"k{i:03d}" for i in range(21)
    ]
    # no-overlap range opens nothing and returns an empty typed frame
    empty = t.read_range("patient_id", "z", None)
    assert empty.count() == 0
    assert empty.schema.fieldNames() == [
        "patient_id", "visit_date", "note"
    ]


def test_delete_where_stats_hint_prunes(spark, tmp_path):
    t = _ranged_table(spark, tmp_path)
    _, active0 = t._replay(t.latest_version())
    v = t.delete_where(
        F.col("patient_id") == "k010",
        stats_hint=("patient_id", "k010", "k010"),
    )
    removed = [
        json.loads(line)["remove"]["path"]
        for line in open(t._commit_file(v))
        if line.strip() and "remove" in json.loads(line)
    ]
    assert len(removed) == 1
    _, active1 = t._replay(v)
    assert set(active0) & set(active1), "high-range file must survive"
    assert t.snapshot().count() == 99


def test_zorder_compact_prunes_on_both_columns(spark, tmp_path):
    """OPTIMIZE ZORDER BY (x, y): after the rewrite, range reads on
    EITHER column must skip most files — the property a lexicographic
    sort cannot deliver for the second column — while content and
    dataChange:false semantics match plain OPTIMIZE."""
    import random

    rnd = random.Random(7)
    rows = [(x, y, f"p{x}-{y}") for x in range(32) for y in range(32)]
    rnd.shuffle(rows)
    df = spark.createDataFrame(
        rows, "x int, y int, payload string"
    ).repartition(8)  # deliberately scrambled files
    t = DeltaProtocolTable.create(spark, str(tmp_path / "z"), df)

    before_cands, _ = t.skipped_files("y", 0, 3)
    v = t.compact(target_files=16, zorder_by=["x", "y"])

    # content identical, commit is dataChange: false
    assert t.snapshot().count() == 1024
    actions = [
        json.loads(line)
        for line in open(t._commit_file(v)) if line.strip()
    ]
    assert all(
        not a["add"]["dataChange"] for a in actions if "add" in a
    )

    for col in ("x", "y"):
        cands, skipped = t.skipped_files(col, 0, 3)
        assert len(skipped) >= len(cands), (
            f"z-order gave no {col}-pruning: {len(cands)} candidates "
            f"vs {len(skipped)} skipped"
        )
        got = sorted(
            (r["x"], r["y"]) for r in t.read_range(col, 0, 3).collect()
        )
        want = sorted(
            (x, y) for x in range(32) for y in range(32)
            if (x if col == "x" else y) <= 3
        )
        assert got == want
    # scrambled input couldn't prune y at all before the rewrite
    assert len(before_cands) == 8


def test_checkpoint_spec_shape_and_replay(spark, table):
    """Parquet checkpoint per spec: %020d.checkpoint.parquet with
    typed action columns + _last_checkpoint pointer; replay afterwards
    reconstructs the same state and later commits still apply."""
    table.append(_rows(spark, [("p4", "2024-01-04", "d")]))
    table.upsert(
        _rows(spark, [("p1", "2024-09-01", "up")]),
        key="patient_id", precombine="visit_date",
        txn=("appA", 7),
    )
    cp_v = table.checkpoint()
    assert cp_v == table.latest_version()

    log = os.path.join(table.path, "_delta_log")
    cp_file = os.path.join(log, f"{cp_v:020d}.checkpoint.parquet")
    assert os.path.isfile(cp_file)
    last = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert last["version"] == cp_v and last["size"] >= 3

    import pyarrow.parquet as pq

    cols = set(pq.read_schema(cp_file).names)
    assert cols == {"txn", "add", "remove", "metaData", "protocol",
                    "domainMetadata"}

    # state through the checkpoint path == state before
    snap = {r["patient_id"]: r["note"] for r in table.snapshot().collect()}
    assert snap["p1"] == "up" and len(snap) == 4
    # txn high-water mark survives the checkpoint
    assert table.last_txn_version("appA") == 7

    # commits after the checkpoint replay on top of it
    table.append(_rows(spark, [("p5", "2024-01-05", "e")]))
    fresh = DeltaProtocolTable(spark, table.path)
    assert fresh.snapshot().count() == 5
    # pre-checkpoint time travel still works (JSON commits retained)
    assert fresh.snapshot(version=0).count() == 3


def test_checkpoint_preserves_stats_skipping(spark, tmp_path):
    """add.stats must round-trip the parquet checkpoint so data
    skipping keeps working when the adds come from the checkpoint."""
    t = _ranged_table(spark, tmp_path)
    t.checkpoint()
    fresh = DeltaProtocolTable(spark, t.path)
    cands, skipped = fresh.skipped_files("patient_id", "k000", "k010")
    assert len(cands) == 1 and len(skipped) == 1


# --- partitioned tables ------------------------------------------------------


def _part_df(spark):
    rows = [
        (f"k{i:03d}", "en" if i % 3 == 0 else ("fr" if i % 3 == 1 else "de"),
         "2024-01-01", float(i))
        for i in range(90)
    ]
    return spark.createDataFrame(
        rows, "patient_id string, lang string, visit_date string, score double"
    )


def test_partitioned_create_log_shape(spark, tmp_path):
    df = _part_df(spark)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "pt"), df,
        key="patient_id", precombine="visit_date",
        partition_by=["lang"],
    )
    meta, active = t._replay(0)
    assert meta["partitionColumns"] == ["lang"]
    assert t.partition_columns() == ["lang"]
    langs = set()
    for rel, add in active.items():
        # hive layout + decoded partitionValues, spec-style
        assert rel.startswith("lang=")
        assert add["partitionValues"] == {"lang": rel.split("=")[1].split("/")[0]}
        langs.add(add["partitionValues"]["lang"])
        # stats exclude the partition column, cover the data columns
        st = __import__("json").loads(add["stats"])
        assert "lang" not in st["minValues"]
        assert "patient_id" in st["minValues"]
    assert langs == {"en", "fr", "de"}


def test_partitioned_snapshot_and_pruned_read(spark, tmp_path):
    df = _part_df(spark)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "pt2"), df,
        key="patient_id", precombine="visit_date",
        partition_by=["lang"],
    )
    # snapshot reconstructs the partition column via basePath
    snap = t.snapshot()
    assert set(snap.columns) == set(df.columns)
    assert snap.count() == 90
    assert snap.filter("lang = 'en'").count() == 30

    cands, skipped = t.partition_pruned_files({"lang": "en"})
    assert cands and skipped  # pruning provably happened
    assert all(r.startswith("lang=en/") for r in cands)
    got = t.read_partitions({"lang": "en"})
    assert got.count() == 30
    assert {r.lang for r in got.collect()} == {"en"}
    # no matching partition → empty frame with full schema
    none = t.read_partitions({"lang": "zz"})
    assert none.count() == 0 and set(none.columns) == set(df.columns)


def test_partitioned_upsert_preserves_layout(spark, tmp_path):
    df = _part_df(spark)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "pt3"), df,
        key="patient_id", precombine="visit_date",
        partition_by=["lang"],
    )
    inc = spark.createDataFrame(
        [("k000", "en", "2024-06-01", 999.0),
         ("x900", "fr", "2024-06-01", 1.5)],
        "patient_id string, lang string, visit_date string, score double",
    )
    t.upsert(inc)
    _, active = t._replay(t.latest_version())
    # every active file still lives in a hive dir with partitionValues
    for rel, add in active.items():
        assert rel.startswith("lang=")
        assert add["partitionValues"].get("lang")
    snap = t.snapshot()
    assert snap.count() == 91
    assert snap.filter("patient_id = 'k000'").first().score == 999.0
    # updated row is findable through partition pruning too
    en = t.read_partitions({"lang": "en"})
    assert en.filter("patient_id = 'k000'").first().score == 999.0


def test_partitioned_checkpoint_roundtrip(spark, tmp_path):
    """partitionValues must survive the parquet checkpoint: replay from
    checkpoint + later commits keeps partition pruning working."""
    df = _part_df(spark)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "pt4"), df,
        key="patient_id", precombine="visit_date",
        partition_by=["lang"],
    )
    t.append(spark.createDataFrame(
        [("z001", "en", "2024-02-01", 7.0)],
        "patient_id string, lang string, visit_date string, score double",
    ))
    cp = t.checkpoint()
    # a post-checkpoint commit so replay must stitch checkpoint+commit
    t.append(spark.createDataFrame(
        [("z002", "fr", "2024-02-02", 8.0)],
        "patient_id string, lang string, visit_date string, score double",
    ))
    _, active = t._replay(t.latest_version())
    assert all(
        a["partitionValues"].get("lang") for a in active.values()
    ), "partitionValues lost through the checkpoint"
    cands, skipped = t.partition_pruned_files({"lang": "en"})
    assert cands and skipped
    assert t.read_partitions({"lang": "en"}).count() == 31
    assert t.read_partitions({"lang": "fr"}).count() == 31
    assert t.snapshot().count() == 92
    assert cp == 1


# --- streaming source over the log ------------------------------------------


def test_delta_stream_source_appends_and_recovery(spark, tmp_path):
    """The Python-DataSource streaming reader over the transaction log:
    initial drain delivers every created row; after an append, a second
    drain from the same checkpoint delivers ONLY the new commit's rows
    (offset = log version, exactly-once across restarts)."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaStreamSource,
    )

    spark.dataSource.register(DeltaStreamSource)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "st"),
        _rows(spark, [("p1", "2024-01-01", "a"), ("p2", "2024-01-02", "b")]),
        key="patient_id", precombine="visit_date",
    )

    def drain():
        got = []

        def sink(batch_df, _bid):
            got.extend(
                (r.patient_id, r.note) for r in batch_df.collect()
            )

        q = (
            spark.readStream.format("delta_log_stream")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "st_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert drain() == [("p1", "a"), ("p2", "b")]
    t.append(_rows(spark, [("p3", "2024-01-03", "c")]))
    # only the new commit streams; the checkpoint remembers version 0
    assert drain() == [("p3", "c")]
    assert drain() == []


def test_delta_stream_source_partitioned_reinjects_columns(
    spark, tmp_path
):
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaStreamSource,
    )

    spark.dataSource.register(DeltaStreamSource)
    df = spark.createDataFrame(
        [("a", "en", "2024-01-01", 1.0), ("b", "fr", "2024-01-02", 2.0)],
        "patient_id string, lang string, visit_date string, score double",
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "stp"), df,
        key="patient_id", precombine="visit_date",
        partition_by=["lang"],
    )
    got = []

    def sink(batch_df, _bid):
        got.extend(
            (r.patient_id, r.lang, r.score) for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("delta_log_stream")
        .option("path", t.path)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "stp_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [("a", "en", 1.0), ("b", "fr", 2.0)]


def test_delta_stream_source_skips_compaction_rewrites(spark, tmp_path):
    """OPTIMIZE rewrites carry dataChange:false — the stream must not
    re-deliver their rows (the spec's streaming contract)."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaStreamSource,
    )

    spark.dataSource.register(DeltaStreamSource)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "stc"),
        _rows(spark, [("p1", "2024-01-01", "a")]),
        key="patient_id", precombine="visit_date",
    )
    t.append(_rows(spark, [("p2", "2024-01-02", "b")]))

    def drain(name):
        got = []

        def sink(batch_df, _bid):
            got.extend(r.patient_id for r in batch_df.collect())

        q = (
            spark.readStream.format("delta_log_stream")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "stc_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert drain("first") == ["p1", "p2"]
    t.compact()  # dataChange: false rewrite
    assert drain("after_compact") == []


def test_delta_batch_source_snapshot_and_time_travel(spark, tmp_path):
    """`spark.read.format("delta_log")`: a vanilla session reads the
    committed snapshot (removes honored) and time-travels by version."""
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        DeltaBatchSource,
    )

    spark.dataSource.register(DeltaBatchSource)
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "bt"),
        _rows(spark, [("p1", "2024-01-01", "a"), ("p2", "2024-01-02", "b")]),
        key="patient_id", precombine="visit_date",
    )
    t.upsert(_rows(spark, [("p1", "2024-06-01", "new")]))

    cur = (
        spark.read.format("delta_log").option("path", t.path).load()
    )
    got = {r.patient_id: r.note for r in cur.collect()}
    assert got == {"p1": "new", "p2": "b"}

    v0 = (
        spark.read.format("delta_log")
        .option("path", t.path).option("version_as_of", 0).load()
    )
    assert {r.patient_id: r.note for r in v0.collect()} == {
        "p1": "a", "p2": "b"
    }


# --- schema evolution (mergeSchema) -----------------------------------------


def test_schema_mismatch_refused_without_merge(table, spark):
    wider = spark.createDataFrame(
        [("p9", "2024-02-01", "z", 5)],
        "patient_id string, visit_date string, note string, score int",
    )
    with pytest.raises(ValueError, match="merge_schema"):
        table.append(wider)


def test_merge_schema_appends_column_and_nulls_old_files(table, spark):
    wider = spark.createDataFrame(
        [("p9", "2024-02-01", "z", 5)],
        "patient_id string, visit_date string, note string, score int",
    )
    v0 = table.latest_version()
    v1 = table.append(wider, merge_schema=True)
    snap = table.snapshot()
    assert snap.columns == ["patient_id", "visit_date", "note", "score"]
    got = {r.patient_id: r.score for r in snap.collect()}
    # pre-evolution files surface the new column as NULL
    assert got == {"p1": None, "p2": None, "p3": None, "p9": 5}
    # the commit carries an evolved metaData action with the SAME id
    meta0 = json.loads(
        [l for l in open(table._commit_file(v0)) if "metaData" in l][0]
    )["metaData"]
    meta1 = json.loads(
        [l for l in open(table._commit_file(v1)) if "metaData" in l][0]
    )["metaData"]
    assert meta1["id"] == meta0["id"]
    names1 = [f["name"] for f in json.loads(meta1["schemaString"])["fields"]]
    assert names1 == ["patient_id", "visit_date", "note", "score"]
    # time travel to the pre-evolution version keeps the OLD schema
    old = table.snapshot(version=v0)
    assert old.columns == ["patient_id", "visit_date", "note"]


def test_merge_schema_fills_missing_columns_with_null(table, spark):
    table.append(
        spark.createDataFrame(
            [("p9", "2024-02-01", "z", 5)],
            "patient_id string, visit_date string, note string, "
            "score int",
        ),
        merge_schema=True,
    )
    # a later batch that OMITS existing columns fills them with NULL
    narrow = spark.createDataFrame(
        [("p10", 7)], "patient_id string, score int"
    )
    table.append(narrow, merge_schema=True)
    got = {
        r.patient_id: (r.note, r.score)
        for r in table.snapshot().collect()
    }
    assert got["p10"] == (None, 7)
    assert got["p1"] == ("a", None)


def test_type_conflict_always_refused(table, spark):
    bad = spark.createDataFrame(
        [("p9", 1, "z")],
        "patient_id string, visit_date int, note string",
    )
    with pytest.raises(ValueError, match="type conflict"):
        table.append(bad, merge_schema=True)


def test_column_order_realigned_silently(table, spark):
    shuffled = spark.createDataFrame(
        [("late note", "p8", "2024-03-01")],
        "note string, patient_id string, visit_date string",
    )
    table.append(shuffled)  # same column SET: no evolution needed
    got = {r.patient_id: r.note for r in table.snapshot().collect()}
    assert got["p8"] == "late note"


def test_merge_schema_on_partitioned_table(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "y")], "k string, n int, v string"
    )
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "pt"), df, partition_by=["k"]
    )
    t.append(
        spark.createDataFrame(
            [("c", 3, "z", 9.5)], "k string, n int, v string, w double"
        ),
        merge_schema=True,
    )
    snap = t.snapshot()
    assert set(snap.columns) == {"k", "n", "v", "w"}
    got = {r.k: r.w for r in snap.collect()}
    assert got == {"a": None, "b": None, "c": 9.5}
    # partition pruning still serves the evolved table
    cands, skipped = t.partition_pruned_files({"k": "c"})
    assert len(cands) == 1 and len(skipped) == 2


# --- optimistic concurrency -------------------------------------------------


def _race_once(monkeypatch, spark, other_df):
    """Arrange for ONE concurrent append to land between a writer's
    file staging and its commit attempt — the optimistic-concurrency
    window."""
    orig = DeltaProtocolTable._write_data_files
    state = {"raced": False}

    def staged_then_raced(self, df, partition_by=None, meta=None):
        adds = orig(self, df, partition_by=partition_by, meta=meta)
        if not state["raced"]:
            state["raced"] = True
            DeltaProtocolTable(spark, self.path).append(other_df)
        return adds

    monkeypatch.setattr(
        DeltaProtocolTable, "_write_data_files", staged_then_raced
    )
    return state


def test_blind_append_rebases_on_concurrent_commit(
    table, spark, monkeypatch
):
    other = _rows(spark, [("p7", "2024-05-01", "other-writer")])
    mine = _rows(spark, [("p8", "2024-05-02", "my-writer")])
    _race_once(monkeypatch, spark, other)
    v = table.append(mine)
    # the concurrent writer took our slot; we rebased one past it
    assert v == 2
    got = {r.patient_id for r in table.snapshot().collect()}
    assert {"p7", "p8"} <= got  # both commits' rows survive


def test_read_modify_write_refuses_concurrent_commit(
    table, spark, monkeypatch
):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        ConcurrentModificationError,
    )

    other = _rows(spark, [("p7", "2024-05-01", "other-writer")])
    _race_once(monkeypatch, spark, other)
    with pytest.raises(ConcurrentModificationError, match="re-run"):
        table.delete_where(F.col("patient_id") == "p1")
    # the refused operation left no commit; the concurrent append did
    assert table.latest_version() == 1
    got = {r.patient_id for r in table.snapshot().collect()}
    assert "p1" in got and "p7" in got


# --- change data feed + table metrics ---------------------------------------


def test_diff_versions_cdf(spark, table):
    table.upsert(
        _rows(spark, [("p1", "2024-06-01", "newer"),
                      ("p9", "2024-06-02", "insert")]),
        key="patient_id", precombine="visit_date",
    )
    table.delete_where(F.col("patient_id") == "p2")
    cdf = {
        r.patient_id: r._change_type
        for r in table.diff_versions(0, table.latest_version(),
                                     key="patient_id").collect()
    }
    assert cdf == {
        "p1": "update_postimage", "p9": "insert", "p2": "delete"
    }
    # unchanged keys (p3) are excluded; compaction-only rewrites too
    v = table.latest_version()
    table.compact()
    assert table.diff_versions(v, table.latest_version(),
                               key="patient_id").count() == 0


def test_table_metrics_from_log_only(spark, table):
    m = table.table_metrics()
    assert m["n_rows"] == 3 and m["n_files"] >= 1
    assert m["total_bytes"] > 0 and m["avg_file_bytes"] > 0
    assert m["small_file_ratio"] == 1.0  # tiny fixture files
    table.append(_rows(spark, [("p4", "2024-01-04", "d")]))
    m2 = table.table_metrics()
    assert m2["n_rows"] == 4 and m2["n_files"] > m["n_files"]
    # historical versions report their own state
    assert table.table_metrics(version=0)["n_rows"] == 3


def test_delta_metrics_cli(spark, table, capsys):
    from fda_clinical_etl_pipeline_spark.__main__ import main

    assert main(["delta-metrics", table.path]) in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_rows"] == 3 and out["n_files"] >= 1
    assert out["history_tail"][-1]["operation"] == "CREATE TABLE AS SELECT"
    assert main(["delta-metrics", str(table.path) + "-missing"]) == 1


def test_clustered_table_hilbert_optimize(spark, tmp_path):
    """OPTIMIZE with cluster_by (the spec's clustered-table / liquid
    clustering): rewrite clusters along the Hilbert curve (range reads
    on EITHER column prune), the protocol gains the WRITER-ONLY
    clustering + domainMetadata features (reader side untouched), and
    the clustering columns are recorded in delta.clustering domain
    metadata that survives a parquet checkpoint."""
    import random

    rnd = random.Random(11)
    rows = [(x, y, f"p{x}-{y}") for x in range(32) for y in range(32)]
    rnd.shuffle(rows)
    df = spark.createDataFrame(
        rows, "x int, y int, payload string"
    ).repartition(8)
    t = DeltaProtocolTable.create(spark, str(tmp_path / "lc"), df)

    v = t.compact(target_files=16, cluster_by=["x", "y"])

    # content identical, commit is dataChange: false
    assert t.snapshot().count() == 1024
    actions = [
        json.loads(line)
        for line in open(t._commit_file(v)) if line.strip()
    ]
    assert all(
        not a["add"]["dataChange"] for a in actions if "add" in a
    )

    # protocol: writer-only upgrade — readers not gated
    protocols = [a["protocol"] for a in actions if "protocol" in a]
    assert len(protocols) == 1
    p = protocols[0]
    assert p["minWriterVersion"] == 7
    assert {"clustering", "domainMetadata"} <= set(p["writerFeatures"])
    assert p["minReaderVersion"] == 1
    assert "readerFeatures" not in p

    # domain metadata records the clustering intent
    dms = [a["domainMetadata"] for a in actions if "domainMetadata" in a]
    assert len(dms) == 1 and dms[0]["domain"] == "delta.clustering"
    assert t.clustering_columns() == ["x", "y"]

    # hilbert layout prunes range reads on both columns
    for col in ("x", "y"):
        cands, skipped = t.skipped_files(col, 0, 3)
        assert len(skipped) >= len(cands), (
            f"hilbert gave no {col}-pruning: {len(cands)} candidates "
            f"vs {len(skipped)} skipped"
        )
        got = sorted(
            (r["x"], r["y"]) for r in t.read_range(col, 0, 3).collect()
        )
        want = sorted(
            (x, y) for x in range(32) for y in range(32)
            if (x if col == "x" else y) <= 3
        )
        assert got == want

    # re-OPTIMIZE: no second protocol action, no duplicate domain row
    v2 = t.compact(target_files=8, cluster_by=["x", "y"])
    actions2 = [
        json.loads(line)
        for line in open(t._commit_file(v2)) if line.strip()
    ]
    assert not [a for a in actions2 if "protocol" in a]
    assert not [a for a in actions2 if "domainMetadata" in a]
    assert t.clustering_columns() == ["x", "y"]

    # domain metadata survives checkpoint-then-replay
    t.checkpoint()
    t.append(spark.createDataFrame(
        [(99, 99, "tail")], "x int, y int, payload string"
    ))
    t2 = DeltaProtocolTable(spark, t.path)
    assert t2.clustering_columns() == ["x", "y"]
    assert t2.snapshot().count() == 1025

    # zorder_by and cluster_by are exclusive
    with pytest.raises(ValueError, match="exclusive"):
        t.compact(zorder_by=["x"], cluster_by=["x", "y"])
