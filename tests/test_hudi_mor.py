"""Hudi MERGE_ON_READ table type: log-file format conformance +
delta-write / compaction / delete semantics.

The reference pins COPY_ON_WRITE (hudi/register_hudi.py:58), so MOR is
symmetry work against the twin's own bar: Delta has deletion vectors
and Iceberg has position deletes — a small upsert into the Hudi twin
must likewise cost O(delta) bytes, not a file-group rewrite. Format
per hudi.apache.org/tech-specs and the 0.14.x HoodieLogFormat
(format version 1): ``#HUDI#`` magic blocks, big-endian framing,
AVRO_DATA / DELETE block contents, log naming
``.<fileId>_<baseInstant>.log.<version>_<writeToken>``, DELTACOMMIT
timeline actions, compaction completing as a COMMIT.

The load-bearing invariant throughout: a MOR table answers every
query EXACTLY like the COW twin given the same upserts — the table
type changes write economics, never results.
"""

from __future__ import annotations

import glob
import json
import os
import re
import struct

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources import hudi_log
from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    META_COLS,
    HudiTable,
)

LOG_FILE_RE = re.compile(
    r"^\.(?P<fileId>[0-9a-f-]+)_(?P<baseInstant>\d{17})"
    r"\.log\.(?P<version>\d+)_(?P<token>[\d-]+)$"
)

I1, I2, I3, I4, I5 = (
    "20240101000000000",
    "20240102000000000",
    "20240103000000000",
    "20240104000000000",
    "20240105000000000",
)


def _rows(i0, i1, ver, bump=0.0):
    return [(i, ver, float(i) + bump) for i in range(i0, i1)]


SCHEMA = "k int, ver int, bal double"


@pytest.fixture()
def mor(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "mor"), "mor_tbl", "k", "ver",
        table_type="MERGE_ON_READ",
    )
    t.upsert(spark.createDataFrame(_rows(0, 40, 1), SCHEMA),
             instant=I1, insert_groups=2)
    t.upsert(
        spark.createDataFrame(
            _rows(0, 10, 2, 100.0) + _rows(12, 14, 0, -5.0), SCHEMA
        ),
        instant=I2,
    )
    return t


def _log_files(t):
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(t.path, ".*.log.*"))
    )


# ------------------------------------------------------ format shape
def test_properties_and_timeline_actions(mor):
    props = mor.properties()
    assert props["hoodie.table.type"] == "MERGE_ON_READ"
    assert props["hoodie.compaction.payload.class"].endswith(
        "DefaultHoodieRecordPayload"
    )
    # MOR upserts are DELTACOMMIT actions with the requested →
    # inflight → completed instant triple
    assert mor.timeline() == [(I1, "deltacommit"), (I2, "deltacommit")]
    for inst in (I1, I2):
        for suffix in ("deltacommit.requested", "deltacommit.inflight",
                       "deltacommit"):
            assert os.path.isfile(
                os.path.join(mor.hoodie_dir, f"{inst}.{suffix}")
            ), f"missing {inst}.{suffix}"


def test_log_file_naming_and_block_layout(mor):
    logs = _log_files(mor)
    assert logs, "updates must produce log files"
    for name in logs:
        m = LOG_FILE_RE.match(name)
        assert m, name
        assert m.group("baseInstant") == I1  # appended to I1's bases
        assert m.group("version") == "1"
    # raw block layout: magic, big-endian framing, AVRO_DATA ordinal,
    # INSTANT_TIME + SCHEMA headers, reverse-pointer tail
    path = os.path.join(mor.path, logs[0])
    with open(path, "rb") as f:
        raw = f.read()
    assert raw[:6] == b"#HUDI#"
    (block_len,) = struct.unpack(">q", raw[6:14])
    assert 6 + 8 + block_len == len(raw)  # single block
    version, btype = struct.unpack(">ii", raw[14:22])
    assert version == hudi_log.LOG_FORMAT_VERSION
    assert btype == hudi_log.AVRO_DATA_BLOCK
    (tail,) = struct.unpack(">q", raw[-8:])
    assert tail == len(raw)  # reverse pointer includes magic
    blocks = hudi_log.read_log_file(path)
    assert len(blocks) == 1
    blk = blocks[0]
    assert blk["type"] == "data" and blk["instant"] == I2
    # records carry the meta columns (populate.meta.fields=true)
    rec = blk["records"][0]
    for c in META_COLS:
        assert c in rec
    assert rec["_hoodie_commit_time"] == I2
    assert rec["_hoodie_file_name"] == logs[0]


def test_deltacommit_stats_shape(mor):
    meta = mor.commit_metadata(I2)
    assert meta["operationType"] == "UPSERT"
    stats = [s for part in meta["partitionToWriteStats"].values()
             for s in part]
    log_stats = [s for s in stats if ".log." in s["path"]]
    assert log_stats, "updates must be logged, not rewritten"
    for s in log_stats:
        assert s["prevCommit"] == I1
        assert s["logVersion"] == 1
        assert s["logFiles"] == [os.path.basename(s["path"])]
        assert s["baseFile"].endswith(".parquet")
        assert s["numUpdateWrites"] == s["numWrites"] > 0
        assert s["numInserts"] == 0
    # updates went to existing groups only: no new base file at I2
    assert not [
        s for s in stats
        if s["path"].endswith(".parquet") and I2 in s["path"]
    ]


# ------------------------------------------------ write economics
def test_small_upsert_does_not_rewrite_base_files(spark, tmp_path):
    """THE merge-on-read claim, as bytes: a 1-row upsert into a MOR
    table must write no new base parquet and orders of magnitude
    fewer bytes than the COW twin's file-group rewrite."""
    dfs = {
        "cow": str(tmp_path / "cow"), "mor": str(tmp_path / "mor")
    }
    big = spark.createDataFrame(_rows(0, 5000, 1), SCHEMA)
    one = spark.createDataFrame([(7, 2, 9.9)], SCHEMA)
    written = {}
    for kind, path in dfs.items():
        t = HudiTable.create(
            spark, path, f"t_{kind}", "k", "ver",
            table_type=(
                "MERGE_ON_READ" if kind == "mor" else "COPY_ON_WRITE"
            ),
        )
        t.upsert(big, instant=I1)
        before = {
            p: os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "**"),
                               recursive=True)
            if os.path.isfile(p) and ".hoodie" not in p
        }
        t.upsert(one, instant=I2)
        after = {
            p: os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "**"),
                               recursive=True)
            if os.path.isfile(p) and ".hoodie" not in p
        }
        written[kind] = sum(
            sz for p, sz in after.items() if p not in before
        )
        # both still answer identically
        got = {r["k"]: r["bal"] for r in t.snapshot().collect()}
        assert got[7] == 9.9 and len(got) == 5000
    new_mor = [
        p for p in glob.glob(os.path.join(dfs["mor"], "*"))
        if os.path.isfile(p) and p.endswith(".parquet")
        and I2 in p
    ]
    assert not new_mor, "MOR upsert must not write base parquet"
    assert written["mor"] < written["cow"] / 10, written


# ------------------------------------------------ read semantics
def test_mor_matches_cow_answers(spark, tmp_path, mor):
    """Identical upsert history → identical snapshot, on every commit
    boundary (precombine winners, losers, carried commit times)."""
    cow = HudiTable.create(
        spark, str(tmp_path / "cow_twin"), "cow_twin", "k", "ver"
    )
    cow.upsert(spark.createDataFrame(_rows(0, 40, 1), SCHEMA),
               instant=I1, insert_groups=2)
    cow.upsert(
        spark.createDataFrame(
            _rows(0, 10, 2, 100.0) + _rows(12, 14, 0, -5.0), SCHEMA
        ),
        instant=I2,
    )
    # _hoodie_file_name and _hoodie_commit_seqno are physical layout
    # (COW rewrites the base file a carried row lives in; seqno's
    # record index follows task assignment order) — every logical
    # column must match exactly
    logical = ["_hoodie_commit_time", "_hoodie_record_key",
               "_hoodie_partition_path", "k", "ver", "bal"]
    for as_of in (None, I1, I2):
        a = sorted(
            tuple(r)
            for r in mor.snapshot(as_of).select(*logical).collect()
        )
        b = sorted(
            tuple(r)
            for r in cow.snapshot(as_of).select(*logical).collect()
        )
        assert a == b, f"diverged at as_of={as_of}"
    # explicit pins: ver=2 upserts won, ver=0 re-sends lost
    got = {r["k"]: (r["ver"], r["bal"], r["_hoodie_commit_time"])
           for r in mor.snapshot().collect()}
    assert got[0] == (2, 100.0, I2)
    assert got[12] == (1, 12.0, I1)  # loser: carried original commit
    assert len(got) == 40


def test_delete_block_and_revive(mor):
    di = mor.delete_where((F.col("k") >= 5) & (F.col("k") < 15),
                          instant=I3)
    assert di == I3
    meta = mor.commit_metadata(I3)
    assert meta["operationType"] == "DELETE"
    stats = [s for part in meta["partitionToWriteStats"].values()
             for s in part]
    assert all(".log." in s["path"] for s in stats)
    assert sum(s["numDeletes"] for s in stats) == 10
    # delete block binary shape
    dpath = os.path.join(mor.path, stats[0]["path"])
    blocks = hudi_log.read_log_file(dpath)
    assert [b["type"] for b in blocks] == ["delete"]
    assert blocks[0]["instant"] == I3
    assert all(d["orderingVal"] is None for d in blocks[0]["deletes"])

    assert mor.snapshot().count() == 30
    # upsert AFTER the delete revives the key (tombstone only kills
    # versions written at or before its instant)
    mor.upsert(
        mor.spark.createDataFrame([(7, 1, 777.0)], SCHEMA), instant=I4
    )
    got = {r["k"]: r["bal"] for r in mor.snapshot().collect()}
    assert got[7] == 777.0 and len(got) == 31
    assert 8 not in got
    # time travel to before the delete still sees all 40
    assert mor.snapshot(as_of_instant=I2).count() == 40


def test_compaction_folds_logs(mor):
    mor.delete_where(F.col("k") >= 38, instant=I3)
    # _hoodie_file_name updates to the new base file on compaction
    # (records are rewritten there); every other column must survive
    keep = [c for c in mor.snapshot().columns
            if c != "_hoodie_file_name"]
    before = sorted(
        tuple(r) for r in mor.snapshot().select(*keep).collect()
    )
    n_logs = len(_log_files(mor))
    assert n_logs > 0
    ci = mor.compact(instant=I4)
    assert ci == I4
    # completes as a COMMIT action carrying compaction counters
    assert (I4, "commit") in mor.timeline()
    meta = mor.commit_metadata(I4)
    assert meta["operationType"] == "COMPACT"
    assert meta["compacted"] is True
    stats = [s for part in meta["partitionToWriteStats"].values()
             for s in part]
    assert all(s["path"].endswith(".parquet") for s in stats)
    assert sum(s["totalLogFilesCompacted"] for s in stats) == n_logs
    assert os.path.isfile(os.path.join(
        mor.hoodie_dir, f"{I4}.compaction.requested"
    ))
    plan = json.load(open(os.path.join(
        mor.hoodie_dir, f"{I4}.compaction.requested"
    )))
    assert {op["fileId"] for op in plan["operations"]} == {
        s["fileId"] for s in stats
    }
    # answers unchanged; rows keep their original commit times
    after = sorted(
        tuple(r) for r in mor.snapshot().select(*keep).collect()
    )
    assert after == before
    # new slices are log-free: snapshot planning reads parquet only
    assert not any(
        s["_logs"] for s in mor.file_slices().values()
    )
    # time travel to before compaction resolves old base + logs
    assert mor.snapshot(as_of_instant=I3).count() == len(before)
    # post-compaction upsert logs against the NEW base instant
    mor.upsert(
        mor.spark.createDataFrame([(0, 3, 1.0)], SCHEMA), instant=I5
    )
    fresh = [n for n in _log_files(mor)
             if LOG_FILE_RE.match(n).group("baseInstant") == I4]
    assert fresh, "post-compact logs must attach to the new base"
    got = {r["k"]: r["bal"] for r in mor.snapshot().collect()}
    assert got[0] == 1.0


def test_full_slice_delete_then_compact_retires_group(spark,
                                                      tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "t"), "t", "k", "ver",
        table_type="MERGE_ON_READ",
    )
    t.upsert(spark.createDataFrame(_rows(0, 10, 1), SCHEMA),
             instant=I1, insert_groups=1)
    t.delete_where(F.lit(True), instant=I2)
    assert t.snapshot().count() == 0
    t.compact(instant=I3)
    assert t.snapshot().count() == 0
    slices = t.file_slices()
    assert all(not s["_logs"] for s in slices.values())
    # the retired slice is an explicit zero-record base file
    for s in slices.values():
        assert s["path"].endswith(".parquet")
        assert s["numWrites"] == 0


def test_compact_refuses_cow_and_empty(spark, tmp_path, mor):
    cow = HudiTable.create(
        spark, str(tmp_path / "cow"), "c", "k", "ver"
    )
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        cow.compact()
    mor.compact(instant=I3)
    with pytest.raises(ValueError, match="nothing to compact"):
        mor.compact(instant=I4)


def test_rollback_incomplete_deltacommit(mor):
    # fake a crashed deltacommit: markers + an orphaned log file
    # named with the crashed instant's write token
    inst = I3
    open(os.path.join(
        mor.hoodie_dir, f"{inst}.deltacommit.requested"
    ), "x").close()
    open(os.path.join(
        mor.hoodie_dir, f"{inst}.deltacommit.inflight"
    ), "x").close()
    orphan = os.path.join(
        mor.path,
        hudi_log.log_file_name("dead-0", I1, 9, f"0-0-{inst}"),
    )
    with open(orphan, "wb") as f:
        f.write(hudi_log.delete_block(["0"], "", inst))
    assert mor.incomplete_instants() == [inst]
    out = mor.rollback_incomplete()
    assert not os.path.exists(orphan)
    assert mor.incomplete_instants() == []
    assert any(
        os.path.basename(orphan) in r["files_deleted"] for r in out
    )
    # reader was never affected
    assert mor.snapshot().count() == 40


def test_mor_batch_source_vanilla_read(spark, mor):
    """External hudi_log DataSource must apply the log merge — a
    vanilla session reading a MOR directory sees merged rows."""
    mor.delete_where(F.col("k") < 3, instant=I3)
    spark.dataSource.register(
        __import__(
            "fda_clinical_etl_pipeline_spark.sources.hudi_table",
            fromlist=["HudiBatchSource"],
        ).HudiBatchSource
    )
    got = (
        spark.read.format("hudi_log")
        .option("path", mor.path).load()
    )
    exp = sorted(tuple(r) for r in mor.snapshot().collect())
    assert sorted(tuple(r) for r in got.collect()) == exp
    # and time travel through the same option surface
    tt = (
        spark.read.format("hudi_log")
        .option("path", mor.path).option("as.of.instant", I1).load()
    )
    assert tt.count() == 40


# ------------------------------------------------- streaming source
def _drain(spark, path, ck):
    got = []

    def sink(batch_df, _bid):
        got.extend(
            (r["k"], r["ver"], r["bal"], r["_hoodie_commit_time"])
            for r in batch_df.collect()
        )

    q = (
        spark.readStream.format("hudi_append_stream")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(got)


def test_hudi_stream_source_cow_and_checkpoint(spark, tmp_path):
    """Incremental feed over the timeline: the first drain delivers
    the initial commit's rows, a second drain from the SAME
    checkpoint delivers only rows written since — including only the
    freshly-written rows of a rewritten COW file group, never its
    carried rows."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_stream import (
        HudiStreamSource,
    )

    spark.dataSource.register(HudiStreamSource)
    t = HudiTable.create(
        spark, str(tmp_path / "hs"), "hs", "k", "ver"
    )
    t.upsert(spark.createDataFrame(_rows(0, 20, 1), SCHEMA),
             instant=I1, insert_groups=2)
    ck = str(tmp_path / "hs_ck")
    first = _drain(spark, t.path, ck)
    assert len(first) == 20
    assert all(ct == I1 for (_k, _v, _b, ct) in first)
    # a COW upsert rewrites a whole file group; the feed must carry
    # ONLY the two updated rows, not the group's carried rows
    t.upsert(
        spark.createDataFrame([(3, 2, 303.0), (4, 2, 404.0)], SCHEMA),
        instant=I2,
    )
    second = _drain(spark, t.path, ck)
    assert second == [(3, 2, 303.0, I2), (4, 2, 404.0, I2)]
    assert _drain(spark, t.path, ck) == []


def test_hudi_stream_source_mor_logs_and_deletes(spark, tmp_path):
    """MOR deltacommits stream their log-block rows; DELETE instants
    and compactions emit nothing (Hudi incremental-query semantics)."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_stream import (
        HudiStreamSource,
    )

    spark.dataSource.register(HudiStreamSource)
    t = HudiTable.create(
        spark, str(tmp_path / "ms"), "ms", "k", "ver",
        table_type="MERGE_ON_READ",
    )
    t.upsert(spark.createDataFrame(_rows(0, 10, 1), SCHEMA),
             instant=I1)
    ck = str(tmp_path / "ms_ck")
    assert len(_drain(spark, t.path, ck)) == 10
    # update -> log blocks; insert -> new base file: both stream
    t.upsert(
        spark.createDataFrame(
            [(0, 2, 100.0), (50, 1, 50.0)], SCHEMA
        ),
        instant=I2,
    )
    got = _drain(spark, t.path, ck)
    assert got == [(0, 2, 100.0, I2), (50, 1, 50.0, I2)]
    # deletes and compaction surface nothing
    t.delete_where(F.col("k") == 5, instant=I3)
    t.compact(instant=I4)
    assert _drain(spark, t.path, ck) == []
    # but the table itself moved on
    assert t.snapshot().count() == 10


def test_hudi_stream_starting_instant(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.hudi_stream import (
        HudiStreamSource,
    )

    spark.dataSource.register(HudiStreamSource)
    t = HudiTable.create(
        spark, str(tmp_path / "si"), "si", "k", "ver"
    )
    t.upsert(spark.createDataFrame(_rows(0, 5, 1), SCHEMA),
             instant=I1)
    t.upsert(spark.createDataFrame(_rows(100, 103, 1), SCHEMA),
             instant=I2)
    got = []

    def sink(batch_df, _bid):
        got.extend((r["k"],) for r in batch_df.collect())

    q = (
        spark.readStream.format("hudi_append_stream")
        .option("path", t.path)
        .option("starting_instant", I1)  # exclusive
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "si_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [(100,), (101,), (102,)]


# ------------------------------------------------ timeline archiving
def test_archive_bounds_planning_not_answers(spark, tmp_path):
    """archive(): instants beyond keep_active move into
    .hoodie/archived (Avro OCF batches) with a file-system-view
    checkpoint at the boundary. Snapshot answers, archived-range time
    travel, and post-archive writes are all unchanged — and the hot
    planning path (latest snapshot) opens ZERO archive files."""
    t = HudiTable.create(
        spark, str(tmp_path / "a"), "a", "k", "ver",
        table_type="MERGE_ON_READ",
    )
    insts = [f"202402{d:02d}120000000" for d in range(1, 9)]
    t.upsert(spark.createDataFrame(_rows(0, 30, 1), SCHEMA),
             instant=insts[0], insert_groups=2)
    for j in range(1, 5):
        t.upsert(spark.createDataFrame(
            [(j, j + 1, float(100 * j))], SCHEMA), instant=insts[j])
    t.delete_where(F.col("k") == 20, instant=insts[5])
    t.compact(instant=insts[6])
    t.upsert(spark.createDataFrame([(25, 2, 2525.0)], SCHEMA),
             instant=insts[7])

    before = sorted(tuple(r) for r in t.snapshot().collect())
    tt_pre = sorted(
        tuple(r)
        for r in t.snapshot(as_of_instant=insts[3]).collect()
    )
    out = t.archive(keep_active=2)
    assert out["boundary"] == insts[5]
    assert len(out["archived"]) == 6
    assert [i for i, _a in t.timeline()] == insts[6:]
    assert [i for i, _a in t.archived_timeline()] == insts[:6]
    # checkpoint artifact exists at the boundary
    assert os.path.isfile(os.path.join(
        t.hoodie_dir, ".aux", f"{insts[5]}.fsview.json"
    ))
    # answers identical; archived-range time travel still folds the
    # archive OCF (slow path) to the same result
    assert sorted(tuple(r) for r in t.snapshot().collect()) == before
    assert sorted(
        tuple(r)
        for r in t.snapshot(as_of_instant=insts[3]).collect()
    ) == tt_pre
    # the hot path never decodes an archive batch
    calls = {"n": 0}
    orig = HudiTable.archived_timeline

    def counting(self):
        calls["n"] += 1
        return orig(self)

    HudiTable.archived_timeline = counting
    try:
        t.snapshot().count()
    finally:
        HudiTable.archived_timeline = orig
    assert calls["n"] == 0
    # writes continue; a second archive stacks on the first
    t.upsert(spark.createDataFrame([(26, 2, 2626.0)], SCHEMA),
             instant="20240209120000000")
    t.archive(keep_active=1)
    got = {r["k"]: r["bal"] for r in t.snapshot().collect()}
    assert got[25] == 2525.0 and got[26] == 2626.0 and 20 not in got


def test_archive_guards(spark, tmp_path):
    t = HudiTable.create(spark, str(tmp_path / "g"), "g", "k", "ver")
    t.upsert(spark.createDataFrame(_rows(0, 5, 1), SCHEMA),
             instant=I1)
    # nothing beyond keep_active -> no-op
    assert t.archive(keep_active=3) is None
    t.upsert(spark.createDataFrame([(0, 2, 9.0)], SCHEMA),
             instant=I2)
    t.upsert(spark.createDataFrame([(1, 2, 8.0)], SCHEMA),
             instant=I3)
    with pytest.raises(ValueError, match="keep_active"):
        t.archive(keep_active=0)
    # a crashed writer's incomplete instant at or before the would-be
    # boundary blocks archiving until rolled back (its rollback needs
    # the active timeline)
    crashed = I1[:-1] + "1"  # between I1 and I2
    open(os.path.join(
        t.hoodie_dir, f"{crashed}.commit.requested"
    ), "x").close()
    with pytest.raises(ValueError, match="incomplete"):
        t.archive(keep_active=1)
    t.rollback_incomplete()
    out = t.archive(keep_active=1)
    assert out["archived"] == [I1, I2]
    assert t.snapshot().count() == 5


def test_stream_reads_across_archive_boundary(spark, tmp_path):
    """A FRESH stream consumer starting from scratch must still see
    rows committed in archived instants — the timeline entries come
    from the archive OCF; the data files were never archived."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_stream import (
        HudiStreamSource,
    )

    spark.dataSource.register(HudiStreamSource)
    t = HudiTable.create(spark, str(tmp_path / "s"), "s", "k", "ver")
    t.upsert(spark.createDataFrame(_rows(0, 4, 1), SCHEMA),
             instant=I1)
    t.upsert(spark.createDataFrame(_rows(100, 102, 1), SCHEMA),
             instant=I2)
    t.upsert(spark.createDataFrame(_rows(200, 201, 1), SCHEMA),
             instant=I3)
    t.archive(keep_active=1)
    got = _drain(spark, t.path, str(tmp_path / "s_ck"))
    assert sorted(k for (k, _v, _b, _ct) in got) == (
        [0, 1, 2, 3] + [100, 101] + [200]
    )


# ------------------------------------------------ read-optimized query
def test_read_optimized_skips_logs(mor):
    # I2 wrote log blocks: snapshot merges them, read_optimized must
    # serve the base files as of I1 (stale by exactly the log debt)
    ro = sorted(tuple(r) for r in
                mor.read_optimized().select("k", "ver", "bal")
                .collect())
    assert ro == _rows(0, 40, 1)
    snap = sorted(tuple(r) for r in
                  mor.snapshot().select("k", "ver", "bal").collect())
    assert snap != ro
    assert [r for r in snap if r[0] == 0][0] == (0, 2, 100.0)


def test_read_optimized_converges_after_compaction(mor):
    mor.compact(instant=I3)
    ro = sorted(tuple(r) for r in
                mor.read_optimized().select("k", "ver", "bal")
                .collect())
    snap = sorted(tuple(r) for r in
                  mor.snapshot().select("k", "ver", "bal").collect())
    assert ro == snap


def test_read_optimized_equals_snapshot_on_cow(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "cow"), "cow_tbl", "k", "ver",
    )
    t.upsert(spark.createDataFrame(_rows(0, 20, 1), SCHEMA),
             instant=I1)
    t.upsert(spark.createDataFrame(_rows(0, 5, 2, 9.0), SCHEMA),
             instant=I2)
    ro = sorted(tuple(r) for r in
                t.read_optimized().select("k", "ver", "bal")
                .collect())
    snap = sorted(tuple(r) for r in
                  t.snapshot().select("k", "ver", "bal").collect())
    assert ro == snap


def test_read_optimized_time_travel(mor):
    ro = sorted(tuple(r) for r in
                mor.read_optimized(as_of_instant=I1)
                .select("k", "ver", "bal").collect())
    assert ro == _rows(0, 40, 1)


# ------------------------------------------------------- MERGE INTO
def test_merge_clause_semantics(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "m"), "merge_tbl", "k", "ver",
        table_type="MERGE_ON_READ",
    )
    t.upsert(spark.createDataFrame(_rows(0, 40, 1), SCHEMA),
             instant=I1)
    instants = t.merge(
        spark.createDataFrame(
            [(0, 9, 999.0), (1, 9, -1.0), (500, 1, 5.0)], SCHEMA
        ),
        when_matched_update="all",
        when_matched_delete="s.bal < 0",
        when_not_matched_insert="all",
        instant=I2,
    )
    assert instants == [I2]  # ONE instant: the whole merge is atomic
    got = {r["k"]: (r["ver"], r["bal"])
           for r in t.snapshot().collect()}
    assert got[0] == (9, 999.0)
    assert 1 not in got
    assert got[500] == (1, 5.0)
    assert len(got) == 40  # -1 deleted, +1 inserted
    # precombine battle was BYPASSED by delete-first: an update with
    # a LOWER precombine than stored still lands
    t.merge(
        spark.createDataFrame([(0, 0, 1.0)], SCHEMA),
        when_matched_update="all",
        instant=I4,
    )
    got2 = {r["k"]: (r["ver"], r["bal"])
            for r in t.snapshot().collect()}
    assert got2[0] == (0, 1.0)


def test_merge_by_source_and_key_gate(mor):
    with pytest.raises(ValueError, match="record key"):
        mor.merge(
            spark_src := mor.spark.createDataFrame(
                [(0, 1, 0.0)], SCHEMA
            ),
            on="bal", when_matched_update="all",
        )
    del spark_src
    mor.merge(
        mor.spark.createDataFrame(
            [(i, 1, 0.0) for i in range(20)], SCHEMA
        ),
        when_not_matched_by_source_delete="t.k >= 30",
        instant="20240110000000000",
    )
    keys = {r["k"] for r in mor.snapshot().collect()}
    assert keys == set(range(30))  # 30..39 were unmatched and killed
