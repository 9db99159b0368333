"""Hudi COW table-format twin: on-disk spec conformance + upsert /
precombine / time-travel semantics (hudi/register_hudi.py:56-96,
README.md:190-198; format per hudi.apache.org/tech-specs, table
version 6). Mirrors the test style of test_delta_log / test_iceberg:
field-by-field shape checks an external Hudi reader relies on, then
behavioral parity pins."""

from __future__ import annotations

import json
import os
import re
import zlib

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    META_COLS,
    HudiTable,
)

BASE_FILE_RE = re.compile(
    r"^(?P<fileId>[0-9a-f-]+)_(?P<token>\d+-\d+-\d+)_"
    r"(?P<instant>\d{17})\.parquet$"
)


@pytest.fixture()
def table(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "tbl"), "patients", "patient_id", "visit"
    )
    df1 = spark.createDataFrame(
        [(i, 10, f"a{i}") for i in range(8)],
        "patient_id int, visit int, note string",
    )
    t.upsert(df1, instant="20240101000000000", insert_groups=2)
    df2 = spark.createDataFrame(
        [(0, 20, "upd0"), (1, 5, "stale1"), (99, 1, "new99")],
        "patient_id int, visit int, note string",
    )
    t.upsert(df2, instant="20240102000000000")
    return t


def test_hoodie_properties_shape(table):
    props = table.properties()
    assert props["hoodie.table.name"] == "patients"
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.version"] == "6"
    assert props["hoodie.timeline.layout.version"] == "1"
    assert props["hoodie.table.recordkey.fields"] == "patient_id"
    assert props["hoodie.table.precombine.field"] == "visit"
    assert props["hoodie.table.base.file.format"] == "PARQUET"
    assert props["hoodie.populate.meta.fields"] == "true"
    assert (
        props["hoodie.table.keygenerator.class"]
        == "org.apache.hudi.keygen.NonpartitionedKeyGenerator"
    )
    # HoodieTableConfig.generateChecksum: CRC32(tableName + database)
    assert int(props["hoodie.table.checksum"]) == zlib.crc32(
        b"patients"
    )


def test_timeline_instant_triples(table):
    hoodie = table.hoodie_dir
    for inst in ("20240101000000000", "20240102000000000"):
        req = os.path.join(hoodie, f"{inst}.commit.requested")
        inflight = os.path.join(hoodie, f"{inst}.inflight")
        done = os.path.join(hoodie, f"{inst}.commit")
        assert os.path.isfile(req) and os.path.getsize(req) == 0
        assert os.path.isfile(inflight)
        assert os.path.isfile(done)
    # aux dirs Hudi creates alongside the timeline
    for sub in (".aux", ".temp", "archived"):
        assert os.path.isdir(os.path.join(hoodie, sub))
    assert table.commits() == [
        "20240101000000000", "20240102000000000"
    ]


def test_commit_metadata_shape(table):
    meta = table.commit_metadata("20240102000000000")
    assert meta["operationType"] == "UPSERT"
    assert meta["compacted"] is False
    stats = [
        s for part in meta["partitionToWriteStats"].values()
        for s in part
    ]
    assert stats
    for s in stats:
        for field in (
            "fileId", "path", "prevCommit", "numWrites", "numDeletes",
            "numUpdateWrites", "numInserts", "totalWriteBytes",
            "fileSizeInBytes",
        ):
            assert field in s
        assert os.path.isfile(os.path.join(table.path, s["path"]))
    # writer avro schema recorded for schema resolution
    avro = json.loads(meta["extraMetadata"]["schema"])
    assert {f["name"] for f in avro["fields"]} == {
        "patient_id", "visit", "note"
    }
    # updated file groups chain to their previous commit
    upd = [s for s in stats if s["numUpdateWrites"] > 0]
    assert upd and all(
        s["prevCommit"] == "20240101000000000" for s in upd
    )


def test_base_file_naming_and_meta_columns(table):
    names = [
        fn for fn in os.listdir(table.path)
        if fn.endswith(".parquet")
    ]
    assert names
    for fn in names:
        m = BASE_FILE_RE.match(fn)
        assert m, fn
        assert m.group("instant") in table.commits()
    snap = table.snapshot()
    # spec: the five hoodie meta columns lead the schema, all strings
    assert tuple(snap.columns[:5]) == META_COLS
    for c in META_COLS:
        assert snap.schema[c].dataType.typeName() == "string"
    row = snap.filter(F.col("patient_id") == 0).collect()[0]
    assert row["_hoodie_record_key"] == "0"
    assert row["_hoodie_partition_path"] == ""
    assert BASE_FILE_RE.match(row["_hoodie_file_name"])
    assert re.match(
        r"^\d{17}_\d+_\d+$", row["_hoodie_commit_seqno"]
    )
    # partition metadata marker at table base for nonpartitioned
    assert os.path.isfile(
        os.path.join(table.path, ".hoodie_partition_metadata")
    )


def test_upsert_precombine_and_meta_preservation(table):
    rows = {
        r["patient_id"]: r for r in table.snapshot().collect()
    }
    assert len(rows) == 9
    # incoming ver=20 wins -> new value, new commit time
    assert rows[0]["note"] == "upd0"
    assert rows[0]["_hoodie_commit_time"] == "20240102000000000"
    # incoming ver=5 LOSES to stored ver=10: value survives AND the
    # record keeps its original commit time + seqno (merge handle
    # preserves metadata of untouched records)
    assert rows[1]["note"] == "a1"
    assert rows[1]["_hoodie_commit_time"] == "20240101000000000"
    assert rows[1]["_hoodie_commit_seqno"].startswith(
        "20240101000000000_"
    )
    # untouched file groups keep commit-1 rows
    assert rows[5]["_hoodie_commit_time"] == "20240101000000000"
    # new key lands in a fresh file group stamped by commit 2
    assert rows[99]["note"] == "new99"
    assert rows[99]["_hoodie_commit_time"] == "20240102000000000"


def test_commit_listing_and_history(table):
    listing = [
        r["_hoodie_commit_time"] for r in table.commit_times().collect()
    ]
    # reference's register_hudi.py:83-96: distinct, newest first
    assert listing == ["20240102000000000", "20240101000000000"]
    h = table.history()
    assert [x["instant"] for x in h] == table.commits()
    assert h[0]["numInserts"] == 8 and h[0]["numUpdateWrites"] == 0
    assert h[1]["numUpdateWrites"] == 1  # only ver=20 actually updated
    assert h[1]["numInserts"] == 1      # key 99


def test_time_travel_as_of_instant(table):
    first = table.snapshot(as_of_instant="20240101000000000")
    assert first.count() == 8
    assert first.filter(F.col("patient_id") == 0).collect()[0][
        "note"
    ] == "a0"
    # lenient datetime form (README.md:190-198 usage)
    same = table.snapshot(as_of_instant="2024-01-01 00:00:00")
    assert same.count() == 8
    with pytest.raises(ValueError):
        table.snapshot(as_of_instant="not-a-time")


def test_cow_writes_only_touched_file_groups(table):
    """A 3-row commit against 2 file groups must create new slices for
    the touched groups + fresh insert groups only — never rewrite the
    whole table (the COW write-amplification bound)."""
    by_instant: dict[str, set] = {}
    for fn in os.listdir(table.path):
        m = BASE_FILE_RE.match(fn)
        if m:
            by_instant.setdefault(m.group("instant"), set()).add(
                m.group("fileId")
            )
    c1 = by_instant["20240101000000000"]
    c2 = by_instant["20240102000000000"]
    assert len(c1) == 2
    # commit 2: only file groups holding keys 0 / 1 rewritten (<= 2)
    # plus exactly one fresh insert group
    rewritten = c1 & c2
    fresh = c2 - c1
    assert 1 <= len(rewritten) <= 2
    assert len(fresh) == 1


def test_single_commit_table_plain_parquet_readable(spark, tmp_path):
    """External readability floor: with one commit, even a plain
    parquet scan of the table dir (no Hudi reader) sees the snapshot."""
    t = HudiTable.create(
        spark, str(tmp_path / "plain"), "plain", "id", "v"
    )
    t.upsert(
        spark.createDataFrame(
            [(1, 1, "x"), (2, 1, "y")], "id int, v int, s string"
        ),
        instant="20240101000000000",
    )
    df = spark.read.parquet(str(tmp_path / "plain"))
    assert df.count() == 2
    assert set(df.columns) >= set(META_COLS)


def test_partitioned_table_layout(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "part"), "part_tbl", "id", "v",
        partition_field="region",
    )
    df = spark.createDataFrame(
        [(i, 1, "EU" if i % 2 else "US") for i in range(10)],
        "id int, v int, region string",
    )
    t.upsert(df, instant="20240101000000000", insert_groups=2)
    props = t.properties()
    assert props["hoodie.table.partition.fields"] == "region"
    assert (
        props["hoodie.table.keygenerator.class"]
        == "org.apache.hudi.keygen.SimpleKeyGenerator"
    )
    # partition dirs are raw values with their own metadata marker
    for pp in ("EU", "US"):
        d = os.path.join(t.path, pp)
        assert os.path.isdir(d)
        assert os.path.isfile(
            os.path.join(d, ".hoodie_partition_metadata")
        )
        assert any(BASE_FILE_RE.match(fn) for fn in os.listdir(d))
    snap = t.snapshot()
    assert snap.count() == 10
    assert {
        r["_hoodie_partition_path"]
        for r in snap.select("_hoodie_partition_path")
        .distinct().collect()
    } == {"EU", "US"}
    # a file group never spans partition paths
    meta = t.commit_metadata("20240101000000000")
    fids = [
        (pp, s["fileId"])
        for pp, stats in meta["partitionToWriteStats"].items()
        for s in stats
    ]
    ids = [fid for _pp, fid in fids]
    assert len(ids) == len(set(ids))


def test_instant_monotonicity_and_validation(spark, tmp_path):
    t = HudiTable.create(
        spark, str(tmp_path / "mono"), "mono", "id", "v"
    )
    df = spark.createDataFrame([(1, 1)], "id int, v int")
    t.upsert(df, instant="20240105000000000")
    with pytest.raises(ValueError):
        t.upsert(df, instant="20240104000000000")  # not after latest
    with pytest.raises(ValueError):
        t.upsert(df, instant="2024-01-06")  # wrong format
    # auto instant on a table whose last commit is in the future
    # still advances strictly
    inst = t.upsert(df)
    assert inst > "20240105000000000"


def test_upsert_prunes_index_scan_by_key_bounds(spark, tmp_path):
    """The write-stat key ranges must keep the index scan off
    non-overlapping file groups: an upsert of high keys against a
    low-key table may not read the low file group at all."""
    t = HudiTable.create(
        spark, str(tmp_path / "prune"), "prune", "id", "v"
    )
    low = spark.createDataFrame(
        [(i, 1) for i in range(10)], "id int, v int"
    )
    t.upsert(low, instant="20240101000000000")
    meta = t.commit_metadata("20240101000000000")
    stats = meta["partitionToWriteStats"][""]
    assert stats[0]["minRecordKey"] == "0"
    assert stats[0]["maxRecordKey"] == "9"
    # keys '30'..'39' sort entirely above '9' as strings -> no overlap
    high = spark.createDataFrame(
        [(i, 1) for i in range(30, 40)], "id int, v int"
    )
    t.upsert(high, instant="20240102000000000")
    meta2 = t.commit_metadata("20240102000000000")
    stats2 = meta2["partitionToWriteStats"][""]
    # no touched group: the low file group was not rewritten
    assert all(s["prevCommit"] == "null" for s in stats2)
    assert all(s["numUpdateWrites"] == 0 for s in stats2)
    assert t.snapshot().count() == 20


def test_hudi_batch_source_vanilla_read(spark, tmp_path):
    """A vanilla session reads the Hudi twin through
    spark.read.format("hudi_log") only — snapshot and as.of.instant
    time travel — without the HudiTable API (the batch twin of
    DeltaBatchSource / IcebergBatchSource)."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        HudiBatchSource,
    )

    spark.dataSource.register(HudiBatchSource)
    t = HudiTable.create(
        spark, str(tmp_path / "bs"), "bs", "id", "ver"
    )
    t.upsert(
        spark.createDataFrame(
            [(i, 1, f"v{i}") for i in range(10)],
            "id int, ver int, val string",
        ),
        instant="20240101000000000",
    )
    t.upsert(
        spark.createDataFrame(
            [(0, 2, "u0"), (50, 1, "new")],
            "id int, ver int, val string",
        ),
        instant="20240102000000000",
    )
    df = spark.read.format("hudi_log").option(
        "path", t.path
    ).load()
    assert tuple(df.columns[:5]) == META_COLS
    assert df.count() == 11
    assert df.where("id = 0").collect()[0]["val"] == "u0"
    asof = spark.read.format("hudi_log").option(
        "path", t.path
    ).option("as.of.instant", "20240101000000000").load()
    assert asof.count() == 10
    assert asof.where("id = 0").collect()[0]["val"] == "v0"


def test_rollback_incomplete_instants(spark, tmp_path):
    """A crashed writer's requested/inflight markers and orphaned base
    files are reclaimed by rollback, which records a completed
    .rollback timeline action; completed commits are never touched."""
    import json as _json

    t = HudiTable.create(
        spark, str(tmp_path / "rb"), "rb", "id", "v"
    )
    t.upsert(
        spark.createDataFrame([(1, 1), (2, 1)], "id int, v int"),
        instant="20240101000000000",
    )
    # simulate a crash: markers + an orphaned base file, no .commit
    crashed = "20240102000000000"
    open(os.path.join(
        t.hoodie_dir, f"{crashed}.commit.requested"), "x").close()
    open(os.path.join(t.hoodie_dir, f"{crashed}.inflight"),
         "x").close()
    orphan = os.path.join(
        t.path, f"deadbeef-0_0-0-0_{crashed}.parquet"
    )
    open(orphan, "wb").write(b"not really parquet")
    assert t.incomplete_instants() == [crashed]
    # readers already ignore the orphan (log-only planning)
    assert t.snapshot().count() == 2

    out = t.rollback_incomplete()
    assert [r["instant"] for r in out] == [crashed]
    assert not os.path.exists(orphan)
    assert t.incomplete_instants() == []
    assert t.commits() == ["20240101000000000"]  # untouched
    assert t.snapshot().count() == 2
    rb_files = [
        fn for fn in os.listdir(t.hoodie_dir)
        if fn.endswith(".rollback")
    ]
    assert len(rb_files) == 1
    meta = _json.load(
        open(os.path.join(t.hoodie_dir, rb_files[0]))
    )
    assert meta["commitsRollback"] == [crashed]
    assert meta["totalFilesDeleted"] == 1
    # idempotent
    assert t.rollback_incomplete() == []


def test_cluster_replacecommit(spark, tmp_path):
    """Clustering bin-packs file slices into fresh file groups under a
    <instant>.replacecommit (HoodieReplaceCommitMetadata with
    partitionToReplaceFileIds); rows KEEP their meta columns, the
    commit listing is unchanged, and time travel before the replace
    still resolves the old groups."""
    t = HudiTable.create(
        spark, str(tmp_path / "cl"), "cl", "id", "v"
    )
    t.upsert(
        spark.createDataFrame(
            [(i, 1, f"a{i}") for i in range(20)],
            "id int, v int, val string",
        ),
        instant="20240101000000000", insert_groups=4,
    )
    t.upsert(
        spark.createDataFrame(
            [(0, 2, "upd0")], "id int, v int, val string"
        ),
        instant="20240102000000000",
    )
    before = t.file_slices()
    assert len(before) >= 4
    listing_before = [
        r["_hoodie_commit_time"]
        for r in t.commit_times().collect()
    ]

    inst = t.cluster(
        instant="20240103000000000", target_file_groups=2
    )
    hoodie = t.hoodie_dir
    for fn in (f"{inst}.replacecommit.requested",
               f"{inst}.replacecommit.inflight",
               f"{inst}.replacecommit"):
        assert os.path.isfile(os.path.join(hoodie, fn))
    meta = t.commit_metadata(inst)
    assert meta["operationType"] == "CLUSTER"
    assert sorted(meta["partitionToReplaceFileIds"][""]) == sorted(
        fid for _pp, fid in before
    )
    after = t.file_slices()
    assert len(after) == 2
    assert not (set(after) & set(before))
    snap = t.snapshot()
    assert snap.count() == 20
    rows = {r["id"]: r for r in snap.collect()}
    # meta columns preserved through the rewrite
    assert rows[0]["val"] == "upd0"
    assert rows[0]["_hoodie_commit_time"] == "20240102000000000"
    assert rows[1]["_hoodie_commit_time"] == "20240101000000000"
    assert rows[1]["_hoodie_commit_seqno"].startswith(
        "20240101000000000_"
    )
    # commit listing unchanged (clustering is not a data commit)
    assert [
        r["_hoodie_commit_time"] for r in t.commit_times().collect()
    ] == listing_before
    # time travel before the replace sees the old layout
    tt = t.snapshot(as_of_instant="20240102000000000")
    assert tt.count() == 20
    old_fids = {
        r["_hoodie_file_name"].split("_")[0]
        for r in tt.select("_hoodie_file_name").distinct().collect()
    }
    assert old_fids == {fid for _pp, fid in before}
    # upsert after clustering targets the new file groups
    t.upsert(
        spark.createDataFrame(
            [(1, 3, "post")], "id int, v int, val string"
        ),
        instant="20240104000000000",
    )
    assert t.snapshot().where("id = 1").collect()[0]["val"] == "post"
    assert t.snapshot().count() == 20
    assert len(t.file_slices()) == 2  # same groups, one new slice


def test_concurrent_overlapping_upsert_refused(spark, tmp_path):
    """Optimistic concurrency: a writer completing while another works
    must not be silently overwritten when they touch the same file
    group; disjoint concurrent commits both land."""
    from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
        ConcurrentHudiCommitError,
    )

    t = HudiTable.create(
        spark, str(tmp_path / "cc"), "cc", "id", "v"
    )
    t.upsert(
        spark.createDataFrame(
            [(i, 1, f"a{i}") for i in range(10)],
            "id int, v int, val string",
        ),
        instant="20240101000000000",
    )

    # interleave: while writer A upserts id=0, writer B completes an
    # upsert of the same key (same file group)
    orig = HudiTable._next_instant
    state = {"raced": False}

    def raced(self, explicit):
        inst = orig(self, explicit)
        if not state["raced"]:
            state["raced"] = True
            other = HudiTable(spark, self.path)
            other.upsert(
                spark.createDataFrame(
                    [(0, 3, "theirs")], "id int, v int, val string"
                ),
                instant="20240102000000000",
            )
            # our instant must still be strictly greater
            inst = orig(self, None)
        return inst

    HudiTable._next_instant = raced
    try:
        with pytest.raises(ConcurrentHudiCommitError):
            t.upsert(
                spark.createDataFrame(
                    [(0, 2, "mine")], "id int, v int, val string"
                ),
            )
    finally:
        HudiTable._next_instant = orig
    # the other writer's commit survives; ours left no trace
    row = t.snapshot().where("id = 0").collect()[0]
    assert row["val"] == "theirs"
    assert t.incomplete_instants() == []
    assert t.snapshot().count() == 10


def test_upsert_schema_evolution_add_column(spark, tmp_path):
    """A batch with an extra column evolves the table (Avro schema
    resolution): pre-evolution slices surface the column as NULL,
    touched/new slices carry it, and a NARROWER batch refuses (it
    would silently drop stored columns from rewritten slices)."""
    t = HudiTable.create(
        spark, str(tmp_path / "evo"), "evo", "id", "v"
    )
    t.upsert(
        spark.createDataFrame(
            [(i, 1, f"a{i}") for i in range(6)],
            "id int, v int, val string",
        ),
        instant="20240101000000000",
    )
    t.upsert(
        spark.createDataFrame(
            [(0, 2, "upd", 9.5), (10, 1, "new", 1.5)],
            "id int, v int, val string, score double",
        ),
        instant="20240102000000000",
    )
    snap = t.snapshot()
    assert snap.columns[5:] == ["id", "v", "val", "score"]
    rows = {r["id"]: (r["val"], r["score"]) for r in snap.collect()}
    assert rows[1] == ("a1", None)    # untouched slice: NULL
    assert rows[0] == ("upd", 9.5)
    assert rows[10] == ("new", 1.5)
    assert snap.count() == 7
    with pytest.raises(ValueError, match="lacks table columns"):
        t.upsert(spark.createDataFrame([(1, 3)], "id int, v int"))


def test_cluster_layout_strategies(spark, tmp_path):
    """Clustering layout strategies (real Hudi's sort-columns option +
    RFC-28 space-filling curves): sort_by gives near-disjoint per-group
    ranges on the leading column; hilbert_by gives tight per-group
    bounding boxes on BOTH columns; the chosen strategy is recorded in
    the replacecommit's extraMetadata; combined strategies refuse."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    t = HudiTable.create(
        spark, str(tmp_path / "cly"), "cly", "id", "v"
    )
    n = 1024
    t.upsert(
        spark.createDataFrame(
            [(i, 1, i % 32, (i * 48271) % 32) for i in range(n)],
            "id int, v int, x int, y int",
        ),
        instant="20240101000000000", insert_groups=4,
    )

    def group_spans(col):
        return {
            r["_hoodie_file_name"]: (r["lo"], r["hi"])
            for r in t.snapshot()
            .groupBy("_hoodie_file_name")
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        }

    # hash bin-pack baseline: every group spans ~the full x range
    base_spans = group_spans("x")
    assert all(hi - lo >= 24 for lo, hi in base_spans.values())

    inst = t.cluster(
        instant="20240102000000000", target_file_groups=8,
        sort_by=["x"],
    )
    meta = t.commit_metadata(inst)
    assert meta["extraMetadata"][
        "hoodie.clustering.plan.strategy.sort.columns"] == "x"
    spans = group_spans("x")
    assert len(spans) == 8
    # range assignment: each group covers ~1/8 of the x domain
    assert all(hi - lo <= 8 for lo, hi in spans.values())
    assert t.snapshot().count() == n

    inst = t.cluster(
        instant="20240103000000000", target_file_groups=16,
        hilbert_by=["x", "y"],
    )
    meta = t.commit_metadata(inst)
    assert meta["extraMetadata"][
        "hoodie.layout.optimize.strategy"] == "hilbert"
    sx, sy = group_spans("x"), group_spans("y")
    assert len(sx) == 16
    # bounding boxes tight on BOTH columns: every group's area is well
    # under the full 32x32 domain (hash packing would span nearly the full range)
    areas = [
        (sx[f][1] - sx[f][0] + 1) * (sy[f][1] - sy[f][0] + 1)
        for f in sx
    ]
    assert max(areas) <= 32 * 32 // 4
    assert t.snapshot().count() == n

    with _pytest.raises(ValueError, match="ONE of"):
        t.cluster(sort_by=["x"], hilbert_by=["x", "y"])
    with _pytest.raises(ValueError, match="not in schema"):
        t.cluster(sort_by=["nope"])
