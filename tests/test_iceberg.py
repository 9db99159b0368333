"""Iceberg v2 table format: structural conformance of the metadata
tree against the public spec (metadata.json fields, manifest-list and
manifest-entry Avro schemas with the spec's reserved field-ids, the
HadoopTables version-hint convention) plus semantics through the
tree-replay reader. No Iceberg jar/pyiceberg in this environment, so —
as with the Delta twin — conformance is what makes the format claim
real; the JVM's Avro reference reader additionally cross-validates the
manifest files as well-formed Avro."""

from __future__ import annotations

import json
import os

import pytest

from fda_clinical_etl_pipeline_spark.sources.avro_ocf import (
    decode_ocf_with_meta,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import IcebergTable


def _rows(spark, data):
    return spark.createDataFrame(
        data, "id long, name string, score double"
    )


@pytest.fixture()
def table(spark, tmp_path):
    return IcebergTable.create(
        spark, str(tmp_path / "ice"),
        _rows(spark, [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]),
    )


def test_metadata_json_conforms_to_spec(table):
    meta = table.metadata()
    assert meta["format-version"] == 2
    assert meta["table-uuid"]
    assert meta["last-sequence-number"] == 1
    schema = meta["schemas"][meta["current-schema-id"]]
    assert schema["type"] == "struct"
    assert [(f["id"], f["name"], f["type"]) for f in schema["fields"]] \
        == [(1, "id", "long"), (2, "name", "string"),
            (3, "score", "double")]
    assert meta["last-column-id"] == 3
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert meta["sort-orders"] == [{"order-id": 0, "fields": []}]
    snap = meta["snapshots"][-1]
    assert snap["snapshot-id"] == meta["current-snapshot-id"]
    assert snap["summary"]["operation"] == "append"
    assert os.path.isfile(snap["manifest-list"])
    # HadoopTables convention: versioned metadata + hint file
    hint = os.path.join(table.meta_dir, "version-hint.text")
    assert open(hint).read() == str(table.current_version())
    assert os.path.isfile(table._metadata_path(table.current_version()))


def test_manifest_avro_schemas_carry_spec_field_ids(table):
    meta = table.metadata()
    snap = meta["snapshots"][-1]
    header, sch, manifests = decode_ocf_with_meta(
        open(snap["manifest-list"], "rb").read())
    ids = {f["name"]: f["field-id"] for f in sch["fields"]}
    assert ids["manifest_path"] == 500
    assert ids["added_snapshot_id"] == 503
    assert ids["sequence_number"] == 515 and ids["content"] == 517
    m = manifests[0]
    assert m["added_files_count"] >= 1 and m["added_rows_count"] == 3

    eheader, esch, entries = decode_ocf_with_meta(
        open(m["manifest_path"], "rb").read())
    eids = {f["name"]: f["field-id"] for f in esch["fields"]}
    assert eids == {"status": 0, "snapshot_id": 1, "data_file": 2,
                    "sequence_number": 3, "file_sequence_number": 4}
    dfs = next(f for f in esch["fields"] if f["name"] == "data_file")
    did = {f["name"]: f["field-id"] for f in dfs["type"]["fields"]}
    assert did["file_path"] == 100 and did["record_count"] == 103
    assert did["content"] == 134
    # manifest header carries the spec's application metadata
    assert eheader["format-version"] == b"2"
    assert eheader["content"] == b"data"
    assert json.loads(eheader["schema"].decode())["type"] == "struct"
    for e in entries:
        assert e["status"] == 1  # ADDED
        assert e["snapshot_id"] == snap["snapshot-id"]
        assert os.path.isfile(e["data_file"]["file_path"])
        assert e["data_file"]["file_format"] == "PARQUET"


def test_jvm_avro_reads_manifests(spark, table):
    meta = table.metadata()
    snap = meta["snapshots"][-1]
    jvm = spark._jvm
    for p in (snap["manifest-list"],):
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        n = 0
        while reader.hasNext():
            reader.next()
            n += 1
        reader.close()
        assert n >= 1


def test_append_accumulates_and_time_travels(spark, table):
    import time as _t

    s1 = table.metadata()["current-snapshot-id"]
    _t.sleep(0.01)
    cut = _t.time()
    _t.sleep(0.01)
    table.append(_rows(spark, [(4, "d", 4.5)]))
    assert table.snapshot().count() == 4
    assert table.snapshot(snapshot_id=s1).count() == 3
    assert table.timestamp_as_of(cut).count() == 3
    # append's manifest list carries the prior manifest forward
    manifests = table._manifest_list_rows(table.metadata())
    assert len(manifests) == 2
    assert [h["operation"] for h in table.history()] \
        == ["append", "append"]


def test_overwrite_replaces_current_but_keeps_history(spark, table):
    s1 = table.metadata()["current-snapshot-id"]
    table.overwrite(_rows(spark, [(9, "z", 9.9)]))
    got = [(r.id, r.name) for r in table.snapshot().collect()]
    assert got == [(9, "z")]
    assert table.snapshot(snapshot_id=s1).count() == 3  # time travel
    meta = table.metadata()
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"
    assert meta["snapshots"][-1]["parent-snapshot-id"] == s1


def test_roundtrip_values_exact(spark, table):
    got = sorted(tuple(r) for r in table.snapshot().collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]


def test_unsupported_types_refused(spark, tmp_path):
    df = spark.createDataFrame([(1, [1, 2])], "id long, xs array<long>")
    with pytest.raises(ValueError, match="unsupported Iceberg"):
        IcebergTable.create(spark, str(tmp_path / "bad"), df)


def test_create_refuses_existing(spark, table):
    with pytest.raises(ValueError, match="already exists"):
        IcebergTable.create(
            table.spark, table.path, _rows(table.spark, [(1, "a", 1.0)])
        )


def test_bounds_and_data_skipping(spark, tmp_path):
    """Per-file lower/upper bounds (spec single-value serialization)
    must drive provable pruning: a range-partitioned write yields
    disjoint per-file ranges, and a narrow read_range scans only the
    matching file while returning row-exact results."""
    import struct as _struct

    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2).alias("val"),
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 4, "0")
                 ).alias("name"),
    ).repartitionByRange(4, "id")
    t = IcebergTable.create(spark, str(tmp_path / "b"), df)

    entries = t._entries_of_current()
    assert len(entries) == 4
    # bounds decode to the file's true min/max
    meta = t.metadata()
    id_field = next(
        f for f in meta["schemas"][0]["fields"] if f["name"] == "id"
    )
    for e in entries:
        d = e["data_file"]
        lo = next(b["value"] for b in d["lower_bounds"]
                  if b["key"] == id_field["id"])
        hi = next(b["value"] for b in d["upper_bounds"]
                  if b["key"] == id_field["id"])
        assert _struct.unpack("<q", lo)[0] <= _struct.unpack("<q", hi)[0]

    cands, skipped = t.skipped_files("id", lo=10, hi=20)
    assert len(cands) == 1 and len(skipped) == 3, (cands, skipped)
    got = sorted(r.id for r in t.read_range("id", 10, 20).collect())
    assert got == list(range(10, 21))
    # string bounds prune too
    c2, s2 = t.skipped_files("name", lo="k0010", hi="k0020")
    assert len(c2) == 1 and len(s2) == 3


def test_upsert_cow_bounds_pruned(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(0, 400).select(
        F.col("id"),
        F.lit("v0").alias("ver"),
        F.lit(1).alias("stamp"),
    ).repartitionByRange(4, "id")
    t = IcebergTable.create(spark, str(tmp_path / "up"), df)
    before = {e["data_file"]["file_path"]
              for e in t._entries_of_current()}
    assert len(before) == 4

    inc = spark.createDataFrame(
        [(5, "new", 2), (7, "old", 0), (999, "ins", 2)],
        "id long, ver string, stamp int",
    )
    # pin the copy-on-write strategy explicitly (auto would pick
    # merge-on-read for a 3-key batch — covered in test_iceberg_mor)
    t.upsert(inc, key="id", precombine="stamp", mode="cow")
    snap = {r.id: (r.ver, r.stamp) for r in t.snapshot().collect()}
    assert len(snap) == 401
    assert snap[5] == ("new", 2)
    assert snap[7] == ("v0", 1), "older precombine must lose"
    assert snap[999] == ("ins", 2)
    # only the file(s) whose key range covered 5/7/999 were rewritten
    after = {e["data_file"]["file_path"]: e
             for e in t._entries_of_current()}
    carried = before & set(after)
    assert len(carried) >= 2, "untouched files must carry forward"
    for p in carried:
        assert after[p]["status"] == 0  # EXISTING


def test_delete_where_cow(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    ).repartitionByRange(4, "id")
    t = IcebergTable.create(spark, str(tmp_path / "dl"), df)
    s1 = t.metadata()["current-snapshot-id"]
    t.delete_where(F.col("id") < 10)
    assert sorted(r.id for r in t.snapshot().collect()) \
        == list(range(10, 100))
    assert t.snapshot(snapshot_id=s1).count() == 100  # time travel
    assert t.history()[-1]["operation"] == "delete"
    # no-match delete commits nothing
    v = t.current_version()
    t.delete_where(F.col("id") > 10_000)
    assert t.current_version() == v


def test_cli_iceberg_register(spark, tmp_path, capsys):
    """The register flow against the Iceberg format: first run creates
    the table, second upserts with precombine semantics."""
    import json as _json

    from fda_clinical_etl_pipeline_spark.__main__ import main

    def _batch(rows, sub):
        spark.createDataFrame(
            rows, "patient_id string, visit_date string, note string"
        ).write.parquet(str(sub))

    lake = tmp_path / "lake"
    _batch([("p1", "2024-01-01", "a"), ("p2", "2024-01-02", "b")],
           lake / "qlm_ready" / "hosp" / "20240101T000000" / "b1")
    assert main(["iceberg-register", "--lake", str(lake),
                 "--source", "hosp"]) == 0
    out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["rows"] == 2 and out1["n_snapshots"] == 1

    _batch([("p1", "2024-06-01", "newer"), ("p9", "2024-06-02", "ins")],
           lake / "qlm_ready" / "hosp" / "20240202T000000" / "b2")
    assert main(["iceberg-register", "--lake", str(lake),
                 "--source", "hosp"]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows"] == 3 and out2["n_snapshots"] == 2

    t = IcebergTable(spark, out2["table"])
    snap = {r.patient_id: r.note for r in t.snapshot().collect()}
    assert snap == {"p1": "newer", "p2": "b", "p9": "ins"}


def test_identity_partitioned_table(spark, tmp_path):
    """Identity partition spec: hive-layout data files, typed partition
    structs in manifest entries, spec fields (field-ids 1000+) in
    metadata, log-only pruning, and partition-column reconstruction on
    read — every writer path inherits the layout."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0), ("c", 4, 4.0)],
        "k string, n int, v double",
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "pt"), df, partition_by=["k"]
    )
    meta = t.metadata()
    spec = meta["partition-specs"][0]["fields"]
    assert spec == [{"name": "k", "transform": "identity",
                     "source-id": 1, "field-id": 1000}]
    assert meta["last-partition-id"] == 1000
    # manifest entries carry typed partition structs + hive dirs
    for e in t._entries_of_current():
        d = e["data_file"]
        assert d["partition"]["k"] in ("a", "b", "c")
        assert f"k={d['partition']['k']}" in d["file_path"]
    # snapshot reconstructs the partition column
    got = {(r.k, r.n) for r in t.snapshot().collect()}
    assert got == {("a", 1), ("a", 2), ("b", 3), ("c", 4)}
    # log-only pruning
    cands, skipped = t.partition_pruned_files({"k": "a"})
    assert len(cands) >= 1 and skipped
    assert {r.n for r in t.read_partitions({"k": "a"}).collect()} \
        == {1, 2}
    # append inherits the layout
    t.append(spark.createDataFrame([("b", 9, 9.0)],
                                   "k string, n int, v double"))
    c2, _ = t.partition_pruned_files({"k": "b"})
    assert len(c2) == 2
    assert {r.n for r in t.read_partitions({"k": "b"}).collect()} \
        == {3, 9}
    # delete keeps layout + pruning
    t.delete_where(F.col("n") == 3)
    assert {r.n for r in t.read_partitions({"k": "b"}).collect()} \
        == {9}


def test_optimistic_concurrency(spark, tmp_path, monkeypatch):
    """A concurrent append landing between staging and the metadata
    swap: appends rebase (both writers' rows survive, sequence numbers
    stay monotonic); read-modify-write refuses."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        ConcurrentModificationError,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "cc"),
        _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
    )
    other = _rows(spark, [(50, "other", 5.0)])
    orig = IcebergTable._write_data_files
    state = {"raced": False}

    def staged_then_raced(self, df):
        files = orig(self, df)
        if not state["raced"]:
            state["raced"] = True
            IcebergTable(spark, self.path).append(other)
        return files

    monkeypatch.setattr(
        IcebergTable, "_write_data_files", staged_then_raced
    )
    t.append(_rows(spark, [(60, "mine", 6.0)]))
    ids = {r.id for r in t.snapshot().collect()}
    assert {1, 2, 50, 60} <= ids  # both writers' rows survive
    seqs = [h["sequence_number"] for h in t.history()]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)

    state["raced"] = False
    with pytest.raises(ConcurrentModificationError):
        t.delete_where(F.col("id") == 1)


def test_incremental_scan_appends_only(spark, table):
    s0 = table.metadata()["current-snapshot-id"]
    table.append(_rows(spark, [(4, "d", 4.5)]))
    s1 = table.metadata()["current-snapshot-id"]
    table.append(_rows(spark, [(5, "e", 5.5)]))
    s2 = table.metadata()["current-snapshot-id"]
    # (s0, s2]: both appended batches, not the initial load
    got = {r.id for r in table.incremental_scan(s0).collect()}
    assert got == {4, 5}
    # (s0, s1]: just the first append
    got = {r.id for r in table.incremental_scan(s0, s1).collect()}
    assert got == {4}
    # (s1, s2]: just the second
    got = {r.id for r in table.incremental_scan(s1, s2).collect()}
    assert got == {5}
    # (s2, s2]: empty frame with the table schema
    empty = table.incremental_scan(s2, s2)
    assert empty.count() == 0 and "name" in empty.columns


def test_incremental_scan_refuses_non_append(spark, table):
    s0 = table.metadata()["current-snapshot-id"]
    table.overwrite(_rows(spark, [(9, "z", 9.9)]))
    with pytest.raises(ValueError, match="not.*append|append"):
        table.incremental_scan(s0)


def test_schema_evolution_add_column(spark, table):
    from pyspark.sql import types as TT

    v = table.add_column("grade", TT.StringType())
    meta = table.metadata()
    assert meta["current-schema-id"] == 1
    assert meta["last-column-id"] == 4
    new_field = meta["schemas"][1]["fields"][-1]
    assert new_field == {"id": 4, "name": "grade",
                         "required": False, "type": "string"}
    # old schema retained for prior metadata versions
    assert len(meta["schemas"][0]["fields"]) == 3
    assert v == table.current_version()

    # pre-evolution files read NULL for the new column
    got = {(r.id, r.grade) for r in table.snapshot().collect()}
    assert got == {(1, None), (2, None), (3, None)}

    # writes with the new column work; writes WITHOUT it null-fill
    table.append(spark.createDataFrame(
        [(4, "d", 4.5, "A")],
        "id long, name string, score double, grade string",
    ))
    table.append(_rows(spark, [(5, "e", 5.5)]))  # old shape
    got = {(r.id, r.grade) for r in table.snapshot().collect()}
    assert got == {(1, None), (2, None), (3, None), (4, "A"),
                   (5, None)}

    # unknown columns refuse with guidance
    with pytest.raises(ValueError, match="add_column"):
        table.append(spark.createDataFrame(
            [(9, "x", 1.0, "B", 7)],
            "id long, name string, score double, grade string, extra int",
        ))
    # duplicate add refuses
    with pytest.raises(ValueError, match="already exists"):
        table.add_column("grade", TT.StringType())
    # data skipping on the NEW column once files carry it
    cands, skipped = table.skipped_files("grade", "A", "A")
    assert cands and len(cands) >= 1


def test_iceberg_stream_source(spark, tmp_path):
    """Streaming source over the metadata tree: initial drain delivers
    the created rows, a second drain from the same checkpoint delivers
    ONLY the new append (offset = metadata version), partition columns
    re-injected from manifest entries."""
    from fda_clinical_etl_pipeline_spark.sources.iceberg_stream import (
        IcebergStreamSource,
    )

    spark.dataSource.register(IcebergStreamSource)
    t = IcebergTable.create(
        spark, str(tmp_path / "ist"),
        spark.createDataFrame(
            [("east", 1, "a"), ("west", 2, "b")],
            "rg string, id long, s string",
        ),
        partition_by=["rg"],
    )

    def drain():
        got = []

        def sink(batch_df, _bid):
            got.extend((r.rg, r.id, r.s) for r in batch_df.collect())

        q = (
            spark.readStream.format("iceberg_append_stream")
            .option("path", t.path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ist_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert drain() == [("east", 1, "a"), ("west", 2, "b")]
    t.append(spark.createDataFrame([("east", 3, "c")],
                                   "rg string, id long, s string"))
    assert drain() == [("east", 3, "c")]
    assert drain() == []


def test_iceberg_stream_source_refuses_overwrite_range(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.iceberg_stream import (
        _IcebergStreamReader,
        _current_version,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "isr"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    v0 = _current_version(t.path)
    t.overwrite(spark.createDataFrame([(9, "z")], "id long, s string"))
    v1 = _current_version(t.path)
    r = _IcebergStreamReader(t.path, None, {})
    with pytest.raises(ValueError, match="append"):
        r.partitions({"version": v0}, {"version": v1})


def test_iceberg_batch_source_vanilla_read(spark, tmp_path):
    """A vanilla session reads the table through
    spark.read.format("iceberg_log") only — snapshot, snapshot-id /
    metadata-version time travel, and merge-on-read deletes applied —
    without touching the IcebergTable API (the batch twin of
    DeltaBatchSource)."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.iceberg_stream import (
        IcebergBatchSource,
    )

    spark.dataSource.register(IcebergBatchSource)
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    t = IcebergTable.create(spark, str(tmp_path / "ib"), df)
    s1 = t.metadata()["current-snapshot-id"]
    ts1 = t.metadata()["last-updated-ms"]
    t.delete_where(F.col("id").isin([7, 8]))  # MOR position deletes
    t.append(spark.createDataFrame([(900, 0)], "id long, grp long"))

    path = str(tmp_path / "ib")
    latest = spark.read.format("iceberg_log").option(
        "path", path
    ).load()
    assert latest.count() == 299
    assert latest.where("id = 7").count() == 0
    assert latest.where("id = 900").count() == 1

    asof = spark.read.format("iceberg_log").option(
        "path", path
    ).option("snapshot_id", str(s1)).load()
    assert asof.count() == 300
    assert asof.where("id = 7").count() == 1

    by_ts = spark.read.format("iceberg_log").option(
        "path", path
    ).option("timestamp_ms", str(ts1)).load()
    assert by_ts.count() == 300

    v2 = spark.read.format("iceberg_log").option(
        "path", path
    ).option("version_as_of", "2").load()
    assert v2.count() == 298  # post-delete, pre-append metadata


def test_iceberg_batch_source_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.iceberg_stream import (
        IcebergBatchSource,
    )

    spark.dataSource.register(IcebergBatchSource)
    df = spark.range(0, 40).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd")
        .alias("par"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "ibp"), df, partition_by=["par"]
    )
    t.delete_where(F.col("id") == 0)
    got = spark.read.format("iceberg_log").option(
        "path", t.path
    ).load()
    # identity-partition column re-injected from manifest entries
    assert got.where("par = 'even'").count() == 19
    assert got.where("par = 'odd'").count() == 20


def test_rename_and_drop_column_resolve_by_field_id(spark, tmp_path):
    """Spec rule: the field ID is a column's identity — renames are
    metadata-only and old data files re-resolve by the parquet field
    ids they carry; drops stop requesting the id. Writes, upserts,
    deletes, range reads and the vanilla batch source all follow."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.iceberg_stream import (
        IcebergBatchSource,
    )

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )
    t = IcebergTable.create(spark, str(tmp_path / "evo"), df)
    t.rename_column("val", "label")
    snap = t.snapshot()
    assert snap.columns == ["id", "grp", "label"]
    assert snap.where("id = 7").collect()[0]["label"] == "v7"
    # writes under the new name coexist with old files
    t.append(spark.createDataFrame(
        [(200, 0, "new200")], "id long, grp long, label string"))
    t.drop_column("grp")
    assert t.snapshot().columns == ["id", "label"]
    t.append(spark.createDataFrame(
        [(300, "n300")], "id long, label string"))
    # upsert + MOR delete on the evolved table ("z7" > "v7" wins the
    # string precombine; a losing value is covered elsewhere)
    t.upsert(spark.createDataFrame(
        [(7, "z7")], "id long, label string"),
        key="id", precombine="label")
    assert t.snapshot().where("id = 7").collect()[0]["label"] \
        == "z7"
    t.delete_where(F.col("id") == 8)
    assert t.snapshot().count() == 101
    assert sorted(
        r.id for r in t.read_range("id", 5, 10).collect()
    ) == [5, 6, 7, 9, 10]
    # vanilla-session batch source resolves by field id too
    spark.dataSource.register(IcebergBatchSource)
    ext = spark.read.format("iceberg_log").option(
        "path", t.path).load()
    assert ext.columns == ["id", "label"]
    assert ext.where("id = 7").collect()[0]["label"] == "z7"
    assert ext.count() == 101


def test_rename_drop_guards(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(0, 10).select(
        F.col("id"),
        (F.col("id") % 2 == 0).cast("string").alias("par"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "g"), df, partition_by=["par"]
    )
    with pytest.raises(ValueError, match="partition source"):
        t.rename_column("par", "side")
    with pytest.raises(ValueError, match="partition source"):
        t.drop_column("par")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("id", "par")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("ghost")
    t.drop_column("id")
    with pytest.raises(ValueError, match="last column"):
        t.drop_column("par")


def test_partition_spec_evolution(spark, tmp_path):
    """Partition specs are append-only (spec rule): update moves the
    default spec; older files stay under the spec that wrote them,
    reads are layout-independent (identity values live in the data
    files), per-entry pruning works for BOTH specs' columns, and a
    COW rewrite carries each spec's entries in its own manifest."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.avro_ocf import (
        decode_ocf,
    )

    df = spark.range(0, 100).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd")
        .alias("par"),
        (F.col("id") % 4).alias("reg"),
    )
    t = IcebergTable.create(
        spark, str(tmp_path / "pe"), df, partition_by=["par"]
    )
    t.update_partition_spec(["reg"])
    meta = t.metadata()
    assert meta["default-spec-id"] == 1
    assert len(meta["partition-specs"]) == 2
    # new spec field ids continue from last-partition-id (never reuse)
    assert meta["partition-specs"][1]["fields"][0]["field-id"] == 1001
    t.append(spark.createDataFrame(
        [(200, "even", 0), (201, "odd", 1)],
        "id long, par string, reg long",
    ))
    snap = t.snapshot()
    assert snap.count() == 102
    assert snap.where("id = 3").collect()[0]["par"] == "odd"
    assert snap.where("id = 201").collect()[0]["reg"] == 1
    # pruning by either spec's column, from per-entry partition values
    c_old, s_old = t.partition_pruned_files({"par": "even"})
    c_new, s_new = t.partition_pruned_files({"reg": 0})
    assert c_old and s_old and c_new and s_new
    assert t.read_partitions({"par": "even"}).count() == 50
    # COW rewrite across specs: one manifest per spec in the list
    t.upsert(spark.createDataFrame(
        [(3, "odd", 3)], "id long, par string, reg long"
    ), key="id", precombine="reg", mode="cow")
    snapm = t._snapshot_by(t.metadata(), None)
    _, mans = decode_ocf(open(snapm["manifest-list"], "rb").read())
    assert sorted({m["partition_spec_id"] for m in mans}) == [0, 1]
    # MOR delete on the evolved table
    t.delete_where(F.col("id") == 4)
    assert t.snapshot().count() == 101
    with pytest.raises(ValueError, match="not in schema"):
        t.update_partition_spec(["ghost"])


def test_remove_orphan_files(spark, tmp_path):
    """Orphan cleanup deletes only age-gated files no snapshot (of any
    metadata version) references; live files — including those only
    old snapshots reference — and fresh files survive."""
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    t = IcebergTable.create(
        spark, str(tmp_path / "orph"),
        spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 3).alias("g")
        ),
    )
    t.overwrite(spark.createDataFrame(
        [(500, 0)], "id long, g long"))  # old snapshot's files orphanable? NO — still referenced by snapshot 1
    data_dir = _os.path.join(t.path, "data")
    # a crashed writer's moved-but-uncommitted file + stale staging
    orphan = _os.path.join(data_dir, "deadbeef-crashed.parquet")
    open(orphan, "wb").write(b"x")
    stale_stage = _os.path.join(t.path, ".staging", "dead-writer")
    _os.makedirs(stale_stage)
    open(_os.path.join(stale_stage, "part-0.parquet"), "wb").write(b"y")
    fresh = _os.path.join(data_dir, "deadbeef-inflight.parquet")
    open(fresh, "wb").write(b"z")
    old = _time.time() - 7200
    _os.utime(orphan, (old, old))
    _os.utime(stale_stage, (old, old))

    removed = t.remove_orphan_files(older_than_s=3600)
    assert "deadbeef-crashed.parquet" in " ".join(removed)
    assert ".staging/dead-writer" in removed
    assert _os.path.exists(fresh), "age gate must spare fresh files"
    assert not _os.path.exists(orphan)
    # every snapshot still reads — historical files were spared
    assert t.snapshot().count() == 1
    first_sid = t.history()[0]["snapshot_id"]
    assert t.snapshot(snapshot_id=first_sid).count() == 100


def test_rewrite_manifests(spark, tmp_path):
    """Manifest consolidation: N appends leave N manifests; the
    rewrite folds them into one per partition spec without touching
    data files, and reads (current + time travel) are unchanged."""
    from pyspark.sql import functions as F

    t = IcebergTable.create(
        spark, str(tmp_path / "rm"),
        spark.range(0, 10).select(F.col("id")),
    )
    for i in range(4):
        t.append(spark.createDataFrame(
            [(100 + i,)], "id long"))
    before_files = set(t._files_of_snapshot(
        t._snapshot_by(t.metadata(), None)))
    assert len(t._manifest_list_rows(t.metadata())) == 5
    s_pre = t.metadata()["current-snapshot-id"]

    t.rewrite_manifests()
    rows = t._manifest_list_rows(t.metadata())
    assert len(rows) == 1
    assert rows[0]["existing_files_count"] == len(before_files)
    assert rows[0]["added_files_count"] == 0
    assert set(t._files_of_snapshot(
        t._snapshot_by(t.metadata(), None))) == before_files
    assert t.snapshot().count() == 14
    assert t.snapshot(snapshot_id=s_pre).count() == 14  # time travel
    # MOR deletes still merge after consolidation
    t.delete_where(F.col("id") == 0)
    assert t.snapshot().count() == 13
