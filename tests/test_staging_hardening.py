"""Regression tests for the round-6 table-format hardening:

- staging cleanup is scoped to the writing call's own uuid dir (a
  concurrent writer's in-flight stage under the shared ``.staging``
  parent must survive, including through the 0-row write path);
- per-file stats keying percent-decodes ``input_file_name()`` URIs so
  hive partition values containing characters Spark escapes in dir
  names ('%', space) don't silently lose their rows;
- Iceberg upsert with a merge-key type ``_bound_value`` can't decode
  (date) falls back to conservative no-skip instead of crashing.
"""

from __future__ import annotations

import datetime
import os

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import IcebergTable


def _part_df(spark):
    # 'a b' -> escaped space in the hive dir name; 'p%c' -> literal %
    # that the URI layer encodes again (the double-encoding trap)
    return spark.createDataFrame(
        [("a b", 1, 1.0), ("a b", 2, 2.0), ("p%c", 3, 3.0),
         ("plain", 4, 4.0)],
        "k string, n int, v double",
    )


def test_delta_escaped_partition_values_keep_rows(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _part_df(spark),
        partition_by=["k"],
    )
    got = {(r.k, r.n) for r in t.snapshot().collect()}
    assert got == {("a b", 1), ("a b", 2), ("p%c", 3), ("plain", 4)}
    # every live add action carries real stats (no dropped stats rows)
    import json

    _meta, adds = t._replay(t.latest_version())
    assert adds
    for add in adds.values():
        stats = json.loads(add["stats"])
        assert stats["numRecords"] >= 1


def test_iceberg_escaped_partition_values_keep_rows(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "i"), _part_df(spark),
        partition_by=["k"],
    )
    got = {(r.k, r.n) for r in t.snapshot().collect()}
    assert got == {("a b", 1), ("a b", 2), ("p%c", 3), ("plain", 4)}
    total = sum(
        e["data_file"]["record_count"] for e in t._entries_of_current()
    )
    assert total == 4


def test_delta_staging_cleanup_scoped_to_own_uuid_dir(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "d2"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    # simulate another writer mid-stage under the shared parent
    foreign = os.path.join(t.path, ".staging", "other-writer")
    os.makedirs(foreign)
    marker = os.path.join(foreign, "part-00000-inflight.parquet")
    open(marker, "w").write("x")
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    assert os.path.isfile(marker), (
        "append's staging cleanup deleted a concurrent writer's stage"
    )


def test_iceberg_staging_cleanup_scoped_incl_zero_row_path(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    t = IcebergTable.create(
        spark, str(tmp_path / "i2"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    foreign = os.path.join(t.path, ".staging", "other-writer")
    os.makedirs(foreign)
    marker = os.path.join(foreign, "part-00000-inflight.parquet")
    open(marker, "w").write("x")
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    assert os.path.isfile(marker)
    # the 0-row early-return path (delete-all rewrite) must also spare it
    t.delete_where(F.lit(True))
    assert os.path.isfile(marker), (
        "0-row write path deleted a concurrent writer's stage"
    )


def test_iceberg_upsert_date_key_conservative_no_skip(spark, tmp_path):
    d = datetime.date
    t = IcebergTable.create(
        spark, str(tmp_path / "i3"),
        spark.createDataFrame(
            [(d(2024, 1, 1), "v0", 1), (d(2024, 1, 2), "v0", 1)],
            "day date, ver string, stamp int",
        ),
    )
    t.upsert(
        spark.createDataFrame(
            [(d(2024, 1, 2), "new", 2), (d(2024, 1, 3), "ins", 2)],
            "day date, ver string, stamp int",
        ),
        key="day", precombine="stamp",
    )
    snap = {r.day: r.ver for r in t.snapshot().collect()}
    assert snap == {
        d(2024, 1, 1): "v0", d(2024, 1, 2): "new", d(2024, 1, 3): "ins"
    }


# --- CHECK constraints (Delta writer version 3) ----------------------


def test_delta_check_constraints(spark, tmp_path):
    import json

    import pytest as _pytest
    from pyspark.sql import functions as F

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "ck"),
        spark.createDataFrame(
            [(1, 10, 1)], "id long, qty long, stamp int"
        ),
        key="id", precombine="stamp",
    )
    v = t.add_check_constraint("qty_pos", "qty > 0")
    assert t.constraints() == {"qty_pos": "qty > 0"}
    # protocol bumped to writer version 3 in the constraint commit
    with open(t._commit_file(v)) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] == 3

    # conforming writes pass; violating append/upsert/overwrite refuse
    t.append(spark.createDataFrame([(2, 5, 1)],
                                   "id long, qty long, stamp int"))
    with _pytest.raises(ValueError, match="qty_pos"):
        t.append(spark.createDataFrame([(3, -1, 1)],
                                       "id long, qty long, stamp int"))
    with _pytest.raises(ValueError, match="qty_pos"):
        t.upsert(spark.createDataFrame([(2, 0, 2)],
                                       "id long, qty long, stamp int"))
    with _pytest.raises(ValueError, match="qty_pos"):
        t.overwrite(spark.createDataFrame([(9, -9, 1)],
                                          "id long, qty long, stamp int"))
    # nulls satisfy (ANSI CHECK: only FALSE violates)
    t.append(spark.createDataFrame([(4, None, 1)],
                                   "id long, qty long, stamp int"))
    assert {r.id for r in t.snapshot().collect()} == {1, 2, 4}

    # adding a constraint existing rows violate refuses
    with _pytest.raises(ValueError, match="existing rows"):
        t.add_check_constraint("qty_big", "qty > 100")
    # dropping re-opens the gate
    t.drop_check_constraint("qty_pos")
    t.append(spark.createDataFrame([(5, -5, 1)],
                                   "id long, qty long, stamp int"))
    assert t.constraints() == {}
    # id column untouched by the failed writes
    assert F is not None


# --- Iceberg snapshot expiration -------------------------------------


def test_iceberg_expire_snapshots(spark, tmp_path):
    import os

    t = IcebergTable.create(
        spark, str(tmp_path / "exp"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    # an overwrite makes v0/v1's data unreachable from the new head
    t.overwrite(spark.createDataFrame([(9, "z")], "id long, s string"))
    t.append(spark.createDataFrame([(10, "y")], "id long, s string"))
    assert len(t.history()) == 4
    old_snap = t.history()[0]["snapshot_id"]

    removed = t.expire_snapshots(keep_last=2)
    assert removed, "orphaned pre-overwrite files should be deleted"
    assert all(os.path.exists(p) is False for p in removed)
    assert len(t.history()) == 2
    # current state intact
    assert {r.id for r in t.snapshot().collect()} == {9, 10}
    # expired snapshot no longer time-travelable
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown snapshot"):
        t.snapshot(old_snap)
    # surviving snapshots' shared files untouched: travel to keep[0]
    prev = t.history()[0]["snapshot_id"]
    assert {r.id for r in t.snapshot(prev).collect()} == {9}
    # idempotent when nothing to expire
    assert t.expire_snapshots(keep_last=2) == []


def test_delta_log_cleanup(spark, tmp_path):
    import os

    import pytest as _pytest

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "lc"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    with _pytest.raises(ValueError, match="checkpoint"):
        t.cleanup_log()
    for i in range(2, 5):
        t.append(spark.createDataFrame([(i, "x")], "id long, s string"))
    cp = t.checkpoint()  # at version 3
    t.append(spark.createDataFrame([(9, "y")], "id long, s string"))
    removed = t.cleanup_log()
    assert [os.path.basename(p) for p in removed] == [
        f"{v:020d}.json" for v in range(cp)
    ]
    # replay from the checkpoint still serves current + recent versions
    assert {r.id for r in t.snapshot().collect()} == {1, 2, 3, 4, 9}
    assert {r.id for r in t.snapshot(cp).collect()} == {1, 2, 3, 4}
    # pre-checkpoint time travel is gone, loudly
    with _pytest.raises(ValueError, match="missing commit"):
        t.snapshot(0).collect()


# --- Protocol conformance ---------------------------------------------


def test_delta_refuses_unknown_reader_features(spark, tmp_path):
    """An external writer can upgrade a table to reader features this
    engine does not implement. Ignoring the protocol would return
    WRONG rows — the spec requires refusing. Reader version 3 with
    only ``deletionVectors`` listed IS implemented now, so the gate
    keys on the FEATURE list (unknown feature -> refuse, known set ->
    read), and plain version 2 (column mapping) still refuses."""
    import json

    import pytest as _pytest

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "rv"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    v = t.latest_version() + 1
    with open(t._commit_file(v), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "v2Checkpoint"],
        }}) + "\n")
    with _pytest.raises(ValueError, match="v2Checkpoint"):
        t.snapshot()
    # time travel BEFORE the upgrade still reads fine
    assert {r.id for r in t.snapshot(0).collect()} == {1}
    # a supported feature set at reader 3 is readable
    with open(t._commit_file(v + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
        }}) + "\n")
    assert {r.id for r in t.snapshot().collect()} == {1}
    # reader version 2 (column mapping) is implemented now — a table
    # upgraded to it stays readable (mode "id" refusal is pinned in
    # test_delta_column_mapping); versions beyond 3 still refuse
    t2 = DeltaProtocolTable.create(
        spark, str(tmp_path / "rv2"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    with open(t2._commit_file(t2.latest_version() + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5,
        }}) + "\n")
    assert {r.id for r in t2.snapshot().collect()} == {1}
    with open(t2._commit_file(t2.latest_version() + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 4, "minWriterVersion": 9,
        }}) + "\n")
    with _pytest.raises(ValueError, match="minReaderVersion 4"):
        t2.snapshot()


def test_delta_replay_ignores_unknown_actions(spark, tmp_path):
    """Commits may carry action types this reader does not know
    (commitInfo variants, future metadata side-cars with reader
    version unchanged) — replay must pass over them, not crash."""
    import json

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "ua"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    v = t.latest_version() + 1
    with open(t._commit_file(v), "w") as f:
        f.write(json.dumps({"someFutureAction": {"x": 1}}) + "\n")
        f.write(json.dumps({"commitInfo": {"operation": "FUTURE"}})
                + "\n")
    assert {r.id for r in t.snapshot().collect()} == {1}
    assert t.latest_version() == v


def test_delta_vacuum_partitioned_and_stale_staging(spark, tmp_path):
    import os
    import time as _time

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "vac"), _part_df(spark),
        partition_by=["k"],
    )
    # overwrite orphans the original partitioned files
    t.overwrite(_part_df(spark))
    # one stale staging dir (crashed writer) + one fresh (live writer)
    stale = os.path.join(t.path, ".staging", "stale-writer")
    fresh = os.path.join(t.path, ".staging", "live-writer")
    os.makedirs(stale); os.makedirs(fresh)
    old = _time.time() - 7200
    os.utime(stale, (old, old))

    deleted = t.vacuum()
    # orphaned partitioned data files swept; snapshot intact
    assert any("/" in d and d.endswith(".parquet") for d in deleted)
    assert ".staging/stale-writer" in deleted
    assert os.path.isdir(fresh), "live stage must survive vacuum"
    got = {(r.k, r.n) for r in t.snapshot().collect()}
    assert got == {("a b", 1), ("a b", 2), ("p%c", 3), ("plain", 4)}
    # change-data and log untouched by design
    assert os.path.isdir(os.path.join(t.path, "_delta_log"))


def test_delta_refuses_unknown_writer_features(spark, tmp_path):
    """Write-side protocol gate: committing to a table whose protocol
    lists writer features this writer does not implement could break
    its invariants — the spec requires refusing. Known feature sets
    (everything this twin implements) keep writing."""
    import json

    import pytest as _pytest

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "wf"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    with open(t._commit_file(t.latest_version() + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "readerFeatures": [],
            "writerFeatures": ["deletionVectors", "futureFeatureX"],
        }}) + "\n")
    with _pytest.raises(ValueError, match="futureFeatureX"):
        t.append(spark.createDataFrame([(2, "b")],
                                       "id long, s string"))
    # plain high writer version refuses too
    t2 = DeltaProtocolTable.create(
        spark, str(tmp_path / "wv"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    with open(t2._commit_file(t2.latest_version() + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 8,
        }}) + "\n")
    with _pytest.raises(ValueError, match="minWriterVersion 8"):
        t2.append(spark.createDataFrame([(2, "b")],
                                        "id long, s string"))
    # a fully-supported feature table keeps writing
    t3 = DeltaProtocolTable.create(
        spark, str(tmp_path / "ok"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
        key="id", precombine="s",
    )
    t3.delete_where(__import__(
        "pyspark.sql.functions", fromlist=["col"]
    ).col("id") < 0)  # no-op but exercises the gate
    t3.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    assert t3.snapshot().count() == 2


def test_delta_legacy_writer_rules_enforced(spark, tmp_path):
    """The legacy writer features this writer claims must actually be
    enforced: delta.appendOnly refuses mutations, column invariants
    refuse violating batches, generated-column values must match
    their expression."""
    import json

    import pytest as _pytest
    from pyspark.sql import functions as F

    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "lw"),
        spark.createDataFrame(
            [(1, 10, 20)], "id long, qty long, twice long"
        ),
        key="id", precombine="qty",
    )
    meta, _ = t._replay(t.latest_version())
    schema = json.loads(meta["schemaString"])
    for f in schema["fields"]:
        if f["name"] == "qty":
            f["metadata"] = {"delta.invariants": json.dumps(
                {"expression": {"expression": "qty >= 0"}}
            )}
        if f["name"] == "twice":
            f["metadata"] = {
                "delta.generationExpression": "id * 2"
            }
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(schema)
    new_meta["configuration"] = {"delta.appendOnly": "true"}
    with open(t._commit_file(t.latest_version() + 1), "w") as f:
        f.write(json.dumps({"metaData": new_meta}) + "\n")

    # appendOnly: mutations refuse, appends pass
    with _pytest.raises(ValueError, match="appendOnly"):
        t.delete_where(F.col("id") == 1)
    with _pytest.raises(ValueError, match="appendOnly"):
        t.overwrite(spark.createDataFrame(
            [(9, 1, 18)], "id long, qty long, twice long"))
    with _pytest.raises(ValueError, match="appendOnly"):
        t.upsert(spark.createDataFrame(
            [(1, 11, 2)], "id long, qty long, twice long"))
    t.append(spark.createDataFrame(
        [(2, 5, 4)], "id long, qty long, twice long"))
    # invariant: qty >= 0
    with _pytest.raises(ValueError, match="invariant\\(qty\\)"):
        t.append(spark.createDataFrame(
            [(3, -1, 6)], "id long, qty long, twice long"))
    # generated column: twice must equal id * 2
    with _pytest.raises(ValueError, match="generated\\(twice\\)"):
        t.append(spark.createDataFrame(
            [(4, 1, 9)], "id long, qty long, twice long"))
    t.append(spark.createDataFrame(
        [(4, 1, 8)], "id long, qty long, twice long"))
    assert t.snapshot().count() == 3


def test_delta_legacy_minwriterversion_feature_gate(spark, tmp_path):
    """Legacy minWriterVersion numbers IMPLY feature sets (spec's
    version->feature table): mwv 2-6 imply only features this writer
    enforces (identityColumns joined the supported set in r14, so v6
    tables write too — the identity behavior itself is pinned in
    test_identity_columns); an out-of-range mwv (0) is a corrupt
    protocol action -> refuse."""
    import json

    import pytest as _pytest

    def _with_protocol(name, mwv):
        t = DeltaProtocolTable.create(
            spark, str(tmp_path / name),
            spark.createDataFrame([(1, "a")], "id long, s string"),
        )
        with open(t._commit_file(t.latest_version() + 1), "w") as f:
            f.write(json.dumps({"protocol": {
                "minReaderVersion": 1, "minWriterVersion": mwv,
            }}) + "\n")
        return t

    more = spark.createDataFrame([(2, "b")], "id long, s string")

    # v2-v6 imply only supported features: appends succeed
    # (v6 = identityColumns, implemented since r14; this table has no
    # identity metadata, so the write is a plain append)
    for mwv in (2, 3, 4, 5, 6):
        t = _with_protocol(f"v{mwv}", mwv)
        t.append(more)
        assert t.snapshot().count() == 2

    # mwv outside 1..7 entirely (malformed protocol) refuses rather
    # than defaulting to "no features required"
    with _pytest.raises(ValueError, match="malformed protocol"):
        _with_protocol("v0", 0).append(more)
