"""Write-side Hudi CDC blocks (RFC-51, r10 verdict task 5).

A cdc-enabled table records its changes at write time — COW commits as
data_before_after row images in standalone ``-cdc`` log files, MOR
commits as op_key_only records inline in their log files — and
``changelog()`` consumes the recorded blocks; ``use_recorded=False``
forces the original timeline+slice derivation. The contract under test:
the two paths agree row-for-row on every write shape (insert, winning
and losing updates, delete_keys, single-instant MERGE with tombstone +
re-insert), and the data_before_after replay touches NO table state.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources import hudi_log
from fda_clinical_etl_pipeline_spark.sources.hudi_table import HudiTable


def _build(spark, root: str, table_type: str, cdc: bool = True) -> HudiTable:
    """Every write shape in one timeline: plain insert, winning update,
    LOSING update (precombine below stored), delete_keys, and a MERGE
    that tombstones + replaces one key and inserts a fresh one."""
    t = HudiTable.create(
        spark, root, "cdcprobe", "k", "ver",
        table_type=table_type, cdc_enabled=cdc,
    )
    df = spark.createDataFrame(
        [(i, 1, f"v{i}") for i in range(1, 11)],
        "k int, ver int, val string",
    )
    t.upsert(df, instant="20240101000000000")
    t.upsert(
        spark.createDataFrame(
            [(1, 2, "u1"), (2, 2, "u2"), (4, 0, "loser")],
            "k int, ver int, val string",
        ),
        instant="20240102000000000",
    )
    t.delete_keys(
        spark.createDataFrame([(5,), (6,)], "k int"),
        instant="20240103000000000",
    )
    t.merge(
        spark.createDataFrame(
            [(7, 2, "m7"), (11, 1, "m11")], "k int, ver int, val string"
        ),
        on="k", when_matched_update="all", when_not_matched_insert="all",
        instant="20240104000000000",
    )
    return t


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_recorded_changelog_equals_derived(spark, tmp_path, table_type):
    t = _build(spark, str(tmp_path / table_type), table_type)
    rec = t.changelog(from_instant="20240101000000000")
    der = t.changelog(from_instant="20240101000000000",
                      use_recorded=False)
    assert rec.columns == der.columns
    assert sorted(map(tuple, rec.collect())) == \
        sorted(map(tuple, der.collect()))
    # the losing update (k=4, ver 0 < stored 1) must appear in NEITHER:
    # nothing changed for that key
    assert rec.filter(F.col("k") == 4).count() == 0


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_every_commit_records_cdc(spark, tmp_path, table_type):
    t = _build(spark, str(tmp_path / table_type), table_type)
    want_mode = (
        hudi_log.CDC_DATA_BEFORE_AFTER
        if table_type == "COPY_ON_WRITE" else hudi_log.CDC_OP_KEY_ONLY
    )
    assert t.cdc_enabled and t.cdc_mode == want_mode
    for c in t.commits():
        meta = t.commit_metadata(c)
        assert meta["extraMetadata"][
            "hoodie.table.cdc.recorded"] == want_mode
        rels = [
            rel
            for sts in meta["partitionToWriteStats"].values()
            for st in sts for rel in (st.get("cdcStats") or {})
        ]
        assert rels, f"commit {c} recorded no cdc data"
        for rel in rels:
            blocks = hudi_log.read_log_file(os.path.join(t.path, rel))
            assert any(b["type"] == "cdc" for b in blocks)


def test_cow_replay_reads_no_table_state(spark, tmp_path):
    """data_before_after replay must come purely from the recorded
    blocks: the changelog plan may not scan ANY parquet — base files
    included — only the mapInPandas over cdc files + from_json."""
    t = _build(spark, str(tmp_path / "cow"), "COPY_ON_WRITE")
    df = t.changelog(from_instant="20240101000000000")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Scan parquet" not in plan
    assert ".parquet" not in plan


def test_cdc_files_invisible_to_snapshot_planning(spark, tmp_path):
    """COW ``-cdc`` files live next to base files but are recorded only
    in cdcStats — file_slices and the snapshot must not see them, and
    the snapshot must equal a cdc-disabled twin's."""
    t = _build(spark, str(tmp_path / "cdc"), "COPY_ON_WRITE")
    plain = _build(spark, str(tmp_path / "plain"), "COPY_ON_WRITE",
                   cdc=False)
    for s in t.file_slices().values():
        assert "-cdc" not in s["path"]
        assert not s["_logs"]
    assert sorted(map(tuple, t.snapshot().collect())) == \
        sorted(map(tuple, plain.snapshot().collect()))


def test_pre_cdc_commits_fall_back_to_derivation(spark, tmp_path):
    """A table whose early commits predate cdc (no recorded marker)
    must serve a window spanning both eras: derivation for the old
    commits, recorded blocks for the new — and agree with a full
    derivation."""
    root = str(tmp_path / "mixed")
    t = HudiTable.create(spark, root, "mixed", "k", "ver",
                         cdc_enabled=False)
    t.upsert(
        spark.createDataFrame([(1, 1, "a"), (2, 1, "b")],
                              "k int, ver int, val string"),
        instant="20240101000000000",
    )
    # enable cdc in-place (property edit, as real table upgrades do)
    props_path = os.path.join(t.hoodie_dir, "hoodie.properties")
    with open(props_path, "a") as f:
        f.write("hoodie.table.cdc.enabled=true\n")
        f.write("hoodie.table.cdc.supplemental.logging.mode="
                "data_before_after\n")
    t.upsert(
        spark.createDataFrame([(1, 2, "a2"), (3, 1, "c")],
                              "k int, ver int, val string"),
        instant="20240102000000000",
    )
    rec = t.changelog()  # whole history, mixed eras
    der = t.changelog(use_recorded=False)
    assert sorted(map(tuple, rec.collect())) == \
        sorted(map(tuple, der.collect()))
    metas = [t.commit_metadata(c) for c in t.commits()]
    markers = sorted(
        m["extraMetadata"].get("hoodie.table.cdc.recorded") or "-"
        for m in metas
    )
    assert markers == ["-", "data_before_after"]


def test_rollback_deletes_orphan_cdc_files(spark, tmp_path):
    """A failed cdc-enabled commit can leave -cdc files behind (they
    are written before the completed-instant publish); rollback must
    delete them like any other orphan of the incomplete instant."""
    t = _build(spark, str(tmp_path / "rb"), "COPY_ON_WRITE")
    bad = "20240199000000000"
    open(os.path.join(t.hoodie_dir, f"{bad}.commit.requested"),
         "x").close()
    open(os.path.join(t.hoodie_dir, f"{bad}.inflight"), "x").close()
    orphan = os.path.join(
        t.path,
        hudi_log.log_file_name("deadbeef-0", bad, 1, f"0-0-{bad}")
        + "-cdc",
    )
    with open(orphan, "wb") as f:
        f.write(hudi_log.cdc_block(
            [{"op": "i", "recordKey": "zombie"}], bad,
            hudi_log.CDC_OP_KEY_ONLY,
        ))
    before = t.changelog(from_instant="20240101000000000").count()
    rolled = t.rollback_incomplete()
    assert not os.path.exists(orphan)
    assert any(r["instant"] == bad for r in rolled)
    assert any(
        f.endswith("-cdc") for r in rolled for f in r["files_deleted"]
    )
    # the orphan never influenced the changelog (only cdcStats-listed
    # files are read), and rollback must not change that
    assert t.changelog(
        from_instant="20240101000000000"
    ).count() == before


def test_changelog_unchanged_across_compaction(spark, tmp_path):
    """MOR compaction is data-identical: a cdc window spanning a
    compact() must emit the same rows after it, recorded and derived
    alike, and the compaction instant itself must emit nothing."""
    t = _build(spark, str(tmp_path / "cp"), "MERGE_ON_READ")
    pre = sorted(map(tuple, t.changelog(
        from_instant="20240101000000000").collect()))
    t.compact(instant="20240105000000000")
    post_rec = sorted(map(tuple, t.changelog(
        from_instant="20240101000000000").collect()))
    post_der = sorted(map(tuple, t.changelog(
        from_instant="20240101000000000", use_recorded=False
    ).collect()))
    assert post_rec == pre
    assert post_der == pre


# ------------- property test: recorded == derived on random histories
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# an op = upsert of {key: (ver, val)} or delete of a key subset; small
# key space forces update/delete/re-insert collisions
_upsert = st.dictionaries(
    st.integers(min_value=0, max_value=7),   # key
    st.tuples(st.integers(min_value=0, max_value=5),   # ver (ties!)
              st.integers(min_value=0, max_value=99)),  # val
    min_size=1, max_size=5,
).map(lambda d: ("upsert", d))
_delete = st.sets(
    st.integers(min_value=0, max_value=7), min_size=1, max_size=3
).map(lambda ks: ("delete", ks))
_history = st.lists(st.one_of(_upsert, _delete), min_size=2, max_size=4)


@settings(max_examples=4, deadline=None)
@given(history=_history)
@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_recorded_equals_derived_on_random_histories(
    spark, tmp_path_factory, table_type, history
):
    """The r10 verdict asked for recorded-vs-derived equality to be
    PROPERTY-tested: arbitrary interleavings of precombine-contested
    upserts and deletes must produce identical changelogs from the
    recorded CDC blocks and from the timeline+slice derivation — on
    both table types."""
    base = tmp_path_factory.mktemp(f"cdcprop_{table_type}")
    t = HudiTable.create(
        spark, str(base / "t"), "cdcprop", "k", "ver",
        table_type=table_type, cdc_enabled=True,
    )
    inst = 20240101000000000
    t.upsert(
        spark.createDataFrame(
            [(i, 1, i * 10) for i in range(8)], "k int, ver int, val int"
        ),
        instant=str(inst),
    )
    for op, payload in history:
        inst += 1000000000
        if op == "upsert":
            t.upsert(
                spark.createDataFrame(
                    [(k, v[0], v[1]) for k, v in sorted(payload.items())],
                    "k int, ver int, val int",
                ),
                instant=str(inst),
            )
        else:
            done = t.delete_keys(
                spark.createDataFrame(
                    [(k,) for k in sorted(payload)], "k int"
                ),
                instant=str(inst),
            )
            if done is None:
                inst -= 1000000000  # no-op delete: instant unused
    rec = sorted(map(tuple, t.changelog().collect()))
    der = sorted(map(tuple, t.changelog(use_recorded=False).collect()))
    assert rec == der
