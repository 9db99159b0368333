"""Hudi clean action (KEEP_LATEST_COMMITS): unreachable file-slice
versions are deleted, reachable ones survive, answers never move.

The reference keeps every file version forever
(hudi/register_hudi.py upserts only — no lifecycle management); clean
is the twin's storage bound: O(live data + retained history). The
invariants pinned here:

- per file group, bases newer than the boundary commit all survive,
  plus the single newest base at-or-below it (it serves
  as-of == boundary); everything older is unreachable and goes;
- log files follow their base file;
- a group replaced by clustering at-or-before the boundary loses
  every file;
- files named with an INCOMPLETE instant are rollback's to delete,
  never clean's;
- snapshot and retained time travel are byte-identical across a
  clean; travel below the horizon refuses with a clear error;
- the timeline records <instant>.clean.requested (plan) / .inflight /
  .clean (HoodieCleanMetadata with earliestCommitToRetain and
  successDeleteFiles).
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.hudi_table import (
    HudiTable,
)

I1, I2, I3, I4, I5 = (
    "20240101000000000",
    "20240102000000000",
    "20240103000000000",
    "20240104000000000",
    "20240105000000000",
)

SCHEMA = "k int, ver int, bal double"


def _rows(i0, i1, ver, bump=0.0):
    return [(i, ver, float(i) + bump) for i in range(i0, i1)]


def _bases(root):
    """{instant: [base file names]} for every base parquet on disk."""
    out = {}
    for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True):
        fn = os.path.basename(p)
        if fn.startswith("."):
            continue
        inst = fn[: -len(".parquet")].rsplit("_", 1)[-1]
        out.setdefault(inst, []).append(fn)
    return out


def _logs(root):
    return [
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "**", ".*.log.*"),
                           recursive=True)
    ]


def _state(df):
    return sorted(
        (r["k"], r["ver"], r["bal"], r["_hoodie_commit_time"])
        for r in df.collect()
    )


def test_cow_clean_removes_unreachable_base_versions(spark, tmp_path):
    root = str(tmp_path / "cow")
    t = HudiTable.create(spark, root, "cow_tbl", "k", "ver")
    for ver, inst in enumerate((I1, I2, I3, I4), start=1):
        t.upsert(
            spark.createDataFrame(_rows(0, 40, ver), SCHEMA),
            instant=inst, insert_groups=2,
        )
    before = _state(t.snapshot())
    boundary_state = _state(t.snapshot(as_of_instant=I3))
    assert set(_bases(root)) == {I1, I2, I3, I4}

    res = t.clean(retain_commits=2)  # boundary = I3
    assert res is not None and res["boundary"] == I3
    # I1 and I2 bases are unreachable (I3 exists for every group)
    assert set(_bases(root)) == {I3, I4}
    assert len(res["files_deleted"]) == 4  # 2 groups x 2 instants
    # answers identical; boundary travel still serves
    assert _state(t.snapshot()) == before
    assert _state(t.snapshot(as_of_instant=I3)) == boundary_state
    # below the horizon: refused, by both as-of forms
    with pytest.raises(ValueError, match="cleaner horizon"):
        t.snapshot(as_of_instant=I2)
    with pytest.raises(ValueError, match="cleaner horizon"):
        t.snapshot(as_of_instant="2024-01-01 00:00:00")
    # timeline action shape
    cleans = glob.glob(os.path.join(root, ".hoodie", "*.clean"))
    assert len(cleans) == 1
    meta = json.load(open(cleans[0]))
    assert meta["earliestCommitToRetain"] == I3
    assert meta["totalFilesDeleted"] == 4
    files = {
        fn
        for pm in meta["partitionMetadata"].values()
        for fn in pm["successDeleteFiles"]
    }
    assert files == {os.path.basename(p)
                     for p in res["files_deleted"]}
    plan = json.load(open(cleans[0] + ".requested"))
    assert plan["policy"] == "KEEP_LATEST_COMMITS"
    assert plan["earliestInstantToRetain"]["timestamp"] == I3
    # a second clean with nothing newly unreachable is a no-op
    assert t.clean(retain_commits=2) is None


def test_untouched_group_keeps_its_boundary_slice(spark, tmp_path):
    """A file group NOT rewritten since the boundary keeps its newest
    at-or-below base — deleting it would break as-of == boundary."""
    root = str(tmp_path / "cold")
    t = HudiTable.create(spark, root, "cold_tbl", "k", "ver",
                         partition_field="pf")
    pschema = SCHEMA + ", pf string"

    def pdf(rows):
        return spark.createDataFrame(
            [(*r, "hot" if r[0] < 20 else "cold") for r in rows],
            pschema,
        )

    t.upsert(pdf(_rows(0, 40, 1)), instant=I1, insert_groups=1)
    # only the hot partition rewrites at I2/I3/I4 — cold stays at I1
    for ver, inst in enumerate((I2, I3, I4), start=2):
        t.upsert(pdf(_rows(0, 20, ver, bump=0.5)), instant=inst)
    before = _state(t.snapshot())
    res = t.clean(retain_commits=2)  # boundary = I3
    assert res is not None
    by_inst = _bases(root)
    # the cold group's I1 base survives (it IS the boundary slice);
    # the hot group's I1/I2 bases are gone
    assert len(by_inst[I1]) == 1
    assert I2 not in by_inst
    assert _state(t.snapshot()) == before
    assert len(_state(t.snapshot(as_of_instant=I3))) == 40


def test_mor_clean_after_compaction(spark, tmp_path):
    root = str(tmp_path / "mor")
    t = HudiTable.create(spark, root, "mor_tbl", "k", "ver",
                         table_type="MERGE_ON_READ")
    t.upsert(spark.createDataFrame(_rows(0, 30, 1), SCHEMA),
             instant=I1, insert_groups=1)
    t.upsert(spark.createDataFrame(_rows(0, 10, 2, bump=0.25), SCHEMA),
             instant=I2)
    t.upsert(spark.createDataFrame(_rows(5, 15, 3, bump=0.5), SCHEMA),
             instant=I3)
    t.compact(instant=I4)
    t.upsert(spark.createDataFrame(_rows(20, 25, 4, bump=0.75), SCHEMA),
             instant=I5)
    before = _state(t.snapshot())
    assert _logs(root), "precondition: post-compaction log exists"

    res = t.clean(retain_commits=2)  # boundary = I4 (the compaction)
    assert res is not None and res["boundary"] == I4
    # pre-compaction base + its logs are gone; compacted base + the
    # I5 log survive
    by_inst = _bases(root)
    assert I1 not in by_inst and I4 in by_inst
    remaining_logs = _logs(root)
    assert remaining_logs and all(
        f"_{I4}.log." in fn for fn in remaining_logs
    )
    deleted_logs = [p for p in res["files_deleted"] if ".log." in p]
    assert deleted_logs and all(
        f"_{I1}.log." in os.path.basename(p) for p in deleted_logs
    )
    assert _state(t.snapshot()) == before
    assert _state(t.snapshot(as_of_instant=I4)) == _state(
        t.snapshot(as_of_instant=I4)
    )
    with pytest.raises(ValueError, match="cleaner horizon"):
        t.snapshot(as_of_instant=I3)


def test_clean_noop_below_retention(spark, tmp_path):
    root = str(tmp_path / "np")
    t = HudiTable.create(spark, root, "np_tbl", "k", "ver")
    t.upsert(spark.createDataFrame(_rows(0, 10, 1), SCHEMA),
             instant=I1)
    t.upsert(spark.createDataFrame(_rows(0, 10, 2), SCHEMA),
             instant=I2)
    assert t.clean(retain_commits=2) is None
    assert not glob.glob(os.path.join(root, ".hoodie", "*.clean*"))
    with pytest.raises(ValueError):
        t.clean(retain_commits=0)


def test_clean_skips_incomplete_instant_files(spark, tmp_path):
    """A crashed writer's orphan base (inflight marker, no commit) is
    rollback's to reclaim — clean must neither delete it nor let it
    shadow a completed slice in its keep-newest choice."""
    root = str(tmp_path / "crash")
    t = HudiTable.create(spark, root, "crash_tbl", "k", "ver")
    for ver, inst in enumerate((I1, I2, I3, I4), start=1):
        t.upsert(spark.createDataFrame(_rows(0, 10, ver), SCHEMA),
                 instant=inst, insert_groups=1)
    # fabricate an orphan: a base named with an incomplete instant
    # between I1 and I2, for the same file group
    fid = next(iter(t.file_slices().values()))["fileId"]
    orphan_inst = "20240101120000000"
    orphan = os.path.join(root, f"{fid}_0-0-0_{orphan_inst}.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a real parquet")
    open(os.path.join(root, ".hoodie", f"{orphan_inst}.inflight"),
         "x").close()

    res = t.clean(retain_commits=2)
    assert res is not None
    assert os.path.exists(orphan), "incomplete file is rollback's job"
    assert not any(orphan_inst in p for p in res["files_deleted"])
    rb = t.rollback_incomplete()
    assert any(
        os.path.basename(orphan) in d
        for r in rb for d in r["files_deleted"]
    )
    assert not os.path.exists(orphan)


def test_incremental_read_batch_query(spark, tmp_path):
    """hoodie.datasource.query.type=incremental as a batch API:
    latest state of records last written in (begin, end], planning
    pruned to the touched file slices."""
    root = str(tmp_path / "inc")
    t = HudiTable.create(spark, root, "inc_tbl", "k", "ver",
                         partition_field="pf")
    pschema = SCHEMA + ", pf string"

    def pdf(rows):
        return spark.createDataFrame(
            [(*r, "hot" if r[0] < 20 else "cold") for r in rows],
            pschema,
        )

    t.upsert(pdf(_rows(0, 40, 1)), instant=I1, insert_groups=1)
    t.upsert(pdf(_rows(0, 5, 2, bump=0.5)), instant=I2)
    t.upsert(pdf(_rows(10, 15, 3, bump=0.9)), instant=I3)
    t.delete_where(F.col("k").isin(18, 19), instant=I4)

    inc = t.incremental_read(begin_instant=I1)
    got = {r["k"]: (r["ver"], r["_hoodie_commit_time"])
           for r in inc.collect()}
    # updated keys surface once with their newest version; deleted
    # keys not at all; untouched keys not at all
    assert set(got) == set(range(0, 5)) | set(range(10, 15))
    assert got[0] == (2, I2) and got[12] == (3, I3)
    # planning never opened the cold partition's base file
    assert all("cold" not in f for f in inc.inputFiles())
    # bounded range
    mid = t.incremental_read(begin_instant=I2, end_instant=I3)
    assert sorted(r["k"] for r in mid.collect()) == list(range(10, 15))
    # begin="" is the full snapshot (minus deletes)
    assert t.incremental_read().count() == 38
    # MOR: same semantics through the log merge
    root2 = str(tmp_path / "incmor")
    m = HudiTable.create(spark, root2, "incm_tbl", "k", "ver",
                         table_type="MERGE_ON_READ")
    m.upsert(spark.createDataFrame(_rows(0, 30, 1), SCHEMA),
             instant=I1, insert_groups=1)
    m.upsert(spark.createDataFrame(_rows(0, 10, 2, bump=0.5), SCHEMA),
             instant=I2)
    m.delete_where(F.col("k") == 3, instant=I3)
    inc2 = m.incremental_read(begin_instant=I1)
    got2 = sorted(r["k"] for r in inc2.collect())
    assert got2 == [0, 1, 2, 4, 5, 6, 7, 8, 9]


def test_clean_after_cluster_drops_replaced_groups(spark, tmp_path):
    root = str(tmp_path / "cl")
    t = HudiTable.create(spark, root, "cl_tbl", "k", "ver")
    t.upsert(spark.createDataFrame(_rows(0, 40, 1), SCHEMA),
             instant=I1, insert_groups=4)
    pre_fids = {fid for _pp, fid in t.file_slices()}
    t.cluster(instant=I2, target_file_groups=1)
    t.upsert(spark.createDataFrame(_rows(0, 10, 2, bump=0.5), SCHEMA),
             instant=I3)
    t.upsert(spark.createDataFrame(_rows(10, 20, 3, bump=0.5), SCHEMA),
             instant=I4)
    before = _state(t.snapshot())

    res = t.clean(retain_commits=2)  # boundary = I3 > replace at I2
    assert res is not None
    # every file of the four replaced groups is gone
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                           recursive=True)
    }
    assert not any(
        fn.rsplit("_", 2)[0] in pre_fids for fn in on_disk
    )
    assert _state(t.snapshot()) == before
