"""Iceberg changelog scan — the CDF twin of Delta table_changes:
row-level insert/delete deltas per snapshot, resolved from manifest
diffs, with replace snapshots (compaction) invisible."""

from __future__ import annotations

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)

SCHEMA = "k long, bal double, seg string"


def _mk(spark, path, n=40):
    df = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 == 0 else "b") for i in range(n)],
        SCHEMA,
    ).coalesce(1)
    return IcebergTable.create(spark, str(path), df)


def _by_type(ch):
    out = {}
    for r in ch.collect():
        out.setdefault(r["_change_type"], []).append(
            (r["k"], r["bal"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_changelog_append_and_mor_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    s0 = t.metadata()["current-snapshot-id"]
    t.append(spark.createDataFrame([(100, 1.0, "z")], SCHEMA))
    t.delete_where(F.col("k") == 3, mode="mor")  # position delete
    t.equality_delete(
        spark.createDataFrame([(4,)], "k long"), ["k"]
    )
    ch = t.changelog_scan(from_snapshot_id=s0)
    got = _by_type(ch)
    assert got["insert"] == [(100, 1.0)]
    assert got["delete"] == [(3, 3.0), (4, 4.0)]
    # ordinals follow commit order; snapshot ids attribute changes
    ords = {
        r["_change_type"]: r["_change_ordinal"]
        for r in ch.collect()
    }
    assert ords["insert"] < ords["delete"]


def test_changelog_merge_emits_row_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    s0 = t.metadata()["current-snapshot-id"]
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
    got = _by_type(t.changelog_scan(from_snapshot_id=s0))
    # update = delete(old) + insert(new); plain delete and insert ride
    assert got["insert"] == [(0, 999.0), (500, 5.0)]
    assert got["delete"] == [(0, 0.0), (1, 1.0)]


def test_changelog_replace_is_invisible(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice")
    t.append(spark.createDataFrame([(200, 2.0, "z")], SCHEMA)
             .coalesce(1))
    s1 = t.metadata()["current-snapshot-id"]
    t.rewrite_data_files()  # bin-pack: data unchanged
    ch = t.changelog_scan(from_snapshot_id=s1)
    assert ch.count() == 0
    # and a change AFTER the compaction still reports
    t.delete_where(F.col("k") == 5, mode="mor")
    got = _by_type(t.changelog_scan(from_snapshot_id=s1))
    assert got == {"delete": [(5, 5.0)]}


def test_changelog_full_history_and_window(spark, tmp_path):
    t = _mk(spark, tmp_path / "ice", n=10)
    s0 = t.metadata()["current-snapshot-id"]
    t.append(spark.createDataFrame([(50, 5.0, "z")], SCHEMA))
    s1 = t.metadata()["current-snapshot-id"]
    t.append(spark.createDataFrame([(60, 6.0, "z")], SCHEMA))
    # full history (no from): the create's rows are inserts too
    full = _by_type(t.changelog_scan())
    assert len(full["insert"]) == 12
    # bounded window (s0, s1]: only the first append
    got = _by_type(t.changelog_scan(
        from_snapshot_id=s0, to_snapshot_id=s1
    ))
    assert got == {"insert": [(50, 5.0)]}


def test_changelog_kept_scan_narrowed_to_delete_targets(
    spark, tmp_path
):
    """Scale guard: a tiny CDC delete against one file must NOT
    rescan every carried file in the changelog — position deletes
    prune by the delete file's file_path footer bounds, equality
    deletes by value-bounds intersection with manifest bounds."""
    df = spark.createDataFrame(
        [(i, float(i), "a") for i in range(400)], SCHEMA
    ).repartitionByRange(8, "k")
    t = IcebergTable(spark, str(tmp_path / "ice"))
    t = IcebergTable.create(spark, str(tmp_path / "ice"), df)
    s0 = t.metadata()["current-snapshot-id"]
    t.delete_where(F.col("k") == 7, mode="mor")  # hits ONE file

    meta = t.metadata()
    fields = {
        f["id"]: f
        for f in meta["schemas"][meta["current-schema-id"]]["fields"]
    }
    snap = t._snapshot_by(meta, None)
    cur = {
        e["data_file"]["file_path"]: e
        for e in t._entries_of_snapshot(snap)
    }
    kept = sorted(cur)
    new_pos = t._delete_files_of_snapshot(snap)
    narrowed = t._narrow_kept_to_delete_targets(
        kept, cur, new_pos, [], fields
    )
    assert len(kept) == 8 and len(narrowed) == 1

    # equality deletes: value-bounds intersection — only the one
    # range-disjoint file that can hold k=11 stays a candidate
    t.append(spark.createDataFrame([(900, 9.0, "z")], SCHEMA))
    t.equality_delete(
        spark.createDataFrame([(11,)], "k long"), ["k"]
    )
    meta2 = t.metadata()
    snap2 = t._snapshot_by(meta2, None)
    cur2 = {
        e["data_file"]["file_path"]: e
        for e in t._entries_of_snapshot(snap2)
    }
    eqs = t._equality_deletes_of_snapshot(snap2)
    narrowed2 = t._narrow_kept_to_delete_targets(
        sorted(cur2), cur2, [], eqs, fields
    )
    assert len(cur2) == 9
    assert len(narrowed2) == 1  # bounds prune 8 of 9 incl. the append

    # end-to-end: the narrowed changelog still reports exact deltas
    got = _by_type(t.changelog_scan(from_snapshot_id=s0))
    assert got == {
        "insert": [(900, 9.0)],
        "delete": [(7, 7.0), (11, 11.0)],
    }


def test_inline_delete_predicates_match_join_path(spark, tmp_path):
    """r15: provably tiny delete sets apply as driver-inlined literal
    predicates instead of anti/semi joins. The two paths must produce
    identical rows on a window mixing MOR position deletes, equality
    deletes and a merge — toggled via the module threshold."""
    from fda_clinical_etl_pipeline_spark.sources import iceberg as ice

    t = _mk(spark, tmp_path / "inline", n=40)
    s0 = t.metadata()["current-snapshot-id"]
    t.delete_where(F.col("k") % 9 == 0, mode="mor")
    t.equality_delete(
        spark.createDataFrame([(3,), (7,)], "k long"), ["k"]
    )
    t.merge(
        spark.createDataFrame(
            [(2, 200.0, "a"), (41, 41.0, "b")], SCHEMA
        ),
        on="k",
        when_matched_update={"bal": "t.bal + s.bal"},
        when_not_matched_insert="all",
    )
    old = ice._INLINE_DELETE_ROWS
    try:
        ice._INLINE_DELETE_ROWS = 0  # force the join path
        join_rows = {
            "snap": sorted(
                tuple(r) for r in t.snapshot().collect()
            ),
            "chg": _by_type(t.changelog_scan(from_snapshot_id=s0)),
        }
        ice._INLINE_DELETE_ROWS = 2000  # inline path
        inline_rows = {
            "snap": sorted(
                tuple(r) for r in t.snapshot().collect()
            ),
            "chg": _by_type(t.changelog_scan(from_snapshot_id=s0)),
        }
    finally:
        ice._INLINE_DELETE_ROWS = old
    assert join_rows == inline_rows
