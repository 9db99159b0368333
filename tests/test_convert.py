"""Cross-format table conversion (sources/convert.py): every ordered
pair of the three table-format twins round-trips the logical snapshot,
merge-on-read state folds in, and history replay gives the destination
its own time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.convert import (
    convert_table,
    detect_format,
)
from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.hudi_table import HudiTable
from fda_clinical_etl_pipeline_spark.sources.iceberg import IcebergTable


def _df(spark, n=100):
    return spark.range(0, n).select(
        F.col("id"), (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
    )


def _rows(df):
    cols = [c for c in df.columns if not c.startswith("_hoodie")]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_detect_format(spark, tmp_path):
    d = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _df(spark))
    i = IcebergTable.create(spark, str(tmp_path / "i"), _df(spark))
    h = HudiTable.create(
        spark, str(tmp_path / "h"), "h", "id", "grp")
    assert detect_format(d.path) == "delta"
    assert detect_format(i.path) == "iceberg"
    assert detect_format(h.path) == "hudi"
    assert detect_format(str(tmp_path)) is None


@pytest.mark.parametrize("src_fmt,dst_fmt", [
    ("delta", "iceberg"), ("delta", "hudi"),
    ("iceberg", "delta"), ("iceberg", "hudi"),
    ("hudi", "delta"), ("hudi", "iceberg"),
])
def test_all_pairs_snapshot_roundtrip(spark, tmp_path, src_fmt, dst_fmt):
    df = _df(spark)
    src_path = str(tmp_path / "src")
    if src_fmt == "delta":
        DeltaProtocolTable.create(spark, src_path, df)
    elif src_fmt == "iceberg":
        IcebergTable.create(spark, src_path, df)
    else:
        t = HudiTable.create(spark, src_path, "src", "id", "grp")
        t.upsert(df)
    dst = convert_table(
        spark, src_path, str(tmp_path / "dst"), dst_fmt,
        record_key="id", precombine="grp",
    )
    assert _rows(dst.snapshot()) == _rows(df)


def test_mor_state_folds_into_conversion(spark, tmp_path):
    """Deletion-vectored source rows must NOT reach the destination."""
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "src"), _df(spark),
        key="id", precombine="grp",
    )
    t.delete_where(F.col("id").isin([1, 2]))  # MOR (DVs)
    dst = convert_table(
        spark, t.path, str(tmp_path / "dst"), "iceberg"
    )
    got = sorted(r.id for r in dst.snapshot().collect())
    assert got == sorted(set(range(100)) - {1, 2})


def test_history_replay_gives_destination_time_travel(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "src"), _df(spark, 10))
    t.append(spark.createDataFrame(
        [(100, 0, "late")], "id long, grp long, val string"))
    dst = convert_table(
        spark, t.path, str(tmp_path / "dst"), "delta",
        history_versions=2,
    )
    assert dst.latest_version() == 1
    assert dst.snapshot().count() == 11
    assert dst.snapshot(0).count() == 10  # replayed first version


def test_conversion_guards(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "src"), _df(spark, 5))
    with pytest.raises(ValueError, match="record_key and precombine"):
        convert_table(spark, t.path, str(tmp_path / "h"), "hudi")
    with pytest.raises(ValueError, match="no recognizable table"):
        convert_table(
            spark, str(tmp_path / "nope"), str(tmp_path / "x"),
            "iceberg",
        )
    dst = convert_table(
        spark, t.path, str(tmp_path / "ok"), "iceberg")
    with pytest.raises(ValueError, match="already holds a table"):
        convert_table(spark, t.path, dst.path, "iceberg")


def test_hudi_destination_gets_meta_columns(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "src"), _df(spark, 20))
    dst = convert_table(
        spark, t.path, str(tmp_path / "h"), "hudi",
        record_key="id", precombine="grp", table_name="converted",
    )
    snap = dst.snapshot()
    assert snap.columns[0] == "_hoodie_commit_time"
    assert snap.count() == 20
    assert dst.properties()["hoodie.table.name"] == "converted"


def test_partition_layout_preserved(spark, tmp_path):
    """Migration keeps the source's partitioning on the destination
    (a converted table must not silently flatten its layout)."""
    df = spark.range(0, 60).select(
        F.col("id"), (F.col("id") % 5).alias("grp"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd")
        .alias("par"),
    )
    d = DeltaProtocolTable.create(
        spark, str(tmp_path / "src"), df, partition_by=["par"]
    )
    ice = convert_table(
        spark, d.path, str(tmp_path / "ice"), "iceberg"
    )
    assert [
        pf["name"] for pf in ice._partition_fields()
    ] == ["par"]
    assert ice.read_partitions({"par": "even"}).count() == 30
    hudi = convert_table(
        spark, d.path, str(tmp_path / "hudi"), "hudi",
        record_key="id", precombine="grp",
    )
    assert hudi.partition_field == "par"
    assert {
        r["_hoodie_partition_path"]
        for r in hudi.snapshot()
        .select("_hoodie_partition_path").distinct().collect()
    } == {"even", "odd"}
    back = convert_table(
        spark, hudi.path, str(tmp_path / "back"), "delta"
    )
    assert back.partition_columns() == ["par"]
    assert _rows(back.snapshot()) == _rows(df)


def test_convert_from_evolved_sources(spark, tmp_path):
    """Conversion reads the LOGICAL snapshot, so schema-evolved
    sources (Delta column mapping rename, Iceberg field-id rename)
    arrive at the destination under their current logical names with
    merge-on-read state folded in."""
    d = DeltaProtocolTable.create(
        spark, str(tmp_path / "d"), _df(spark, 50),
        key="id", precombine="grp",
    )
    d.rename_column("val", "label")
    d.delete_where(F.col("id") == 1)  # deletion vector
    ice = convert_table(spark, d.path, str(tmp_path / "d2i"),
                        "iceberg")
    assert ice.snapshot().columns == ["id", "grp", "label"]
    assert ice.snapshot().count() == 49
    assert ice.snapshot().where("id = 1").count() == 0

    i = IcebergTable.create(spark, str(tmp_path / "i"), _df(spark, 30))
    i.rename_column("val", "tag")
    i.delete_where(F.col("id") == 2)  # position delete
    back = convert_table(spark, i.path, str(tmp_path / "i2d"),
                         "delta")
    assert back.snapshot().columns == ["id", "grp", "tag"]
    assert back.snapshot().count() == 29


@pytest.mark.parametrize("hudi_type", [
    "COPY_ON_WRITE", "MERGE_ON_READ",
])
def test_hudi_replay_propagates_deletes(spark, tmp_path, hudi_type):
    """A Delta→Hudi migration of a table with a mid-history delete
    must NOT resurrect the deleted rows in the replayed lineage:
    vanished keys between source versions become destination delete
    commits (O(delta) tombstone blocks on a MOR destination)."""
    d = DeltaProtocolTable.create(
        spark, str(tmp_path / f"d_{hudi_type}"), _df(spark),
        key="id", precombine="grp",
    )
    d.delete_where(F.col("id") < 10)                    # v1
    d.append(_df(spark).where("id >= 200 and id < 210")
             .withColumn("id", F.col("id")))            # v2
    dst = convert_table(
        spark, d.path, str(tmp_path / f"h_{hudi_type}"), "hudi",
        record_key="id", precombine="grp",
        history_versions=3, hudi_table_type=hudi_type,
    )
    assert dst.table_type == hudi_type
    # final state matches the source head exactly
    assert _rows(dst.snapshot()) == _rows(d.snapshot())
    got = {int(r["_hoodie_record_key"])
           for r in dst.snapshot().collect()}
    assert not (got & set(range(10))), "deleted keys resurrected"
    # the replayed lineage has a DELETE commit between the versions
    ops = [dst.commit_metadata(i).get("operationType")
           for i in dst.commits()]
    assert "DELETE" in ops
    # destination time travel: the instant BEFORE the delete commit
    # still shows the doomed keys — the replay preserved the shape
    # of history, not just its endpoint
    first = dst.commits()[0]
    early = {int(r["_hoodie_record_key"])
             for r in dst.snapshot(as_of_instant=first).collect()}
    assert set(range(10)) <= early
