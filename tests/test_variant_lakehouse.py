"""VARIANT columns inside the Delta and Iceberg protocol twins:
Delta's variantType reader+writer table feature and Iceberg's V3
variant type — storage round-trip, protocol/format-version
enablement (create AND evolution), stats behavior, and DV interplay.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F, types as T

from fda_clinical_etl_pipeline_spark.sources.delta_log import (
    DeltaProtocolTable,
)
from fda_clinical_etl_pipeline_spark.sources.iceberg import (
    IcebergTable,
)


def _docs(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.try_parse_json(F.to_json(F.struct(
            F.col("id").alias("a"),
            F.concat(F.lit("s"), F.col("id")).alias("b"),
        ))).alias("v"),
    )


def _last_protocol(table_path: str) -> dict:
    proto = None
    log = os.path.join(table_path, "_delta_log")
    for fn in sorted(os.listdir(log)):
        if not fn.endswith(".json"):
            continue
        for line in open(os.path.join(log, fn)):
            a = json.loads(line)
            if "protocol" in a:
                proto = a["protocol"]
    return proto


def test_delta_variant_create_roundtrip_and_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaProtocolTable.create(
        spark, path, _docs(spark), key="k", precombine="k"
    )
    got = (
        t.snapshot()
        .select("k", F.try_variant_get("v", "$.b", "string").alias("b"))
        .filter(F.col("k") < 3).orderBy("k").collect()
    )
    assert [(r["k"], r["b"]) for r in got] == [
        (0, "s0"), (1, "s1"), (2, "s2")
    ]
    proto = _last_protocol(path)
    # spec: variantType is a reader+writer TABLE FEATURE
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]

    # non-variant columns still carry data-skipping stats; the
    # variant column is simply absent from them
    _meta, active = t._replay(t.latest_version())
    for add in active.values():
        st = t._file_stats(add)
        assert "k" in st["minValues"]
        assert "v" not in st["minValues"]
        assert "v" not in st["nullCount"]


def test_delta_variant_upsert_and_dv_delete(spark, tmp_path):
    t = DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), _docs(spark), key="k",
        precombine="k",
    )
    t.upsert(
        _docs(spark).filter(F.col("k") < 5)
        .withColumn("v", F.try_parse_json(F.lit('{"a": -1}'))),
        mode="cow",
    )
    t.delete_where(F.col("k").between(50, 59), mode="mor")
    snap = t.snapshot()
    assert snap.count() == 90
    upd = snap.filter(F.col("k") == 1).select(
        F.try_variant_get("v", "$.a", "long").alias("a")
    ).collect()
    assert upd[0]["a"] == -1
    # time travel: version 0 still serves the original variant
    v0 = t.snapshot(version=0).filter(F.col("k") == 1).select(
        F.try_variant_get("v", "$.a", "long").alias("a")
    ).collect()
    assert v0[0]["a"] == 1


def test_delta_variant_evolution_upgrades_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaProtocolTable.create(
        spark, path,
        spark.range(10).select(F.col("id").alias("k")),
        key="k", precombine="k",
    )
    assert _last_protocol(path)["minWriterVersion"] == 2
    t.append(_docs(spark, 5), merge_schema=True)
    proto = _last_protocol(path)
    assert proto["minReaderVersion"] == 3
    assert "variantType" in proto["readerFeatures"]
    # legacy implied features materialize alongside
    assert {"appendOnly", "invariants", "variantType"} <= set(
        proto["writerFeatures"]
    )
    snap = t.snapshot()
    assert snap.count() == 15
    assert snap.filter(F.col("v").isNotNull()).count() == 5


def test_iceberg_variant_is_v3_with_boundless_manifests(
    spark, tmp_path
):
    t = IcebergTable.create(spark, str(tmp_path / "t"), _docs(spark))
    meta = t.metadata()
    assert meta["format-version"] == 3
    got = (
        t.snapshot()
        .select("k", F.try_variant_get("v", "$.a", "long").alias("a"))
        .filter(F.col("k") < 3).orderBy("k").collect()
    )
    assert [(r["k"], r["a"]) for r in got] == [(0, 0), (1, 1), (2, 2)]

    vid = next(
        f["id"] for f in meta["schemas"][meta["current-schema-id"]]
        ["fields"] if f["name"] == "v"
    )
    kid = next(
        f["id"] for f in meta["schemas"][meta["current-schema-id"]]
        ["fields"] if f["name"] == "k"
    )
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    for e in t._entries_of_snapshot(snap, content=0):
        lower = {b["key"] for b in
                 (e["data_file"].get("lower_bounds") or [])}
        assert kid in lower      # normal column keeps bounds
        assert vid not in lower  # variant carries no bounds


def test_iceberg_variant_add_column_bumps_to_v3(spark, tmp_path):
    t = IcebergTable.create(
        spark, str(tmp_path / "t"),
        spark.range(5).select(F.col("id").alias("k")),
    )
    assert t.metadata()["format-version"] == 2
    t.add_column("v", T.VariantType())
    assert t.metadata()["format-version"] == 3
    # old files surface the new column as NULL variants
    assert t.snapshot().filter(F.col("v").isNull()).count() == 5
    t.append(_docs(spark, 3))
    assert t.snapshot().filter(F.col("v").isNotNull()).count() == 3


def test_streams_refuse_variant_tables(spark, tmp_path):
    """The custom Python DataSource streams materialize parquet via
    pyarrow, which cannot parse the variant logical type — they must
    refuse AT SOURCE CONSTRUCTION with an actionable message, not
    fail with an opaque OSError mid-batch."""
    import pytest

    path = str(tmp_path / "t")
    DeltaProtocolTable.create(
        spark, path, _docs(spark, 10), key="k", precombine="k"
    )
    from fda_clinical_etl_pipeline_spark.sources.delta_stream import (
        _DeltaStreamReader, _table_schema,
    )

    with pytest.raises(ValueError, match="VARIANT.*shred"):
        _DeltaStreamReader(path, _table_schema(path), {})
