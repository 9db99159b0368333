"""Avro Object Container File source/sink: pure-codec round-trips,
distributed Spark read/write, and — the conformance anchor — both-way
cross-validation against the JVM Avro reference implementation
(avro-1.12.1.jar, bundled with Spark): files we write must be readable
by org.apache.avro's DataFileReader, and files the JVM writer produces
must decode here."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from fda_clinical_etl_pipeline_spark.sources.avro_ocf import (
    avro_schema_of,
    decode_ocf,
    encode_ocf,
    read_avro_ocf,
    spark_schema_of,
    write_avro_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {
            "type": "enum", "name": "k", "symbols": ["A", "B"]}},
        {"name": "sub", "type": {
            "type": "record", "name": "sub",
            "fields": [{"name": "x", "type": "int"}],
        }},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at", "type": {
            "type": "long", "logicalType": "timestamp-micros"}},
    ],
}

ROWS = [
    {
        "id": 1, "name": "alpha", "score": 1.5, "flag": True,
        "raw": b"\x00\xff", "tags": ["x", "y"], "props": {"a": 7},
        "kind": "A", "sub": {"x": 3},
        "day": datetime.date(2024, 5, 17),
        "at": datetime.datetime(2024, 5, 17, 12, 30, 0, 123456),
    },
    {
        "id": -92233720368547758, "name": None, "score": -0.25,
        "flag": False, "raw": b"", "tags": [], "props": {},
        "kind": "B", "sub": {"x": -1},
        "day": datetime.date(1969, 12, 31),
        "at": datetime.datetime(1969, 12, 31, 23, 59, 59),
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_roundtrip_all_types(codec):
    blob = encode_ocf(SCHEMA, ROWS, codec=codec)
    schema, rows = decode_ocf(blob)
    assert schema == SCHEMA
    assert rows == ROWS


def test_varint_edge_values():
    sch = {"type": "record", "name": "r",
           "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1,
            -(2**63)]
    _, rows = decode_ocf(encode_ocf(sch, [{"v": v} for v in vals]))
    assert [r["v"] for r in rows] == vals


def test_spark_schema_mapping_roundtrip(spark):
    sdf_schema = spark_schema_of(SCHEMA)
    names = sdf_schema.fieldNames()
    assert names == [f["name"] for f in SCHEMA["fields"]]
    # nullable only where the avro type was a [null, T] union
    nullable = {f.name: f.nullable for f in sdf_schema.fields}
    assert nullable["name"] and not nullable["id"]


def test_distributed_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 4, i % 2 == 0) for i in range(100)],
        "id long, name string, score double, flag boolean",
    ).repartition(4)
    out = str(tmp_path / "avro_out")
    n = write_avro_ocf(df, out, codec="deflate")
    assert n == 100
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 4, "one OCF file per partition"

    back = read_avro_ocf(spark, out)
    got = sorted(
        (r["id"], r["name"], r["score"], r["flag"])
        for r in back.collect()
    )
    assert got == sorted(
        (i, f"n{i}", float(i) / 4, i % 2 == 0) for i in range(100)
    )


def test_readers_read_avro_falls_back(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.readers import read_avro

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    out = str(tmp_path / "fb")
    write_avro_ocf(df, out)
    assert read_avro(spark, out).collect()[0]["name"] == "a"


def test_jvm_avro_reads_our_files(spark, tmp_path):
    """Conformance: the JVM Avro reference reader must consume our
    bytes — deflate codec, unions, nested types and all."""
    blob = encode_ocf(SCHEMA, ROWS, codec="deflate")
    path = str(tmp_path / "ours.avro")
    with open(path, "wb") as f:
        f.write(blob)

    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    out = []
    while reader.hasNext():
        out.append(reader.next())
    reader.close()
    assert len(out) == 2
    r0 = out[0]
    assert r0.get("id") == 1
    assert str(r0.get("name")) == "alpha"
    assert r0.get("score") == 1.5
    assert str(r0.get("kind")) == "A"
    assert r0.get("sub").get("x") == 3
    # logical types decode as their raw representations JVM-side
    assert r0.get("day") == (ROWS[0]["day"]
                             - datetime.date(1970, 1, 1)).days
    assert out[1].get("name") is None
    assert out[1].get("id") == -92233720368547758


def test_we_read_jvm_avro_files(spark, tmp_path):
    """Conformance, other direction: bytes produced by the JVM Avro
    writer (deflate) decode here byte-exactly."""
    jvm = spark._jvm
    sch_json = json.dumps({
        "type": "record", "name": "jrec",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": "double"},
        ],
    })
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / "theirs.avro")
    writer.create(schema, jvm.java.io.File(path))
    for i, name in ((1, "x"), (2, None), (3, "z")):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("a", i)
        rec.put("b", name)
        rec.put("c", i * 0.5)
        writer.append(rec)
    writer.close()

    with open(path, "rb") as f:
        _, rows = decode_ocf(f.read())
    assert rows == [
        {"a": 1, "b": "x", "c": 0.5},
        {"a": 2, "b": None, "c": 1.0},
        {"a": 3, "b": "z", "c": 1.5},
    ]
    # and through the distributed reader
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in read_avro_ocf(spark, path).collect()
    )
    assert got == [(1, "x", 0.5), (2, None, 1.0), (3, "z", 1.5)]


def test_avro_schema_of_spark_types(spark):
    df = spark.createDataFrame(
        [(1, "a", [1.0], datetime.datetime(2024, 1, 1))],
        "id long, s string, arr array<double>, ts timestamp",
    )
    sch = avro_schema_of(df.schema)
    by_name = {f["name"]: f["type"] for f in sch["fields"]}
    assert by_name["id"] == ["null", "long"]
    assert by_name["arr"][1]["type"] == "array"
    assert by_name["ts"][1]["logicalType"] == "timestamp-micros"
