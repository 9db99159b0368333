"""Writer round-trip tests (K2–K4): CSV with header, JSONL with the
reference's corrupt-line verbatim passthrough (etl/scrub_phi.py:155-160),
HL7 message re-joining, plus the binary-file reader (K1 scale path)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources import readers, writers


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("P1", "note one"), ("P2", "with,comma")], "patient_id string, notes string"
    )
    path = str(tmp_path / "out_csv")
    writers.write_csv(df, path)
    back = readers.read_csv_strings(spark, path, ["patient_id", "notes"])
    rows = {r["patient_id"]: r["notes"] for r in back.collect()}
    assert rows == {"P1": "note one", "P2": "with,comma"}


def test_jsonl_corrupt_passthrough(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": "A", "v": "1"}\n'
        "this is not json at all\n"
        '{"id": "B", "v": "2"}\n'
    )
    df = readers.read_jsonl(spark, str(src))
    assert "_corrupt_record" in df.columns
    out = str(tmp_path / "out_jsonl")
    writers.write_jsonl(df.drop("_input_file"), out)
    lines = []
    for f in sorted(glob.glob(out + "/part-*")):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    # corrupt line passed through verbatim, valid lines re-serialized
    assert "this is not json at all" in lines
    parsed = [ln for ln in lines if ln.startswith("{")]
    assert len(parsed) == 2


def test_hl7_write_rejoins_messages(spark, tmp_path):
    msgs = [
        ("MSH|a|b\nPID|1||X\nOBX|1|ST|R||1",),
        ("MSH|a|c\nPID|1||Y\nOBX|1|ST|R||2",),
    ]
    df = spark.createDataFrame(msgs, "message string")
    out = str(tmp_path / "out_hl7")
    writers.write_hl7(df.coalesce(1), out)
    text = ""
    for f in sorted(glob.glob(out + "/part-*")):
        with open(f) as fh:
            text += fh.read()
    # blank line between messages, segments newline-joined
    blocks = [b for b in text.split("\n\n") if b.strip()]
    assert len(blocks) == 2
    assert blocks[0].splitlines()[1] == "PID|1||X"
    # round-trip through the HL7 reader
    back = readers.read_hl7(spark, out)
    assert back.count() == 2
    ids = {
        r[0]
        for r in back.select(
            F.element_at(F.split(F.element_at("segments", 2), r"\|"), 4)
        ).collect()
    }
    assert ids == {"X", "Y"}


def test_binary_files_through_multimodal_decode(spark, tmp_path):
    """K1 scale path → multimodal decode integration: real binary files
    read via binaryFile flow through the Arrow decode plumbing."""
    from fda_clinical_etl_pipeline_spark.operators.multimodal import (
        decode_binary_assets,
    )
    from pyspark.sql import functions as F2

    blobs = {0: b"\x10\x20\x30", 1: b"\xff" * 10}
    for i, b in blobs.items():
        (tmp_path / f"asset_{i}.bin").write_bytes(b)
    # note: zero-length files are SKIPPED by the binaryFile source
    # (documented in read_binary_files); empty content goes through the
    # decode path via a constructed frame below
    assets = (
        readers.read_binary_files(spark, str(tmp_path), "*.bin")
        .select(
            F2.regexp_extract(F2.col("path"), r"asset_(\d+)\.bin", 1)
            .cast("long")
            .alias("doc_id"),
            "content",
        )
    )
    rows = {r["doc_id"]: r for r in decode_binary_assets(assets).collect()}
    assert rows[0]["n_bytes"] == 3 and rows[0]["feat_sum"] == 0x60
    assert rows[0]["feat_first"] == 0x10
    assert rows[1]["feat_sum"] == 255 * 10
    import hashlib

    assert rows[1]["content_sha"] == hashlib.sha256(b"\xff" * 10).hexdigest()

    empty = spark.createDataFrame([(9, b"")], "doc_id long, content binary")
    r9 = decode_binary_assets(empty).collect()[0]
    assert r9["n_bytes"] == 0 and r9["feat_first"] == -1


def test_run_all_over_catalog(spark, tmp_path):
    """S1/S2: run_all enumerates active sources' directories and runs
    every file end-to-end."""
    from fda_clinical_etl_pipeline_spark.catalog import (
        Catalog,
        HOSPITAL_A,
        SourceMeta,
    )
    from fda_clinical_etl_pipeline_spark.pipeline import ClinicalPipeline, Zones

    src_dir = tmp_path / "hospital_a_files"
    src_dir.mkdir()
    csv = (
        "patient_id,patient_name,ssn,dob,visit_date,diagnosis,notes\n"
        "P1,Jo Um,111-22-3333,1970-01-01,2025-01-01,Flu,note\n"
    )
    (src_dir / "a.csv").write_text(csv)
    (src_dir / "b.csv").write_text(csv.replace("P1", "P2"))

    active = SourceMeta(
        "hospital_a", "csv", file_path=str(src_dir),
        columns=HOSPITAL_A.columns,
    )
    inactive = SourceMeta("legacy", "csv", file_path=str(src_dir), active=False)
    pipe = ClinicalPipeline(
        spark, Zones(str(tmp_path / "lake")), Catalog((active, inactive))
    )
    results = pipe.run_all()
    assert len(results) == 2  # inactive source skipped
    assert all(r["status"] == "COMPLETED" for r in results)
    assert pipe.prov.batches().count() == 2


def test_binary_file_reader_sha_matches_driver_hash(spark, tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"\x00\x01\x02clinical-bytes" * 100)
    df = readers.read_binary_files(spark, str(tmp_path), "*.bin")
    row = df.select(
        F.sha2("content", 256).alias("sha"), F.length("content").alias("n")
    ).collect()[0]
    assert row["sha"] == writers.sha256_file(str(p))
    assert row["n"] == len(p.read_bytes())


def test_orc_round_trip(spark, tmp_path):
    from fda_clinical_etl_pipeline_spark.sources.readers import read_orc
    from fda_clinical_etl_pipeline_spark.sources.writers import write_orc

    rows = [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    write_orc(df, str(tmp_path / "orc_out"))
    back = read_orc(spark, str(tmp_path / "orc_out"))
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
    # predicate pushdown reaches the ORC scan like parquet
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter("id = 2").explain()
    assert "PushedFilters" in buf.getvalue()


def test_xml_roundtrip_and_corrupt_capture(spark, tmp_path):
    from pyspark.sql import types as T

    from fda_clinical_etl_pipeline_spark.sources.readers import read_xml
    from fda_clinical_etl_pipeline_spark.sources.writers import write_xml

    df = spark.createDataFrame(
        [(1, "Ann", "2024-01-01"), (2, "Bob", "2024-02-01")],
        "id long, name string, visit_date string",
    )
    out = str(tmp_path / "xml_out")
    write_xml(df, out, row_tag="patient", root_tag="patients")
    back = read_xml(spark, out, row_tag="patient")
    # inference types the ISO string as DATE — value fidelity via str()
    rows = {r.id: (r.name, str(r.visit_date)) for r in back.collect()}
    assert rows == {1: ("Ann", "2024-01-01"), 2: ("Bob", "2024-02-01")}
    assert "_input_file" in back.columns

    # corrupt element capture under an enforced schema
    bad = tmp_path / "bad.xml"
    bad.write_text(
        "<patients>"
        "<patient><id>3</id><name>Cee</name></patient>"
        "<patient><id>not_a_number</id><name>Dee</name></patient>"
        "</patients>"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    got = read_xml(spark, str(bad), row_tag="patient", schema=schema)
    rows2 = got.collect()
    ok = [r for r in rows2 if r._corrupt_record is None]
    corrupt = [r for r in rows2 if r._corrupt_record is not None]
    # the well-typed element parses; the bad one quarantines whole
    # (PERMISSIVE nulls every parsed field and keeps the raw element)
    assert [(r.id, r.name) for r in ok] == [(3, "Cee")]
    assert len(corrupt) == 1 and corrupt[0].id is None
    assert "not_a_number" in corrupt[0]._corrupt_record
