"""E2E test: the streaming clinical pipeline processes files that land in
a watched directory through validate→scrub→canonicalize with provenance,
and a restart with the same checkpoint does not reprocess old files."""

from __future__ import annotations

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.catalog import HOSPITAL_A
from fda_clinical_etl_pipeline_spark.streaming.clinical import (
    StreamingClinicalPipeline,
)

CSV1 = (
    "patient_id,patient_name,ssn,dob,visit_date,diagnosis,notes\n"
    "P1,Ann Ray,111-22-3333,1970-01-01,2025-01-01,Flu,Call 555-214-7788\n"
    "P2,Bo Li,222-33-4444,1980-02-02,2025-01-02,Cold,mail bo@x.org\n"
)
CSV2 = (
    "patient_id,patient_name,ssn,dob,visit_date,diagnosis,notes\n"
    ",Cy Wu,333-44-5555,bad-date,2025-01-03,Flu,n1\n"  # invalid row
    "P4,Di Vo,444-55-6666,1990-04-04,2025-01-04,Ache,n2\n"
)


def test_streaming_clinical_end_to_end(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    (src / "f1.csv").write_text(CSV1)
    pipe = StreamingClinicalPipeline(spark, HOSPITAL_A, str(src), out)
    q = pipe.start(ckpt)
    q.awaitTermination()

    qlm = spark.read.parquet(f"{out}/qlm_ready/hospital_a")
    assert qlm.count() == 2
    names = {r["patient_name"] for r in qlm.collect()}
    assert names == {"[REDACTED_NAME]"}
    notes = " ".join(r["note_text"] for r in qlm.collect())
    assert "555-214-7788" not in notes and "bo@x.org" not in notes

    # second file lands (one bad row) → restart from the same checkpoint
    (src / "f2.csv").write_text(CSV2)
    q2 = pipe.start(ckpt)
    q2.awaitTermination()

    qlm2 = spark.read.parquet(f"{out}/qlm_ready/hospital_a")
    # only the valid new row appended; f1 NOT reprocessed (checkpoint)
    assert qlm2.count() == 3
    quarantined = spark.read.parquet(f"{out}/quarantine/hospital_a")
    assert quarantined.count() == 1
    errs = quarantined.collect()[0]["_errors"]
    assert "null_not_allowed:patient_id" in errs

    batches = pipe.prov.batches()
    statuses = {r["batch_id"]: r["status"] for r in batches.collect()}
    assert set(statuses.values()) <= {"COMPLETED"}
    assert len(statuses) == 2  # one provenance batch per micro-batch
