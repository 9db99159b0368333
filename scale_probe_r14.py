"""r14 probe: run_bulk's JSONL and HL7 paths at 64× reference volume.

r13 extended bulk ingest beyond CSV to the reference's other two
formats (etl/validate.py:134-213) but measured them only at reference
volume (100k JSONL records / 10k HL7 messages). This probe re-runs
both at 1× and 64× with a CONSTANT file count (32 generated part
files per scale — rows per file grow 64×), and records:

* wall + rows/s for the whole run_bulk (read → validate → scrub →
  canonicalize → write → provenance);
* what crosses to the driver: the per-file stats rows (must stay
  == file count at both scales — O(files), never O(rows));
* the Python driver's ru_maxrss high-water mark after each phase
  (the 64× run must not move it materially — all row-proportional
  state lives executor-side).

PASS = rows/s at 64× ≥ rows/s at 1× (fixed per-plan costs amortize)
AND driver stats rows == file count at both scales.

Inputs are GENERATED distributed (Spark text writes), not driver
loops — 6.4M JSONL lines via to_json over range(), HL7 messages via
format_string with an embedded-newline template (text writer's
per-row lineSep supplies the blank-line message separator).
"""

import json
import os
import resource
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.catalog import Catalog
from fda_clinical_etl_pipeline_spark.pipeline import (
    ClinicalPipeline,
    Zones,
)
from fda_clinical_etl_pipeline_spark.session import get_spark

N_PARTS = 32
JSONL_REF = 100_000
HL7_REF = 10_000


def gen_jsonl(spark, path: str, n: int) -> None:
    df = (
        spark.range(n)
        .select(
            F.to_json(F.struct(
                F.format_string("C%06d", F.col("id")).alias("id"),
                F.format_string("Name %d", F.col("id")).alias("name"),
                F.lit("1981-09-22").alias("date_of_birth"),
                F.lit("2025-02-05").alias("encounter"),
                F.lit("J10").alias("icd"),
                F.format_string(
                    "note %d; contact n%d@clinic.org",
                    F.col("id"), F.col("id"),
                ).alias("free_text"),
            )).alias("value")
        )
        .repartition(N_PARTS)
    )
    df.write.mode("overwrite").text(path)


def gen_hl7(spark, path: str, n: int) -> None:
    # every 5000th message lacks its PID segment -> quarantined,
    # so the probe exercises the quarantine branch too
    pid = F.when(
        F.col("id") % 5000 == 0, F.lit("")
    ).otherwise(F.format_string(
        'PID|1||%d||"Pat %d"||19770318|M|||1 Main St|||||414-52-9061\n',
        F.col("id") + 30000, F.col("id"),
    ))
    msg = F.concat(
        F.format_string(
            "MSH|^~\\&|HOSPITAL_C|LAB|QLM|DEST|20250201||ORU^R01|"
            "M%d|P|2.3\n", F.col("id")),
        pid,
        F.format_string("OBR|1||%d|T^N\n", F.col("id")),
        F.format_string("OBX|1|ST|RESULT||%d|units||N\n", F.col("id")),
    )
    # each value already ends in "\n"; the text writer's lineSep adds
    # another -> blank-line separated messages (read_hl7's contract)
    df = spark.range(n).select(msg.alias("value")).repartition(N_PARTS)
    df.write.mode("overwrite").text(path)


def run_one(spark, fmt: str, source: str, gen, n_rows: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"bulkprobe_{fmt}_")
    in_dir = os.path.join(root, "in")
    gen(spark, in_dir, n_rows)
    # drop the _SUCCESS marker so the glob sees data files only
    marker = os.path.join(in_dir, "_SUCCESS")
    if os.path.exists(marker):
        os.remove(marker)
    pipe = ClinicalPipeline(
        spark, Zones(os.path.join(root, "lake")), Catalog()
    )
    t0 = time.monotonic()
    res = pipe.run_bulk(source, in_dir)
    wall = time.monotonic() - t0
    out = {
        "fmt": fmt,
        "rows": n_rows,
        "wall_s": round(wall, 2),
        "rows_per_s": int(n_rows / wall),
        "files_in": len([
            f for f in os.listdir(in_dir)
            if not f.startswith(("_", "."))
        ]),
        "driver_stats_rows": res["files"],
        "ingested": res["rows"],
        "quarantined": res["quarantined"],
        "ru_maxrss_mb": resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss // 1024,
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for fmt, source, gen, ref in (
        ("jsonl", "clinic_b", gen_jsonl, JSONL_REF),
        ("hl7", "hospital_c_hl7", gen_hl7, HL7_REF),
    ):
        for mult in (1, 64):
            r = run_one(spark, fmt, source, gen, ref * mult)
            r["mult"] = mult
            results.append(r)
            print(json.dumps(r))
    ok = True
    for fmt in ("jsonl", "hl7"):
        one, big = [r for r in results if r["fmt"] == fmt]
        flat = (one["driver_stats_rows"] == one["files_in"]
                and big["driver_stats_rows"] == big["files_in"])
        amortized = big["rows_per_s"] >= one["rows_per_s"]
        print(f"{fmt}: driver O(files) {'PASS' if flat else 'FAIL'}; "
              f"rows/s {one['rows_per_s']} -> {big['rows_per_s']} "
              f"({'PASS' if amortized else 'FAIL'} amortization); "
              f"rss {one['ru_maxrss_mb']} -> {big['ru_maxrss_mb']} MB")
        ok = ok and flat and amortized
    print("PROBE", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
