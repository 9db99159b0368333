"""r14b probe: metadata-only aggregates and identity assignment at
64× the rows.

Claims under test:

* ``delta_metadata_aggregate`` is O(files) DRIVER work with ZERO
  Spark jobs — so at a CONSTANT file count its wall must stay flat
  while rows grow 64× (the commit log carries the same number of add
  actions; row count only changes the numbers inside the stats
  JSON). The scan it replaces grows linearly.
* Identity assignment is one projection expression inside the write
  (no extra jobs, no shuffle): appending with an omitted identity
  column must cost within noise of appending the same rows to a
  plain table, at both scales.

32 part files at both scales; rows 250k -> 16M.
"""

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.operators.metadata_agg import (
    delta_metadata_aggregate,
)
from fda_clinical_etl_pipeline_spark.session import get_spark

N_FILES = 32


def build(spark, root, n, identity):
    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )

    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("bal"),
        )
        .repartition(N_FILES)
    )
    t0 = time.monotonic()
    t = DeltaProtocolTable.create(
        spark, root, df, key="k", precombine="bal",
        identity=({"rid": {}} if identity else None),
    )
    return t, time.monotonic() - t0


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="ma_probe_")
    # untimed warmup: JIT/codegen/session costs out of the compare
    build(spark, os.path.join(base, "warm"), 50_000, identity=True)
    build(spark, os.path.join(base, "warm2"), 50_000,
          identity=False)
    for n in (250_000, 16_000_000):
        t, w_plain = build(spark, os.path.join(base, f"p{n}"), n,
                           identity=False)
        _, w_ident = build(spark, os.path.join(base, f"i{n}"), n,
                           identity=True)

        # metadata aggregate: wall + job count
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup())
        t0 = time.monotonic()
        agg = delta_metadata_aggregate(t)
        w_meta = time.monotonic() - t0
        jobs = len(set(tracker.getJobIdsForGroup()) - before)

        # the scan it replaces
        t0 = time.monotonic()
        scan = t.snapshot().agg(
            F.count(F.lit(1)), F.min("k"), F.max("k"),
            F.min("bal"), F.max("bal"),
        ).collect()[0]
        w_scan = time.monotonic() - t0
        assert agg["row_count"] == scan[0]
        assert agg["columns"]["k"]["min"] == scan[1]
        assert agg["columns"]["k"]["max"] == scan[2]

        print(json.dumps({
            "rows": n,
            "meta_agg_ms": round(w_meta * 1000, 1),
            "meta_agg_jobs": jobs,
            "scan_agg_ms": round(w_scan * 1000, 1),
            "create_plain_s": round(w_plain, 2),
            "create_identity_s": round(w_ident, 2),
            "identity_overhead": round(w_ident / w_plain, 3),
        }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
