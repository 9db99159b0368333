"""Round-9b scale probe: MERGE and compaction economics.

The claims under test, at 10x table growth with a FIXED 100-key merge
batch:

- Delta ``merge`` (copy-on-write, two-pass file pruning): bytes
  rewritten and files touched stay O(touched files) — growing the
  table 10x must not grow the rewrite ~10x, because the batch still
  lands in the same number of range-disjoint files;
- Iceberg ``merge`` (merge-on-read, equality deletes + appends):
  bytes written stay O(changed rows) — near-flat at any table size;
- Iceberg ``rewrite_data_files`` bin-pack: linear in input bytes by
  design (it must read and rewrite everything it compacts) — the
  probe records rows/s to show throughput holds at 10x.

Usage:
    python scale_probe_r9b.py            # runs both scales, prints table
"""

from __future__ import annotations

import os
import shutil
import time

BASE = "/tmp/fda_probe_r9b"
BATCH_KEYS = 100


def _table_bytes(root: str) -> int:
    total = 0
    for r, _d, fns in os.walk(root):
        if "_delta_log" in r or "metadata" in r:
            continue
        total += sum(
            os.path.getsize(os.path.join(r, f))
            for f in fns if f.endswith(".parquet")
        )
    return total


def probe(spark, n_rows: int, n_files: int, tag: str) -> dict:
    import json

    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )
    from fda_clinical_etl_pipeline_spark.sources.iceberg import (
        IcebergTable,
    )

    root = os.path.join(BASE, tag)
    shutil.rmtree(root, ignore_errors=True)
    df = spark.range(0, n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("bal"),
        F.concat(F.lit("seg-"), F.col("id") % 7).alias("seg"),
    ).repartitionByRange(n_files, "k")
    # a REALISTIC hot batch: keys clustered in one range (a recent-id
    # window), not sprayed across the whole keyspace — the case the
    # file pruning exists for
    batch = spark.range(0, BATCH_KEYS).select(
        F.col("id").alias("k"),
        F.lit(-1.0).alias("bal"),
        F.lit("upd").alias("seg"),
    )
    out = {"rows": n_rows, "files": n_files}

    # ---- delta merge (COW, pruned)
    d = DeltaProtocolTable.create(
        spark, os.path.join(root, "delta"), df
    )
    before = _table_bytes(os.path.join(root, "delta"))
    t0 = time.monotonic()
    v = d.merge(batch, on="k", when_matched_update="all",
                when_not_matched_insert="all")
    out["delta_merge_s"] = round(time.monotonic() - t0, 3)
    with open(d._commit_file(v)) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    out["delta_files_rewritten"] = sum(
        1 for a in acts if "remove" in a
    )
    out["delta_bytes_written"] = sum(
        a["add"].get("size", 0) for a in acts if "add" in a
    )
    out["delta_table_bytes"] = before

    # ---- iceberg merge (MOR)
    it = IcebergTable.create(
        spark, os.path.join(root, "ice"), df
    )
    before_files = set(it._files_of_snapshot(
        it._snapshot_by(it.metadata(), None)
    ))
    t0 = time.monotonic()
    it.merge(batch, on="k", when_matched_update="all",
             when_not_matched_insert="all")
    out["ice_merge_s"] = round(time.monotonic() - t0, 3)
    snap = it._snapshot_by(it.metadata(), None)
    new_files = [
        p for p in it._files_of_snapshot(snap)
        if p not in before_files
    ]
    out["ice_bytes_written"] = sum(
        os.path.getsize(p) for p in new_files
    ) + sum(
        os.path.getsize(p)
        for p in it._delete_files_of_snapshot(snap)
    ) + sum(
        os.path.getsize(e["path"])
        for e in it._equality_deletes_of_snapshot(snap)
    )

    # ---- iceberg bin-pack compaction throughput
    t0 = time.monotonic()
    it.rewrite_data_files(target_file_size_bytes=256 << 20)
    dt = time.monotonic() - t0
    out["compact_s"] = round(dt, 3)
    out["compact_rows_per_s"] = int(n_rows / dt)
    return out


def main() -> None:
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    small = probe(spark, 500_000, 16, "s")
    big = probe(spark, 5_000_000, 160, "l")  # rows-per-file held constant
    print(f"{'metric':28s}{'500k rows':>14s}{'5M rows':>14s}{'ratio':>8s}")
    for k in ("delta_merge_s", "delta_files_rewritten",
              "delta_bytes_written", "ice_merge_s",
              "ice_bytes_written", "compact_s",
              "compact_rows_per_s"):
        r = big[k] / small[k] if small[k] else float("inf")
        print(f"{k:28s}{small[k]:>14}{big[k]:>14}{r:>8.2f}")
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
