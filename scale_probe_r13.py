"""r13 probe: driver footprint of the distributed key-pruning path
(sources/keyindex.py) under a 64× blow-up of incoming distinct keys.

The r12 verdict's one remaining driver-memory-∝-data shape was the
batch-key collect on the upsert/merge paths. This probe forces the
distributed path (SPARK_GRAFT_KEY_COLLECT_CAP=0), runs a Delta COW
upsert against a 32-file table at 10k and 640k incoming distinct
keys, and records what actually crosses to the driver: the per-file
verdict row counts from the two pruning stages. PASS = verdicts stay
O(files) (≤ file count) at both scales — flat, while keys grow 64×.
"""

import os
import time

os.environ["SPARK_GRAFT_KEY_COLLECT_CAP"] = "0"

from pyspark.sql import functions as F  # noqa: E402

from fda_clinical_etl_pipeline_spark.session import get_spark  # noqa: E402
from fda_clinical_etl_pipeline_spark.sources import keyindex  # noqa: E402
from fda_clinical_etl_pipeline_spark.sources.delta_log import (  # noqa: E402
    DeltaProtocolTable,
)

COLLECTED = {"stats_rows": 0, "member_rows": 0, "small_used": 0}

_orig_prune = keyindex.stats_prune_distributed
_orig_member = keyindex.files_containing_distributed
_orig_small = keyindex.collect_keys_if_small


def _prune(keys_df, bounds):
    out = _orig_prune(keys_df, bounds)
    COLLECTED["stats_rows"] += len(out)
    return out


def _member(file_df, key_col, keys_df):
    out = _orig_member(file_df, key_col, keys_df)
    COLLECTED["member_rows"] += len(out)
    return out


def _small(keys_df, cap=None):
    out = _orig_small(keys_df, cap)
    if out is not None:
        COLLECTED["small_used"] += 1
    return out


keyindex.stats_prune_distributed = _prune
keyindex.files_containing_distributed = _member
keyindex.collect_keys_if_small = _small
import fda_clinical_etl_pipeline_spark.sources.delta_log as dl  # noqa: E402


def run(spark, root, n_keys):
    for k in COLLECTED:
        COLLECTED[k] = 0
    base = spark.range(2_000_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("bal"),
    ).repartitionByRange(32, "k")
    t = DeltaProtocolTable.create(
        spark, root, base, key="k", precombine="bal"
    )
    # incoming keys clustered into 1/4 of the key space: pruning has
    # real skips to find
    inc = spark.range(n_keys).select(
        (F.col("id") * 2).alias("k"),
        F.lit(9e9).alias("bal"),
    )
    t0 = time.time()
    t.upsert(inc, mode="cow")
    wall = time.time() - t0
    n = t.snapshot().count()
    return wall, n, dict(COLLECTED)


def main():
    import shutil
    import tempfile

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    for n_keys in (10_000, 640_000):
        d = tempfile.mkdtemp(prefix="probe_r13_")
        try:
            wall, rows, got = run(spark, os.path.join(d, "t"), n_keys)
            print(
                f"keys={n_keys:>7}  wall={wall:6.1f}s  table_rows={rows}"
                f"  driver_verdicts: stats={got['stats_rows']}"
                f" member={got['member_rows']}"
                f" small_path_used={got['small_used']}"
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
