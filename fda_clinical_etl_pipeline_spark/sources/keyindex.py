"""Distributed key→file pruning for the upsert/merge write paths.

The historical shape on all three table formats (Delta, Iceberg,
Hudi) was ``inc.select(key).distinct().collect()`` — driver memory
proportional to the batch's distinct-key count. Fine at gate scale
and under the Hudi workload-profile contract, but a 100 TB-posture
batch upsert with tens of millions of distinct keys pushes them all
through the driver. This module bounds the driver by a CONSTANT:

* batches whose distinct-key count is ≤ ``key_collect_cap()`` keep
  the historical collect (a bounded driver list is cheaper than
  extra Spark jobs when the batch is tiny, and the cap makes the
  bound a constant, not data-proportional);
* larger batches switch to a fully distributed two-stage prune whose
  driver footprint is O(files):

  1. **stats prune** (``stats_prune_distributed``): each partition
     sorts its keys once (numpy, Arrow-batched) and binary-searches
     every file's [lo, hi] key bound into them — a file survives iff
     some partition found a key inside its range. The driver receives
     only surviving file ORDINALS. Cost per partition is
     O(keys·log keys + files·log keys); nothing all-pairs, nothing
     key-proportional crosses to the driver.
  2. **exact membership** (``files_containing_distributed``): the
     candidate files' key column semi-joins the distinct incoming
     keys (a shuffled equi-join — never an ``isin`` literal, which
     would embed the whole key set in the PLAN) and the driver
     receives only distinct ``input_file_name`` verdicts.

Reference parity: the reference engine loads each batch into driver
memory wholesale (etl/validate.py) — this module is the
Spark-posture generalization, not a port.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

_DEFAULT_CAP = 100_000


def key_collect_cap() -> int:
    """Distinct-key count up to which the historical driver-side
    collect is used. Override with ``SPARK_GRAFT_KEY_COLLECT_CAP``
    (scale probes set 0 to force the distributed path)."""
    return int(os.environ.get("SPARK_GRAFT_KEY_COLLECT_CAP",
                              _DEFAULT_CAP))


def distinct_keys(df: DataFrame, key_col) -> DataFrame:
    """Distinct non-null keys as a one-column frame named ``__k``.
    ``key_col`` may be a name or a Column expression."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        df.select(col.alias("__k"))
        .where(F.col("__k").isNotNull())
        .distinct()
    )


def collect_keys_if_small(keys_df: DataFrame,
                          cap: int | None = None) -> list | None:
    """The historical bounded collect, made SAFE: fetch at most
    ``cap + 1`` rows; return the key list iff it fits, else None
    (caller switches to the distributed path). Driver memory is
    bounded by the cap whatever the batch size."""
    cap = key_collect_cap() if cap is None else cap
    if cap <= 0:
        return None
    got = keys_df.limit(cap + 1).collect()
    if len(got) > cap:
        return None
    return [r[0] for r in got]


def stats_prune_distributed(keys_df: DataFrame,
                            bounds: list[tuple]) -> set:
    """``bounds`` is [(file_id, lo, hi), ...] from table metadata
    (O(files), already driver-resident — metadata is the one thing
    that legitimately lives there). Returns the set of file_ids whose
    [lo, hi] range contains at least one key — decided in ONE Spark
    job; the driver receives only file ordinals.

    Bounds must be comparable with the key column's pandas values
    (int/float/string keys — the common merge identities). If a
    partition hits a cross-type comparison it marks EVERY file a
    candidate (conservative no-skip; the exact-membership stage still
    guarantees correctness)."""
    if not bounds or keys_df.isEmpty():
        return set()
    spark = keys_df.sparkSession
    ids = [b[0] for b in bounds]
    bc = spark.sparkContext.broadcast(
        ([b[1] for b in bounds], [b[2] for b in bounds])
    )

    def scan(batches):
        import numpy as np
        import pandas as pd

        los, his = bc.value
        seen = np.zeros(len(los), dtype=bool)
        for pdf in batches:
            s = pdf.iloc[:, 0].dropna()
            if s.empty:
                continue
            try:
                k = np.sort(s.to_numpy())
                lo_i = np.searchsorted(k, np.asarray(los, dtype=k.dtype),
                                       side="left")
                hi_i = np.searchsorted(k, np.asarray(his, dtype=k.dtype),
                                       side="right")
                seen |= lo_i < hi_i
            except (TypeError, ValueError):
                seen[:] = True  # incomparable bound domain: no skip
        yield pd.DataFrame(
            {"__ord": np.nonzero(seen)[0].astype("int64")}
        )

    hits = keys_df.mapInPandas(scan, "__ord long").distinct().collect()
    return {ids[r["__ord"]] for r in hits}


def files_containing_distributed(file_df: DataFrame, key_col: str,
                                 keys_df: DataFrame) -> set[str]:
    """Exact membership over the stats-pruned candidates: semi-join
    the files' key column against the distinct incoming keys and
    distinct the carrying file names. One shuffled equi-join (hash-
    partitioned on the key both sides — co-located, broadcast-free);
    the driver receives O(files) names, never keys."""
    hits = (
        file_df
        .select(F.col(key_col).alias("__k"),
                F.input_file_name().alias("__f"))
        .join(keys_df, "__k", "left_semi")
        .select("__f")
        .distinct()
        .collect()
    )
    return {os.path.basename(r["__f"]) for r in hits}
