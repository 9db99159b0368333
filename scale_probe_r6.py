"""Round-6 scale probes: the r5 operator families measured under
growth, the way SCALING.md's q1 probes were run.

- PageRank: 10x the edge list as 10 disjoint graph copies (node-id
  offsets keep structure); 3 iterations. Checks the per-round
  edge-join + partial-agg pipeline scales with edges, not worse.
- BPE: per-merge-round cost at 1x vs ~10x word-type count (word
  suffix perturbation per replica — the merge loop's unit of work is
  the word-frequency relation, not the corpus).
- Delta upsert: identical 3-row upsert against a 4-file vs 40-file
  table; the stats-pruned COW merge must price by FILES TOUCHED, not
  table file count (log-only candidate pruning).

Probes replicate inside the plan/table, holding IO constant — same
method note as SCALING.md's existing probes.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def probe_pagerank(spark):
    from fda_clinical_etl_pipeline_spark.operators._util import tables
    from fda_clinical_etl_pipeline_spark.operators.graph import pagerank

    orders, lineitem = tables(spark, SF_DIR, "orders", "lineitem")
    eo = (
        orders.join(lineitem,
                    F.col("l_orderkey") == F.col("o_orderkey"))
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
        .distinct()
    )
    und = eo.union(eo.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    und = und.persist()
    n_edges = und.count()

    def run(edges):
        t0 = time.perf_counter()
        pagerank(edges, iterations=3).count()
        return time.perf_counter() - t0

    t1 = min(run(und) for _ in range(2))
    offset = 10_000_000
    rep = spark.range(10).select(F.col("id").alias("k"))
    und10 = und.crossJoin(rep).select(
        (F.col("src") + F.col("k") * offset).alias("src"),
        (F.col("dst") + F.col("k") * offset).alias("dst"),
    ).persist()
    n10 = und10.count()
    t10 = min(run(und10) for _ in range(2))
    print(f"pagerank: 1x {n_edges} edges {t1:.2f}s "
          f"({n_edges*3/t1/1e6:.1f}M edge-visits/s); "
          f"10x {n10} edges {t10:.2f}s "
          f"({n10*3/t10/1e6:.1f}M edge-visits/s); cost ratio "
          f"{t10/t1:.2f}x for 10x edges")
    und.unpersist(); und10.unpersist()


def probe_bpe(spark):
    from fda_clinical_etl_pipeline_spark.operators._util import tables
    from fda_clinical_etl_pipeline_spark.operators.bpe import (
        bpe_train,
        word_freq_table,
    )

    (docs,) = tables(spark, SF_DIR, "documents")
    n_types = word_freq_table(docs).count()

    def run(d):
        t0 = time.perf_counter()
        merges = bpe_train(d, num_merges=8)
        return (time.perf_counter() - t0) / 8, len(merges)

    per1, _ = run(docs)
    # ~10x word types: replicate docs, salting every word with a
    # replica suffix so the word-frequency relation grows 10x
    rep = spark.range(10).select(F.col("id").alias("k"))
    docs10 = docs.select("text").crossJoin(rep).select(
        F.when(F.col("k") == 0, F.col("text")).otherwise(
            # suffix every word with the replica id: word-type count
            # grows ~10x while corpus shape stays identical
            F.expr(
                "array_join(transform(split(text, ' '), "
                "w -> concat(w, 'z', k)), ' ')"
            )
        ).alias("text")
    )
    n10 = word_freq_table(docs10).count()
    per10, _ = run(docs10)
    print(f"bpe: per-merge {per1*1000:.0f}ms at {n_types} word types; "
          f"{per10*1000:.0f}ms at {n10} types; cost ratio "
          f"{per10/per1:.2f}x for {n10/n_types:.1f}x types")


def probe_delta_upsert(spark, tmp_root):
    import os
    import shutil

    from fda_clinical_etl_pipeline_spark.sources.delta_log import (
        DeltaProtocolTable,
    )

    base = spark.range(0, 400_000).select(
        F.col("id"),
        F.lit("v0").alias("ver"),
        F.lit(1).alias("stamp"),
    )
    inc = spark.createDataFrame(
        [(5, "new", 2), (200_001, "new", 2), (399_999, "new", 2)],
        "id long, ver string, stamp int",
    )
    results = {}
    for nfiles in (4, 40):
        path = os.path.join(tmp_root, f"delta_{nfiles}")
        shutil.rmtree(path, ignore_errors=True)
        t = DeltaProtocolTable.create(
            spark, path, base.repartitionByRange(nfiles, "id")
        )
        t0 = time.perf_counter()
        t.upsert(inc, key="id", precombine="stamp")
        results[nfiles] = time.perf_counter() - t0
    print(f"delta_upsert: 3-row upsert vs 400k-row table — "
          f"4 files {results[4]:.2f}s, 40 files {results[40]:.2f}s; "
          f"10x files costs {results[40]/results[4]:.2f}x "
          f"(log-only pruning: touched-file count, not table size, "
          f"prices the merge)")


if __name__ == "__main__":
    import sys
    import tempfile

    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1:] or ["pagerank", "bpe", "delta"]
    with tempfile.TemporaryDirectory() as tmp:
        if "pagerank" in which:
            probe_pagerank(spark)
        if "bpe" in which:
            probe_bpe(spark)
        if "delta" in which:
            probe_delta_upsert(spark, tmp)
