"""Round-11 scale probe: connected-components round count vs graph
diameter — min-label propagation against large-star/small-star.

Near-dup cluster graphs are usually shallow, but nothing guarantees it:
a template-chain corpus (doc i near-dups doc i+1) produces a path
graph, and min-label propagation moves labels ONE hop per round, so a
D-diameter component needs D rounds (each round = a join + groupBy +
convergence check over the full edge list). The star algorithm
(Kiveris et al., SoCC 2014) contracts toward a star forest in
O(log^2 n) rounds regardless of diameter.

The probe counts star rounds directly (one run per depth, using the
same per-round helpers the production function uses) and times the
min-label engine on the shallow cases for contrast. Claim under test:
star rounds grow ~log(depth) while min-label rounds equal depth, so at
100 TB (where one round is a full shuffle over billions of edges) only
the star engine is safe for unknown-diameter graphs.

Usage:
    python scale_probe_r11b.py
"""

from __future__ import annotations

import time


def main() -> None:
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        _large_star,
        _small_star,
        _star_canonical_edges,
        connected_components,
        connected_components_star,
    )
    from fda_clinical_etl_pipeline_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def path_graph(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )

    print("depth  | engine   | rounds | one component | wall")
    for depth in (100, 1_000, 10_000, 100_000):
        pairs = path_graph(depth)

        # Star: count rounds with the production per-round helpers.
        t0 = time.monotonic()
        edges = _star_canonical_edges(pairs).localCheckpoint()
        rounds = 0
        while True:
            new_edges = _small_star(_large_star(edges)).localCheckpoint()
            rounds += 1
            if new_edges.subtract(edges).isEmpty() and (
                new_edges.count() == edges.count()
            ):
                break
            edges = new_edges
        wall = time.monotonic() - t0
        one = (
            edges.groupBy("v").count().count() == 1
            and edges.count() == depth
        )
        print(
            f"{depth:>6} | star     | {rounds:>6} | {str(one):>13} |"
            f" {wall:6.2f}s"
        )

        # Sanity: the public function converges inside its default
        # budget and labels everything 0.
        labels = connected_components_star(pairs)
        assert labels.filter(F.col("component") != 0).count() == 0

        if depth <= 1_000:
            t0 = time.monotonic()
            import warnings

            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                labels = connected_components(pairs, max_iter=25)
                ncomp = labels.select("component").distinct().count()
            converged = not any(
                "no fixpoint" in str(w.message) for w in caught
            )
            wall = time.monotonic() - t0
            print(
                f"{depth:>6} | minlabel |"
                f" {'<=25' if converged else '>25':>6} |"
                f" {str(ncomp == 1):>13} | {wall:6.2f}s"
            )


if __name__ == "__main__":
    main()
