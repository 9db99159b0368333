"""Invariant tests for the integer-arithmetic PageRank operator."""

from __future__ import annotations

from fda_clinical_etl_pipeline_spark.operators.graph import (
    TOTAL_MASS,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_symmetric_pair_has_equal_ranks(spark):
    # two nodes, one undirected edge: perfectly symmetric, so ranks equal
    out = pagerank(_edges(spark, [(1, 2), (2, 1)]), iterations=3).collect()
    ranks = {r.node: r.rank for r in out}
    assert set(ranks) == {1, 2}
    assert ranks[1] == ranks[2]


def test_mass_approximately_conserved(spark):
    # star: hub 0 connected to 1..4 (undirected). Truncating division
    # loses < 1 unit per division, so total mass stays within
    # (nodes + edges) * iterations of TOTAL_MASS.
    pairs = []
    for k in range(1, 5):
        pairs += [(0, k), (k, 0)]
    out = pagerank(_edges(spark, pairs), iterations=3).collect()
    total = sum(r.rank for r in out)
    slack = (5 + len(pairs)) * 3 + 5
    assert TOTAL_MASS - slack <= total <= TOTAL_MASS


def test_hub_outranks_leaves(spark):
    pairs = []
    for k in range(1, 6):
        pairs += [(0, k), (k, 0)]
    ranks = {
        r.node: r.rank
        for r in pagerank(_edges(spark, pairs), iterations=3).collect()
    }
    assert all(ranks[0] > ranks[k] for k in range(1, 6))
    # leaves are symmetric with each other
    assert len({ranks[k] for k in range(1, 6)}) == 1


def test_deterministic_across_runs(spark):
    pairs = [(i, (i * 7) % 11) for i in range(11)] + [
        ((i * 7) % 11, i) for i in range(11)
    ]
    a = sorted(
        (r.node, r.rank)
        for r in pagerank(_edges(spark, pairs), iterations=3).collect()
    )
    b = sorted(
        (r.node, r.rank)
        for r in pagerank(_edges(spark, pairs), iterations=3).collect()
    )
    assert a == b


# --- triangle counting ------------------------------------------------------


def _und(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_triangles_k4_and_square(spark):
    from fda_clinical_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # K4 on {0..3}: C(4,3)=4 triangles, each node on exactly 3;
    # square {10..13}: zero triangles, nodes absent from output
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(_und(spark, k4 + square)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_normalize_direction_and_duplicates(spark):
    from fda_clinical_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # one triangle given with mixed directions and duplicate edges
    messy = [(1, 2), (2, 1), (3, 2), (1, 3), (1, 3), (4, 1)]
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(_und(spark, messy)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_hub_graph_counts(spark):
    from fda_clinical_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    # hub 0 connected to 1..8, plus chain edges (1,2),(3,4),(5,6):
    # 3 triangles, hub on all of them, chain nodes on one each.
    pairs = [(0, i) for i in range(1, 9)] + [(1, 2), (3, 4), (5, 6)]
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(_und(spark, pairs)).collect()
    }
    assert got[0] == 3
    assert all(got[n] == 1 for n in (1, 2, 3, 4, 5, 6))
    assert 7 not in got and 8 not in got
