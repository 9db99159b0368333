"""ANN quality pins: the LSH/IVF similarity paths are rows-only in the
driver gate forever (bucketing depends on engine hash seeds / learned
centroids), so their QUALITY is asserted here instead — measured recall
against the exact brute-force cosine top-k on the same fixture.

Everything is deterministic (xxhash64 hyperplanes, KMeans seed=42,
sample seed=42), so the measured recalls are exact constants at this
fixture (LSH 0.60, IVF 0.667 at sf0.001); the floors sit far enough
below to survive an intentional re-tuning of planes/nlist while still
catching a broken bucket join (recall would crater toward 0).
"""

from __future__ import annotations

from fda_clinical_etl_pipeline_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
QUERIES = all_queries()

LSH_RECALL_FLOOR = 0.4
IVF_RECALL_FLOOR = 0.4


def _topk_pairs(spark, name):
    return {(r.q_id, r.c_id) for r in QUERIES[name].fn(spark, SF_DIR).collect()}


def test_ann_recall_floors(spark):
    exact = _topk_pairs(spark, "sim_cosine_topk")
    assert exact, "exact top-k returned nothing"
    lsh = _topk_pairs(spark, "sim_ann_lsh_topk")
    ivf = _topk_pairs(spark, "sim_ann_ivf_topk")

    lsh_recall = len(lsh & exact) / len(exact)
    ivf_recall = len(ivf & exact) / len(exact)
    assert lsh_recall >= LSH_RECALL_FLOOR, (
        f"LSH recall {lsh_recall:.3f} below floor {LSH_RECALL_FLOOR} — "
        "bucket join or hyperplane hashing regressed"
    )
    assert ivf_recall >= IVF_RECALL_FLOOR, (
        f"IVF recall {ivf_recall:.3f} below floor {IVF_RECALL_FLOOR} — "
        "cell assignment / nprobe probing regressed (uniform-data "
        "expectation is ~nprobe/nlist plus the query's own cell)"
    )


def test_ann_result_shape(spark):
    """Both ANN paths must return a full top-k slate per query — a
    too-small candidate pool (over-aggressive bucketing) shows up as
    missing rows before it shows up as bad recall."""
    exact = QUERIES["sim_cosine_topk"].fn(spark, SF_DIR)
    n_expected = exact.count()
    for name in ("sim_ann_lsh_topk", "sim_ann_ivf_topk"):
        df = QUERIES[name].fn(spark, SF_DIR)
        assert df.count() == n_expected, f"{name} returned fewer pairs"
        assert df.columns == ["q_id", "c_id", "cosine"]
