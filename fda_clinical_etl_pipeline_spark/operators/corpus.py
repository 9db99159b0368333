"""Training-corpus preparation: the north-star operators composed into
the pipeline a 100 TB pretraining-data job actually runs.

quality filter → exact dedup → MinHash near-dup removal → corpus stats,
in one lazy DataFrame chain:

1. quality gate (narrow, no shuffle): token/stopword/length heuristics;
2. exact dedup: keep min doc_id per normalized fingerprint (one shuffle
   on the digest);
3. near-dup removal: MinHash-LSH candidate pairs verified by Jaccard;
   from each near-dup pair the LARGER doc_id drops (union-find-free
   approximation that is deterministic and order-independent: a doc
   survives iff it is not the greater member of any qualifying pair);
4. outputs the surviving corpus with per-doc stats.

Each stage's drop counts are observable via ``corpus_report`` — no
silent-cap behavior: everything removed is accounted for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables
from .dedup import connected_components, minhash_lsh_candidates, verify_jaccard
from .text import stopword_count, token_count

MIN_TOKENS = 10
MIN_STOPWORD_RATIO = 0.05
NEAR_DUP_JACCARD = 0.5


def quality_gate(docs: DataFrame) -> DataFrame:
    n_tokens = token_count("text")
    n_stop = stopword_count("text")
    ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    return docs.filter(
        (n_tokens >= MIN_TOKENS) & (ratio >= MIN_STOPWORD_RATIO)
    )


def exact_dedup_keep_min(docs: DataFrame) -> DataFrame:
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " ")))
    keepers = (
        docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi")


def verified_near_dup_pairs(docs: DataFrame) -> DataFrame:
    """LSH candidates → exact-Jaccard-verified (doc_a, doc_b, jaccard);
    the shared verify primitive (dedup.verify_jaccard)."""
    ids = docs.select("doc_id", "text")
    return verify_jaccard(
        minhash_lsh_candidates(ids), ids, NEAR_DUP_JACCARD
    )


def near_dup_losers(docs: DataFrame, cluster: bool = False) -> DataFrame:
    """doc_ids to drop.

    cluster=False (default): the greater member of every verified pair —
    deterministic, order-independent, union-find-free; a chain A~B~C
    (A!~C) keeps A only if the A~B pair verifies, but B~C dropping C is
    independent of whether A~B verified.

    cluster=True: connected components over the verified pairs — the
    standard pretraining-dedup refinement: every member of a cluster
    except its min-doc_id canonical drops, however indirect the link."""
    pairs = verified_near_dup_pairs(docs)
    if cluster:
        comps = connected_components(pairs)
        return (
            comps.filter(F.col("doc_id") != F.col("component"))
            .select("doc_id")
        )
    return pairs.select(F.col("doc_b").alias("doc_id")).distinct()


def prepare_training_corpus(docs: DataFrame, cluster: bool = False) -> DataFrame:
    """The full preparation chain; returns surviving docs with stats."""
    gated = quality_gate(docs)
    exact = exact_dedup_keep_min(gated)
    survivors = exact.join(near_dup_losers(exact, cluster=cluster),
                           "doc_id", "left_anti")
    return survivors.select(
        "doc_id",
        "lang",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "training_corpus_prep",
    None,  # minhash stage is engine-hash-specific → rows-only check
    doc="North-star composition: quality gate → exact dedup → MinHash "
        "near-dup removal → surviving corpus with stats, one lazy chain. "
        "Stage drop-counts via corpus_report (no silent caps).",
)
def training_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    return prepare_training_corpus(documents)


def corpus_report(docs: DataFrame, cluster: bool = False) -> dict:
    """Stage-by-stage accounting. The two reused intermediates (gated,
    exact) are persisted for the duration: without the persist, each later
    count re-ran the whole upstream chain — including the MinHash
    candidate join — up to 3x."""
    gated = quality_gate(docs).persist()
    exact = exact_dedup_keep_min(gated).persist()
    try:
        total = docs.count()
        n_gated = gated.count()
        n_exact = exact.count()
        survivors = exact.join(near_dup_losers(exact, cluster=cluster),
                               "doc_id", "left_anti")
        n_final = survivors.count()
        return {
            "input": total,
            "dropped_quality": total - n_gated,
            "dropped_exact_dup": n_gated - n_exact,
            "dropped_near_dup": n_exact - n_final,
            "surviving": n_final,
        }
    finally:
        exact.unpersist()
        gated.unpersist()
