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
from ..cache import persist_tracked
from ._util import tables
from .dedup import (
    _shingle_truth_ctes,
    connected_components,
    lowered_tokens,
    minhash_lsh_candidates,
    verify_shingle_jaccard,
)
from .text import stopword_count, token_count

MIN_TOKENS = 10
MIN_STOPWORD_RATIO = 0.05
NEAR_DUP_JACCARD = 0.5


def _spread(docs: DataFrame) -> DataFrame:
    """Spread (doc_id, text, ...) rows across the cores when the scan
    under-parallelizes (single-row-group testdata => one task): the
    whole prep chain's CPU (quality-gate tokenization, fingerprint
    md5, shingling) otherwise runs serially. A properly split
    production scan skips the exchange (same gate as the SimHash and
    k-gram paths)."""
    sess = docs.sparkSession
    par = sess.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        return docs.repartition(par, "doc_id")
    return docs


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
    """LSH candidates → exact-SHINGLE-Jaccard-verified (doc_a, doc_b,
    jaccard) — the same resemblance metric the MinHash sketch estimates,
    applied exactly (dedup.verify_shingle_jaccard). One tokenization
    pass feeds both the signatures and the verify shingle sets."""
    ids = docs.select("doc_id", "text")
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(ids.repartition(parallelism, "doc_id"))
    )
    return verify_shingle_jaccard(
        minhash_lsh_candidates(toks=toks), toks=toks,
        threshold=NEAR_DUP_JACCARD,
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
    """The full preparation chain; returns surviving docs with stats.

    ``exact`` is persisted: it feeds both sides of the survivor
    anti-join (directly, and through the near-dup loser derivation), so
    without it the whole quality-gate + exact-dedup subtree runs twice
    (guide §5 reuse rule — same persist corpus_report already applies)."""
    gated = quality_gate(_spread(docs))
    exact = persist_tracked(exact_dedup_keep_min(gated))
    survivors = exact.join(near_dup_losers(exact, cluster=cluster),
                           "doc_id", "left_anti")
    return survivors.select(
        "doc_id",
        "lang",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _quality_exact_ctes() -> str:
    """DuckDB CTEs replicating quality_gate + exact_dedup_keep_min over
    ``documents``: ``exact(doc_id, text, lang, arr0)`` is the surviving
    relation. Shared by the xxhash64 gate oracle and the portable twin."""
    from .text import STOPWORDS_EN

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
    tokarr AS (
      SELECT doc_id, text, lang,
             LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                         t -> t != '') AS arr0
      FROM documents
    ), qual AS (
      SELECT doc_id, text, lang, arr0 FROM tokarr
      WHERE LEN(arr0) >= {MIN_TOKENS}
        AND CAST(LEN(LIST_FILTER(arr0,
                t -> LOWER(t) IN ({stop_list}))) AS DOUBLE)
            / GREATEST(LEN(arr0), 1) >= {MIN_STOPWORD_RATIO}
    ), fps AS (
      SELECT doc_id,
             md5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fp
      FROM qual
    ), keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM fps GROUP BY fp
    ), exact AS (
      SELECT q.* FROM qual q JOIN keepers k USING (doc_id)
    )"""


@register(
    "training_corpus_prep",
    "WITH " + _quality_exact_ctes() + ", "
    + _shingle_truth_ctes(src="exact", threshold=NEAR_DUP_JACCARD) + """
    , losers AS (SELECT DISTINCT doc_b AS doc_id FROM spairs)
    SELECT e.doc_id, e.lang,
           CAST(LEN(e.arr0) AS BIGINT)  AS n_tokens,
           CAST(LENGTH(e.text) AS BIGINT) AS n_chars
    FROM exact e
    WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
    doc="North-star composition: quality gate → exact dedup → MinHash "
        "near-dup removal (exact-shingle-verified) → surviving corpus "
        "with stats, one lazy chain. Stage drop-counts via corpus_report "
        "(no silent caps). Oracle = the full chain recomputed in DuckDB "
        "with the near-dup stage resolved from the EXACT all-pairs "
        "shingle-Jaccard truth — a green row certifies every stage "
        "including LSH recall on the gate corpus (see dedup_minhash_lsh "
        "for the recall argument).",
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
    exact = persist_tracked(exact_dedup_keep_min(gated))
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


def _corpus_portable_oracle() -> str:
    """DuckDB oracle for the FULL prep chain under the portable hash
    family: quality gate → exact dedup → portable-LSH near-dup pairs →
    drop greater pair members → survivor stats. The near-dup stage
    reuses dedup._portable_oracle_ctes parameterized onto the
    exact-deduped relation."""
    from .dedup import _portable_oracle_ctes

    return (
        "WITH " + _quality_exact_ctes() + ","
        + _portable_oracle_ctes(src="exact") + """
    , losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
    SELECT e.doc_id, e.lang,
           CAST(LEN(e.arr0) AS BIGINT)  AS n_tokens,
           CAST(LENGTH(e.text) AS BIGINT) AS n_chars
    FROM exact e
    WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
    """
    )


@register(
    "training_corpus_prep_portable",
    _corpus_portable_oracle(),
    doc="The full corpus-prep chain under the PORTABLE md5 hash family "
        "— quality gate → exact dedup → portable-LSH near-dup removal → "
        "survivor stats — fully oracle-gated: DuckDB recomputes every "
        "stage including the LSH pipeline in SQL. Certifies the "
        "composition end-to-end; training_corpus_prep (xxhash64) stays "
        "the production path.",
)
def training_corpus_prep_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .dedup import (
        lowered_tokens,
        portable_minhash_candidates,
        verify_jaccard,
    )

    (documents,) = tables(spark, sf_dir, "documents")
    gated = quality_gate(_spread(documents))
    # persisted (tracked): exact feeds the near-dup chain AND the
    # survivor anti-join — without it the gate + dedup subtree runs
    # twice (the xxhash64 twin already persists it)
    exact = persist_tracked(exact_dedup_keep_min(gated))
    ids = exact.select("doc_id", "text")
    parallelism = spark.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(ids.repartition(parallelism, "doc_id"))
    )
    pairs = verify_jaccard(
        portable_minhash_candidates(toks),
        threshold=NEAR_DUP_JACCARD,
        toks=toks,
    )
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = exact.join(losers, "doc_id", "left_anti")
    return survivors.select(
        "doc_id",
        "lang",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
