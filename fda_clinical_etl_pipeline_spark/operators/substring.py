"""Exact substring-level deduplication (duplicated k-gram spans).

Document-level dedup (exact / MinHash / SimHash, ``dedup.py``) removes
whole near-identical documents; training corpora ALSO carry massive
*within*-document and *cross*-document repeated substrings (boilerplate
headers, license blocks, templated passages) that survive document
dedup. Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022) deduplicate at the substring level with a corpus
suffix array; the Spark-native re-expression here finds every token
position whose word k-gram occurs more than once in the whole corpus —
the same duplicated-span signal — with two bounded shuffles instead of
a suffix array:

1. one narrow pass explodes each document into (pos, gram) pairs via
   higher-order expressions (``transform`` over ``sequence``, no UDF);
2. gram occurrence counts: one hash-partitioned groupBy on the gram
   (O(total tokens) shuffle rows — the same class as
   ``llm_decontaminate``'s 5-gram join);
3. duplicated positions join back on gram, then contiguous runs
   collapse to islands with the gaps-and-islands window per document
   (window state is O(one document's duplicated positions)).

At 100 TB: everything is keyed by gram or doc_id — uniform by
construction (grams are near-unique), no all-pairs step anywhere; the
candidate-duplicated subset that reaches the window is typically a
small fraction of the corpus.

``mask_duplicated_spans`` turns the span signal into the actual
cleaning transformation: tokens covered by any duplicated k-gram are
dropped (the paper's removal policy, expressed per-token), keeping one
canonical occurrence per gram (the globally-first (doc_id, pos)).

Reference scope note: the reference pipeline (etl/transform.py) has no
substring dedup; this is north-star LLM-pipeline surface like the rest
of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables
from .text import tokens

K = 5  # word k-gram width — the dedup unit


def _grams(documents: DataFrame, k: int, text_col: str,
           id_col: str) -> DataFrame:
    """(id, pos, gram): every word k-gram with its 1-based start
    position. Narrow (one projection + explode); documents shorter
    than k contribute nothing.

    The tokenize + per-position concat is the CPU core of the whole
    operator (measured 0.6 of dedup_substring_spans' 0.78 s at sf0.1),
    and it inherits the SCAN's parallelism — one task on a single-row-
    group file. Spread the (id, text) rows across the cores first when
    the scan under-parallelizes; a properly split production scan
    skips the exchange (same gate as the SimHash sketch)."""
    sess = documents.sparkSession
    par = sess.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < par:
        documents = documents.repartition(par, id_col)
    tk = tokens(text_col)
    return (
        documents
        .select(id_col, tk.alias("_tk"))
        .filter(F.size("_tk") >= k)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_tk) - {k} + 1), "
                    f"i -> struct(i AS pos, "
                    f"concat_ws(' ', slice(_tk, i, {k})) AS gram))"
                )
            ).alias("g"),
        )
        .select(id_col, "g.pos", "g.gram")
    )


def duplicated_positions(
    documents: DataFrame,
    k: int = K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos) for every token position whose k-gram occurs more
    than once in the corpus (any document, including its own)."""
    grams = _grams(documents, k, text_col, id_col)
    # one shuffle on gram (count-over window), not groupBy + join-back
    # (two shuffles + a second evaluation of the explode); per-gram
    # window state is the occurrence list of ONE gram — tiny
    w = Window.partitionBy("gram")
    return (
        grams.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") > 1)
        .select(id_col, "pos")
    )


def duplicated_span_stats(
    documents: DataFrame,
    k: int = K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span profile: for documents with at
    least one duplicated k-gram position — total duplicated positions,
    number of contiguous islands, longest island, and the document's
    gram count (islands via gaps-and-islands, windowed per doc)."""
    pos = duplicated_positions(documents, k, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        pos.withColumn("_grp", F.col("pos") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    per_doc = islands.groupBy(id_col).agg(
        F.sum("_len").cast("long").alias("n_dup_positions"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("_len").cast("long").alias("max_island_len"),
    )
    n_grams = (
        documents.select(
            id_col,
            (F.size(tokens(text_col)) - k + 1).cast("long")
            .alias("n_grams"),
        )
        .filter(F.col("n_grams") >= 1)
    )
    return per_doc.join(n_grams, id_col).select(
        id_col, "n_grams", "n_dup_positions", "n_islands",
        "max_island_len",
    )


def mask_duplicated_spans(
    documents: DataFrame,
    k: int = K,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The cleaning transformation: rebuild each document's text with
    every token covered by a NON-CANONICAL duplicated k-gram removed.
    For each duplicated gram the globally-first occurrence (min
    (doc_id, pos)) is canonical and keeps its tokens; every other
    occurrence's k-token window is dropped. Documents shorter than k
    tokens pass through unchanged.

    Coverage is computed without materializing per-token rows for the
    whole corpus: only duplicated occurrences explode into their k
    covered positions, then an anti-join-shaped array filter drops the
    covered tokens per document."""
    grams = _grams(documents, k, text_col, id_col)
    w_gram = Window.partitionBy("gram").orderBy(id_col, "pos")
    non_canonical = (
        grams.withColumn("_rk", F.row_number().over(w_gram))
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy("gram"))
        )
        .filter((F.col("_n") > 1) & (F.col("_rk") > 1))
        .select(id_col, "pos")
    )
    covered = (
        non_canonical.select(
            id_col,
            F.explode(
                F.expr(f"sequence(pos, pos + {k} - 1)")
            ).alias("cpos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("cpos").alias("_covered"))
    )
    return (
        documents.withColumn("_tk0", tokens(text_col))
        .join(covered, id_col, "left")
        .withColumn(
            "clean_text",
            F.when(F.col("_covered").isNull(), F.col(text_col))
            .otherwise(
                # two-arg filter lambda: i is the 0-based token index
                F.expr(
                    "concat_ws(' ', filter(_tk0, "
                    "(t, i) -> NOT array_contains(_covered, i + 1)))"
                )
            ),
        )
        .drop("_covered", "_tk0")
    )


@register(
    "dedup_substring_spans",
    f"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                         t -> t != '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             ARRAY_TO_STRING(tk[i:i + {K} - 1], ' ') AS gram
      FROM toks, UNNEST(RANGE(1, LENGTH(tk) - {K} + 2)) AS t(i)
      WHERE LENGTH(tk) >= {K}
    ),
    dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1
    ),
    duppos AS (
      SELECT g.doc_id, g.pos,
             g.pos - ROW_NUMBER() OVER (
               PARTITION BY g.doc_id ORDER BY g.pos) AS grp
      FROM grams g JOIN dup USING (gram)
    ),
    islands AS (
      SELECT doc_id, grp, COUNT(*) AS len
      FROM duppos GROUP BY 1, 2
    ),
    perdoc AS (
      SELECT doc_id,
             CAST(SUM(len) AS BIGINT) AS n_dup_positions,
             CAST(COUNT(*) AS BIGINT) AS n_islands,
             CAST(MAX(len) AS BIGINT) AS max_island_len
      FROM islands GROUP BY 1
    )
    SELECT p.doc_id,
           CAST(LENGTH(t.tk) - {K} + 1 AS BIGINT) AS n_grams,
           p.n_dup_positions, p.n_islands, p.max_island_len
    FROM perdoc p JOIN toks t USING (doc_id)
    """,
    doc="Substring-level dedup signal (Lee et al. 2022, suffix-array "
        "substring dedup re-expressed Spark-native): every token "
        f"position whose word {K}-gram occurs >1 time in the corpus, "
        "collapsed to contiguous islands per document. Two bounded "
        "shuffles (gram groupBy + gram join-back) and a per-doc "
        "gaps-and-islands window — no suffix array, no all-pairs. "
        "The DuckDB oracle recomputes the identical definition.",
)
def dedup_substring_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    return duplicated_span_stats(documents)


@register(
    "dedup_substring_mask_portable",
    f"""
    WITH toks AS (
      SELECT doc_id, text,
             LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                         t -> t != '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             ARRAY_TO_STRING(tk[i:i + {K} - 1], ' ') AS gram
      FROM toks, UNNEST(RANGE(1, LENGTH(tk) - {K} + 2)) AS t(i)
      WHERE LENGTH(tk) >= {K}
    ),
    occ AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY gram
                                ORDER BY doc_id, pos) AS rk,
             COUNT(*) OVER (PARTITION BY gram) AS n
      FROM grams
    ),
    covered AS (
      SELECT DISTINCT doc_id, CAST(cpos AS INTEGER) AS cpos FROM (
        SELECT doc_id, UNNEST(RANGE(pos, pos + {K})) AS cpos
        FROM occ WHERE n > 1 AND rk > 1
      )
    ),
    tokrows AS (
      SELECT doc_id, tk[CAST(i AS INTEGER)] AS tok,
             CAST(i AS INTEGER) AS j
      FROM toks, UNNEST(RANGE(1, LENGTH(tk) + 1)) AS u(i)
    ),
    kept AS (
      SELECT tr.doc_id,
             ARRAY_TO_STRING(LIST(tr.tok ORDER BY tr.j), ' ')
               AS rebuilt
      FROM tokrows tr
      LEFT JOIN covered c
        ON c.doc_id = tr.doc_id AND c.cpos = tr.j
      WHERE c.cpos IS NULL
      GROUP BY 1
    ),
    cov_docs AS (SELECT DISTINCT doc_id FROM covered)
    SELECT t.doc_id,
           md5(CASE WHEN cd.doc_id IS NULL THEN t.text
                    ELSE COALESCE(k.rebuilt, '') END) AS clean_md5
    FROM toks t
    LEFT JOIN cov_docs cd USING (doc_id)
    LEFT JOIN kept k USING (doc_id)
    """,
    doc="Portable certification of the masking TRANSFORMATION: md5 of "
        "each document's cleaned text, with DuckDB re-deriving the "
        "full policy (non-canonical duplicated-gram occurrences cover "
        "their k tokens; covered tokens drop; whitespace renormalizes; "
        "untouched docs byte-identical) in pure SQL. A hash mismatch "
        "on ANY document fails the gate — the strongest oracle shape "
        "for a rewrite operator.",
)
def dedup_substring_mask_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    return mask_duplicated_spans(documents).select(
        "doc_id", F.md5("clean_text").alias("clean_md5")
    )
