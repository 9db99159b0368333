"""Text-analysis operators over the ``documents`` table (north-star
extension: the text kernel a 100 TB training-data pipeline needs).

All of these are pure column expressions — tokenization, quality scoring,
language ID and fingerprinting run inside whole-stage codegen with zero
Python in the hot path, so they scale linearly with input splits: no
shuffle at all until an aggregate asks for one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..cache import persist_tracked
from ._util import money, tables

# Tiny stopword inventories for the n-gram/stopword language heuristic.
# Deliberately small and deterministic so the DuckDB oracle can replicate
# them verbatim.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")

_WS = "\\s+"


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization with empty-token removal (leading/trailing
    whitespace safe). Stays a native higher-order expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), _WS), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_count(col: str | Column, stopwords=STOPWORDS_EN) -> Column:
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
           CAST(LENGTH(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                   t -> t != '')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(LIST_DISTINCT(LIST_TRANSFORM(
                 LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), t -> t != ''),
                 t -> LOWER(t)))) AS BIGINT) AS n_unique_tokens
    FROM documents
    """,
    doc="Token counting (whitespace tokenizer) + vocabulary size per doc — "
        "all higher-order array expressions, no UDF.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    toks = tokens("text")
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.transform(toks, lambda t: F.lower(t))))
        .cast("long")
        .alias("n_unique_tokens"),
    )


@register(
    "text_quality_score",
    """
    WITH t AS (
      SELECT doc_id, lang, text,
             CAST(LENGTH(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                     x -> x != '')) AS BIGINT) AS n_tokens,
             CAST(LENGTH(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                   x -> LIST_CONTAINS(['the','a','of','and','to','in','is','that','it','for'],
                                      LOWER(x)))) AS BIGINT) AS n_stop,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g'))
                  AS BIGINT) AS n_punct,
             CAST(LENGTH(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           ROUND(CAST(n_stop  AS DOUBLE) / GREATEST(n_tokens, 1), 4) AS stopword_ratio,
           ROUND(CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1), 4)  AS punct_ratio,
           ROUND(CAST(n_chars AS DOUBLE) / GREATEST(n_tokens, 1), 4) AS avg_token_len,
           CASE WHEN n_tokens >= 10
                 AND CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1) >= 0.05
                THEN 'keep' ELSE 'flag' END AS quality_bucket
    FROM t
    """,
    doc="Quality scoring: length / punctuation / stopword-ratio heuristics "
        "(Gopher-style filters) as one codegen'd projection.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    n_tokens = token_count("text")
    n_stop = stopword_count("text")
    n_chars = F.length("text").cast("long")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", "\\p{Punct}", ""))
    ).cast("long")
    stop_ratio = F.round(n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)), 4)
    d = documents.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4).alias(
            "punct_ratio"
        ),
        F.round(n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 4).alias(
            "avg_token_len"
        ),
        F.when(
            (n_tokens >= 10) & (n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)) >= 0.05),
            "keep",
        )
        .otherwise("flag")
        .alias("quality_bucket"),
    )
    return d


@register(
    "text_lang_id",
    """
    WITH t AS (
      SELECT doc_id, lang AS lang_label,
             LIST_TRANSFORM(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                        x -> x != ''), x -> LOWER(x)) AS toks
      FROM documents
    )
    SELECT doc_id, lang_label,
           CASE
             WHEN CAST(LENGTH(LIST_FILTER(toks,
                    x -> LIST_CONTAINS(['the','a','of','and','to','in','is','that','it','for'], x)))
                  AS DOUBLE) / GREATEST(LENGTH(toks), 1) >= 0.08 THEN 'en'
             ELSE 'other'
           END AS lang_pred
    FROM t
    """,
    doc="Language-ID heuristic (stopword-hit-rate n-gram proxy). The "
        "fixture text is synthetic so the interesting part is the operator "
        "shape: per-doc token scan + ratio + threshold, zero Python.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    n_tokens = token_count("text")
    n_stop = stopword_count("text")
    ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    return documents.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        F.when(ratio >= 0.08, "en").otherwise("other").alias("lang_pred"),
    )


@register(
    "text_top_bigrams",
    """
    WITH toks AS (
      SELECT doc_id, LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), t -> t != ''),
               t -> LOWER(t)) AS tok
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, tok[i] || ' ' || tok[i+1] AS bigram
      FROM toks, UNNEST(range(1, GREATEST(LENGTH(tok), 1))) AS u(i)
    )
    SELECT bigram,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    doc="Corpus-wide bigram vocabulary: per-doc bigram explode → global "
        "frequency + document frequency → deterministic top-20. The "
        "n-gram census a tokenizer-training / contamination-check pass "
        "runs; partial aggregation bounds the shuffle at vocab size.",
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    toksdf = documents.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.lower(t)).alias("tok"),
    )
    n = F.size("tok")
    # guard: sequence(1, 0) would generate DESCENDING [1, 0] in Spark, so
    # docs with <2 tokens must take the empty-array branch explicitly
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("tok", i), F.element_at("tok", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = toksdf.select("doc_id", F.explode(pairs).alias("bigram"))
    return (
        bigrams.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


@register(
    "text_tfidf_topterms",
    """
    WITH toks AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), t -> t != ''),
               t -> LOWER(t)))) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term FROM toks),
    df AS (SELECT term, COUNT(*) AS n_docs FROM tf GROUP BY term),
    total AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(LN((1.0 + n.n) / (1.0 + df.n_docs)) + 1.0, 6) AS idf
      FROM tf JOIN df USING (term) CROSS JOIN total n
    )
    SELECT doc_id, term, idf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY idf DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    doc="TF-IDF-style distinctive-term extraction: document frequency via "
        "one grouped pass, smoothed idf (sklearn convention), top-3 "
        "rarest terms per doc. The relational core of TF-IDF — the "
        "spark.ml HashingTF/IDF pipeline gives the vectorized form; this "
        "keeps terms inspectable and oracle-checkable.",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (documents,) = tables(spark, sf_dir, "documents")
    # corpus size as a 1-row aggregate cross-joined in (broadcast NL) —
    # no driver-side action inside the query plan
    total = documents.agg(
        F.count(F.lit(1)).cast("double").alias("_total_docs")
    )
    # persist: the (doc, term) relation feeds both the document-
    # frequency aggregate and the score join-back — without it the
    # corpus is tokenized twice (guide §5 reuse rule)
    tf = documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.transform(tokens("text"), lambda t: F.lower(t)))
        ).alias("term"),
    )
    tf = persist_tracked(tf)
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df_counts, "term").crossJoin(total).select(
        "doc_id",
        "term",
        F.round(
            F.log((1.0 + F.col("_total_docs")) / (1.0 + F.col("n_docs")))
            + 1.0,
            6,
        ).alias("idf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("idf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "idf")
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fingerprint,
           md5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_TRANSFORM(
                 LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), t -> t != ''),
                 t -> LOWER(t)))), ' ')) AS bag_fingerprint
    FROM documents
    """,
    doc="Document fingerprinting: md5 of the whitespace-normalized text "
        "(exact-dup key) and of the sorted unique-token bag "
        "(order-insensitive near-dup key).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), _WS, " "))
    bag = F.array_join(
        F.array_sort(
            F.array_distinct(F.transform(tokens("text"), lambda t: F.lower(t)))
        ),
        " ",
    )
    return documents.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.md5(bag).alias("bag_fingerprint"),
    )


@register(
    "text_repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS toks
      FROM documents
    ),
    ex AS (SELECT doc_id, UNNEST(toks) AS tok FROM toks),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY doc_id, tok),
    agg AS (SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_c,
                   COUNT(*) AS n_distinct
            FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 4) AS distinct_ratio,
           ROUND(top_c / CAST(n_tokens AS DOUBLE), 4) AS top_token_share
    FROM agg
    """,
    doc="Gopher-style repetition quality signals (Rae et al. 2021 §A1.1: "
        "repetitious documents are low-quality training data): per-doc "
        "distinct-token ratio and most-frequent-token share. Shape: "
        "explode -> (doc_id, tok) partial-agg counts -> per-doc agg; two "
        "shuffles keyed by doc_id-prefixed keys, uniform by construction "
        "- no skew at corpus scale. Filter downstream on e.g. "
        "top_token_share > 0.2 or distinct_ratio < 0.3.",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    ex = documents.select(
        "doc_id",
        F.explode(
            F.transform(tokens("text"), lambda t: F.lower(t))
        ).alias("tok"),
    )
    cnt = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.max("c").alias("top_c"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("n_distinct") / F.col("n_tokens").cast("double"), 4
            ).alias("distinct_ratio"),
            F.round(
                F.col("top_c") / F.col("n_tokens").cast("double"), 4
            ).alias("top_token_share"),
        )
    )


@register(
    "text_token_entropy",
    """
    WITH toks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS toks
      FROM documents
    ),
    ex AS (SELECT doc_id, UNNEST(toks) AS tok FROM toks),
    cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM ex GROUP BY doc_id, tok),
    agg AS (SELECT doc_id, SUM(c) AS n, SUM(c * LN(c)) AS s
            FROM cnt GROUP BY doc_id)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           ROUND(LN(n) - s / n, 4) + 0 AS token_entropy
    FROM agg
    """,
    doc="Per-document Shannon entropy of the token distribution - the "
        "information-density quality signal (near-zero = degenerate "
        "repetition, the complement of text_repetition_stats). Uses the "
        "algebraic identity H = ln(n) - (1/n) SUM c*ln(c), so a SINGLE "
        "two-level partial aggregation computes it: no per-doc "
        "probability materialization, shuffle keys uniform by "
        "construction. '+ 0' normalizes IEEE -0.0 (single-token docs) "
        "for the cross-engine hash.",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    ex = documents.select(
        "doc_id",
        F.explode(
            F.transform(tokens("text"), lambda t: F.lower(t))
        ).alias("tok"),
    )
    cnt = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log("c")).alias("s"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            (
                F.round(F.log("n") - F.col("s") / F.col("n"), 4)
                + F.lit(0.0)
            ).alias("token_entropy"),
        )
    )


# --- BM25 retrieval -------------------------------------------------------

# Okapi BM25 defaults (Robertson/Sparck Jones); idf is the Lucene
# non-negative variant ln(1 + (N - df + 0.5)/(df + 0.5)).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_TERMS = ("spark", "vector", "merge")
BM25_TOP_K = 10


@register(
    "text_bm25_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t))) AS term
      FROM documents
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n, AVG(dl) AS avgdl
      FROM doclen
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks
      WHERE term IN ('{BM25_QUERY_TERMS[0]}', '{BM25_QUERY_TERMS[1]}',
                     '{BM25_QUERY_TERMS[2]}')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS n_docs FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             ROUND(
               ROUND(LN(1.0 + (s.n - df.n_docs + 0.5)
                              / (df.n_docs + 0.5)), 6)
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * (doclen.dl / s.avgdl))), 6) AS s
      FROM tf JOIN df USING (term)
              JOIN doclen USING (doc_id)
              CROSS JOIN stats s
    ),
    ranked AS (
      SELECT doc_id, ROUND(SUM(s), 4) AS bm25,
             CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM scored GROUP BY doc_id
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, bm25, n_terms FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM ranked
    ) WHERE rank <= {BM25_TOP_K}
    """,
    doc="Okapi BM25 top-k retrieval over the corpus for a fixed query "
        "(k1=1.2, b=0.75, Lucene non-negative idf): the scoring core "
        "of hard-negative mining / eval-set retrieval in a training-"
        "data pipeline. Scale shape: the term filter lands BEFORE the "
        "tf groupBy, so the shuffled intermediate is O(matching "
        "postings), not O(corpus tokens); doc lengths and avgdl are "
        "one grouped pass + a broadcast 1-row aggregate; per-term df "
        "is a broadcast-joined dimension; final top-k is a single "
        "TakeOrderedAndProject, never a global sort materialization. "
        "Both engines round idf and per-term scores to 6 decimals and "
        "the 3-term sum to 4, making the float path order-insensitive.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (documents,) = tables(spark, sf_dir, "documents")
    # ONE explode pass over corpus tokens, carrying the doc length
    # (token-array size) through to the tf groupBy — no doclen join,
    # no second tokenize+explode for df. Spark does not share physical
    # subtrees between DataFrame consumers, so every extra reference
    # to the exploded lineage is a full corpus re-scan at 100 TB; this
    # shape scans the corpus exactly twice (postings + the 1-row
    # avgdl/N aggregate) and shuffles only O(matching postings).
    toks = documents.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.lower(t)).alias("_tk"),
    ).select(
        "doc_id",
        F.size("_tk").alias("dl"),
        F.explode("_tk").alias("term"),
    )
    # corpus size and mean doc length in one 1-row aggregate (docs
    # with zero tokens count toward N but not avgdl)
    stats = documents.select(
        F.size(tokens("text")).alias("dl")
    ).agg(
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
        F.count(F.lit(1)).alias("n"),
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.first("dl").alias("dl"),  # constant within the group
        )
    )
    # per-term document frequency as a window over the (small) matched
    # relation — one O(matching postings) shuffle on term instead of a
    # groupBy+join that would recompute the corpus explode
    tf = tf.withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    idf = F.round(
        F.log(
            1.0 + (F.col("n") - F.col("n_docs") + 0.5)
            / (F.col("n_docs") + 0.5)
        ),
        6,
    )
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                idf * (F.col("tf") * (BM25_K1 + 1.0))
                / (F.col("tf") + BM25_K1 * (1.0 - BM25_B
                   + BM25_B * (F.col("dl") / F.col("avgdl")))),
                6,
            ).alias("s"),
        )
    )
    ranked = scored.groupBy("doc_id").agg(
        F.round(F.sum("s"), 4).alias("bm25"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    # distributed top-k first (TakeOrderedAndProject — per-partition
    # heaps, no global sort/window over the full posting-match set);
    # the rank window then runs over only BM25_TOP_K rows
    top = ranked.orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    ).limit(BM25_TOP_K)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "bm25", "n_terms")
    )
