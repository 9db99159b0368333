"""LLM training-data preparation operators beyond dedup/similarity
(north-star extensions): chunking, deterministic sampling, benchmark
decontamination.

All three are pure built-in-expression plans (codegen, no UDF) and all
three are DuckDB-oracle-gated — the chunker and decontaminator use md5
content hashes so the comparison is content-exact without shipping full
chunk text through the gate.

Scale notes:
- chunking is narrow (explode over per-row sequences — no shuffle);
  output rows ≈ docs × chunks/doc, the natural pretraining unit;
- hash sampling is a narrow filter — deterministic, reproducible,
  restartable (no RNG state), stratification verified by aggregation;
- decontamination shuffles O(distinct n-grams) per side, never all-pairs;
  the benchmark side is a broadcast-sized distinct set in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..cache import persist_tracked
from ._util import tables
from .dedup import shingles_from
from .text import tokens

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks
DECON_NGRAM = 5


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """documents(doc_id, text) → one row per training chunk:
    (doc_id, chunk_idx, chunk_start, n_chunk_tokens, chunk_md5).

    Token-window chunking with overlap: chunk i covers tokens
    [1 + i*stride, 1 + i*stride + chunk_tokens). posexplode over a
    per-row start sequence — narrow, no shuffle; the chunk becomes the
    unit every downstream stage (tokenize/pack/shuffle-for-training)
    consumes."""
    toksdf = docs.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.lower(t)).alias("toks"),
    ).withColumn("n_toks", F.size("toks")).filter(F.col("n_toks") > 0)
    starts = F.sequence(F.lit(1), F.col("n_toks"), F.lit(stride))
    exploded = toksdf.select(
        "doc_id", "toks",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_start"), F.lit(chunk_tokens))
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


@register(
    "llm_chunk_documents",
    f"""
    WITH toks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS toks
      FROM documents
    ),
    starts AS (
      SELECT doc_id, toks, LENGTH(toks) AS n_toks,
             UNNEST(RANGE(1, LENGTH(toks) + 1, {CHUNK_STRIDE})) AS chunk_start
      FROM toks WHERE LENGTH(toks) > 0
    )
    SELECT doc_id,
           CAST((chunk_start - 1) // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(LEAST({CHUNK_TOKENS}, n_toks - chunk_start + 1) AS BIGINT)
             AS n_chunk_tokens,
           md5(ARRAY_TO_STRING(
             toks[chunk_start:chunk_start + {CHUNK_TOKENS} - 1], ' '))
             AS chunk_md5
    FROM starts
    """,
    doc="Token-window chunking with overlap (64-token chunks, stride 48): "
        "posexplode over per-row start sequences — narrow plan, no "
        "shuffle. Chunk content verified via md5 so the oracle comparison "
        "is content-exact.",
)
def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    return chunk_documents(documents.select("doc_id", "text"))


def hash_sample(docs: DataFrame, key: str, hex_cut: str = "1a") -> DataFrame:
    """Deterministic ~10% sample: md5(key) hex prefix < cut. No RNG —
    reproducible across runs/engines/restarts, and a row's membership
    never depends on partitioning (the property `df.sample` lacks)."""
    return docs.filter(
        F.substring(F.md5(F.col(key).cast("string")), 1, 2) < hex_cut
    )


@register(
    "llm_sample_stratified",
    """
    WITH sampled AS (
      SELECT lang, doc_id,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' AS in_sample
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           ROUND(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS sample_rate
    FROM sampled GROUP BY lang
    """,
    doc="Deterministic hash sampling (md5 prefix < 0x1a ≈ 10.2%) with "
        "per-language stratification accounting — reproducible without "
        "RNG state, membership independent of partitioning; the "
        "restartable sampling a 100 TB corpus job needs.",
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    in_sample = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 2
    ) < "1a"
    return (
        documents.select("lang", in_sample.alias("in_sample"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
            .cast("long").alias("n_sampled"),
            F.round(
                F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("sample_rate"),
        )
    )


PACK_TOKENS = 256


PACK_SHARDS = 16  # md5-hex fan-out per language


def pack_chunks(chunks: DataFrame, target_tokens: int = PACK_TOKENS) -> DataFrame:
    """Pack chunk rows into fixed-token-budget training bins:
    (lang, shard, bin_id, n_chunks, n_tokens).

    Sequential packing by cumulative token offset within each
    (lang, shard) shard, where shard is the first md5 hex digit of
    doc_id — a deterministic 16-way fan-out, engine-portable (the DuckDB
    oracle computes the identical digit). A chunk's bin is
    floor(start_offset / target); deterministic order (doc_id,
    chunk_idx) makes packing reproducible across runs and partitionings.

    The composite shard key is the 100 TB contract: window state is
    bounded by ONE shard of ONE language (~1/16th), never a whole
    language funneling through a single task; raise the fan-out with a
    second hash digit (256 shards) as corpus volume grows. Bins are
    per-shard — exactly how a production packer writes shard-local
    training files with no cross-shard coordination."""
    from pyspark.sql import Window

    sharded = chunks.withColumn(
        "shard", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    )
    win = Window.partitionBy("lang", "shard").orderBy("doc_id", "chunk_idx")
    cum = F.sum("n_chunk_tokens").over(win)
    return (
        sharded.withColumn(
            "bin_id",
            F.floor(
                (cum - F.col("n_chunk_tokens")) / F.lit(target_tokens)
            ).cast("long"),
        )
        .groupBy("lang", "shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("long").alias("n_tokens"),
        )
    )


@register(
    "llm_pack_chunks",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS toks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, lang,
             UNNEST(RANGE(1, LENGTH(toks) + 1, {CHUNK_STRIDE})) AS chunk_start,
             LENGTH(toks) AS n_toks
      FROM toks WHERE LENGTH(toks) > 0
    ),
    sized AS (
      SELECT doc_id, lang,
             CAST((chunk_start - 1) // {CHUNK_STRIDE} AS INT) AS chunk_idx,
             LEAST({CHUNK_TOKENS}, n_toks - chunk_start + 1) AS n_chunk_tokens
      FROM chunks
    ),
    offsets AS (
      SELECT lang,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             n_chunk_tokens,
             SUM(n_chunk_tokens) OVER (
               PARTITION BY lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_chunk_tokens AS start_offset
      FROM sized
    )
    SELECT lang, shard,
           CAST(FLOOR(start_offset / {PACK_TOKENS}.0) AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens
    FROM offsets GROUP BY lang, shard, bin_id
    """,
    doc="Chunk packing into fixed-token training bins (256-token budget): "
        "windowed cumulative offset per (lang, md5-digit shard) — a 16-way "
        "deterministic fan-out per language so window state is bounded by "
        "one shard, never a whole language through one task; bin = offset "
        "div budget — deterministic, reproducible, shard-parallel.",
)
def llm_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    chunks = chunk_documents(documents.select("doc_id", "text")).join(
        documents.select("doc_id", "lang"), "doc_id"
    )
    return pack_chunks(chunks)


@register(
    "llm_quota_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM ranked WHERE rn <= 40
    GROUP BY source
    """,
    doc="Per-domain quota sampling: cap every source at N docs, selected "
        "by md5 hash order (deterministic lottery — no RNG, stable across "
        "runs and partitionings). One window shuffle on the source key; "
        "skewed domains cap without scanning twice.",
)
def llm_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (documents,) = tables(spark, sf_dir, "documents")
    win = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        documents.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 40)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def decontaminate_report(
    docs: DataFrame, benchmark: DataFrame, ngram: int = DECON_NGRAM
) -> DataFrame:
    """Per-document benchmark contamination: the share of a document's
    distinct n-grams that appear in the benchmark (eval) set —
    (doc_id, n_grams, n_contaminated, contamination).

    Shape: explode distinct n-grams both sides, hash them (md5 — engine-
    independent), left-join doc grams against the benchmark's DISTINCT
    gram set (broadcast-sized for real eval suites), aggregate per doc.
    Shuffle is O(distinct grams), never doc×doc."""
    def grams(df: DataFrame) -> DataFrame:
        toksdf = df.select(
            "doc_id",
            F.transform(tokens("text"), lambda t: F.lower(t)).alias("toks"),
        )
        return toksdf.select(
            "doc_id",
            F.explode(
                shingles_from(F.col("toks"), k=ngram, dedup=True)
            ).alias("gram"),
        ).select("doc_id", F.md5("gram").alias("gram_md5"))

    bench_grams = (
        grams(benchmark).select("gram_md5").distinct()
        .withColumn("_bench", F.lit(1))
    )
    doc_grams = grams(docs)
    return (
        doc_grams.join(bench_grams, "gram_md5", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_bench").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(
                F.col("n_contaminated") / F.col("n_grams").cast("double"), 4
            ),
        )
    )


@register(
    "llm_decontaminate",
    f"""
    WITH toks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(CASE
               WHEN LENGTH(toks) >= {DECON_NGRAM} THEN
                 LIST_TRANSFORM(
                   RANGE(1, LENGTH(toks) - {DECON_NGRAM} + 2),
                   i -> ARRAY_TO_STRING(toks[i:i + {DECON_NGRAM} - 1], ' '))
               WHEN LENGTH(toks) > 0 THEN [ARRAY_TO_STRING(toks, ' ')]
               ELSE [] END)) AS gram
      FROM toks
    ),
    hashed AS (SELECT doc_id, md5(gram) AS gram_md5 FROM grams),
    bench AS (SELECT DISTINCT gram_md5 FROM hashed WHERE doc_id < 20),
    joined AS (
      SELECT h.doc_id, h.gram_md5, b.gram_md5 IS NOT NULL AS hit
      FROM hashed h LEFT JOIN bench b USING (gram_md5)
      WHERE h.doc_id >= 20
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           ROUND(SUM(CASE WHEN hit THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS contamination
    FROM joined GROUP BY doc_id
    HAVING SUM(CASE WHEN hit THEN 1 ELSE 0 END) > 0
    """,
    doc="Benchmark decontamination: distinct 5-gram overlap of each "
        "training document against an eval set (docs 0..19 as the "
        "stand-in benchmark), md5 gram hashing, distinct-gram join — "
        "shuffle O(grams), never doc×doc. Reports contaminated docs "
        "with gram-overlap ratios.",
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    # the tokenize + 5-gram shingle + md5 chain is the dominant CPU
    # and inherits the scan's parallelism — spread first when the scan
    # under-parallelizes (single-row-group file => one task)
    par = spark.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < par:
        documents = documents.repartition(par, "doc_id")
    docs = documents.select("doc_id", "text")
    report = decontaminate_report(
        docs.filter(F.col("doc_id") >= 20),
        docs.filter(F.col("doc_id") < 20),
    )
    return report.filter(F.col("n_contaminated") > 0)


DSIR_BUCKETS = 64


@register(
    "llm_dsir_weights",
    f"""
    WITH toks AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS toks
      FROM documents
    ),
    ex AS (SELECT doc_id, UNNEST(toks) AS tok FROM toks),
    b AS (SELECT doc_id,
                 (LENGTH(tok)*97 + ASCII(SUBSTR(tok,1,1))) % {DSIR_BUCKETS}
                   AS bucket
          FROM ex),
    tgt AS (SELECT bucket, COUNT(*) AS c FROM b
            JOIN documents d USING(doc_id) WHERE d.lang = 'en'
            GROUP BY bucket),
    corp AS (SELECT bucket, COUNT(*) AS c FROM b GROUP BY bucket),
    tot AS (SELECT (SELECT SUM(c) FROM tgt) AS tc,
                   (SELECT SUM(c) FROM corp) AS cc),
    ratio AS (SELECT corp.bucket,
                     LN((COALESCE(tgt.c,0)+1) / (tot.tc + {DSIR_BUCKETS}.0))
                   - LN((corp.c+1) / (tot.cc + {DSIR_BUCKETS}.0)) AS lr
              FROM corp LEFT JOIN tgt USING(bucket), tot)
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(r.lr), 4) + 0 AS dsir_logratio
    FROM b JOIN ratio r USING(bucket) GROUP BY b.doc_id
    """,
    doc="DSIR-style importance weights (Xie et al. 2023, 'Data Selection "
        "for Language Models via Importance Resampling'): hashed token "
        "features into a bounded bucket space, per-doc mean "
        "log(p_target/p_corpus) with Laplace smoothing (target here: "
        "lang='en'). The bucket distributions are a {DSIR_BUCKETS}-row "
        "relation - broadcast - so the whole weighting is one token "
        "explode + one per-doc aggregation; the engine-independent "
        "arithmetic bucket hash keeps it oracle-checkable. At 100 TB the "
        "target/corpus histograms are tiny and the per-doc pass is "
        "embarrassingly parallel.",
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    ex = documents.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(tokens("text"), lambda t: F.lower(t))
        ).alias("tok"),
    )
    # persist the bucketed token relation: it feeds the target
    # histogram, the corpus histogram AND the per-doc weighting pass —
    # three tokenizations of the corpus without it (guide §5 reuse
    # rule). Three compact int/str columns, spills at scale.
    b = ex.select(
        "doc_id",
        "lang",
        (
            (F.length("tok") * 97 + F.ascii(F.substring("tok", 1, 1)))
            % DSIR_BUCKETS
        ).alias("bucket"),
    )
    b = persist_tracked(b)
    tgt = (
        b.filter(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("tc_b"))
    )
    corp = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cc_b"))
    tot = corp.join(tgt, "bucket", "left").agg(
        F.sum("tc_b").alias("tc"), F.sum("cc_b").alias("cc")
    )
    ratio = (
        corp.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("tc_b"), F.lit(0)) + 1)
                    / (F.col("tc") + F.lit(float(DSIR_BUCKETS)))
                )
                - F.log(
                    (F.col("cc_b") + 1)
                    / (F.col("cc") + F.lit(float(DSIR_BUCKETS)))
                )
            ).alias("lr"),
        )
    )
    return (
        b.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            # + 0 both sides: IEEE -0.0 + 0.0 = +0.0, so a rounded
            # tiny-negative can never hash-mismatch as "-0.0" vs "0.0"
            (F.round(F.avg("lr"), 4) + F.lit(0.0)).alias("dsir_logratio"),
        )
    )


LANG_TEMPERATURE = 0.3


@register(
    "llm_lang_temperature",
    f"""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    s AS (SELECT SUM(POWER(n_docs, {LANG_TEMPERATURE})) AS z FROM c)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(POWER(n_docs, {LANG_TEMPERATURE}) / s.z, 4) AS sample_weight
    FROM c, s
    """,
    doc="Temperature-based multilingual sampling weights (the mBERT/"
        "XLM-R exponential-smoothing scheme, alpha=0.3): per-language "
        "corpus counts raised to alpha and normalized - upsamples tail "
        "languages, downsamples the head. One count aggregation plus a "
        "broadcast scalar; the per-language weights then drive "
        "llm_quota_sample / llm_sample_stratified at corpus scale.",
)
def llm_lang_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    c = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    z = c.agg(
        F.sum(F.pow("n_docs", F.lit(LANG_TEMPERATURE))).alias("z")
    )
    return c.crossJoin(F.broadcast(z)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(
            F.pow("n_docs", F.lit(LANG_TEMPERATURE)) / F.col("z"), 4
        ).alias("sample_weight"),
    )


MIX_ALPHA = 0.5
MIX_TOKEN_BUDGET = 1_000_000


@register(
    "llm_token_budget_mix",
    f"""
    WITH t AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(LENGTH(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                    t -> t != ''))) AS n_tokens
      FROM documents GROUP BY source),
    s AS (SELECT SUM(POWER(n_tokens, {MIX_ALPHA})) AS z FROM t)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(POWER(n_tokens, {MIX_ALPHA})/s.z, 4) AS mix_weight,
           CAST(FLOOR(POWER(n_tokens, {MIX_ALPHA})/s.z * {MIX_TOKEN_BUDGET})
                AS BIGINT) AS alloc_tokens,
           ROUND(POWER(n_tokens, {MIX_ALPHA})/s.z * {MIX_TOKEN_BUDGET}
                 / n_tokens, 4) AS repeat_factor
    FROM t, s
    """,
    doc="Token-budget data mixing: allocate a training-token budget "
        "across sources by temperature-smoothed token counts "
        "(count^alpha normalized, alpha=0.5 - the LLaMA-style domain "
        "mixture shape) and derive each source's epoch repeat factor. "
        "One count/sum aggregation plus a broadcast normalizer scalar; "
        "the output drives downstream samplers. repeat_factor > 1 means "
        "the source is upsampled (multiple epochs) to fill its "
        "allocation.",
)
def llm_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    t = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    z = t.agg(F.sum(F.pow("n_tokens", F.lit(MIX_ALPHA))).alias("z"))
    w = F.pow("n_tokens", F.lit(MIX_ALPHA)) / F.col("z")
    return t.crossJoin(F.broadcast(z)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(w, 4).alias("mix_weight"),
        F.floor(w * MIX_TOKEN_BUDGET).cast("long").alias("alloc_tokens"),
        F.round(w * MIX_TOKEN_BUDGET / F.col("n_tokens"), 4)
        .alias("repeat_factor"),
    )


@register(
    "llm_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t))) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT SUM(c) AS n FROM cnt),
    lp  AS (SELECT tok, LN(c / n) AS lp FROM cnt, tot)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(-AVG(lp) / LN(2.0), 4) AS bits_per_token
    FROM toks JOIN lp USING(tok)
    GROUP BY doc_id
    """,
    doc="CCNet-style language-model quality score (Wenzek et al. 2020 "
        "filter corpora with an LM; here the LM is the corpus's own "
        "unigram distribution, kept engine-independent so the oracle "
        "can replicate it): per-document mean negative log2 unigram "
        "probability = bits per token. Low bits-per-token means "
        "high-probability (boilerplate-ish) text, high means rare-token "
        "soup; both tails get cut in a real pipeline. Plan: one token "
        "explode (narrow), one vocabulary aggregation (shuffle bounded "
        "by vocab size, not corpus size), a token-keyed join back, and "
        "a per-doc aggregation. At 100 TB the vocab relation (counts "
        "above any sane floor) fits the autoBroadcast threshold after "
        "AQE measures it; no mandatory hint so a pathological vocab "
        "degrades to a shuffle join instead of an executor OOM.",
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    # spread the rows first when the scan under-parallelizes (the
    # tokenization below is the dominant CPU and a single-row-group
    # file scans as ONE task); production scans skip the exchange
    par = spark.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < par:
        documents = documents.repartition(par, "doc_id")
    # persist the un-exploded token arrays (smaller than the exploded
    # relation): both the vocabulary count and the per-doc join-back
    # re-derive from them, so tokenization runs once, not twice
    # (guide §5 reuse rule).
    arrs = persist_tracked(documents.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.lower(t)).alias("arr"),
    ))
    toks = arrs.select("doc_id", F.explode("arr").alias("tok"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    lp = cnt.crossJoin(F.broadcast(tot)).select(
        "tok", F.log(F.col("c") / F.col("n")).alias("lp")
    )
    return (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(-F.avg("lp") / F.log(F.lit(2.0)), 4)
            .alias("bits_per_token"),
        )
    )


QUALITY_QUANTILE = 0.6


@register(
    "llm_quality_filter_quantile",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             LENGTH(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                t -> t != '')) AS n_tok
      FROM documents
    ),
    q AS (SELECT QUANTILE_CONT(n_tok, {QUALITY_QUANTILE}) AS thr FROM t)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS total_docs,
           CAST(SUM(CASE WHEN n_tok >= thr THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_docs,
           ROUND(thr, 2) AS threshold
    FROM t, q
    GROUP BY lang, thr
    """,
    doc="Global-quantile quality gate: keep documents at or above the "
        f"corpus-wide {QUALITY_QUANTILE:.0%} token-count quantile — the "
        "broadcast-global-threshold pattern every score-based corpus "
        "filter (perplexity, quality classifier, toxicity) reuses: "
        "compute the cutoff as a 1-row aggregate, broadcast it, filter "
        "in a second narrow pass. Spark's exact `percentile` matches "
        "DuckDB QUANTILE_CONT (linear interpolation at rank (N-1)*p). "
        "Exact percentile materializes the value multiset on one "
        "reducer; at 100 TB swap in approx_percentile exactly as "
        "percentile_prices documents — the filter pass is unchanged.",
)
def llm_quality_filter_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    t = documents.select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tok")
    )
    q = t.agg(
        F.percentile("n_tok", F.lit(QUALITY_QUANTILE)).alias("thr")
    )
    return (
        t.crossJoin(F.broadcast(q))
        .groupBy("lang", "thr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_docs"),
            F.sum(
                F.when(F.col("n_tok") >= F.col("thr"), 1).otherwise(0)
            ).cast("long").alias("kept_docs"),
        )
        .select(
            "lang", "total_docs", "kept_docs",
            F.round("thr", 2).alias("threshold"),
        )
    )


@register(
    "llm_shuffle_order",
    """
    WITH pos AS (
      SELECT doc_id,
             ('0x' || SUBSTR(MD5('shuffle-epoch-1:' || doc_id), 1, 15))::BIGINT
               AS shuffle_key
      FROM documents
    )
    SELECT doc_id, shuffle_key,
           CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
             AS position
    FROM pos
    ORDER BY position
    LIMIT 100
    """,
    doc="Deterministic training-order shuffle: every epoch's document "
        "order is a pure function of (epoch seed, doc_id) via an md5 "
        "sort key — reproducible across engines, runs, and restarts "
        "(resuming mid-epoch needs only the position watermark, no RNG "
        "state). The global ordering materializes lazily: downstream "
        "consumers range-partition on shuffle_key; the gate query "
        "surfaces the first 100 positions. Changing the epoch string "
        "reshuffles with zero correlation between epochs.",
)
def llm_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (documents,) = tables(spark, sf_dir, "documents")
    pos = documents.selectExpr(
        "doc_id",
        "CAST(CONV(SUBSTR(MD5(CONCAT('shuffle-epoch-1:', doc_id)), 1, 15),"
        " 16, 10) AS BIGINT) AS shuffle_key",
    )
    # limit FIRST (TakeOrderedAndProject — never a global sort), then
    # rank within the bounded 100-row result; at corpus scale consumers
    # repartitionByRange on shuffle_key instead of ranking globally —
    # the same scale contract as global_ntile
    top = pos.orderBy("shuffle_key", "doc_id").limit(100)
    w = Window.orderBy("shuffle_key", "doc_id")
    return (
        top.withColumn("position", F.row_number().over(w).cast("long"))
        .orderBy("position")
    )


@register(
    "llm_pps_sample",
    """
    WITH w AS (
      SELECT doc_id, CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight
      FROM documents
    ),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w FROM w)
    SELECT doc_id, weight
    FROM w, tot
    WHERE (('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           / 1152921504606846976.0) * total_w < 500 * weight
    """,
    doc="Probability-proportional-to-size (PPS / Poisson) sampling with "
        "NO RNG state: each document's inclusion test is md5(doc_id) "
        "mapped to a uniform u in (0,1), included iff u * W < k * w "
        "(expected sample size k, inclusion probability min(1, k*w/W)). "
        "Fully deterministic and engine-independent — the only float "
        "ops are one division and one multiply (IEEE-deterministic; no "
        "transcendentals), so the DuckDB oracle reproduces the exact "
        "sample. Distributed shape: a narrow scan + one broadcast "
        "1-row total — the corpus-weighting primitive behind "
        "importance-weighted corpus mixes, and the hash-lottery "
        "complement to the equal-probability llm_quota_sample.",
)
def llm_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    k = 500
    w = documents.select(
        "doc_id",
        F.greatest(F.col("n_chars"), F.lit(1)).cast("long")
        .alias("weight"),
    )
    tot = w.agg(F.sum("weight").cast("long").alias("total_w"))
    u = F.expr(
        "CAST(CONV(SUBSTR(MD5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) / 1152921504606846976.0"
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .filter(u * F.col("total_w") < k * F.col("weight"))
        .select("doc_id", "weight")
    )


BIGRAM_K = 0.5  # add-k smoothing constant


@register(
    "llm_bigram_logprob",
    f"""
    WITH arrs AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                           t -> t != ''),
               t -> LOWER(t)) AS arr
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, arr[i] AS a, arr[i + 1] AS b
      FROM (SELECT doc_id, arr, UNNEST(RANGE(1, LEN(arr))) AS i
            FROM arrs)
    ),
    bi  AS (SELECT a, b, COUNT(*) AS c FROM pairs GROUP BY a, b),
    ctx AS (SELECT a, SUM(c) AS ca FROM bi GROUP BY a),
    voc AS (SELECT COUNT(DISTINCT tok) AS v FROM (
              SELECT UNNEST(arr) AS tok FROM arrs)),
    lp  AS (
      SELECT bi.a, bi.b,
             LN((bi.c + {BIGRAM_K}) / (ctx.ca + {BIGRAM_K} * voc.v))
               AS lp
      FROM bi JOIN ctx ON ctx.a = bi.a, voc
    )
    SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(-AVG(lp.lp) / LN(2.0), 4) AS bits_per_pair
    FROM pairs p JOIN lp ON lp.a = p.a AND lp.b = p.b
    GROUP BY p.doc_id
    """,
    doc="Bigram-LM quality score — the context-sensitive upgrade of "
        "llm_unigram_logprob (CCNet filters on LM perplexity; a "
        "corpus-trained bigram model with add-k smoothing is the "
        "engine-independent stand-in the oracle can replicate): per "
        "document, mean negative log2 P(w|prev) over adjacent token "
        "pairs, P(w|v) = (c(v,w) + k) / (c(v) + k|V|) with k=0.5 and "
        "context counts derived FROM the bigram relation so both "
        "engines share one definition. Plan: one in-array pair "
        "derivation (narrow), a bigram-type aggregation (shuffle "
        "bounded by distinct bigrams, not corpus size), one context "
        "re-aggregation over that bounded relation, a 1-row vocab "
        "broadcast, a pair-keyed join back, and the per-doc fold. "
        "Docs with fewer than two tokens have no pairs and drop out, "
        "matching the SQL'S inner join.",
)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    # spread the rows first when the scan under-parallelizes (the
    # tokenization below is the dominant CPU and a single-row-group
    # file scans as ONE task); production scans skip the exchange
    par = spark.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < par:
        documents = documents.repartition(par, "doc_id")
    # persist the token arrays: this plan is a triple diamond over the
    # tokenization (pairs->bigram counts, pairs->per-doc join-back,
    # vocab count), so without it the corpus is regexp-tokenized three
    # times — the dominant cost (guide §5 reuse rule; measured 1.10 s
    # -> 0.76 s at sf0.1). O(corpus tokens), spills to disk at scale.
    arrs = persist_tracked(documents.select(
        "doc_id",
        F.transform(tokens("text"), lambda t: F.lower(t))
        .alias("arr"),
    ))
    pairs = arrs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(arr, 1, size(arr) - 1), "
            "(t, i) -> struct(t AS a, element_at(arr, i + 2) AS b))"
        )).alias("p"),
    ).select("doc_id", "p.a", "p.b")
    bi = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    ctx = bi.groupBy("a").agg(F.sum("c").alias("ca"))
    voc = (
        arrs.select(F.explode("arr").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    lp = (
        bi.join(ctx, "a")
        .crossJoin(F.broadcast(voc))
        .select(
            "a", "b",
            F.log(
                (F.col("c") + F.lit(BIGRAM_K))
                / (F.col("ca") + F.lit(BIGRAM_K) * F.col("v"))
            ).alias("lp"),
        )
    )
    return (
        pairs.join(lp, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(-F.avg("lp") / F.log(F.lit(2.0)), 4)
            .alias("bits_per_pair"),
        )
    )


# --- train/val/test split + cross-split leakage audit ------------------

# md5-hex prefix cuts: < c0 -> train (75%), < e0 -> val (12.5%),
# else test (12.5%). Generous eval fractions keep the sf0.01 gate
# non-degenerate; production would use f0/f8-style 98/1/1 cuts.
SPLIT_TRAIN_CUT = "c0"
SPLIT_VAL_CUT = "e0"


def split_of(key) -> "F.Column":
    """Deterministic train/val/test assignment: md5-hex prefix of the
    key against fixed cuts. No RNG — membership is a pure function of
    the key, reproducible across runs/engines/restarts and independent
    of partitioning, so a re-run (or another engine) puts every document
    in the same split."""
    h2 = F.substring(F.md5(F.col(key).cast("string")), 1, 2)
    return (
        F.when(h2 < SPLIT_TRAIN_CUT, "train")
        .when(h2 < SPLIT_VAL_CUT, "val")
        .otherwise("test")
    )


# Built from the same cut constants as split_of so engine and oracle
# cannot silently diverge when a cut changes.
def _split_sql_for(key: str) -> str:
    return (
        f"CASE WHEN substr(md5(CAST({key} AS VARCHAR)), 1, 2) "
        f"< '{SPLIT_TRAIN_CUT}' THEN 'train' "
        f"WHEN substr(md5(CAST({key} AS VARCHAR)), 1, 2) "
        f"< '{SPLIT_VAL_CUT}' THEN 'val' ELSE 'test' END"
    )


_SPLIT_SQL = _split_sql_for("doc_id")


@register(
    "llm_split_assign",
    f"""
    WITH s AS (
      SELECT doc_id,
             {_SPLIT_SQL} AS split,
             LENGTH(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                                t -> t != '')) AS n_tokens
      FROM documents
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc_id
    FROM s GROUP BY split
    """,
    doc="Deterministic train/val/test split assignment (md5-prefix cuts "
        "75/12.5/12.5) with per-split document and token accounting — "
        "the split is a pure function of doc_id, so shards can be "
        "assigned independently on every executor with no coordination, "
        "and a restarted 100 TB job reproduces the exact same split.",
)
def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    return (
        documents.select(
            "doc_id",
            split_of("doc_id").alias("split"),
            F.size(tokens("text")).cast("long").alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def _leakage_oracle_sql() -> str:
    from .dedup import _portable_oracle_ctes

    return (
        "WITH " + _portable_oracle_ctes() + f"""
    , s AS (
      SELECT doc_id, {_SPLIT_SQL} AS split FROM documents
    ), x AS (
      SELECT p.jaccard, sa.split AS split_a, sb.split AS split_b
      FROM pairs p
      JOIN s sa ON sa.doc_id = p.doc_a
      JOIN s sb ON sb.doc_id = p.doc_b
      WHERE sa.split != sb.split
    )
    SELECT LEAST(split_a, split_b)    AS split_lo,
           GREATEST(split_a, split_b) AS split_hi,
           CAST(COUNT(*) AS BIGINT)   AS n_leaky_pairs,
           ROUND(MAX(jaccard), 4)     AS max_jaccard
    FROM x GROUP BY 1, 2
    """
    )


@register(
    "split_leakage_audit",
    _leakage_oracle_sql(),
    doc="Cross-split contamination audit: verified near-dup pairs "
        "(portable MinHash+LSH candidates, exact Jaccard >= 0.5) whose "
        "endpoints land in DIFFERENT train/val/test splits — the "
        "train/test-overlap analysis an LLM data pipeline runs before "
        "trusting its eval numbers. Composes the oracle-certified "
        "dedup pair machinery with the deterministic split hash; at "
        "scale the pair set is LSH-bounded (never all-pairs) and the "
        "two split lookups are hash joins on doc_id.",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import (
        lowered_tokens,
        portable_minhash_candidates,
        verify_jaccard,
    )

    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    parallelism = spark.sparkContext.defaultParallelism
    toks = persist_tracked(
        lowered_tokens(docs.repartition(parallelism, "doc_id"))
    )
    pairs = verify_jaccard(
        portable_minhash_candidates(toks), threshold=0.5, toks=toks
    )
    splits = docs.select("doc_id", split_of("doc_id").alias("split"))
    leaks = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("doc_a"),
                F.col("split").alias("split_a"),
            ),
            "doc_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("doc_b"),
                F.col("split").alias("split_b"),
            ),
            "doc_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return (
        leaks.select(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
            "jaccard",
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count(F.lit(1)).alias("n_leaky_pairs"),
            F.round(F.max("jaccard"), 4).alias("max_jaccard"),
        )
    )


# --- semantic decontamination ------------------------------------------------

DECONTAM_TOP_K = 20


def _decontam_semantic_oracle() -> str:
    from .similarity import _portable_signs

    bucket_terms = " + ".join(
        "(CASE WHEN LIST_DOT_PRODUCT(emb, [{vals}]) > 0 "
        "THEN {bit} ELSE 0 END)".format(
            vals=", ".join(f"{v:.1f}" for v in plane),
            bit=2 ** p,
        )
        for p, plane in enumerate(_portable_signs())
    )
    return f"""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    b AS (
      SELECT vec_id, emb, {bucket_terms} AS bucket,
             {_split_sql_for('vec_id')} AS split
      FROM v
    ),
    pairs AS (
      SELECT t.vec_id AS train_id, e.vec_id AS test_id,
             ROUND(LIST_DOT_PRODUCT(t.emb, e.emb)
                   / (SQRT(LIST_DOT_PRODUCT(t.emb, t.emb))
                      * SQRT(LIST_DOT_PRODUCT(e.emb, e.emb))), 4)
               AS cosine
      FROM b t JOIN b e
        ON t.bucket = e.bucket
       AND t.split = 'train' AND e.split = 'test'
    )
    SELECT CAST(rank AS BIGINT) AS rank, train_id, test_id, cosine
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY cosine DESC, train_id, test_id) AS rank
      FROM pairs
    ) WHERE rank <= {DECONTAM_TOP_K}
    """


@register(
    "split_decontam_semantic",
    _decontam_semantic_oracle(),
    doc="Semantic (embedding-space) decontamination audit: the top-k "
        "most similar train->test pairs by exact cosine over "
        "LSH-bucketed candidates — the paraphrase-contamination "
        "complement of split_leakage_audit's n-gram pass (near-"
        "verbatim leaks share shingles; semantic leaks only share a "
        "neighborhood in embedding space). Always reports the nearest "
        "cross-split neighbors so a clean corpus yields a ranked "
        "low-cosine report, not a vacuous empty result; thresholding "
        "is the caller's policy. Scale shape: splits are pure hash "
        "functions of vec_id (no coordination), candidates are "
        "bucket-join bounded (never train x test all-pairs; the "
        "shuffle key is the 8-bit hyperplane bucket), and the final "
        "ranking is a distributed top-k. Portable md5-parity "
        "hyperplanes are plan-time literals in BOTH engines, so the "
        "whole pipeline is oracle-gated.",
)
def split_decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .similarity import (
        EMB_DIM,
        _portable_bucket,
        as_double,
        dot,
        l2_norm,
    )

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    b = (
        embeddings.select("vec_id", as_double("embedding").alias("emb"))
        .filter(F.size("emb") == EMB_DIM)
        .select(
            "vec_id", "emb",
            _portable_bucket(F.col("emb")).alias("bucket"),
            split_of("vec_id").alias("split"),
        )
    )
    train = b.filter(F.col("split") == "train").select(
        F.col("vec_id").alias("train_id"),
        F.col("emb").alias("t_emb"),
        "bucket",
    )
    test = b.filter(F.col("split") == "test").select(
        F.col("vec_id").alias("test_id"),
        F.col("emb").alias("e_emb"),
        "bucket",
    )
    scored = train.join(test, "bucket").select(
        "train_id",
        "test_id",
        F.round(
            dot(F.col("t_emb"), F.col("e_emb"))
            / (l2_norm(F.col("t_emb")) * l2_norm(F.col("e_emb"))),
            4,
        ).alias("cosine"),
    )
    top = scored.orderBy(
        F.col("cosine").desc(), "train_id", "test_id"
    ).limit(DECONTAM_TOP_K)
    w = Window.orderBy(F.col("cosine").desc(), "train_id", "test_id")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "train_id", "test_id", "cosine")
    )
