"""Distributed BPE vocabulary training + encoding (training-data
extension: the tokenizer-building step of a pretraining pipeline).

Byte-pair encoding at corpus scale the Spark way:

- ``word_freq_table``: ONE corpus scan — tokenize, groupBy word, count.
  Everything after operates on this bounded relation (the corpus's
  word-type vocabulary, thousands of times smaller than the text at
  100 TB), exactly how production BPE trainers (GPT-2, SentencePiece
  in word mode) structure the computation.
- ``bpe_train``: per merge iteration, explode adjacent symbol pairs
  weighted by word frequency, aggregate pair counts (partial-agg
  shuffle on the SMALL word table), pick the max (count desc, pair
  lexicographic tie-break — fully deterministic), then apply the merge
  to every word via a JVM-side ``aggregate`` HOF fold (leftmost
  non-overlapping, the standard BPE semantics). The winning pair per
  round is a 1-row collect — control-plane, like a LIMIT 1 result; the
  corpus is never re-read after the initial frequency scan.
- ``bpe_encode_expr``: apply a learned merge list to a token column as
  a chain of fold expressions — narrow, codegen-free but Arrow-free
  too (pure Catalyst), no shuffle.

Correctness is pinned against a pure-Python reference implementation
(tests/test_bpe.py) on fixed and randomized corpora — merge-for-merge
and encoding-for-encoding equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens


def word_freq_table(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (word, freq, syms) where syms is the word split into
    single-character symbols. One scan + one shuffle on the word."""
    toks = documents.select(
        F.explode(
            F.transform(tokens(text_col), lambda t: F.lower(t))
        ).alias("word")
    )
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split(F.col("word"), ""))
    )


def _merge_fold_expr(col: str, a: str, b: str) -> str:
    """SQL expression applying ONE merge (a, b) → "ab" to a symbol
    array via a sequential fold. A plain left fold IS leftmost
    non-overlapping BPE: the freshly merged symbol "ab" can never equal
    the pair's left element (it is strictly longer), so it cannot
    re-merge within the same pass — no scan-position state needed."""
    a_lit = a.replace("\\", "\\\\").replace("'", "\\'")
    b_lit = b.replace("\\", "\\\\").replace("'", "\\'")
    return (
        f"aggregate({col}, "
        f"cast(array() as array<string>), "
        f"(acc, s) -> CASE "
        f"WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = '{a_lit}' AND s = '{b_lit}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array('{a_lit}{b_lit}')) "
        f"ELSE concat(acc, array(s)) END)"
    )


def bpe_train(
    documents: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (the vocabulary artifact — a tiny model the
    caller persists/broadcasts). Deterministic: ties broken by pair
    lexicographic order."""
    words = word_freq_table(documents, text_col).persist()
    merges: list[tuple[str, str]] = []
    try:
        current = words
        for _ in range(num_merges):
            pairs = current.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s AS a, "
                        "element_at(syms, i + 2) AS b))"
                    )
                ).alias("p"),
            )
            top = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            merged = current.withColumn(
                "syms", F.expr(_merge_fold_expr("syms", a, b))
            )
            # localCheckpoint: each round's plan nests another fold HOF;
            # truncate lineage so Catalyst re-analysis stays O(1) per
            # round (same discipline as connected_components)
            current = merged.localCheckpoint(eager=True)
    finally:
        words.unpersist()
    return merges


def bpe_encode_expr(col: str, merges: list[tuple[str, str]]) -> Column:
    """Column expression encoding a (lowercased) token column (by name)
    into BPE symbols under the learned merge list — the per-token apply
    step, narrow and shuffle-free. Merges apply in learned order, each
    as one fold."""
    expr = f"split({col}, '')"
    for a, b in merges:
        inner = _merge_fold_expr("__S__", a, b)
        expr = inner.replace("__S__", expr)
    return F.expr(expr)


def bpe_encode_tokens(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """documents → (word, pieces): distinct words encoded under the
    merge list. Encoding the DISTINCT words then joining back (or
    broadcast-mapping) is the production shape — the fold runs once per
    word type, not once per corpus occurrence."""
    words = documents.select(
        F.explode(
            F.transform(tokens(text_col), lambda t: F.lower(t))
        ).alias("word")
    ).distinct()
    return words.select("word", bpe_encode_expr("word", merges).alias("pieces"))


# Driver-gated query: the iteration-1 workload of the trainer (the
# only distributed-heavy step — later iterations reuse the same shape
# over the already-built word table).
from ..registry import register  # noqa: E402
from ._util import tables  # noqa: E402


@register(
    "llm_bpe_pair_counts",
    """
    WITH toks AS (
      SELECT LOWER(tok) AS word
      FROM (SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(text, '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), wf AS (
      SELECT word, COUNT(*) AS freq FROM toks GROUP BY word
    ), pairs AS (
      SELECT word[i] AS a, word[i + 1] AS b, freq
      FROM (SELECT word, freq, UNNEST(RANGE(1, LENGTH(word))) AS i
            FROM wf)
    )
    SELECT a, b, CAST(SUM(freq) AS BIGINT) AS n
    FROM pairs GROUP BY a, b ORDER BY n DESC, a, b LIMIT 20
    """,
    doc="BPE trainer iteration-1 workload: adjacent-symbol pair counts "
        "weighted by word frequency, top-20 with deterministic "
        "tie-break — the aggregation every merge round repeats over the "
        "bounded word-type relation. Oracle-gated end to end (the full "
        "trainer's later rounds depend on data-driven merges, which SQL "
        "cannot express statically; they are pinned against a "
        "pure-Python reference in test_bpe instead).",
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    words = word_freq_table(documents)
    pairs = words.select(
        "freq",
        F.explode(
            F.expr(
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "a", "b")
        .limit(20)
    )


# Portable merge list for the ENCODE gate: fixed literals in both
# engines (the portable-model contract — production uses bpe_train's
# corpus-learned merges, pinned against the Python reference in
# test_bpe). Cascading on purpose: merge 2 consumes merge 1's output.
PORTABLE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("an", "d"), ("er", "s"),
]

_BPE_ENC_MAXLEN = 12
_BPE_ENC_DOCS = 60


def _bpe_encode_oracle() -> str:
    n = len(PORTABLE_MERGES)
    a_case = ("CASE m " + " ".join(
        f"WHEN {i + 1} THEN '{a}'"
        for i, (a, _b) in enumerate(PORTABLE_MERGES)) + " END")
    b_case = ("CASE m " + " ".join(
        f"WHEN {i + 1} THEN '{b}'"
        for i, (_a, b) in enumerate(PORTABLE_MERGES)) + " END")
    return f"""
    WITH RECURSIVE words AS (
      SELECT DISTINCT LOWER(tok) AS word
      FROM (SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(text, '\\s+')) AS tok
            FROM documents WHERE doc_id <= {_BPE_ENC_DOCS})
      WHERE tok <> '' AND LENGTH(LOWER(tok)) <= {_BPE_ENC_MAXLEN}
    ), enc(word, syms, m) AS (
      SELECT word, REGEXP_SPLIT_TO_ARRAY(word, ''), 1 FROM words
      UNION ALL
      SELECT word,
             CASE WHEN p IS NOT NULL
                  THEN syms[1:p-1] || [a || b] || syms[p+2:]
                  ELSE syms END,
             CASE WHEN p IS NOT NULL THEN m ELSE m + 1 END
      FROM (
        SELECT word, syms, m, a, b,
               LIST_FILTER(RANGE(1, LEN(syms)),
                           i -> syms[i] = a AND syms[i+1] = b)[1] AS p
        FROM (
          SELECT word, syms, m, {a_case} AS a, {b_case} AS b
          FROM enc WHERE m <= {n}
        )
      )
    )
    SELECT word, ARRAY_TO_STRING(syms, '|') AS pieces
    FROM enc WHERE m = {n} + 1 ORDER BY word
    """


@register(
    "llm_bpe_encode",
    _bpe_encode_oracle(),
    doc="BPE APPLY step oracle-gated end to end via portable literal "
        "merges (the trainer's data-driven merges stay pinned against "
        "the Python reference in test_bpe): bpe_encode_expr folds each "
        "merge over the distinct word types as one JVM aggregate HOF — "
        "narrow, shuffle-free. The DuckDB oracle applies the same "
        "merges by recursive-CTE leftmost-occurrence rewriting, which "
        "provably equals the single left fold: a merged symbol is "
        "strictly longer than the pair's elements, so one application "
        "can never create a new occurrence of its own pair.",
)
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = tables(spark, sf_dir, "documents")
    words = (
        documents.filter(F.col("doc_id") <= _BPE_ENC_DOCS)
        .select(F.explode(
            F.transform(tokens("text"), lambda t: F.lower(t))
        ).alias("word"))
        .filter(
            (F.col("word") != "")
            & (F.length("word") <= _BPE_ENC_MAXLEN)
        )
        .distinct()
    )
    return (
        words.select(
            "word",
            F.array_join(
                bpe_encode_expr("word", PORTABLE_MERGES), "|"
            ).alias("pieces"),
        )
        .orderBy("word")
    )
