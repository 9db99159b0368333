"""Distributed Unigram-LM (SentencePiece-style) tokenizer training —
the second half of the tokenizer story next to BPE (``bpe.py``).

Kudo (2018)'s unigram language model tokenizer, the Spark way:

- everything operates on the BOUNDED word-frequency relation from ONE
  corpus scan (``bpe.word_freq_table``) — the corpus is never re-read;
- seed vocabulary: every substring occurrence up to ``max_piece_len``
  explodes from the word table (a vocab-bounded relation thousands of
  times smaller than 100 TB of text), single characters always kept
  (coverage guarantee), plus the top-``seed_size`` multi-character
  pieces by occurrence frequency (deterministic tie-break: piece asc);
- E-step: VITERBI segmentation of each word under the current piece
  log-probs, expressed as one JVM ``aggregate`` fold (the same HOF
  family the BPE encoder uses — no Python in the hot path). The model
  rides as ONE broadcast single-row map (``map_from_entries`` over the
  vocab-bounded model relation, crossJoin of one scalar row); piece
  counts aggregate with a partial-agg shuffle on the word table.
  This is hard-EM (Viterbi counts, not forward-backward expected
  counts) — deterministic, which the cross-engine oracle and the
  pure-Python pin both require;
- M-step: re-estimate log-probs from the counts; zero-count
  multi-character pieces drop, single characters floor at count 1
  (coverage); then a deterministic prune schedule keeps the top
  ``shrink`` fraction of multis (count desc, piece asc) per round
  until ``vocab_size``;
- tie-breaks are exact and engine-portable: the Viterbi fold's argmax
  is ``array_max`` over struct(score, len) — highest score, then the
  LONGEST piece at each boundary walking back from the end of the
  word. Scores are quantized to multiples of 1/64 (binary-exact
  doubles), so score sums and therefore tie decisions are EXACT in
  both Spark and DuckDB — no float-fuzz divergence.

Scale shape: the trainer's per-iteration work is one narrow map over
the word-type relation (Viterbi fold), one explode bounded by
total-symbols-per-word, and one shuffle keyed by piece (vocab-
bounded). The model artifact (piece -> logp, ``vocab_size`` rows) is
the only thing that ever reaches the driver — control-plane, same
class as BPE's merge list.

Reference analog: none — the reference pipeline has no tokenizer
concept; this is a training-data-pipeline extension (SURVEY §2
extension tier), specified against the published SentencePiece
algorithm.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .bpe import word_freq_table


def _q64(x: float) -> float:
    """Quantize to multiples of 1/64 — binary-exact doubles, so sums
    of piece scores (and Viterbi tie decisions) are exact and
    identical across engines."""
    return round(x * 64.0) / 64.0


def _viterbi_pieces_expr(
    word_col: str, map_col: str, max_len: int
) -> str:
    """SQL expression segmenting ``word_col`` into the max-probability
    piece sequence under the score map ``map_col`` (piece -> logp).

    Two JVM folds: a DP pass building best[i] = max over l<=max_len of
    best[i-l] + score(word[i-l+1..i]) with argmax-l carried per
    position (struct max: score first, then LARGEST l on ties), and a
    backtrack pass reconstructing the pieces. Pieces absent from the
    map score -1e15 (never chosen: the single-character candidate is
    always finite when the vocab covers the alphabet, which the seed
    guarantees)."""
    w, m = word_col, map_col
    dp = f"""aggregate(
      sequence(1, length({w})),
      array(named_struct('s', cast(0.0 as double), 'l', 0)),
      (acc, i) -> concat(acc, array(
        array_max(transform(sequence(1, least(i, {max_len})),
          l -> named_struct(
            's', element_at(acc, cast(i - l + 1 as int)).s
                 + coalesce(element_at({m},
                     substring({w}, cast(i - l + 1 as int),
                               cast(l as int))),
                     cast(-1e15 as double)),
            'l', cast(l as int)))))))"""
    return f"""aggregate(
      sequence(1, length({w})),
      named_struct('p', length({w}),
                   'ps', cast(array() as array<string>),
                   'dp', {dp}),
      (st, x) -> IF(st.p <= 0, st,
        named_struct(
          'p', st.p - element_at(st.dp, st.p + 1).l,
          'ps', concat(array(substring({w},
                  st.p - element_at(st.dp, st.p + 1).l + 1,
                  element_at(st.dp, st.p + 1).l)), st.ps),
          'dp', st.dp)),
      st -> st.ps)"""


def seed_vocab(
    words: DataFrame, max_piece_len: int = 4, seed_size: int = 200
) -> DataFrame:
    """(piece, freq): every single character seen (coverage), plus the
    top ``seed_size`` multi-character substrings by occurrence
    frequency (freq desc, piece asc — deterministic). Occurrences
    count multiplicity within a word, weighted by word frequency —
    the SentencePiece suffix-array seed's counting."""
    subs = words.select(
        "freq",
        F.explode(F.expr(
            f"flatten(transform(sequence(1, length(word)), "
            f"i -> transform("
            f"sequence(1, least({max_piece_len}, "
            f"length(word) - i + 1)), "
            f"l -> substring(word, cast(i as int), cast(l as int)))))"
        )).alias("piece"),
    )
    pf = subs.groupBy("piece").agg(F.sum("freq").alias("freq"))
    singles = pf.filter(F.length("piece") == 1)
    multis = (
        pf.filter(F.length("piece") > 1)
        .orderBy(F.col("freq").desc(), "piece")
        .limit(seed_size)
    )
    return singles.unionByName(multis)


def _model_map_row(model_df: DataFrame) -> DataFrame:
    """Vocab-bounded (piece, logp) relation -> ONE row carrying the
    whole model as a map column ``m`` (broadcast onto the word table
    as a scalar — the approved crossJoin-of-one-row shape)."""
    return model_df.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "logp"))
        ).alias("m")
    )


def unigram_em_counts(
    words: DataFrame, model_df: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """One E-step: Viterbi-segment every word type under the model,
    explode the pieces, count weighted by word frequency. Returns
    (piece, cnt) — vocab-bounded."""
    seg = words.crossJoin(F.broadcast(_model_map_row(model_df))).select(
        "freq",
        F.explode(F.expr(
            _viterbi_pieces_expr("word", "m", max_piece_len)
        )).alias("piece"),
    )
    return seg.groupBy("piece").agg(F.sum("freq").alias("cnt"))


def unigram_train(
    documents: DataFrame,
    vocab_size: int = 120,
    iterations: int = 2,
    max_piece_len: int = 4,
    seed_size: int = 400,
    shrink: float = 0.75,
    text_col: str = "text",
) -> list[tuple[str, float]]:
    """Learn a unigram-LM tokenizer model. Returns the (piece, logp)
    list sorted by piece — the vocabulary artifact the caller
    persists/broadcasts, like ``bpe_train``'s merge list.

    Per iteration: one distributed E-step over the word-type relation
    (Viterbi fold + vocab-bounded count shuffle), then a driver-side
    M-step + prune over the vocab-bounded counts (the model IS the
    artifact — collecting it is control-plane, not data-plane)."""
    spark = documents.sparkSession
    words = word_freq_table(documents, text_col).persist()
    try:
        seed = {
            r["piece"]: int(r["freq"])
            for r in seed_vocab(
                words, max_piece_len, seed_size
            ).collect()
        }
        total = sum(seed.values())
        model = {
            p: _q64(math.log(f / total)) for p, f in seed.items()
        }
        for it in range(iterations):
            mdf = spark.createDataFrame(
                sorted(model.items()), "piece string, logp double"
            )
            counts = {
                r["piece"]: int(r["cnt"])
                for r in unigram_em_counts(
                    words, mdf, max_piece_len
                ).collect()
            }
            # M-step: singles floor at 1 (coverage), zero-count multis
            # drop; prune schedule shrinks multis toward vocab_size
            singles = {p for p in model if len(p) == 1}
            cnt = {
                p: max(counts.get(p, 0), 1) if p in singles
                else counts.get(p, 0)
                for p in model
            }
            cnt = {p: c for p, c in cnt.items() if c > 0}
            keep_multi = max(vocab_size - len(singles), 0)
            if it < iterations - 1:
                n_multi = sum(1 for p in cnt if len(p) > 1)
                keep_multi = max(
                    keep_multi, int(math.ceil(n_multi * shrink))
                )
            ranked = sorted(
                ((p, c) for p, c in cnt.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[:keep_multi]
            kept = {p: c for p, c in ranked}
            kept.update({p: cnt[p] for p in singles if p in cnt})
            total = sum(kept.values())
            model = {
                p: _q64(math.log(c / total))
                for p, c in kept.items()
            }
    finally:
        words.unpersist()
    return sorted(model.items())


def unigram_encode_expr(
    col: str, model: list[tuple[str, float]], max_piece_len: int = 4
) -> Column:
    """Column expression segmenting a (lowercased) token column under
    a learned model — the apply step, narrow and shuffle-free. The
    model inlines as a map literal (vocab-bounded, like BPE's merge
    chain)."""
    entries = ", ".join(
        "'{}', cast({!r} as double)".format(
            p.replace("\\", "\\\\").replace("'", "\\'"), lp
        )
        for p, lp in model
    )
    return F.expr(
        _viterbi_pieces_expr(col, f"map({entries})", max_piece_len)
    )


# ------------------------------------------------- driver-gated query
from ..registry import register  # noqa: E402
from ._util import tables  # noqa: E402

_UNI_DOCS = 40
_UNI_MAXWORD = 8
_UNI_MAXPIECE = 3
_UNI_SEED_MULTI = 40


def _unigram_oracle() -> str:
    """DuckDB re-derivation of one full seed + EM round. The Viterbi
    argmax re-derives by enumerating every segmentation path over the
    seed vocabulary (bounded: words <= 8 chars, pieces <= 3) and
    picking per word the max score with the EXACT tie-break the Spark
    fold implements: highest score, then longest-last-piece walking
    back from the end — i.e. lexicographic max on the reversed
    piece-length sequence. Scores are 1/64-quantized so sums are
    binary-exact in both engines and ties are genuine ties."""
    return f"""
    WITH RECURSIVE wf AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT LOWER(tok) AS word
        FROM (SELECT UNNEST(REGEXP_SPLIT_TO_ARRAY(text, '\\s+')) AS tok
              FROM documents WHERE doc_id <= {_UNI_DOCS})
        WHERE tok <> '' AND LENGTH(tok) <= {_UNI_MAXWORD}
      ) GROUP BY word
    ), subs AS (
      SELECT SUBSTRING(word, i, l) AS piece, freq
      FROM (
        SELECT word, freq, UNNEST(RANGE(1, LENGTH(word) + 1)) AS i
        FROM wf
      ), (SELECT UNNEST(RANGE(1, {_UNI_MAXPIECE} + 1)) AS l)
      WHERE i + l - 1 <= LENGTH(word)
    ), pf AS (
      SELECT piece, SUM(freq) AS freq FROM subs GROUP BY piece
    ), seed AS (
      SELECT piece, freq FROM pf WHERE LENGTH(piece) = 1
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, piece) AS rn
        FROM pf WHERE LENGTH(piece) > 1
      ) WHERE rn <= {_UNI_SEED_MULTI}
    ), model0 AS (
      SELECT piece,
             ROUND(LN(freq / (SELECT SUM(freq) FROM seed)) * 64) / 64
               AS logp
      FROM seed
    ), paths AS (
      SELECT word, freq, 0 AS pos, CAST(0.0 AS DOUBLE) AS score,
             CAST([] AS INTEGER[]) AS lens
      FROM wf
      UNION ALL
      SELECT p.word, p.freq, p.pos + LENGTH(m.piece),
             p.score + m.logp,
             LIST_APPEND(p.lens, CAST(LENGTH(m.piece) AS INTEGER))
      FROM paths p JOIN model0 m
        ON p.pos < LENGTH(p.word)
       AND m.piece = SUBSTRING(p.word, p.pos + 1, LENGTH(m.piece))
    ), best AS (
      SELECT word, freq, lens FROM (
        SELECT word, freq, lens,
               ROW_NUMBER() OVER (
                 PARTITION BY word
                 ORDER BY score DESC,
                          LIST_TRANSFORM(LIST_REVERSE(lens),
                                         x -> -x) ASC
               ) AS rn
        FROM paths WHERE pos = LENGTH(word)
      ) WHERE rn = 1
    ), segs AS (
      SELECT word, freq,
             SUBSTRING(
               word,
               1 + CAST(COALESCE(LIST_SUM(lens[1:idx - 1]), 0)
                        AS INTEGER),
               lens[idx]
             ) AS piece
      FROM (SELECT word, freq, lens,
                   UNNEST(RANGE(1, LEN(lens) + 1)) AS idx
            FROM best)
    ), ecnt AS (
      SELECT piece, SUM(freq) AS cnt FROM segs GROUP BY piece
    ), kept AS (
      SELECT s.piece,
             CASE WHEN LENGTH(s.piece) = 1
                  THEN GREATEST(COALESCE(e.cnt, 0), 1)
                  ELSE COALESCE(e.cnt, 0) END AS cnt
      FROM seed s LEFT JOIN ecnt e ON s.piece = e.piece
    ), final AS (
      SELECT piece, cnt,
             ROUND(LN(cnt / (SELECT SUM(cnt) FROM kept WHERE cnt > 0))
                   * 64) / 64 AS logp
      FROM kept WHERE cnt > 0
    )
    SELECT piece, CAST(cnt AS BIGINT) AS cnt, logp
    FROM final ORDER BY piece
    """


@register(
    "llm_unigram_train",
    _unigram_oracle(),
    doc="Unigram-LM (SentencePiece-style) trainer, one full seed + EM "
        "round oracle-gated end to end: substring seed vocabulary "
        "(singles + top-40 multis, deterministic tie-break), "
        "1/64-quantized initial scores, E-step Viterbi segmentation "
        "as a JVM aggregate fold over the word-type relation (model "
        "broadcast as one map row), M-step re-estimate with coverage "
        "floor. DuckDB re-derives the Viterbi argmax by exhaustive "
        "path enumeration with the fold's exact tie-break (score "
        "desc, then reversed piece-length sequence desc); quantized "
        "scores make tie decisions binary-exact across engines. The "
        "multi-round trainer (prune schedule) is pinned against a "
        "pure-Python reference in test_unigram, like BPE's trainer.",
)
def llm_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..cache import persist_tracked

    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.filter(F.col("doc_id") <= _UNI_DOCS)
    # diamonds (guide §5): `words` anchors both the seed-vocab
    # aggregation and the E-step Viterbi fold; `pf` anchors the
    # initial model AND the kept-piece join-back — unpersisted, each
    # subtree re-tokenized the corpus / re-aggregated the substring
    # explosion (measured 0.64-0.79 -> 0.41-0.45 s at sf0.1)
    words = persist_tracked(
        word_freq_table(docs).filter(
            F.length("word") <= _UNI_MAXWORD
        )
    )
    pf = persist_tracked(
        seed_vocab(words, _UNI_MAXPIECE, _UNI_SEED_MULTI)
    )
    total0 = pf.agg(F.sum("freq").alias("t"))
    model0 = pf.crossJoin(F.broadcast(total0)).select(
        "piece",
        (F.round(F.log(F.col("freq") / F.col("t")) * 64) / 64)
        .alias("logp"),
    )
    ecnt = unigram_em_counts(words, model0, _UNI_MAXPIECE)
    kept = (
        pf.select("piece")
        .join(ecnt, "piece", "left")
        .select(
            "piece",
            F.when(
                F.length("piece") == 1,
                F.greatest(F.coalesce(F.col("cnt"), F.lit(0)),
                           F.lit(1)),
            ).otherwise(F.coalesce(F.col("cnt"), F.lit(0)))
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    total2 = kept.agg(F.sum("cnt").alias("t2"))
    return (
        kept.crossJoin(F.broadcast(total2))
        .select(
            "piece",
            F.col("cnt").cast("long").alias("cnt"),
            (F.round(F.log(F.col("cnt") / F.col("t2")) * 64) / 64)
            .alias("logp"),
        )
        .orderBy("piece")
    )
