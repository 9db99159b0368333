"""Distributed unigram-LM trainer/encoder vs a pure-Python reference —
model-for-model and segmentation-for-segmentation equality, including
the Viterbi tie-break (highest score, then longest piece walking back
from the end of the word) and the deterministic prune schedule."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from fda_clinical_etl_pipeline_spark.operators.unigram import (
    _q64,
    seed_vocab,
    unigram_em_counts,
    unigram_encode_expr,
    unigram_train,
)
from fda_clinical_etl_pipeline_spark.operators.bpe import (
    word_freq_table,
)


# ------------------------------------------------ pure-Python reference
def ref_word_freq(texts):
    wf = Counter()
    for t in texts:
        for w in t.split():
            wf[w.lower()] += 1
    return wf


def ref_seed(wf, max_len, seed_size):
    pf = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                pf[w[i:i + l]] += f
    singles = {p: c for p, c in pf.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in pf.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    out = dict(singles)
    out.update(dict(multis))
    return out


def ref_viterbi(word, model, max_len):
    """dp with struct-max semantics: best score, ties -> LARGEST l."""
    n = len(word)
    dp = [(0.0, 0)]
    for i in range(1, n + 1):
        cands = []
        for l in range(1, min(i, max_len) + 1):
            s = dp[i - l][0] + model.get(word[i - l:i], -1e15)
            cands.append((s, l))
        dp.append(max(cands))
    pieces, pos = [], n
    while pos > 0:
        l = dp[pos][1]
        pieces.insert(0, word[pos - l:pos])
        pos -= l
    return pieces


def ref_train(texts, vocab_size, iterations, max_len, seed_size,
              shrink=0.75):
    wf = ref_word_freq(texts)
    seed = ref_seed(wf, max_len, seed_size)
    total = sum(seed.values())
    model = {p: _q64(math.log(f / total)) for p, f in seed.items()}
    for it in range(iterations):
        counts = Counter()
        for w, f in wf.items():
            for p in ref_viterbi(w, model, max_len):
                counts[p] += f
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
            p: _q64(math.log(c / total)) for p, c in kept.items()
        }
    return sorted(model.items())


FIXTURE = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat is flat",
    "matter chatter the the the",
    "internationalization nation station",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_unigram_train_matches_reference_on_fixture(spark):
    df = _df(spark, FIXTURE)
    got = unigram_train(
        df, vocab_size=40, iterations=2, max_piece_len=4,
        seed_size=30,
    )
    exp = ref_train(FIXTURE, 40, 2, 4, 30)
    assert got == exp


def test_unigram_seed_counts_occurrences(spark):
    # "aaa" contributes 3 occurrences of "a" and 2 of "aa" per doc
    df = _df(spark, ["aaa aaa"])
    seed = {
        r["piece"]: r["freq"]
        for r in seed_vocab(
            word_freq_table(df), max_piece_len=3, seed_size=10
        ).collect()
    }
    assert seed["a"] == 6
    assert seed["aa"] == 4
    assert seed["aaa"] == 2


def test_unigram_viterbi_tie_prefers_longest_from_end(spark):
    """Exact-tie scores (1/64 multiples): the fold must pick the
    longest last piece, like the reference dp's struct max."""
    model = [("a", -1.0), ("b", -1.0), ("ab", -2.0), ("ba", -2.0)]
    # "aba": a|ba and ab|a both score -3.0; tie-break -> last piece
    # as long as possible -> a|ba
    df = _df(spark, ["x"]).select(
        unigram_encode_expr("'aba'", model, 2).alias("ps")
    )
    assert df.collect()[0]["ps"] == ["a", "ba"]
    assert ref_viterbi("aba", dict(model), 2) == ["a", "ba"]


def test_unigram_em_counts_match_reference(spark):
    df = _df(spark, FIXTURE)
    wf = ref_word_freq(FIXTURE)
    seed = ref_seed(wf, 3, 20)
    total = sum(seed.values())
    model = {p: _q64(math.log(f / total)) for p, f in seed.items()}
    mdf = df.sparkSession.createDataFrame(
        sorted(model.items()), "piece string, logp double"
    )
    got = {
        r["piece"]: r["cnt"]
        for r in unigram_em_counts(
            word_freq_table(df), mdf, 3
        ).collect()
    }
    exp = Counter()
    for w, f in wf.items():
        for p in ref_viterbi(w, model, 3):
            exp[p] += f
    assert got == dict(exp)


def test_unigram_encode_expr_segments_under_model(spark):
    df = _df(spark, FIXTURE)
    model = unigram_train(
        df, vocab_size=40, iterations=2, max_piece_len=4,
        seed_size=30,
    )
    words = word_freq_table(df).select("word")
    enc = {
        r["word"]: list(r["ps"])
        for r in words.select(
            "word",
            unigram_encode_expr("word", model, 4).alias("ps"),
        ).collect()
    }
    mdl = dict(model)
    for w, ps in enc.items():
        assert ps == ref_viterbi(w, mdl, 4)
        assert "".join(ps) == w  # segmentation covers the word


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("abcd "), min_size=1, max_size=30
        ).map(lambda s: s.strip() or "a"),
        min_size=1, max_size=6,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_unigram_random_corpora_match_reference(
    spark, texts, iterations
):
    df = _df(spark, texts)
    got = unigram_train(
        df, vocab_size=12, iterations=iterations, max_piece_len=3,
        seed_size=8,
    )
    exp = ref_train(texts, 12, iterations, 3, 8)
    assert got == exp
