"""Distributed BPE trainer/encoder vs a pure-Python reference —
merge-for-merge and encoding-for-encoding equality."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from fda_clinical_etl_pipeline_spark.operators.bpe import (
    bpe_encode_tokens,
    bpe_train,
    word_freq_table,
)


def ref_bpe(texts, num_merges):
    wf = Counter()
    for t in texts:
        for w in t.split():
            wf[w.lower()] += 1
    words = {w: list(w) for w in wf}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


FIXTURE = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat is flat",
    "matter chatter the the the",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_matches_reference_on_fixture(spark):
    df = _df(spark, FIXTURE)
    got = bpe_train(df, num_merges=8)
    exp, ref_words = ref_bpe(FIXTURE, 8)
    assert got == exp
    enc = {r.word: list(r.pieces) for r in bpe_encode_tokens(df, got).collect()}
    assert enc == ref_words


def test_bpe_word_table_is_one_scan_shape(spark):
    df = _df(spark, FIXTURE)
    wf = {r.word: r.freq for r in word_freq_table(df).collect()}
    assert wf["the"] == 7
    assert wf["cat"] == 2


def test_bpe_repeated_symbol_merges_leftmost(spark):
    """'aaaa' under merge (a,a): leftmost non-overlapping → [aa, aa];
    then (aa,aa) → [aaaa]. The fold must not double-consume."""
    df = _df(spark, ["aaaa aaaa aaa"])
    merges = bpe_train(df, num_merges=2)
    exp, ref_words = ref_bpe(["aaaa aaaa aaa"], 2)
    assert merges == exp
    enc = {
        r.word: list(r.pieces)
        for r in bpe_encode_tokens(df, merges).collect()
    }
    assert enc == ref_words


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=1, max_size=24),
        min_size=1,
        max_size=6,
    ).filter(lambda ts: any(t.strip() for t in ts)),
    st.integers(1, 5),
)
def test_bpe_property_vs_reference(spark, texts, k):
    df = _df(spark, texts)
    got = bpe_train(df, num_merges=k)
    exp, ref_words = ref_bpe(texts, k)
    assert got == exp
    enc = {r.word: list(r.pieces) for r in bpe_encode_tokens(df, got).collect()}
    assert enc == ref_words


def test_portable_merges_encode_edge_cases(spark):
    """The gate's literal merge list against the pure-Python reference
    on overlap-adversarial words: leftmost non-overlapping single-pass
    semantics ('ththth' under (t,h) merges every pair; 'ttth' merges
    the SECOND t with h) and the two-merge cascade 'the'."""
    from fda_clinical_etl_pipeline_spark.operators.bpe import (
        PORTABLE_MERGES,
        bpe_encode_expr,
    )
    from pyspark.sql import functions as F

    def ref_encode(word: str) -> list[str]:
        syms = list(word)
        for a, b in PORTABLE_MERGES:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    # no empty word: Spark's split('', '') yields [''], and the gate
    # filters empty tokens before encoding anyway
    words = ["the", "ththth", "ttth", "anand", "anders", "a",
             "thethe", "inin", "onon", "xyz"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["pieces"]
        for r in df.select(
            "word",
            bpe_encode_expr("word", PORTABLE_MERGES).alias("pieces"),
        ).collect()
    }
    for w in words:
        assert got[w] == ref_encode(w), w
    # sanity of the interesting ones
    assert got["the"] == ["the"]
    assert got["ththth"] == ["th", "th", "th"]
    assert got["anders"] == ["and", "ers"]
