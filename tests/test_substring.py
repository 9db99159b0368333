"""Substring-level dedup: duplicated k-gram spans, island stats, and
the masking transformation — each checked against an in-test
brute-force reference implementing the same definition."""

from __future__ import annotations

import re

import pytest

from fda_clinical_etl_pipeline_spark.operators.substring import (
    duplicated_positions,
    duplicated_span_stats,
    mask_duplicated_spans,
)


def _ref(docs: dict[int, str], k: int):
    """Brute-force reference: token positions (1-based) whose k-gram
    repeats corpus-wide; per-doc island stats; masked text keeping the
    globally-first occurrence per gram."""
    toks = {
        d: [t for t in re.split(r"\s+", s.strip()) if t]
        for d, s in docs.items()
    }
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        tk = toks[d]
        for i in range(len(tk) - k + 1):
            occ.setdefault(" ".join(tk[i:i + k]), []).append((d, i + 1))
    dup_pos: dict[int, set[int]] = {}
    covered: dict[int, set[int]] = {}
    for g, sites in occ.items():
        if len(sites) <= 1:
            continue
        for j, (d, p) in enumerate(sorted(sites)):
            dup_pos.setdefault(d, set()).add(p)
            if j > 0:  # non-canonical: its k tokens are masked
                covered.setdefault(d, set()).update(
                    range(p, p + k)
                )
    stats = {}
    for d, ps in dup_pos.items():
        sp = sorted(ps)
        islands, cur = [], 1
        for a, b in zip(sp, sp[1:]):
            if b == a + 1:
                cur += 1
            else:
                islands.append(cur)
                cur = 1
        islands.append(cur)
        stats[d] = (
            len(toks[d]) - k + 1,
            len(sp),
            len(islands),
            max(islands),
        )
    masked = {}
    for d, tk in toks.items():
        cov = covered.get(d, set())
        if not cov:
            masked[d] = docs[d]
        else:
            masked[d] = " ".join(
                t for i, t in enumerate(tk, start=1) if i not in cov
            )
    return dup_pos, stats, masked


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog today",
    2: "intro text the quick brown fox jumps over something else",
    3: "  unrelated words only here nothing repeats at all  ",
    4: "the quick brown fox jumps over the lazy dog today",  # full dup of 1
    5: "tiny doc",  # < k tokens: contributes nothing
}


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(
        [(d, s) for d, s in CORPUS.items()], "doc_id long, text string"
    )


def test_duplicated_positions_match_reference(spark, docs_df):
    got = {
        (r.doc_id, r.pos)
        for r in duplicated_positions(docs_df, k=5).collect()
    }
    dup_pos, _, _ = _ref(CORPUS, 5)
    want = {(d, p) for d, ps in dup_pos.items() for p in ps}
    assert got == want


def test_span_stats_match_reference(spark, docs_df):
    got = {
        r.doc_id: (r.n_grams, r.n_dup_positions, r.n_islands,
                   r.max_island_len)
        for r in duplicated_span_stats(docs_df, k=5).collect()
    }
    _, stats, _ = _ref(CORPUS, 5)
    assert got == stats
    assert 3 not in got and 5 not in got  # clean/short docs absent


def test_mask_keeps_canonical_occurrence(spark, docs_df):
    got = {
        r.doc_id: r.clean_text
        for r in mask_duplicated_spans(docs_df, k=5).collect()
    }
    _, _, masked = _ref(CORPUS, 5)
    assert got == masked
    # doc 1 is the canonical copy: text unchanged
    assert got[1] == CORPUS[1]
    # doc 4 (the non-canonical full duplicate) loses all tokens
    assert got[4] == ""
    # short doc passes through byte-identically
    assert got[5] == CORPUS[5]


def test_randomized_against_reference(spark):
    import random

    rng = random.Random(6)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        d: " ".join(rng.choice(vocab)
                    for _ in range(rng.randint(0, 30)))
        for d in range(40)
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    k = 3
    _, stats, masked = _ref(docs, k)
    got_stats = {
        r.doc_id: (r.n_grams, r.n_dup_positions, r.n_islands,
                   r.max_island_len)
        for r in duplicated_span_stats(df, k=k).collect()
    }
    assert got_stats == stats
    got_masked = {
        r.doc_id: r.clean_text
        for r in mask_duplicated_spans(df, k=k).collect()
    }
    assert got_masked == masked
