"""Training-corpus preparation: stage accounting and invariants, plus the
RocksDB state store switch for streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.operators.corpus import (
    corpus_report,
    prepare_training_corpus,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


GOOD = "the quick brown fox jumps over a lazy dog in the warm morning sun today"


def test_corpus_prep_stages(spark):
    rows = [
        (0, GOOD, "en"),
        (1, GOOD, "en"),                      # exact dup of 0 → dropped
        (2, GOOD + " extra tail words here", "en"),  # near-dup of 0 → dropped
        (3, "short", "en"),                   # quality: too few tokens
        (4, "xx yy zz ww vv uu tt ss rr qq pp", "en"),  # quality: no stopwords
        (5, "a completely different document that is about the sea and the "
            "ships that sail upon it every single day", "en"),
    ]
    docs = _docs(spark, rows)
    report = corpus_report(docs)
    assert report["input"] == 6
    assert report["dropped_quality"] == 2
    assert report["dropped_exact_dup"] == 1
    assert report["dropped_near_dup"] == 1
    assert report["surviving"] == 2

    out = {r["doc_id"]: r for r in prepare_training_corpus(docs).collect()}
    assert set(out) == {0, 5}  # min doc_id survives each dup cluster
    assert out[0]["n_tokens"] == len(GOOD.split())


def test_corpus_prep_deterministic(spark):
    rows = [(i, GOOD + f" variant {i}", "en") for i in range(8)]
    docs = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in prepare_training_corpus(docs).collect())
    b = sorted(r["doc_id"] for r in prepare_training_corpus(docs).collect())
    assert a == b
    assert 0 in a  # smallest id always survives


def test_connected_components_chain(spark):
    """A~B~C (A!~C) collapses to one cluster labeled min(doc_id);
    disjoint pairs keep their own label."""
    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    comps = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_connected_components_nonconvergence_is_reported(spark):
    """A 25-node path graph cannot reach a fixpoint in 5 min-label
    rounds (propagation is one hop per round): the truncated result
    must WARN by default and raise when asked — never a silent stop."""
    import warnings

    import pytest

    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components(chain, max_iter=5)
        n_comps = labels.select("component").distinct().count()
    assert n_comps > 1  # truncated: not yet one component
    assert any("no fixpoint" in str(w.message) for w in caught)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(chain, max_iter=5, on_nonconvergence="raise")


def test_connected_components_star_deep_chain(spark):
    """A 120-node path graph is the min-label worst case (120 rounds =
    one hop per round); the large-star/small-star engine must collapse
    it to ONE component labeled 0 within its default O(log² n) round
    budget — diameter-independence is the whole point of the second
    engine."""
    import warnings

    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components_star(chain)
        comps = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert not any("no fixpoint" in str(w.message) for w in caught)
    assert len(comps) == 121
    assert set(comps.values()) == {0}


def test_connected_components_star_truncated_labels_one_row_each(spark):
    """ADVICE r11: when the star engine exhausts max_iter (warn mode),
    the non-fixpoint edge set can still hold multiple parents per
    child; the labeling join must collapse them — one row per doc_id,
    always, even when components are (warned) split."""
    import warnings

    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components_star(chain, max_iter=1).collect()
    assert any("no fixpoint" in str(w.message) for w in caught)
    ids = [r["doc_id"] for r in labels]
    assert len(ids) == len(set(ids)) == 61  # exactly one row per node


def test_connected_components_star_edge_cases(spark):
    """Self-loop-only nodes label themselves; disjoint clusters keep
    their own minima; duplicate/reversed edges are harmless — parity
    with the min-label engine's contract."""
    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (7, 9), (42, 42)],
        "doc_a long, doc_b long",
    )
    comps = {
        r["doc_id"]: r["component"]
        for r in connected_components_star(pairs).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7, 42: 42}
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components_star(empty).count() == 0


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to RELIABLE
    checkpoints: converges to one component and leaves checkpoint files
    in the given durable directory."""
    import os

    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    ckpt_dir = str(tmp_path / "cc_ckpt")
    labels = connected_components(chain, max_iter=15,
                                  checkpoint_dir=ckpt_dir)
    comps = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == 11
    # reliable checkpoints materialized under the durable dir
    found = [f for _, _, fs in os.walk(ckpt_dir) for f in fs]
    assert found


def test_corpus_report_matches_prep_count(spark):
    rows = [
        (0, GOOD, "en"),
        (1, GOOD, "en"),
        (2, GOOD + " extra tail words here", "en"),
        (3, "short", "en"),
        (5, "a completely different document that is about the sea and the "
            "ships that sail upon it every single day", "en"),
    ]
    docs = _docs(spark, rows)
    for cluster in (False, True):
        report = corpus_report(docs, cluster=cluster)
        n = prepare_training_corpus(docs, cluster=cluster).count()
        assert report["surviving"] == n


def test_rocksdb_state_store_switch(spark, tmp_path):
    import datetime

    from fda_clinical_etl_pipeline_spark.streaming.pipeline import (
        ROCKSDB_PROVIDER,
        run_to_memory,
        sessionize,
        use_rocksdb_state_store,
    )

    assert use_rocksdb_state_store(spark)
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == ROCKSDB_PROVIDER
    )
    try:
        rows = [
            (1, datetime.datetime(2024, 1, 1, 10, 0), 1, "click", 1.0),
            (2, datetime.datetime(2024, 1, 1, 12, 0), 1, "click", 2.0),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        src = tmp_path / "rdb_src"
        df.coalesce(1).write.parquet(str(src))
        stream = spark.readStream.schema(df.schema).parquet(str(src))
        sessions = sessionize(stream, gap_seconds=1800, watermark="10 minutes")
        run_to_memory(
            sessions, "rdb_sessions", "append", str(tmp_path / "rdb_ckpt")
        )
        out = spark.sql("SELECT * FROM rdb_sessions").collect()
        # first session closed by the 2-hour-later event under RocksDB state
        assert any(r["n_events"] == 1 and r["value_sum"] == 1.0 for r in out)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_incremental_dedup_against_fingerprints(spark):
    """Delta dedup against a released corpus's fingerprint table: rows
    duplicating the release drop, in-delta dups keep min doc_id."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        incremental_dedup,
    )

    released = _docs(spark, [(0, GOOD, "en"), (1, "older text here", "en")])
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), "\\s+", " ")))
    fingerprints = released.select(fp.alias("fingerprint"))
    delta = _docs(spark, [
        (10, GOOD, "en"),               # dup of released doc 0 → dropped
        (11, "brand new words", "en"),  # fresh
        (12, "brand new words", "en"),  # in-delta dup → min id 11 kept
    ])
    out = sorted(
        r["doc_id"] for r in incremental_dedup(delta, fingerprints).collect()
    )
    assert out == [11]


def test_incremental_minhash_never_rescans_prior_text(spark, tmp_path):
    """Incremental NEAR-dup across corpus versions: the released corpus
    participates only through its persisted signature table. Proven two
    ways: (a) the survivor plan scans the signature parquet but NOT the
    prior-text parquet; (b) near-dups of the release drop, fresh text
    survives, in-delta near-dups keep min doc_id."""
    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        incremental_minhash_dedup,
        write_signature_table,
    )

    other = ("completely different content about spark engines and "
             "large scale distributed aggregation pipelines running fast")
    prior = _docs(spark, [(0, GOOD, "en"), (1, other, "en")]).select(
        "doc_id", "text"
    )
    prior_text_path = str(tmp_path / "prior_text_v1")
    prior.write.parquet(prior_text_path)
    sig_path = str(tmp_path / "prior_sigs_v1")
    # release-time step reads the text ONCE to build the signature table
    write_signature_table(spark.read.parquet(prior_text_path), sig_path)

    fresh = ("a brand new document with entirely novel words nobody has "
             "ever written before in any corpus version at all")
    delta = _docs(spark, [
        (100, GOOD, "en"),   # exact near-dup of released doc 0 → dropped
        (101, fresh, "en"),  # fresh → survives
        (102, fresh + " extra", "en"),  # in-delta near-dup → 101 kept
    ]).select("doc_id", "text")

    out = incremental_minhash_dedup(
        delta, spark.read.parquet(sig_path), threshold=0.5
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")  # formatted mode prints scan paths
    plan = buf.getvalue()
    assert "prior_sigs_v1" in plan       # signatures: the only prior input
    assert "prior_text_v1" not in plan   # released text never re-scanned
    assert sorted(r["doc_id"] for r in out.collect()) == [101]


def test_split_assign_partitions_corpus(spark):
    """Every document lands in exactly one split; counts reconcile with
    the corpus total and all three splits are populated at sf0.001+."""
    from fda_clinical_etl_pipeline_spark.operators.llmprep import (
        llm_split_assign,
    )
    from fda_clinical_etl_pipeline_spark.operators._util import tables

    sf = "/root/testdata/sf0.01"
    rows = {r["split"]: r for r in llm_split_assign(spark, sf).collect()}
    (documents,) = tables(spark, sf, "documents")
    total = documents.count()
    assert set(rows) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == total
    # train dominates by construction (75% expected cut)
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]


def test_split_leakage_pairs_cross_splits_only(spark):
    """The audit reports only pairs whose endpoints differ in split, and
    every reported pair is a VERIFIED near-dup (subset of the portable
    pair set); split labels are canonically ordered."""
    from pyspark.sql import functions as F

    from fda_clinical_etl_pipeline_spark.operators.dedup import (
        lowered_tokens,
        portable_minhash_candidates,
        verify_jaccard,
    )
    from fda_clinical_etl_pipeline_spark.operators.llmprep import (
        split_leakage_audit,
        split_of,
    )
    from fda_clinical_etl_pipeline_spark.operators._util import tables

    sf = "/root/testdata/sf0.01"
    audit = split_leakage_audit(spark, sf).collect()
    assert audit, "sf0.01 corpus is known to contain cross-split dups"
    for r in audit:
        assert r["split_lo"] < r["split_hi"]
        assert r["n_leaky_pairs"] > 0
        assert 0.5 <= r["max_jaccard"] <= 1.0

    # Reconcile the audit total against a direct recount.
    (documents,) = tables(spark, sf, "documents")
    docs = documents.select("doc_id", "text")
    toks = lowered_tokens(docs).persist()
    pairs = verify_jaccard(
        portable_minhash_candidates(toks), threshold=0.5, toks=toks
    )
    splits = docs.select("doc_id", split_of("doc_id").alias("split"))
    n_cross = (
        pairs.join(
            splits.select(F.col("doc_id").alias("doc_a"),
                          F.col("split").alias("sa")), "doc_a")
        .join(
            splits.select(F.col("doc_id").alias("doc_b"),
                          F.col("split").alias("sb")), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert sum(r["n_leaky_pairs"] for r in audit) == n_cross
