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
