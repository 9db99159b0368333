"""Unit tests: Hudi-style versioned upsert (K7/W1/A6), time travel (S7),
scrub rule-order semantics (quirk #3), HL7 extraction, validation taxonomy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.operators.versioning import (
    VersionedTable,
    precombine_dedup,
)
from fda_clinical_etl_pipeline_spark.functions.scrub import (
    DEFAULT_PHI_RULES,
    redact_expr,
    rule_hits_expr,
)
from fda_clinical_etl_pipeline_spark.functions import hl7 as hl7f
from fda_clinical_etl_pipeline_spark.plans.validate import validate


def _qlm(spark, rows):
    return spark.createDataFrame(
        rows, "patient_id string, visit_date string, note string"
    )


class TestVersionedTable:
    def test_upsert_precombine_and_time_travel(self, spark, tmp_path):
        t = VersionedTable(
            spark, str(tmp_path / "qlm"), record_key="patient_id",
            precombine="visit_date",
        )
        # commit 0: initial load with an in-batch duplicate — precombine
        # keeps the greater visit_date (hudi/register_hudi.py:64-66)
        t.upsert(_qlm(spark, [
            ("P1", "2025-01-01", "old"),
            ("P1", "2025-02-01", "newer"),
            ("P2", "2025-01-15", "p2"),
        ]))
        snap0 = {r["patient_id"]: r for r in t.snapshot().collect()}
        assert len(snap0) == 2
        assert snap0["P1"]["note"] == "newer"

        # commit 1: update P2 forward, try to regress P1 backward
        t.upsert(_qlm(spark, [
            ("P1", "2024-12-01", "stale"),   # older precombine → ignored
            ("P2", "2025-03-01", "p2-new"),
            ("P3", "2025-01-01", "p3"),
        ]))
        snap1 = {r["patient_id"]: r for r in t.snapshot().collect()}
        assert len(snap1) == 3
        assert snap1["P1"]["note"] == "newer"   # regression rejected
        assert snap1["P2"]["note"] == "p2-new"  # forward update applied

        # time travel: version 0 still shows the old P2
        v0 = {r["patient_id"]: r for r in t.version_as_of(0).collect()}
        assert v0["P2"]["note"] == "p2"
        assert "P3" not in v0

        # commit listing ≅ _hoodie_commit_time distinct, newest first
        commits = t.commits()
        assert [c["version"] for c in commits] == [1, 0]

        # timestamp travel: instant after commit 0 → version 0
        ts0 = commits[-1]["epoch_s"]
        assert {
            r["patient_id"] for r in t.timestamp_as_of(ts0).collect()
        } == {"P1", "P2"}

    def test_equal_precombine_incoming_wins(self, spark, tmp_path):
        t = VersionedTable(
            spark, str(tmp_path / "q2"), record_key="patient_id",
            precombine="visit_date",
        )
        t.upsert(_qlm(spark, [("P1", "2025-01-01", "v1")]))
        t.upsert(_qlm(spark, [("P1", "2025-01-01", "v2")]))
        assert t.snapshot().collect()[0]["note"] == "v2"

    def test_upsert_rewrites_only_touched_buckets(self, spark, tmp_path):
        """A commit touches k of n bucket dirs, not a full snapshot —
        the Hudi file-group COW behavior (hudi/register_hudi.py:56-77)."""
        import os

        t = VersionedTable(
            spark, str(tmp_path / "qb"), record_key="patient_id",
            precombine="visit_date", n_buckets=8,
        )
        # initial load spread over many keys → many buckets
        t.upsert(_qlm(spark, [
            (f"P{i}", "2025-01-01", f"n{i}") for i in range(40)
        ]))
        v0_buckets = {
            d for d in os.listdir(t._snapshot_dir(0))
            if d.startswith("_bucket=")
        }
        assert len(v0_buckets) > 1
        # single-key commit → exactly one bucket dir rewritten
        t.upsert(_qlm(spark, [("P3", "2025-06-01", "updated")]))
        v1_buckets = {
            d for d in os.listdir(t._snapshot_dir(1))
            if d.startswith("_bucket=")
        }
        assert len(v1_buckets) == 1
        assert t.commits()[0]["buckets"] == [int(
            next(iter(v1_buckets)).split("=")[1]
        )]
        # snapshot merges the rewritten bucket with untouched v0 buckets
        snap = {r["patient_id"]: r for r in t.snapshot().collect()}
        assert len(snap) == 40
        assert snap["P3"]["note"] == "updated"
        assert snap["P5"]["note"] == "n5"
        # per-row commit metadata: updated row carries v1, others v0
        assert snap["P3"]["_commit_version"] == 1
        assert snap["P5"]["_commit_version"] == 0

    def test_delete_keys_right_to_be_forgotten(self, spark, tmp_path):
        """Hard delete by record key: rows leave the CURRENT snapshot via
        a bucket-pruned rewrite; history keeps them until vacuum."""
        t = VersionedTable(
            spark, str(tmp_path / "qd"), record_key="patient_id",
            precombine="visit_date", n_buckets=8,
        )
        t.upsert(_qlm(spark, [
            (f"P{i}", "2025-01-01", f"n{i}") for i in range(30)
        ]))
        entry = t.delete_keys(
            spark.createDataFrame([("P3",), ("P7",)], "patient_id string")
        )
        assert entry["op"] == "delete" and len(entry["buckets"]) <= 2
        snap = {r["patient_id"] for r in t.snapshot().collect()}
        assert len(snap) == 28 and "P3" not in snap and "P7" not in snap
        # history: version 0 still contains the deleted patient
        assert "P3" in {
            r["patient_id"] for r in t.version_as_of(0).collect()
        }
        # full erasure: vacuum with keep_last_n=1 retires the old snapshot
        removed = t.vacuum(keep_last_n=1)
        assert removed == [] or all(isinstance(v, int) for v in removed)
        # deleting a missing key is a no-op commit against its bucket
        before = {r["patient_id"] for r in t.snapshot().collect()}
        t.delete_keys(spark.createDataFrame([("ZZZ",)], "patient_id string"))
        assert {r["patient_id"] for r in t.snapshot().collect()} == before

    def test_diff_versions_change_feed(self, spark, tmp_path):
        t = VersionedTable(
            spark, str(tmp_path / "qc"), record_key="patient_id",
            precombine="visit_date", n_buckets=4,
        )
        t.upsert(_qlm(spark, [
            ("P1", "2025-01-01", "a"), ("P2", "2025-01-01", "b"),
            ("P3", "2025-01-01", "c"),
        ]))
        t.upsert(_qlm(spark, [
            ("P2", "2025-02-01", "b2"),           # update
            ("P4", "2025-01-01", "d"),            # insert
        ]))
        t.delete_keys(
            spark.createDataFrame([("P3",)], "patient_id string")
        )
        diff = {
            r["patient_id"]: r["change_type"]
            for r in t.diff_versions(0, 2).collect()
        }
        assert diff == {"P2": "update", "P4": "insert", "P3": "delete"}
        assert t.diff_versions(0, 0).count() == 0

    def test_commit_time_monotonic(self, spark, tmp_path):
        """commit_time strings must sort consistently with version order,
        even for commits landing within the same millisecond."""
        t = VersionedTable(
            spark, str(tmp_path / "qm"), record_key="patient_id",
            precombine="visit_date", n_buckets=4,
        )
        for i in range(4):
            t.upsert(_qlm(spark, [("P1", f"2025-01-0{i + 1}", f"v{i}")]))
        times = [c["commit_time"] for c in sorted(
            t.commits(), key=lambda c: c["version"]
        )]
        assert times == sorted(times) and len(set(times)) == len(times)

    def test_commit_meta_round_trips_time_travel(self, spark, tmp_path):
        t = VersionedTable(
            spark, str(tmp_path / "qt"), record_key="patient_id",
            precombine="visit_date", n_buckets=4,
        )
        c0 = t.upsert(_qlm(spark, [("P1", "2025-01-01", "a")]))
        t.upsert(_qlm(spark, [("P1", "2025-02-01", "b")]))
        v0 = t.version_as_of(0).collect()[0]
        assert v0["_commit_version"] == 0
        assert v0["_commit_time"] == c0["commit_time"]
        latest = t.snapshot().collect()[0]
        assert latest["_commit_version"] == 1 and latest["note"] == "b"
        # with_meta=False strips the meta columns
        assert "_commit_version" not in t.snapshot(with_meta=False).columns

    def test_insert_overwrite_is_one_job(self, spark, tmp_path):
        """The commit's row count comes from an observed write metric and
        its bucket list from the partition dirs on disk — a narrow-input
        insert_overwrite must submit exactly ONE Spark job (the write),
        with no post-write count or distinct scan."""
        t = VersionedTable(
            spark, str(tmp_path / "onejob"), record_key="patient_id",
            precombine="visit_date", n_buckets=4,
        )
        df = _qlm(
            spark,
            [(f"P{i}", "2025-01-01", f"n{i}") for i in range(20)],
        )
        tracker = spark.sparkContext.statusTracker()
        # count NEW job ids, not list lengths: the status store retains
        # a bounded number of jobs (spark.ui.retainedJobs), so late in a
        # long session the list can SHRINK across an action as old ids
        # evict (observed 998 -> 899 in a full-suite shard); new ids are
        # always the freshest and never evicted at +1
        before = set(tracker.getJobIdsForGroup())
        entry = t.insert_overwrite(df)
        new_jobs = set(tracker.getJobIdsForGroup()) - before
        assert entry["rows"] == 20
        assert entry["buckets"]  # from directory listing, not a scan
        assert len(new_jobs) == 1
        # and the recorded metadata still drives reads correctly
        assert t.snapshot(with_meta=False).count() == 20

    def test_upsert_commit_count_from_observed_metric(self, spark, tmp_path):
        """Upsert's committed-row count comes from the write job's
        observed metric (no post-write scan). With a single bucket the
        merge rewrites the whole table, so the expected count is exact:
        updated key + carried-over key."""
        t = VersionedTable(
            spark, str(tmp_path / "noscan"), record_key="patient_id",
            precombine="visit_date", n_buckets=1,
        )
        entry = t.upsert(_qlm(spark, [
            ("P1", "2025-01-01", "a"),
            ("P2", "2025-01-02", "b"),
        ]))
        assert entry["rows"] == 2
        entry2 = t.upsert(_qlm(spark, [("P1", "2025-03-01", "a2")]))
        assert entry2["rows"] == 2  # merged bucket: updated P1 + carried P2
        assert entry2["op"] == "upsert"
        snap = {r["patient_id"]: r for r in t.snapshot().collect()}
        assert snap["P1"]["note"] == "a2" and snap["P2"]["note"] == "b"

    def test_precombine_dedup_tiebreak(self, spark):
        df = _qlm(spark, [
            ("P1", "2025-01-01", "a"),
            ("P1", "2025-01-01", "b"),
        ])
        out = precombine_dedup(df, "patient_id", "visit_date", ("note",))
        assert out.collect()[0]["note"] == "b"  # explicit desc tiebreak


class TestScrubSemantics:
    def test_rule_order_address_consumes_phone(self, spark):
        """Quirk #3: greedy PHI_ADDRESS_SIMPLE sorts first and eats
        digit-led spans before the phone/date rules see them."""
        df = spark.createDataFrame(
            [("Call 555-214-7788 at 742 Evergreen Terrace today",)], "t string"
        )
        out = df.select(redact_expr("t").alias("s")).collect()[0]["s"]
        # the phone IS matched first by the address regex? No: '555-...'
        # has no digit-whitespace prefix, so PHONE gets it; the street
        # span goes to ADDRESS.
        assert "[REDACTED_PHONE]" in out or "[REDACTED_ADDRESS]" in out
        assert "555-214-7788" not in out
        assert "742 Evergreen" not in out

    def test_sequential_application(self, spark):
        """Rule N runs on rule N-1's output: an SSN inside a span already
        consumed by the address rule is gone before PHI_SSN runs."""
        df = spark.createDataFrame([("1 Oak St 111-22-3333",)], "t string")
        out = df.select(redact_expr("t").alias("s")).collect()[0]["s"]
        # greedy address regex consumes digits+letters+spaces+dashes
        # including the SSN-shaped tail
        assert out.count("[REDACTED") == 1
        assert "111-22-3333" not in out

    def test_case_insensitive(self, spark):
        df = spark.createDataFrame([("MAIL ME AT FOO@BAR.COM",)], "t string")
        out = df.select(redact_expr("t").alias("s")).collect()[0]["s"]
        assert "[REDACTED_EMAIL]" in out

    def test_rule_hits_attribution(self, spark):
        # note the comma after the SSN: "3333 email a" would otherwise be
        # eaten by the greedy address rule first (quirk #3 in action)
        df = spark.createDataFrame(
            [("ssn 111-22-3333, email a@b.co",), ("nothing here",)], "t string"
        )
        hits = (
            df.select(F.explode(rule_hits_expr("t")).alias("rh"))
            .groupBy("rh.rule_id").agg(F.sum("rh.hits").alias("h"))
            .filter("h > 0").collect()
        )
        fired = {r["rule_id"] for r in hits}
        assert "PHI_SSN" in fired and "PHI_EMAIL" in fired
        assert "PHI_DATE_ISO" not in fired

    def test_bad_regex_falls_back_to_literal(self, spark):
        from fda_clinical_etl_pipeline_spark.functions.scrub import PhiRule

        rules = (PhiRule("R1", "[unclosed", "[GONE]"),)
        df = spark.createDataFrame([("x [unclosed y",)], "t string")
        out = df.select(redact_expr("t", rules).alias("s")).collect()[0]["s"]
        assert out == "x [GONE] y"


class TestHl7Functions:
    def test_pid_positions_and_ssn_coalesce(self, spark):
        msg = (
            "MSH|a|b\n"
            "PID|1||30138||Emily||19770318|M|||742 Oak St||||||sixteen|seventeen\n"
            "OBX|1|ST|R||142\n"
            "OBX|2|ST|R||143"
        )
        df = spark.createDataFrame([(msg,)], "message string").withColumn(
            "segments", F.split("message", "\n")
        )
        row = df.select(
            hl7f.pid_field(F.col("segments"), 3).alias("pid3"),
            hl7f.pid_field(F.col("segments"), 11).alias("pid11"),
            hl7f.hl7_ssn(F.col("segments")).alias("ssn"),
            hl7f.obx_note_text(F.col("segments")).alias("note"),
            hl7f.has_segment(F.col("segments"), "PID").alias("has_pid"),
        ).collect()[0]
        assert row["pid3"] == "30138"
        assert row["pid11"] == "742 Oak St"
        assert row["ssn"] == "sixteen"  # PID-16 wins the coalesce
        assert row["note"] == "OBX|1|ST|R||142 OBX|2|ST|R||143"
        assert row["has_pid"] is True

    def test_missing_pid_gives_nulls(self, spark):
        df = spark.createDataFrame([("MSH|a\nOBR|1",)], "message string"
                                   ).withColumn("segments", F.split("message", "\n"))
        row = df.select(
            hl7f.pid_field(F.col("segments"), 3).alias("pid3"),
            hl7f.has_segment(F.col("segments"), "PID").alias("has_pid"),
        ).collect()[0]
        assert row["pid3"] is None
        assert row["has_pid"] is False


class TestValidation:
    META = [
        {"column_name": "id", "data_type": "string", "is_nullable": False},
        {"column_name": "amount", "data_type": "float", "is_nullable": True},
        {"column_name": "when", "data_type": "date", "is_nullable": True},
    ]

    def test_taxonomy_and_split(self, spark):
        df = spark.createDataFrame(
            [
                ("A", "1.5", "2025-01-01"),     # valid
                ("", "2.0", "2025-01-02"),      # null_not_allowed:id
                ("C", "oops", "2025-01-03"),    # type_mismatch(float)
                ("D", "3.0", "31/02/1999"),     # type_mismatch(date)
                ("E", "", ""),                  # empties allowed (nullable)
            ],
            "id string, amount string, `when` string",
        )
        res = validate(df, self.META)
        assert res.valid.count() == 2
        q = {r["id"]: r["_errors"] for r in res.quarantine.collect()}
        assert q[""] == ["null_not_allowed:id"]
        assert q["C"] == ["type_mismatch(float):amount"]
        assert q["D"] == ["type_mismatch(date):when"]
        summary = {r["error"]: r["count"] for r in res.error_summary().collect()}
        assert summary["null_not_allowed:id"] == 1

    def test_missing_column_fails_every_row(self, spark):
        df = spark.createDataFrame([("A",)], "id string")
        res = validate(df, self.META)
        assert res.valid.count() == 0
        errs = res.quarantine.collect()[0]["_errors"]
        assert "missing_columns:amount" in errs
        assert "missing_columns:when" in errs

    def test_no_metadata_passes_everything(self, spark):
        df = spark.createDataFrame([("A",), ("",)], "id string")
        res = validate(df, [])
        assert res.valid.count() == 2
