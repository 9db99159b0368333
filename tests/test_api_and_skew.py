"""Tests: lineage API façade (handlers + stdlib HTTP server) and the
skew utilities (salted join equivalence, two-phase agg equivalence)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.api import LineageApi, serve_stdlib
from fda_clinical_etl_pipeline_spark.operators.skew import (
    key_histogram,
    salted_join,
    two_phase_agg,
)
from fda_clinical_etl_pipeline_spark.plans.provenance import ProvenanceStore


@pytest.fixture()
def store(spark, tmp_path):
    s = ProvenanceStore(spark, str(tmp_path / "prov"))
    s.register_batch("b1", "hospital_a", "/raw/a.csv", "abc123")
    s.record_step("b1", "INGEST", {"x": 1})
    s.update_status("b1", "VALIDATED", total_rows=10)
    s.record_step("b1", "VALIDATION_PASSED", {})
    s.record_rule("b1", "PHI_EMAIL", "email", 3)
    s.register_batch("b2", "clinic_b", "/raw/b.jsonl", "def456")
    s.update_status("b2", "FAILED_VALIDATION", error_details="2 invalid rows")
    return s


class TestLineageApi:
    def test_handlers(self, store):
        api = LineageApi(store)
        assert api.health() == {"status": "ok"}

        b = api.batch("b1")
        assert b["status"] == "VALIDATED" and b["total_rows"] == 10
        assert b["raw_sha256"] == "abc123"  # carried through the update
        assert api.batch("nope") is None

        steps = api.steps("b1")
        assert [s["step_name"] for s in steps] == ["INGEST", "VALIDATION_PASSED"]
        assert json.loads(steps[0]["details_json"]) == {"x": 1}

        rules = api.rules("b1")
        assert rules[0]["rule_id"] == "PHI_EMAIL" and rules[0]["hits"] == 3

        latest = api.latest(1)
        assert {r["source_name"] for r in latest} == {"hospital_a", "clinic_b"}

        failed = api.search(status="FAILED_VALIDATION")
        assert [r["batch_id"] for r in failed] == ["b2"]
        assert api.search(source_name="hospital_a")[0]["batch_id"] == "b1"

    def test_stdlib_http_server(self, store):
        server = serve_stdlib(store, port=0)  # ephemeral port
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            def get(path):
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}"
                ) as r:
                    return r.status, json.loads(r.read())

            assert get("/health") == (200, {"status": "ok"})
            code, body = get("/provenance/batch/b1")
            assert code == 200 and body["status"] == "VALIDATED"
            code, body = get("/provenance/search?status=FAILED_VALIDATION")
            assert code == 200 and body[0]["batch_id"] == "b2"
            # 404 path
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/provenance/batch/ghost"
                )
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()


class TestAuditLog:
    def test_recent_audit_order_and_limit(self, spark, tmp_path):
        s = ProvenanceStore(spark, str(tmp_path / "a"))
        for i in range(5):
            s.write_audit("runner", f"ACTION_{i}", f"b{i}", severity="INFO")
        recent = s.recent_audit(3).collect()
        assert len(recent) == 3
        assert [r["action"] for r in recent] == [
            "ACTION_4", "ACTION_3", "ACTION_2"
        ]
        assert "p_month" not in s.recent_audit(1).columns


class TestLineageAndVacuum:
    def test_lineage_single_row(self, spark, store):
        row = store.lineage("b1").collect()[0]
        assert row["status"] == "VALIDATED"
        assert row["steps"] == ["INGEST", "VALIDATION_PASSED"]
        assert row["rules"] == ["PHI_EMAIL"]
        # batch with no rules: rules column NULL, not an error
        row2 = store.lineage("b2").collect()[0]
        assert row2["status"] == "FAILED_VALIDATION"
        assert row2["rules"] is None

    def test_vacuum_keeps_recent_versions(self, spark, tmp_path):
        import os

        from fda_clinical_etl_pipeline_spark.operators.versioning import (
            VersionedTable,
        )

        t = VersionedTable(spark, str(tmp_path / "vt"), "k", "v")
        for i in range(5):
            t.upsert(
                spark.createDataFrame([("a", str(i), i)], "k string, v string, x long")
            )
        removed = t.vacuum(keep_last_n=2)
        assert removed == [2, 1, 0]
        assert t.snapshot().count() == 1           # latest unaffected
        assert t.version_as_of(3).count() == 1     # kept version readable
        assert not os.path.isdir(t._snapshot_dir(0))
        assert len(t.commits()) == 5               # history metadata intact


class TestProvenancePartitioning:
    def test_month_partitioned_appends_and_compact(self, spark, tmp_path):
        import glob
        import os

        s = ProvenanceStore(spark, str(tmp_path / "p"))
        for i in range(6):
            s.register_batch(f"b{i}", "src", f"/raw/{i}", f"sha{i}")
            s.record_step(f"b{i}", "INGEST", {})
        # hive-style month dirs exist
        batch_dir = str(tmp_path / "p" / "provenance_batch")
        months = [d for d in os.listdir(batch_dir) if d.startswith("p_month=")]
        assert months
        files_before = len(glob.glob(batch_dir + "/*/*.parquet"))
        assert files_before >= 6  # one tiny file per event

        before = {r["batch_id"]: r["status"] for r in s.batches().collect()}
        s.compact()
        files_after = len(glob.glob(batch_dir + "/*/*.parquet"))
        assert files_after < files_before
        after = {r["batch_id"]: r["status"] for r in s.batches().collect()}
        assert after == before  # compaction is content-preserving
        assert [r["step_name"] for r in s.steps("b3").collect()] == ["INGEST"]


class TestSkewUtilities:
    def test_salted_join_matches_plain_join(self, spark, sf_dir):
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
        )
        plain = (
            lineitem.join(orders, "l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
            .collect()[0]
        )
        salted = (
            salted_join(lineitem, orders, "l_orderkey", salt_buckets=4)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
            .collect()[0]
        )
        assert plain["n"] == salted["n"]
        assert abs(plain["q"] - salted["q"]) < 1e-6

    def test_two_phase_agg_matches_plain(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        plain = {
            r["o_orderstatus"]: (r["s"], r["c"])
            for r in orders.groupBy("o_orderstatus")
            .agg(F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        }
        two = {
            r["o_orderstatus"]: (r["sum_o_totalprice"], r["count_o_orderkey"])
            for r in two_phase_agg(
                orders, "o_orderstatus",
                {"o_totalprice": "sum", "o_orderkey": "count"},
            ).collect()
        }
        assert plain.keys() == two.keys()
        for k in plain:
            assert abs(plain[k][0] - two[k][0]) < 1e-6
            assert plain[k][1] == two[k][1]

    def test_two_phase_agg_rejects_nondecomposable(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        with pytest.raises(ValueError, match="not decomposable"):
            two_phase_agg(orders, "o_orderstatus", {"o_totalprice": "avg"})

    def test_key_histogram(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        hist = key_histogram(orders, "o_orderstatus", top_n=3).collect()
        assert len(hist) == 3
        assert abs(sum(r["share"] for r in hist) - 1.0) < 0.01
        assert hist[0]["count"] >= hist[-1]["count"]
