"""Control-table job-config layer: scheduling, ordered execution,
status machine, and failure isolation (SURVEY.md §2.11 surface #2 —
the reference's dormant DSL, working here)."""

from __future__ import annotations

import pytest

from fda_clinical_etl_pipeline_spark.catalog import Catalog
from fda_clinical_etl_pipeline_spark.pipeline import ClinicalPipeline, Zones
from fda_clinical_etl_pipeline_spark.plans.control import (
    ControlStore,
    run_pending_controls,
)

CSV_GOOD = """patient_id,patient_name,ssn,dob,visit_date,diagnosis,notes
P10001,John Smith,111-22-3333,1979-04-12,2025-02-03,Flu,"Patient called 555-214-7788, email john.smith@host.org"
P10002,Mary Jones,999-88-7777,1985-12-01,2025-02-04,Cold,"Follow-up at 44 Oak Ave"
"""


@pytest.fixture()
def pipeline(spark, tmp_path):
    return ClinicalPipeline(spark, Zones(str(tmp_path / "lake")), Catalog())


@pytest.fixture()
def store(spark, tmp_path):
    return ControlStore(spark, str(tmp_path / "control"))


def _csv(tmp_path, name):
    p = tmp_path / name
    p.write_text(CSV_GOOD)
    return str(p)


def test_schedule_pending_order_and_steps(spark, store, tmp_path):
    c2 = store.schedule(
        "hospital_a",
        [("run_batch", {"file_path": "later.csv"})],
        scheduled_time=200.0,
    )
    c1 = store.schedule(
        "hospital_a",
        [
            ("run_batch", {"file_path": "a.csv"}),
            ("resume_pending", {}),
        ],
        scheduled_time=100.0,
    )
    pend = store.pending()
    assert [r["control_id"] for r in pend] == [c1, c2]  # scheduled order
    steps = store.steps(c1)
    assert [(s["step_order"], s["step_type"]) for s in steps] == [
        (1, "run_batch"),
        (2, "resume_pending"),
    ]


def test_run_pending_executes_and_completes(
    spark, store, pipeline, tmp_path
):
    f = _csv(tmp_path, "2025-02-03_clinical.csv")
    cid = store.schedule(
        "hospital_a", [("run_batch", {"file_path": f})]
    )
    results = run_pending_controls(store, pipeline)
    assert store.status_of(cid) == "COMPLETED"
    (step,) = results[cid]
    assert step.step_type == "run_batch"
    assert step.result["status"] == "COMPLETED"
    assert step.result["rows"] == 2
    # re-running is a no-op: nothing pending anymore
    assert run_pending_controls(store, pipeline) == {}


def test_failed_step_fails_control_but_not_others(
    spark, store, pipeline, tmp_path
):
    good = _csv(tmp_path, "2025-02-04_clinical.csv")
    bad_cid = store.schedule(
        "hospital_a",
        [("run_batch", {"file_path": str(tmp_path / "missing.csv")})],
        scheduled_time=1.0,
    )
    good_cid = store.schedule(
        "hospital_a",
        [("run_batch", {"file_path": good})],
        scheduled_time=2.0,
    )
    run_pending_controls(store, pipeline)
    assert store.status_of(bad_cid) == "FAILED"
    assert store.status_of(good_cid) == "COMPLETED"


def test_unknown_step_type_fails_cleanly(spark, store, pipeline):
    cid = store.schedule("hospital_a", [("no_such_step", {})])
    run_pending_controls(store, pipeline)
    assert store.status_of(cid) == "FAILED"
