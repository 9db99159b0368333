"""S8/K8 live contract test: a real JDBC round-trip against the Derby
embedded database that ships inside pyspark's jars (the Hive-metastore
dependency) — no external server needed.

The reference's JDBC surface is psycopg2 against Postgres (etl/db.py:
48-63, per-row INSERT loops); the engine's write_jdbc batches via the
Spark JDBC sink and read_jdbc scans back (optionally partitioned). Derby
exercises the exact same code path (DriverManager → dialect → batched
INSERT / SELECT), so S8/K8 are executed, not just plumbed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fda_clinical_etl_pipeline_spark.sources.readers import read_jdbc
from fda_clinical_etl_pipeline_spark.sources.writers import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_probe(spark) -> str | None:
    """Return None when the Derby embedded driver loads, else the actual
    failure text — so a skip (which should never fire now that
    tests/conftest.py pins the pyspark-bundled Derby jars onto the driver
    classpath) is diagnosable instead of silent."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return None
    except Exception as exc:  # pragma: no cover - requires a broken env
        return f"{type(exc).__name__}: {exc}"


@pytest.fixture()
def derby_url(spark, tmp_path):
    err = _derby_probe(spark)
    if err is not None:  # pragma: no cover - requires a broken env
        pytest.skip(f"Derby embedded driver failed to load: {err}")
    return f"jdbc:derby:{tmp_path}/jdbcdb;create=true"


def test_jdbc_write_read_round_trip(spark, derby_url):
    rows = [
        ("b1", "hospital_a", "COMPLETED", 100),
        ("b2", "hospital_a", "FAILED_VALIDATION", 7),
        ("b3", "clinic_b", "COMPLETED", 55),
    ]
    df = spark.createDataFrame(
        rows, "batch_id string, source_name string, status string, total_rows int"
    )
    write_jdbc(df, derby_url, "provenance_batch", mode="overwrite",
               driver=DERBY_DRIVER)
    out = read_jdbc(spark, derby_url, "provenance_batch", driver=DERBY_DRIVER)
    assert sorted(tuple(r) for r in out.collect()) == sorted(rows)

    # append mode accumulates (the reference's INSERT semantics)
    write_jdbc(df.limit(1), derby_url, "provenance_batch", mode="append",
               driver=DERBY_DRIVER)
    assert read_jdbc(
        spark, derby_url, "provenance_batch", driver=DERBY_DRIVER
    ).count() == 4


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 5).cast("int").alias("grp"),
    )
    write_jdbc(df, derby_url, "wide_table", mode="overwrite",
               driver=DERBY_DRIVER)
    out = read_jdbc(
        spark, derby_url, "wide_table",
        partition_column="id", num_partitions=4,
        lower_bound=0, upper_bound=100, driver=DERBY_DRIVER,
    )
    # the scan is split into real partitions AND loses no rows
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 100
    assert out.agg(F.sum("id")).collect()[0][0] == 4950


def test_jdbc_partitioned_read_requires_bounds(spark):
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:derby:memory:x", "t", partition_column="id")
