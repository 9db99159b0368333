from __future__ import annotations

import glob
import os

import pytest

from fda_clinical_etl_pipeline_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


def _derby_jars() -> str:
    """Locate the Derby jars that ship inside pyspark (the Hive-metastore
    dependency). Pinning them onto the driver classpath at session build
    time makes tests/test_jdbc.py's live S8/K8 contract deterministic —
    a conditional skip that only fires under full-suite ordering is how a
    real JDBC regression would hide (r10 verdict task 2)."""
    import pyspark

    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby*.jar")
    )
    return ":".join(sorted(jars))


@pytest.fixture(scope="session")
def spark():
    import tempfile

    spark = get_spark(
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.extraClassPath": _derby_jars(),
            # keep derby.log / db locks inside this process's tmpdir —
            # run_suite.py gives each shard its own TMPDIR, so
            # concurrent shards never share Derby state
            "spark.driver.extraJavaOptions":
                f"-Dderby.system.home={tempfile.gettempdir()}",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001
