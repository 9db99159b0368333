"""SparkSession factory.

The reference builds one Spark session only for its Hudi step
(`hudi/spark_session.py:3-12`: Kryo serializer, explicit jar). Our engine is
Spark end-to-end, so the session factory is the root of everything and bakes
in the configuration that matters at 100 TB:

- UTC session timezone (the reference stamps everything with ``utcnow()``,
  `etl/ingest.py:48`) so timestamp semantics are deployment-independent.
- AQE on: runtime join-strategy switches, partition coalescing and skew-join
  splitting — the knobs that keep a 1000-executor plan healthy without
  hand-tuning per query.
- Arrow for the few Pandas-UDF paths (multimodal decode), so Python
  boundaries are columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "fda-clinical-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[N]`` with N = SPARK_GRAFT_CPUS (default 32).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    builder = builder.master(master)

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        # 100 TB posture: don't let tiny metadata tables force sort-merge
        # joins; AQE still demotes broadcasts that turn out too large.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Keep ANSI on (Spark 4 default); the engine uses try_* functions
        # for the reference's lenient parse-or-null semantics.
        "spark.sql.ansi.enabled": "true",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


_PYFILE_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor workers regardless of the
    driver process's PYTHONPATH (workers spawn with their own sys.path;
    pickled closures that reference package modules need the import to
    succeed there). Zips the package once per session and addPyFile's it.
    """
    key = id(spark.sparkContext)
    if key in _PYFILE_SHIPPED:
        return
    try:
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        pkg_name = os.path.basename(pkg_dir)
        # unique path per process: a cached zip from an older code version
        # must never shadow current sources on the executors
        zip_path = os.path.join(
            tempfile.gettempdir(), f"{pkg_name}-pyfiles-{os.getpid()}.zip"
        )
        if not os.path.exists(zip_path):
            with zipfile.ZipFile(zip_path, "w") as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            rel = os.path.join(
                                pkg_name, os.path.relpath(full, pkg_dir)
                            )
                            zf.write(full, rel)
        spark.sparkContext.addPyFile(zip_path)
        _PYFILE_SHIPPED.add(key)
    except Exception:
        pass  # best effort; self-contained closures are the primary defense


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable config to an externally created
    session (e.g. the driver's). Only touches conf that is mutable at
    runtime; static conf (serializer, memory) is left alone."""
    _ship_package(spark)
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        # Runtime-settable shuffle sizing: an externally created session
        # (the driver's) defaults to 200 partitions — far too many for the
        # test scales and harmlessly coalesced by AQE at real scale.
        "spark.sql.shuffle.partitions": str(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        ),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment; semantics degrade gracefully
    return spark
