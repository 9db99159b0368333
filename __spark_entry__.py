"""Driver contract for the spark-graft builder (PySpark target).

Backed by the `fda_clinical_etl_pipeline_spark` package: every operator
from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable plus —
when SQL-expressible — a DuckDB oracle string. See
fda_clinical_etl_pipeline_spark/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fda_clinical_etl_pipeline_spark.registry import all_queries
from fda_clinical_etl_pipeline_spark.session import configure_runtime

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by nation (SURVEY.md §7.1): scan + filter + broadcast joins +
    hash agg + sort in one plan.
    """
    configure_runtime(spark)
    q = all_queries()["q5_revenue_by_nation"]
    return q.fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_runtime(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
