"""User-extension surface (SURVEY.md §2.11).

The reference has no code-level UDF API — its pluggable surfaces are
data-driven (PHI rule rows, control tables). The engine keeps every
reference semantic in native expressions, and exposes this thin,
deliberately opinionated extension surface for users who need more:

- ``scalar_pandas_udf``  — Arrow-batched vectorized UDF (the ONLY
  sanctioned Python hot path; ~10-100× over row-at-a-time).
- ``grouped_transform``  — applyInPandas per-group transforms.
- ``batch_transform``    — mapInPandas whole-batch transforms (the
  multimodal decode path uses this).
- ``register_sql_function`` — name a pandas UDF for spark.sql use.

Row-at-a-time ``F.udf`` is intentionally NOT wrapped: at 100 TB it is a
per-row Python round-trip; if you reach for it, first check whether a
built-in or higher-order function expresses the logic (it almost always
does — see functions/hl7.py for HL7 parsing without a single UDF).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def scalar_pandas_udf(return_type: T.DataType | str):
    """Decorator: vectorized scalar UDF over Arrow batches.

    >>> @scalar_pandas_udf("double")
    ... def centi(v: pd.Series) -> pd.Series:
    ...     return v / 100.0
    """
    return pandas_udf(return_type)


def grouped_transform(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable,
    schema: T.StructType | str,
) -> DataFrame:
    """applyInPandas: fn(pandas.DataFrame) -> pandas.DataFrame per group.
    The group's rows are materialized in one executor — bound group sizes
    (salt or pre-aggregate) before using this at scale."""
    return df.groupBy(*group_cols).applyInPandas(fn, schema)


def batch_transform(
    df: DataFrame,
    fn: Callable[[Iterator], Iterator],
    schema: T.StructType | str,
) -> DataFrame:
    """mapInPandas: fn(iter of pandas.DataFrame) -> iter of
    pandas.DataFrame. Batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    return df.mapInPandas(fn, schema)


def register_sql_function(
    spark: SparkSession, name: str, fn, return_type: T.DataType | str
) -> None:
    """Expose a vectorized UDF to spark.sql queries by name."""
    spark.udf.register(name, pandas_udf(fn, return_type))
