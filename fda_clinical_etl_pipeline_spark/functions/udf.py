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


# --- Python UDTFs (Spark 4 table functions) ---------------------------------
#
# The tabular escape hatch: one input row -> many output rows with a
# declared schema, usable from DataFrames and LATERAL SQL. Same plan
# discipline as scalar UDFs — row-at-a-time Python, so NOT for corpus
# hot paths (no registered query uses one; explode/posexplode +
# higher-order functions cover those natively). Where they earn their
# keep: low-volume control-plane expansion (schema registries, rule
# tables, per-source config fan-out) where the convenience of arbitrary
# Python beats writing a mapInPandas harness.


def make_regex_extract_udtf():
    """UDTF ``(text, pattern) -> (match string, pos int)`` — one row per
    regex match. Built lazily (the decorator needs an active session).

    >>> ExtractAll = make_regex_extract_udtf()
    >>> ExtractAll(F.lit("a1 b22"), F.lit(r"[a-z]\\d+")).show()
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="match: string, pos: int")
    class RegexExtractAll:
        def eval(self, text: str, pattern: str):
            import re

            for i, m in enumerate(re.finditer(pattern or "", text or "")):
                yield (m.group(0), i)

    return RegexExtractAll


def make_split_fields_udtf():
    """UDTF with a DYNAMIC schema via the ``analyze`` static method —
    the Spark 4 API where output columns derive from a constant
    argument at plan time: ``SplitFields(line, lit('a|b|c'))`` returns
    columns (a, b, c). The pattern for config-driven projections where
    the column set lives in a control table, resolved per call site
    without code changes."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFields:
        @staticmethod
        def analyze(
            line: AnalyzeArgument, header: AnalyzeArgument
        ) -> AnalyzeResult:
            if not header.isConstantExpression or not header.value:
                raise ValueError(
                    "SplitFields needs a constant header argument"
                )
            schema = StructType()
            for name in str(header.value).split("|"):
                schema = schema.add(name, StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, line: str, header: str):
            n = len((header or "").split("|"))
            parts = (line or "").split("|")
            yield tuple((parts + [None] * n)[:n])

    return SplitFields


def register_udtf(spark: SparkSession, name: str, udtf_cls) -> None:
    """Expose a UDTF to SQL: ``SELECT t.* FROM my_udtf(...) t`` (also
    composable via LATERAL joins against real tables)."""
    spark.udtf.register(name, udtf_cls)
