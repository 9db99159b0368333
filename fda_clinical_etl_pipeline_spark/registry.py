"""Query registry — the single source of truth behind __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an ANSI-SQL oracle string DuckDB can run over the same
parquet tables. The driver hash-compares the two at sf=0.01; tests/
test_oracle_parity.py runs the identical comparison locally at sf=0.001.

Rules for parity (SURVEY.md §7.4 #6):
- alias every computed column identically on both sides;
- round floating aggregates (both sides) so summation order can't flip
  the hash;
- keep timestamps out of results — project dates or strings;
- make every top-k / per-key-latest deterministic with explicit tiebreaks.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, doc)
        return fn

    return wrap


def all_queries() -> dict[str, RegisteredQuery]:
    # Import registers as a side effect; keep imports here so a broken
    # optional module can't take down the whole entry point.
    from .operators import advanced  # noqa: F401
    from .operators import corpus  # noqa: F401
    from .operators import relational  # noqa: F401
    from .operators import windows  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import llmprep  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import skew  # noqa: F401
    from .operators import text  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .plans import clinical_queries  # noqa: F401

    return dict(_REGISTRY)
