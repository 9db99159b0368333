"""Oracle result-type lint — kills the HUGEINT hash-mismatch class.

The driver's value hash is result-type-sensitive at the Arrow level
(int128 vs int64 hash differently even when values are equal), while
tests/test_oracle_parity.py stringifies values and can never see the
width.  CORRECTNESS_r05 failed exactly the three oracles (of 125)
whose DuckDB result carried a HUGEINT column — DuckDB widens integer
SUM to INT128 unless the column is CAST back.

This lint binds (does not execute) every registered oracle in DuckDB
and asserts each result column's type is in the portable set the
driver's Arrow comparison treats identically to Spark's:

    VARCHAR, BIGINT, DOUBLE, BOOLEAN, DATE, INTEGER

Anything wider (HUGEINT), narrower (TINYINT/SMALLINT), or engine-
flavored (DECIMAL, TIMESTAMP) must be CAST on the oracle side —
mirroring the registry parity rules (registry.py module docstring).

The would-fail demo test proves the lint actually catches the class
that shipped red in r5.
"""

from __future__ import annotations

import duckdb
import pytest

from fda_clinical_etl_pipeline_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

ALLOWED = {"VARCHAR", "BIGINT", "DOUBLE", "BOOLEAN", "DATE", "INTEGER"}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_result_types_portable(duck, name):
    rel = duck.sql(QUERIES[name].oracle)  # binds only — no execution
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ) not in ALLOWED
    ]
    assert not bad, (
        f"{name}: oracle emits non-portable result type(s) {bad}; "
        f"CAST them on the oracle side (allowed: {sorted(ALLOWED)})"
    )


def test_lint_catches_hugeint(duck):
    """Would-fail demo: the exact r5 failure shape trips the lint."""
    rel = duck.sql("SELECT SUM(o_custkey) AS s FROM orders")
    assert str(rel.types[0]) == "HUGEINT"  # DuckDB widens integer SUM
    assert str(rel.types[0]) not in ALLOWED
