"""Local twin of the driver's t2 correctness gate: run every registered
query through Spark AND its DuckDB oracle at sf0.001, compare row count,
column names, and an order-insensitive value hash.

If this passes here, the driver's sf0.01 comparison should pass too
(same comparison semantics, bigger data).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from fda_clinical_etl_pipeline_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and representation jitter below round-trip precision
        if v == 0:
            return "0.0"
        return repr(round(v, 10))
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "NULL"
    return str(v)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return out


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
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_canon = _canon(spark_rows, spark_cols)
    d_canon = _canon(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_no_rows_only_queries_remain():
    """Every registered query is oracle-gated (162/162 since r10). If
    this ever regresses, re-grow the rows-only runner this test
    replaced (parametrize over ROWS_ONLY, run each at SF_DIR, assert
    rows >= 0) — a weaker gate is better than none, but the bar is an
    oracle for every new query."""
    assert ROWS_ONLY == [], (
        f"queries without oracles crept back in: {ROWS_ONLY}"
    )
