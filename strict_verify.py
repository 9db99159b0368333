"""Type-STRICT oracle verification — the local twin of the driver's
Arrow-level hash comparison.

tests/test_oracle_parity.py stringifies values, so it proves value
equality but is blind to result-type width (the exact blind spot that
let three HUGEINT oracles ship red in round 5). This harness compares
at the Arrow layer, like the driver:

- Spark result  -> df.toArrow()   (Spark 4 native Arrow collect)
- DuckDB result -> res.arrow()
- columns sorted by name on both sides;
- schemas must agree after canonical widening only (arrow
  large_string -> string, dictionary decode, timezone-less temporal
  equivalence, decimal/int128 are NOT widened — they must be CAST in
  the oracle);
- values compared after a lossless sort over the stringified row (the
  driver sorts too; strings only break ties — types were already
  checked structurally).

Usage:
    python strict_verify.py [N]    # first N of the rotation (default 50
                                   # = the driver's window), sf0.01
    python strict_verify.py all    # every oracle-gated query
"""

from __future__ import annotations

import sys

import duckdb
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_type(t: pa.DataType) -> pa.DataType:
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_timestamp(t):
        return pa.timestamp("us")
    return t


def _canon_table(tbl: pa.Table) -> pa.Table:
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    fields = [
        pa.field(f.name, _canon_type(f.type)) for f in tbl.schema
    ]
    return tbl.cast(pa.schema(fields))


def _rows_sorted(tbl: pa.Table) -> list[str]:
    pydata = tbl.to_pylist()
    out = []
    for row in pydata:
        cells = []
        for c in tbl.column_names:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 10)
            cells.append(repr(v))
        out.append("\x1f".join(cells))
    return sorted(out)


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        # hostile-tz posture: the driver's session config is not ours
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    from fda_clinical_etl_pipeline_spark.registry import all_queries

    qs = all_queries()  # rotation order: stalest first
    names = [n for n, q in qs.items() if q.oracle is not None]
    if arg != "all":
        if arg.isdigit():
            names = names[: int(arg)]
        else:  # explicit query names
            unknown = [a for a in sys.argv[1:] if a not in qs]
            if unknown:
                print(f"unknown queries: {unknown}")
                return 2
            names = [a for a in sys.argv[1:]
                     if qs[a].oracle is not None]

    failures = []
    for name in names:
        q = qs[name]
        try:
            s_tbl = _canon_table(q.fn(spark, SF_DIR).toArrow())
            d_tbl = _canon_table(con.execute(q.oracle).arrow())
            if s_tbl.schema != d_tbl.schema:
                failures.append((name, "SCHEMA",
                                 f"{s_tbl.schema} != {d_tbl.schema}"))
                print(f"{name}: TYPE-MISMATCH")
                continue
            if _rows_sorted(s_tbl) != _rows_sorted(d_tbl):
                failures.append((name, "VALUES", ""))
                print(f"{name}: VALUE-MISMATCH")
                continue
            print(f"{name}: STRICT-MATCH")
        except Exception as exc:  # noqa: BLE001
            failures.append((name, "ERROR", str(exc)[:200]))
            print(f"{name}: ERROR {str(exc)[:120]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} strict-match")
    for name, kind, detail in failures:
        print(f"FAIL {name} [{kind}] {detail}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
