"""Semi-structured VARIANT pipeline: JSON ingest → open-type VARIANT
column → schema inference → shredding into typed, stats-bearing
columns.

VARIANT is the Spark 4 / Delta / Iceberg-v3 answer to schemaless
ingestion at scale: a binary-encoded open type that keeps every field
of every record (no lossy schema-on-write), decodes fields ~8-10×
faster than string JSON re-parsing, and — once hot paths are SHREDDED
into typed top-level columns — gets parquet min/max stats and
predicate pushdown on exactly the fields queries filter on. The
reference parses JSONL with a fixed column list and drops everything
else (etl/validate.py:134-176); the VARIANT path is the superset:
nothing is dropped, the declared columns become shredded paths, and
the long tail stays queryable.

Every transform here is a JVM expression (``try_parse_json``,
``variant_get``, ``schema_of_variant_agg``) — no Python UDF, whole
row-batches stay columnar, and the schema inference is ONE aggregate
whose driver result is a single schema string, O(1) in rows.

Storage: the Delta twin stores variant columns under the spec's
``variantType`` reader+writer table feature (enabled at create, or
via the protocol-upgrade path when schema evolution introduces the
first variant column), and the Iceberg twin stores them as the V3
``variant`` type (format-version auto-bumps, like the first DV
write) — see ``tests/test_variant_lakehouse.py``. The custom Python
DataSource STREAMS refuse variant tables up front (their pyarrow
partition readers cannot parse the variant logical type —
``sources/_pyarrow_compat.py``); stream shredded columns instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "json_to_variant",
    "variant_schema",
    "shred_variant",
    "variant_quarantine_split",
]


def json_to_variant(
    df: DataFrame, json_col: str, out_col: str = "v",
    keep_raw: bool = False,
) -> DataFrame:
    """Parse a JSON-string column into a VARIANT column.

    Malformed documents become NULL variants (``try_parse_json``)
    rather than failing the job — split them out with
    ``variant_quarantine_split`` (the reference's corrupt-capture
    semantics, readers.py:88, lifted to the open type). A JSON
    ``null`` document parses to a VALID variant holding null
    (``is_variant_null``), distinct from a parse failure."""
    out = df.withColumn(out_col, F.try_parse_json(F.col(json_col)))
    if not keep_raw:
        out = out.drop(json_col) if json_col != out_col else out
    return out


def variant_quarantine_split(
    df: DataFrame, v_col: str = "v", raw_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(parsed, corrupt): a row is corrupt iff its variant is SQL
    NULL while the raw text was not — ``try_parse_json`` maps only
    parse failures to SQL NULL (JSON ``null`` yields a non-null
    variant whose value is the variant null)."""
    bad = F.col(v_col).isNull()
    if raw_col is not None:
        bad = bad & F.col(raw_col).isNotNull()
    return df.filter(~bad), df.filter(bad)


def variant_schema(df: DataFrame, v_col: str = "v") -> str:
    """The merged schema of every variant in the column, as ONE
    JVM-side aggregate (``schema_of_variant_agg``) — the driver
    receives a single DDL string however many rows the corpus has.
    This is the shred-planning input: its top-level fields are the
    candidate hot paths."""
    row = df.select(
        F.schema_of_variant_agg(F.col(v_col)).alias("s")
    ).collect()
    return row[0]["s"] if row else "VOID"


def shred_variant(
    df: DataFrame,
    paths: dict[str, tuple[str, str]],
    v_col: str = "v",
    residual: bool = True,
) -> DataFrame:
    """Shred hot paths into typed top-level columns: ``paths`` maps
    output column name -> (variant path like ``$.a.b``, Spark type
    DDL). Extraction is lenient (``try_variant_get``): a document
    missing the path, or holding an uncastable value, yields NULL in
    the shredded column — document-level heterogeneity must not
    poison the batch (the Delta/Iceberg shredding spec's optional-
    field semantics).

    Shredded columns are ordinary typed columns: written to parquet
    they carry min/max stats and take predicate pushdown — the whole
    point of shredding. ``residual=True`` keeps the full variant
    alongside (as the specs do) so the un-shredded long tail stays
    queryable; drop it for the lean canonical projection."""
    cols = list(df.columns)
    out = df
    for name, (path, ddl) in paths.items():
        out = out.withColumn(
            name, F.try_variant_get(F.col(v_col), path, ddl)
        )
    if not residual:
        out = out.drop(v_col)
        cols.remove(v_col)
    return out.select(
        *[c for c in cols], *[n for n in paths if n not in cols]
    )


# ------------------------------------------------------ oracle gate
from pyspark.sql import SparkSession  # noqa: E402

from ..registry import register  # noqa: E402
from ..cache import persist_tracked
from ._util import read_table  # noqa: E402

_VARIANT_ORACLE = """
    SELECT * FROM (
      SELECT o_orderstatus AS status,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(o_totalprice), 2) AS sum_price,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
      FROM orders
      GROUP BY o_orderstatus
      UNION ALL
      SELECT 'JSON_NULL_DOC', 1, NULL, 0
      UNION ALL
      SELECT '__corrupt__', 3, NULL, 0
    ) AS u ORDER BY status
"""


@register(
    "variant_shred_rollup",
    _VARIANT_ORACLE,
    doc="Semi-structured VARIANT round-trip: orders rows serialize to "
        "JSON documents (two nesting levels), parse into a VARIANT "
        "column (try_parse_json), shred back into typed columns "
        "(try_variant_get) and roll up — DuckDB computes the same "
        "rollup from the raw columns, so any loss or type drift in "
        "the encode/parse/shred path flips the hash. Three malformed "
        "documents must land in the corrupt split (not fail the job, "
        "not count as data), and one JSON `null` document must parse "
        "as a VALID variant that shreds to NULLs — the "
        "parse-failure/JSON-null distinction is part of the gate.",
)
def variant_shred_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    # the try_parse_json materialization is the gate's dominant CPU
    # and inherits the scan's parallelism — spread the rows first when
    # the scan under-parallelizes (single-row-group file => one task;
    # measured 0.69 -> 0.40 s for the parse at sf0.1); a properly
    # split production scan skips the exchange
    par = spark.sparkContext.defaultParallelism
    if o.rdd.getNumPartitions() < par:
        o = o.repartition(par, "o_orderkey")
    docs = o.select(
        F.to_json(F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
            F.struct(
                F.col("o_custkey").alias("cust"),
                F.col("o_orderpriority").alias("prio"),
            ).alias("nested"),
        )).alias("j")
    )
    garbage = spark.createDataFrame(
        [("{not json",), ("[1, 2",), ("{\"k\": }",), ("null",)],
        "j string",
    )
    # persist the parsed variants: the quarantine split's two branches
    # (parsed rollup, corrupt count) otherwise each re-run
    # try_parse_json over the whole corpus inside the one union plan —
    # the parse is the dominant cost of the gate (guide §5 reuse rule).
    vdf = persist_tracked(
        json_to_variant(docs.unionByName(garbage), "j")
    )
    parsed, corrupt = variant_quarantine_split(vdf, "v")
    shredded = shred_variant(parsed, {
        "k": ("$.k", "long"),
        "price": ("$.price", "double"),
        "status": ("$.status", "string"),
        "cust": ("$.nested.cust", "long"),
    }, residual=False)
    data_rollup = (
        shredded
        # the JSON `null` document: a valid variant, all paths NULL —
        # distinguish it from data via the key column
        .withColumn(
            "status",
            F.when(F.col("k").isNull(), F.lit("JSON_NULL_DOC"))
            .otherwise(F.col("status")),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("price"), 2).alias("sum_price"),
            F.count_distinct("cust").cast("long").alias("n_cust"),
        )
    )
    corrupt_row = corrupt.agg(
        F.lit("__corrupt__").alias("status"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.lit(None).cast("double").alias("sum_price"),
        F.lit(0).cast("long").alias("n_cust"),
    )
    return data_rollup.unionByName(corrupt_row).orderBy("status")
