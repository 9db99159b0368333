"""Readers — the engine's scan operators (SURVEY.md §2.1, S1–S9).

Design: every source becomes a DataFrame with a declarative schema so
Catalyst gets pushdown/pruning for free. The reference reads row-at-a-time
(`csv.DictReader` at etl/validate.py:98-99, `json.loads` per line at
etl/validate.py:134-146, whole-file HL7 split at etl/validate.py:179-197);
here each of those is a distributed scan:

- CSV  (S3): header + all-string schema, matching the reference's
  "in-flight data is all strings" rule (etl/transform.py:171 dtype=str).
- JSONL (S4): PERMISSIVE mode with ``_corrupt_record`` — the distributed
  equivalent of the reference's per-line invalid-JSON capture
  (etl/validate.py:141-146), kept as a column so scrub can pass corrupt
  lines through verbatim (etl/scrub_phi.py:155-160).
- HL7 v2 (S5): one row per message via ``lineSep="\\n\\n"``, segments as an
  array column — no UDF; parsing is split/filter/element_at expressions
  (functions/hl7.py).
- Parquet (S6), binary (K1's scale path), and a generic multi-table loader
  for the driver testdata.

At 100 TB these scans are the bottleneck if done wrong: always pass a
schema (no inference pass over the data), never collect, and let
partitioning come from file splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet star schema and (optionally)
    register each table as a temp view for Spark SQL queries."""
    from ..operators._util import read_table

    out: dict[str, DataFrame] = {}
    for name in tables:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def all_string_schema(columns: list[str]) -> T.StructType:
    """The reference's type system: everything is a nullable string
    (SURVEY.md §1.2); declared types live in metadata and are applied
    lazily with try_cast/to_date."""
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def read_csv_strings(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """S3 — CSV scan with header, typed-as-string (etl/validate.py:98-99).

    With ``columns`` given, the schema is fixed (no inference job); without,
    a single header-sniff pass infers names only, types stay string.
    """
    reader = spark.read.option("header", True)
    if columns is not None:
        reader = reader.schema(all_string_schema(columns))
    else:
        reader = reader.option("inferSchema", False)  # names only, all strings
    return reader.csv(path).withColumn("_input_file", F.input_file_name())


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S4 — JSONL scan, one object per line, corrupt lines captured.

    Mirrors etl/validate.py:134-146: blank lines are skipped by the source,
    invalid JSON lands in ``_corrupt_record`` instead of failing the job.
    """
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        if "_corrupt_record" not in schema.fieldNames():
            schema = schema.add("_corrupt_record", T.StringType(), True)
        reader = reader.schema(schema)
    return reader.json(path).withColumn("_input_file", F.input_file_name())


def read_hl7(spark: SparkSession, path: str) -> DataFrame:
    """S5 — HL7 v2 scan: one row per message (blank-line separated), with a
    ``segments`` array column (etl/validate.py:179-197 semantics).

    Columns: message (raw text), segments (array<string>), _input_file.
    """
    df = spark.read.text(path, lineSep="\n\n")
    return (
        df.withColumnRenamed("value", "message")
        .filter(F.trim(F.col("message")) != "")
        .withColumn(
            "segments",
            F.filter(
                F.split(F.col("message"), "\n"),
                lambda s: F.trim(s) != "",
            ),
        )
        .withColumn("_input_file", F.input_file_name())
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S6 — parquet scan (hudi/register_hudi.py:51 equivalent)."""
    return spark.read.parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S8 — JDBC scan (the reference's psycopg2 metadata fetches,
    etl/db.py:48-63). Executed live against the Derby embedded DB bundled
    with pyspark (tests/test_jdbc.py); the partitioned-read plumbing is
    the part that matters at scale: without partition_column the whole
    table funnels through one task."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """K1 scale path — byte-exact file contents as a DataFrame
    (path, modificationTime, length, content:binary). This is how RAW-zone
    integrity hashing (etl/ingest.py:18-25) distributes: sha2 over
    ``content`` instead of a driver-side 8KB-chunk loop.

    Caveat (observed): the binaryFile source silently SKIPS zero-length
    files — an ingest that must account for every file (the reference
    registers a batch per file regardless) needs a driver-side listing
    reconciliation for empties."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — Spark-native columnar alternative to parquet (same
    pushdown/pruning machinery; no extra jars). Useful when upstream
    lakes standardized on ORC (Hive-era estates)."""
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan. Prefers the spark-avro datasource when its jar is on
    the classpath (vectorized, the right engine for a heavy Avro
    ingest); otherwise falls back to the built-in spec-conformant OCF
    decoder (``sources.avro_ocf`` — binaryFile + mapInPandas, one
    decode task per file, cross-validated against the JVM Avro
    library), so Avro reads work in this container too."""
    try:
        return spark.read.format("avro").load(path)
    except Exception:
        from .avro_ocf import read_avro_ocf

        return read_avro_ocf(spark, path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML scan via Spark 4's native xml source (spark-xml merged into
    core) — the CDA/CCD-style clinical-document ingest the reference's
    HL7 path would grow into. One row per ``row_tag`` element; malformed
    elements land in ``_corrupt_record`` (PERMISSIVE) instead of failing
    the job, the same quarantine contract as read_jsonl."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if schema is not None:
        if "_corrupt_record" not in schema.fieldNames():
            schema = schema.add("_corrupt_record", T.StringType(), True)
        reader = reader.schema(schema)
    return reader.load(path).withColumn("_input_file", F.input_file_name())
