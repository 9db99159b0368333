"""Clinical-pipeline operators expressed over the driver testdata so they
enter the DuckDB-oracle correctness gate (the driver can only hash-compare
queries on its own parquet tables, TESTDATA.md).

Each query synthesizes the reference's input shape deterministically from
testdata rows, then applies the REAL engine expression (the same
``redact_expr`` / HL7 parser the pipeline modules use) — so the gate
checks the production plan, not a test double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scrub import DEFAULT_PHI_RULES, redact_expr
from ..operators._util import tables
from ..registry import register


def _oracle_redact_chain(col_sql: str) -> str:
    """Build the DuckDB equivalent of redact_expr: nested regexp_replace
    in rule_id order, global + case-insensitive flags."""
    expr = col_sql
    for rule in sorted(DEFAULT_PHI_RULES, key=lambda r: r.rule_id):
        # DuckDB single-quoted literals keep backslashes verbatim; only
        # single quotes need doubling.
        pattern = "(?i)" + rule.pattern.replace("'", "''")
        expr = f"REGEXP_REPLACE({expr}, '{pattern}', '{rule.replacement}', 'g')"
    return expr


_NOTE_SQL = (
    "concat('Patient ', c_name, ' (SSN ', lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0'), "
    "'-', lpad(CAST(c_custkey % 90 + 10 AS VARCHAR), 2, '0'), '-', "
    "lpad(CAST(c_custkey % 9000 + 1000 AS VARCHAR), 4, '0'), ') visited 1996-04-15.', "
    "' Call 555-', lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0'), '-7788 ', "
    "'or mail c', CAST(c_custkey AS VARCHAR), '@clinic.org soon.')"
)


def _note_expr() -> F.Column:
    k = F.col("c_custkey")
    pad3 = F.lpad((k % 900 + 100).cast("string"), 3, "0")
    pad2 = F.lpad((k % 90 + 10).cast("string"), 2, "0")
    pad4 = F.lpad((k % 9000 + 1000).cast("string"), 4, "0")
    return F.concat(
        F.lit("Patient "), F.col("c_name"),
        F.lit(" (SSN "), pad3, F.lit("-"), pad2, F.lit("-"), pad4,
        F.lit(") visited 1996-04-15."),
        F.lit(" Call 555-"), pad3, F.lit("-7788 "),
        F.lit("or mail c"), k.cast("string"), F.lit("@clinic.org soon."),
    )


@register(
    "phi_scrub_chain",
    f"""
    WITH notes AS (
      SELECT c_custkey AS patient_key, {_NOTE_SQL} AS note_text
      FROM customer
    )
    SELECT patient_key, note_text,
           {_oracle_redact_chain("note_text")} AS scrubbed
    FROM notes
    """,
    doc="F1–F4/J5 + quirk #3: the ordered, case-insensitive PHI regex "
        "chain (db/init.sql:163-171) folded into ONE nested regexp_replace "
        "expression — rule N sees rule N-1's output, greedy address rule "
        "first. Zero Python per row.",
)
def phi_scrub_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = tables(spark, sf_dir, "customer")
    notes = customer.select(
        F.col("c_custkey").alias("patient_key"),
        _note_expr().alias("note_text"),
    )
    return notes.select(
        "patient_key",
        "note_text",
        redact_expr("note_text").alias("scrubbed"),
    )


_HL7_MSG_SQL = (
    "concat('MSH|^~\\&|HOSPITAL_C|LAB|QLM_SYS|DEST|20250201000137||ORU^R01|MSG', "
    "CAST(o_orderkey AS VARCHAR), '|P|2.3', chr(10), "
    "'PID|1||', CAST(o_orderkey AS VARCHAR), '||PAT_', CAST(o_custkey AS VARCHAR), "
    "'||19770318|M|||', CAST(o_orderkey % 999 AS VARCHAR), ' Evergreen Terrace||||', "
    "CASE WHEN o_orderkey % 3 = 0 THEN '' ELSE concat('414-52-', lpad(CAST(o_orderkey % 9000 + 1000 AS VARCHAR), 4, '0')) END, "
    "'||', CASE WHEN o_orderkey % 3 = 0 THEN concat('515-62-', lpad(CAST(o_orderkey % 9000 + 1000 AS VARCHAR), 4, '0')) ELSE '' END, "
    "'|', chr(10), "
    "'OBR|1||', CAST(o_orderkey AS VARCHAR), '|TEST^TESTNAME', chr(10), "
    "'OBX|1|ST|RESULT||', CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), '|units||N')"
)


def _hl7_msg_expr() -> F.Column:
    k = F.col("o_orderkey")
    nl = F.lit("\n")
    ssn15 = F.when(k % 3 == 0, F.lit("")).otherwise(
        F.concat(F.lit("414-52-"), F.lpad((k % 9000 + 1000).cast("string"), 4, "0"))
    )
    ssn17 = F.when(k % 3 == 0,
                   F.concat(F.lit("515-62-"), F.lpad((k % 9000 + 1000).cast("string"), 4, "0"))
                   ).otherwise(F.lit(""))
    return F.concat(
        F.lit("MSH|^~\\&|HOSPITAL_C|LAB|QLM_SYS|DEST|20250201000137||ORU^R01|MSG"),
        k.cast("string"), F.lit("|P|2.3"), nl,
        F.lit("PID|1||"), k.cast("string"),
        F.lit("||PAT_"), F.col("o_custkey").cast("string"),
        F.lit("||19770318|M|||"),
        (k % 999).cast("string"), F.lit(" Evergreen Terrace||||"),
        ssn15, F.lit("||"), ssn17, F.lit("|"), nl,
        F.lit("OBR|1||"), k.cast("string"), F.lit("|TEST^TESTNAME"), nl,
        F.lit("OBX|1|ST|RESULT||"),
        F.floor("o_totalprice").cast("string"),
        F.lit("|units||N"),
    )


@register(
    "hl7_parse_extract",
    f"""
    WITH msgs AS (
      SELECT o_orderkey, {_HL7_MSG_SQL} AS message FROM orders
    ),
    seg AS (
      SELECT o_orderkey, message,
             LIST_FILTER(STRING_SPLIT(message, chr(10)), s -> s LIKE 'PID|%')[1] AS pid
      FROM msgs
    )
    SELECT o_orderkey,
           SPLIT_PART(pid, '|', 4)  AS patient_id,
           SPLIT_PART(pid, '|', 6)  AS patient_name,
           SPLIT_PART(pid, '|', 8)  AS dob,
           SPLIT_PART(pid, '|', 12) AS address,
           COALESCE(NULLIF(SPLIT_PART(pid, '|', 17), ''),
                    NULLIF(SPLIT_PART(pid, '|', 18), ''),
                    NULLIF(SPLIT_PART(pid, '|', 20), '')) AS ssn,
           ARRAY_TO_STRING(LIST_FILTER(STRING_SPLIT(message, chr(10)),
                                       s -> s LIKE 'OBX|%'), ' ') AS note_text
    FROM seg
    """,
    doc="S5/P3/P13/F13: native HL7 v2 positional parse — segments array → "
        "PID-n via split/element_at, OBX concat, SSN as true coalesce with "
        "''→NULL (fixes quirk #2's dead fillna chain). Message synthesized "
        "per order row; parser is the engine's real functions/hl7.py.",
)
def hl7_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hl7 import hl7_ssn, obx_note_text, pid_field

    (orders,) = tables(spark, sf_dir, "orders")
    msgs = orders.select(
        "o_orderkey", _hl7_msg_expr().alias("message")
    ).withColumn(
        "segments", F.filter(F.split("message", "\n"), lambda s: F.trim(s) != "")
    )
    seg = F.col("segments")
    return msgs.select(
        "o_orderkey",
        pid_field(seg, 3).alias("patient_id"),
        pid_field(seg, 5).alias("patient_name"),
        pid_field(seg, 7).alias("dob"),
        pid_field(seg, 11).alias("address"),
        hl7_ssn(seg).alias("ssn"),
        obx_note_text(seg).alias("note_text"),
    )


def _staged_hits_oracle() -> str:
    """DuckDB oracle for sequential rule-hit counting: stage N counts its
    pattern on stage N-1's output (subn semantics), exactly like
    rule_hits_expr."""
    rules = sorted(DEFAULT_PHI_RULES, key=lambda r: r.rule_id)
    ctes = [f"s0 AS (SELECT c_custkey, {_NOTE_SQL} AS t FROM customer)"]
    hit_cols = []
    for i, rule in enumerate(rules):
        pat = "(?i)" + rule.pattern.replace("'", "''")
        ctes.append(
            f"s{i + 1} AS (SELECT c_custkey, "
            f"LENGTH(regexp_extract_all(t, '{pat}')) AS hits_{i}, "
            f"REGEXP_REPLACE(t, '{pat}', '{rule.replacement}', 'g') AS t, "
            + ", ".join(f"hits_{j}" for j in range(i))
            + (", " if i else "")
            + f"FROM s{i})".replace(", FROM", " FROM")
        )
        hit_cols.append((rule.rule_id, f"hits_{i}"))
    selects = ",\n".join(
        f"       CAST(SUM({col}) AS BIGINT) AS \"{rid}\""
        for rid, col in hit_cols
    )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT\n{selects}\nFROM s{len(rules)}"
    )


@register(
    "phi_rule_hits",
    _staged_hits_oracle(),
    doc="A2/A3: replacement-counter + rules-applied attribution "
        "(etl/scrub_phi.py:81-132) as ONE aggregate pass — per-rule hit "
        "counts measured sequentially (rule N sees rule N-1's output, "
        "subn() accounting), totals across the batch.",
)
def phi_rule_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scrub import rule_hits_expr

    (customer,) = tables(spark, sf_dir, "customer")
    notes = customer.select(_note_expr().alias("note_text"))
    # rule_hits_expr's array positions are fixed (sorted rule_id), so the
    # per-rule totals are one flat global aggregate — no explode, no
    # pivot, a single partial+final agg with 8 bytes per rule shuffled.
    hits = notes.select(rule_hits_expr("note_text").alias("rh"))
    ordered = sorted(DEFAULT_PHI_RULES, key=lambda x: x.rule_id)
    return hits.agg(
        *[
            F.sum(F.col("rh")[i]["hits"]).cast("long").alias(r.rule_id)
            for i, r in enumerate(ordered)
        ]
    )


@register(
    "catalog_active_sources",
    """
    WITH source_registry(source_name, source_type, active) AS (
      VALUES ('hospital_a', 'csv', TRUE), ('clinic_b', 'jsonl', TRUE),
             ('hospital_c_hl7', 'hl7', TRUE), ('legacy_feed', 'csv', FALSE)
    )
    SELECT source_name, source_type FROM source_registry WHERE active
    """,
    doc="S1/P14: the source-registry scan with active-flag filter "
        "(etl/ingest.py:27-43) — metadata as a DataFrame, broadcast-size.",
)
def catalog_active_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL VALUES → LocalTableScan (createDataFrame local data is an
    # RDD-backed plan: one pickled-row job per action, ~0.3 s floor)
    registry = spark.sql(
        "SELECT * FROM VALUES "
        "('hospital_a', 'csv', true), ('clinic_b', 'jsonl', true), "
        "('hospital_c_hl7', 'hl7', true), ('legacy_feed', 'csv', false) "
        "AS source_registry(source_name, source_type, active)"
    )
    return registry.filter(F.col("active")).select("source_name", "source_type")


@register(
    "constraint_check_orders",
    """
    WITH agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_orderkey,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS uq_orderkey,
             CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('F','O','P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS av_status,
             CAST(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS rg_price
      FROM orders
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS fk_custkey
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      WHERE o_custkey IS NOT NULL AND c_custkey IS NULL
    )
    SELECT 'not_null:o_orderkey' AS constraint, nn_orderkey = 0 AS passed, nn_orderkey AS violations FROM agg
    UNION ALL SELECT 'unique:o_orderkey', uq_orderkey = 0, uq_orderkey FROM agg
    UNION ALL SELECT 'accepted_values:o_orderstatus', av_status = 0, av_status FROM agg
    UNION ALL SELECT 'range:o_totalprice', rg_price = 0, rg_price FROM agg
    UNION ALL SELECT 'references:o_custkey', fk_custkey = 0, fk_custkey FROM fk
    UNION ALL SELECT 'min_rows', n_rows >= 100, CAST(GREATEST(0, 100 - n_rows) AS BIGINT) FROM agg
    """,
    doc="Table-contract constraints (dbt-style expectations): not-null, "
        "key uniqueness, accepted values, range, FK integrity, row floor "
        "— all scalar checks in ONE aggregate pass + one anti-join per "
        "FK. Violations as counts, never row collections.",
)
def constraint_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .constraints import TableConstraints

    orders, customer = tables(spark, sf_dir, "orders", "customer")
    checks = TableConstraints(
        not_null=["o_orderkey"],
        unique=[("o_orderkey",)],
        accepted_values={"o_orderstatus": ("F", "O", "P")},
        ranges={"o_totalprice": (0.0, 1_000_000.0)},
        min_rows=100,
        references={"o_custkey": (customer, "c_custkey")},
    )
    return checks.check_df(orders).select("constraint", "passed", "violations")


@register(
    "validation_report",
    """
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'not-a-number'
                  ELSE CAST(o_totalprice AS VARCHAR) END AS total_str,
             CASE WHEN o_orderkey % 101 = 0 THEN ''
                  ELSE CAST(o_custkey AS VARCHAR) END AS cust_str,
             CASE WHEN o_orderkey % 89 = 0 THEN '31/02/1999'
                  ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_str
      FROM orders
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS total_rows,
      CAST(SUM(CASE WHEN TRY_CAST(total_str AS DOUBLE) IS NULL
                    AND total_str != '' THEN 1 ELSE 0 END) AS BIGINT)
          AS type_mismatch_float,
      CAST(SUM(CASE WHEN cust_str = '' OR cust_str IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS null_not_allowed,
      CAST(SUM(CASE WHEN date_str != '' AND date_str IS NOT NULL
                    AND COALESCE(try_strptime(date_str, '%Y-%m-%d'),
                                 try_strptime(date_str, '%d/%m/%Y')) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS type_mismatch_date,
      CAST(SUM(CASE WHEN (TRY_CAST(total_str AS DOUBLE) IS NOT NULL OR total_str = '')
                     AND cust_str != '' AND cust_str IS NOT NULL
                     AND (date_str = '' OR date_str IS NULL
                          OR COALESCE(try_strptime(date_str, '%Y-%m-%d'),
                                      try_strptime(date_str, '%d/%m/%Y')) IS NOT NULL)
                    THEN 1 ELSE 0 END) AS BIGINT) AS valid_rows
    FROM raw
    """,
    doc="P9–P11: metadata-driven validation (null_not_allowed / "
        "type_mismatch taxonomy, etl/validate.py:100-120) compiled to "
        "boolean expressions over an all-strings batch with injected "
        "defects; counts aggregate the valid/quarantine split.",
)
def validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .validate import type_ok

    (orders,) = tables(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = orders.select(
        "o_orderkey",
        F.when(k % 97 == 0, "not-a-number")
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("total_str"),
        F.when(k % 101 == 0, "").otherwise(F.col("o_custkey").cast("string")).alias(
            "cust_str"
        ),
        F.when(k % 89 == 0, "31/02/1999")
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
        .alias("date_str"),
    )
    float_ok = type_ok(F.col("total_str"), "float")
    date_ok = type_ok(F.col("date_str"), "date")
    null_bad = F.col("cust_str").isNull() | (F.col("cust_str") == "")
    return raw.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(~float_ok, 1).otherwise(0)).cast("long").alias(
            "type_mismatch_float"
        ),
        F.sum(F.when(null_bad, 1).otherwise(0)).cast("long").alias("null_not_allowed"),
        F.sum(F.when(~date_ok, 1).otherwise(0)).cast("long").alias(
            "type_mismatch_date"
        ),
        F.sum(
            F.when(float_ok & ~null_bad & date_ok, 1).otherwise(0)
        ).cast("long").alias("valid_rows"),
    )
