"""Canonicalization to the QLM schema (SURVEY.md §2.3 P1–P4; §2.8 union).

The reference maps each source to the fixed canonical schema with pandas
rename loops (etl/transform.py:46-140); here each mapping is a pure
``select`` of alias/lit/coalesce expressions, and the three sources union
into ONE canonical table (the reference writes separate per-source
artifacts, but its fixed schema exists precisely so they union —
SURVEY.md §2.8).

Divergence from the reference, by design (documented quirks):
- quirk #1: we canonicalize the *scrubbed* data (the reference re-reads
  the raw file, etl/transform.py:222-227);
- quirk #2: HL7 SSN uses a true coalesce with ''→NULL (the reference's
  fillna('') chain made fallbacks dead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hl7 import hl7_ssn, obx_note_text, pid_field

CANONICAL_COLUMNS = (
    "patient_id",
    "patient_name",
    "dob",
    "visit_date",
    "diagnosis",
    "note_text",
    "address",
    "ssn",
    "source",
)


def _conform(df: DataFrame) -> DataFrame:
    """Project to the canonical column order, adding NULLs for the columns
    a source doesn't supply (HL7 has address/ssn but no visit_date —
    etl/transform.py:120-140)."""
    cols = [
        F.col(c) if c in df.columns else F.lit(None).cast("string").alias(c)
        for c in CANONICAL_COLUMNS
    ]
    return df.select(*cols)


def canonicalize_hospital_a(df: DataFrame) -> DataFrame:
    """P1 (etl/transform.py:46-60): straight renames + literal source.
    P4: `notes` falls back to `note` when absent (etl/transform.py:58)."""
    notes_col = "notes" if "notes" in df.columns else "note"
    return _conform(
        df.select(
            F.col("patient_id"),
            F.col("patient_name"),
            F.col("dob"),
            F.col("visit_date"),
            F.col("diagnosis"),
            F.col(notes_col).alias("note_text"),
            F.lit("hospital_a").alias("source"),
        )
    )


def canonicalize_clinic_b(df: DataFrame) -> DataFrame:
    """P2 (etl/transform.py:63-78)."""
    return _conform(
        df.select(
            F.col("id").alias("patient_id"),
            F.col("name").alias("patient_name"),
            F.col("date_of_birth").alias("dob"),
            F.col("encounter").alias("visit_date"),
            F.col("icd").alias("diagnosis"),
            F.col("free_text").alias("note_text"),
            F.lit("clinic_b").alias("source"),
        )
    )


def canonicalize_hl7(df: DataFrame) -> DataFrame:
    """P3 (etl/transform.py:81-140): positional PID extraction + OBX join.
    Input: DataFrame with a ``segments`` array<string> column (read_hl7).
    """
    seg = F.col("segments")
    return _conform(
        df.select(
            pid_field(seg, 3).alias("patient_id"),
            pid_field(seg, 5).alias("patient_name"),
            pid_field(seg, 7).alias("dob"),
            obx_note_text(seg).alias("note_text"),
            pid_field(seg, 11).alias("address"),
            hl7_ssn(seg).alias("ssn"),
            F.lit("hospital_c_hl7").alias("source"),
        )
    )


def canonical_union(*frames: DataFrame) -> DataFrame:
    """§2.8: one QLM table from all sources — unionByName over conformed
    projections. Narrow op: no shuffle, partitions concatenate."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
