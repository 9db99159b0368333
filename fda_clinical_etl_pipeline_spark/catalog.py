"""Catalog: source registry + schema metadata as data (SURVEY.md §1.3).

The reference keeps schemas in Postgres rows
(``schema_metadata(source_name, column_name, data_type, is_nullable,
is_phi, phi_rule)``, db/init.sql:68-78) and sources in
``source_registry`` (db/init.sql:38-44). The engine keeps the same
*dynamic, metadata-driven* model: schemas are rows, fetched per source at
plan time, compiled into validation/scrub/canonicalize expressions. The
tables live as DataFrames (parquet/JDBC-backed in production; in-memory
for tests) — tiny, always broadcast (J1/J2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ColumnMeta:
    column_name: str
    data_type: str = "string"  # string|date|int|float|... (etl/validate.py:19-37)
    is_nullable: bool = True
    is_phi: bool = False
    phi_rule: str | None = None

    def as_dict(self) -> dict:
        return {
            "column_name": self.column_name,
            "data_type": self.data_type,
            "is_nullable": self.is_nullable,
            "is_phi": self.is_phi,
            "phi_rule": self.phi_rule,
        }


@dataclass(frozen=True)
class SourceMeta:
    source_name: str
    source_type: str  # csv | jsonl | hl7 (db/init.sql:103-107)
    file_path: str = ""
    active: bool = True
    columns: tuple[ColumnMeta, ...] = field(default_factory=tuple)


# The reference's seed metadata (db/init.sql:110-140 / FIXTURES.md §1–3).
HOSPITAL_A = SourceMeta(
    "hospital_a",
    "csv",
    columns=(
        ColumnMeta("patient_id", "string", False, False),
        ColumnMeta("patient_name", "string", False, True),
        ColumnMeta("ssn", "string", False, True),
        ColumnMeta("dob", "date", True, True),
        ColumnMeta("visit_date", "date", True, False),
        ColumnMeta("diagnosis", "string", True, False),
        ColumnMeta("notes", "string", True, False),
    ),
)

CLINIC_B = SourceMeta(
    "clinic_b",
    "jsonl",
    columns=(
        ColumnMeta("id", "string", False, False),
        ColumnMeta("name", "string", False, True),
        ColumnMeta("date_of_birth", "date", True, True),
        ColumnMeta("encounter", "date", True, False),
        ColumnMeta("icd", "string", True, False),
        ColumnMeta("free_text", "string", True, True),
    ),
)

HOSPITAL_C_HL7 = SourceMeta(
    "hospital_c_hl7",
    "hl7",
    columns=(
        ColumnMeta("PID-3", "string", False, False),
        ColumnMeta("PID-5", "string", False, True),
        ColumnMeta("PID-7", "date", False, True),
        ColumnMeta("PID-11", "string", True, True),
        ColumnMeta("PID-17", "string", True, True),
    ),
)

DEFAULT_SOURCES = (HOSPITAL_A, CLINIC_B, HOSPITAL_C_HL7)


class Catalog:
    """In-memory registry with DataFrame views for SQL access."""

    def __init__(self, sources: tuple[SourceMeta, ...] = DEFAULT_SOURCES):
        self._sources = {s.source_name: s for s in sources}

    def source(self, name: str) -> SourceMeta:
        return self._sources[name]

    def active_sources(self) -> list[SourceMeta]:
        """S1: list active sources (etl/ingest.py:27-43 / P14 active filter)."""
        return [s for s in self._sources.values() if s.active]

    def schema_metadata(self, source_name: str) -> list[dict]:
        """J1: the per-source schema rows (etl/validate.py:52-65). Empty
        list means 'no metadata ⇒ skip validation' (etl/validate.py:239-243).
        """
        src = self._sources.get(source_name)
        return [c.as_dict() for c in src.columns] if src else []

    def register_views(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        """Expose source_registry + schema_metadata as temp views so
        lineage queries can join against them (J1/J2)."""
        reg = spark.createDataFrame(
            [
                (s.source_name, s.source_type, s.file_path, s.active)
                for s in self._sources.values()
            ],
            "source_name string, source_type string, file_path string, active boolean",
        )
        meta = spark.createDataFrame(
            [
                (
                    s.source_name,
                    c.column_name,
                    c.data_type,
                    c.is_nullable,
                    c.is_phi,
                    c.phi_rule,
                )
                for s in self._sources.values()
                for c in s.columns
            ],
            "source_name string, column_name string, data_type string, "
            "is_nullable boolean, is_phi boolean, phi_rule string",
        )
        reg.createOrReplaceTempView("source_registry")
        meta.createOrReplaceTempView("schema_metadata")
        return reg, meta
