"""HL7 v2 parsing as native column expressions (SURVEY.md §2.1 S5, §2.3
P3/P13, §7.4 hard part #2 — no UDF).

The reference parses HL7 with Python string splits
(etl/validate.py:179-197: file → blank-line messages → '\\n' segments →
'|' fields; etl/transform.py:81-117: positional PID-n extraction, OBX
concatenation). Here a message is one row with a ``segments``
array<string> column and everything below is split / filter / element_at /
exists — higher-order functions inside codegen.

Positional convention: ``PID-n`` is the nth ``|``-field *after* the
segment name (etl/validate.py:196-205: ``fields = line.split('|')``,
``fields[n]``), so element_at(parts, n+1) with 1-based element_at.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FIELD_SEP = r"\|"  # regex-escaped HL7 field separator


def segment_of(segments: Column, name: str) -> Column:
    """First segment whose name matches (e.g. 'PID') — NULL if absent
    (the reference's 'PID segment missing' case, etl/validate.py:190-193).
    """
    matches = F.filter(segments, lambda s: s.startswith(name + "|"))
    return F.when(F.size(matches) > 0, F.element_at(matches, 1))


def field_of(segment: Column, n: int) -> Column:
    """PID-n positional extraction: nth field after the segment name.
    Returns NULL when the segment is NULL or too short; empty fields come
    back as '' (the reference distinguishes the two, etl/validate.py:199).
    """
    parts = F.split(segment, FIELD_SEP)
    return F.when(F.size(parts) > n, F.element_at(parts, n + 1))


def pid_field(segments: Column, n: int) -> Column:
    return field_of(segment_of(segments, "PID"), n)


def obx_note_text(segments: Column) -> Column:
    """All OBX segments joined with ' ' — the reference's note_text for HL7
    (etl/transform.py:113-115)."""
    return F.array_join(
        F.filter(segments, lambda s: s.startswith("OBX|")), " "
    )


def has_segment(segments: Column, name: str) -> Column:
    """P13: F.exists over the segment array."""
    return F.exists(segments, lambda s: s.startswith(name + "|"))


def nullif_empty(c: Column) -> Column:
    """The reference treats '' as null for required/coalesce semantics
    (etl/validate.py:20-21); quirk #2's dead fillna chain becomes a true
    coalesce via nullif (SURVEY.md F13)."""
    return F.nullif(c, F.lit(""))


def hl7_ssn(segments: Column) -> Column:
    """F13 fixed semantics: coalesce(PID-16, PID-17, PID-19) with
    empty-string treated as missing (the reference's fillna('') chain at
    etl/transform.py:132-137 made the fallbacks dead — documented quirk #2;
    we implement the intended semantics)."""
    return F.coalesce(
        nullif_empty(pid_field(segments, 16)),
        nullif_empty(pid_field(segments, 17)),
        nullif_empty(pid_field(segments, 19)),
    )
