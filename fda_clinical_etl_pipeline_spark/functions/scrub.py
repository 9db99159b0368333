"""PHI redaction as a plan-time expression compiler (SURVEY.md §2.9 F1–F4,
§2.11, quirk #3/#4).

The reference applies regex rules row-at-a-time in Python
(etl/scrub_phi.py:18-35: compile per rule, ``subn`` per value, rules
ordered by ``rule_id`` at etl/scrub_phi.py:41, case-insensitive at :26).
Here the whole rule set folds into ONE chained ``regexp_replace`` column
expression at plan time — no UDF, no Python per row, whole-stage codegen;
the fold nests left-to-right in ``rule_id`` order so rule N runs on rule
N-1's OUTPUT.

Quirk #10 (FIXED, documented divergence): in the reference's CSV/JSONL
paths ``val`` is never reassigned inside the rule loop
(etl/scrub_phi.py:117-124) — every rule matches against the ORIGINAL
text and the LAST matching rule's output wins, so a later rule can
restore text an earlier rule already redacted. The engine's cumulative
chain is the safer intended semantics (each rule sees its predecessors'
redactions); it is NOT bit-for-bit reference parity on inputs where two
rules match the same value.

Rule-hit attribution (the reference's ``rules_applied`` set,
etl/scrub_phi.py:81-132) uses regexp_count on the staged text — an
aggregate over a derived column, not a side effect.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PhiRule:
    rule_id: str
    pattern: str
    replacement: str
    description: str = ""


# The reference rule set, db/init.sql:163-171. Alphabetical rule_id order is
# load-bearing (etl/scrub_phi.py:41 ORDER BY rule_id): the greedy address
# pattern runs first and may consume phones/dates inside address-ish spans.
DEFAULT_PHI_RULES: tuple[PhiRule, ...] = (
    PhiRule("PHI_ADDRESS_SIMPLE", r"\b\d+\s+[A-Za-z0-9\.\- ]+\b", "[REDACTED_ADDRESS]", "street address"),
    PhiRule("PHI_DATE_ISO", r"\b\d{4}-\d{2}-\d{2}\b", "[REDACTED_DATE]", "ISO date"),
    PhiRule("PHI_DATE_YYYYMMDD", r"\b\d{8}\b", "[REDACTED_DATE]", "compact date"),
    PhiRule("PHI_EMAIL", r"\b[\w.+-]+@[\w-]+\.[\w.-]+\b", "[REDACTED_EMAIL]", "email"),
    PhiRule("PHI_PHONE", r"\b\d{3}-\d{3}-\d{4}\b", "[REDACTED_PHONE]", "phone"),
    PhiRule("PHI_SSN", r"\b\d{3}-\d{2}-\d{4}\b", "[REDACTED_SSN]", "SSN"),
    PhiRule("PHI_SSN_DIGITS", r"\b\d{9}\b", "[REDACTED_SSN]", "9-digit SSN"),
)


def rules_from_df(rules_df) -> tuple[PhiRule, ...]:
    """Load the rule set from a DataFrame with columns
    (rule_id, pattern, replacement[, description]) — the reference's
    data-driven ``phi_rules`` table (db/init.sql:80-87) as first-class
    input. Rules are rows; the plan compiler (redact_expr) is generic.
    Collecting is fine: the rule table is metadata-sized by definition."""
    cols = rules_df.columns
    return tuple(
        PhiRule(
            r["rule_id"],
            r["pattern"],
            r["replacement"],
            r["description"] if "description" in cols else "",
        )
        for r in rules_df.orderBy("rule_id").collect()
    )


def _safe_pattern(pattern: str, case_insensitive: bool = True) -> str:
    """Validate the regex at plan time; fall back to a literal-escaped
    pattern like the reference does on a bad regex (etl/scrub_phi.py:29-35).
    Case-insensitivity via inline flag (etl/scrub_phi.py:26)."""
    try:
        re.compile(pattern)
    except re.error:
        pattern = re.escape(pattern)
    return ("(?i)" + pattern) if case_insensitive else pattern


def redact_expr(
    col: Column | str,
    rules: tuple[PhiRule, ...] = DEFAULT_PHI_RULES,
    case_insensitive: bool = True,
) -> Column:
    """Fold the ordered rule chain into one nested regexp_replace
    expression: rule N runs on rule N-1's output (quirk #3 ordering;
    quirk #10 cumulative-application divergence — see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    for rule in sorted(rules, key=lambda r: r.rule_id):
        c = F.regexp_replace(
            c, _safe_pattern(rule.pattern, case_insensitive), rule.replacement
        )
    return c


def rule_hits_expr(
    col: Column | str,
    rules: tuple[PhiRule, ...] = DEFAULT_PHI_RULES,
) -> Column:
    """array<struct<rule_id,hits>> — per-row hit counts per rule, measured
    the way the engine's cumulative chain sees the text (rule N counts on
    the text *after* rules 1..N-1 ran). This matches the engine's own
    redaction accounting; the reference's subn() counts each rule against
    the ORIGINAL text (quirk #10), so its per-rule totals can differ on
    overlapping matches."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for rule in sorted(rules, key=lambda r: r.rule_id):
        pat = _safe_pattern(rule.pattern)
        out.append(
            F.struct(
                F.lit(rule.rule_id).alias("rule_id"),
                F.regexp_count(c, F.lit(pat)).cast("long").alias("hits"),
            )
        )
        c = F.regexp_replace(c, pat, rule.replacement)
    return F.array(*out)


def redact_hl7_segments(
    segments: Column,
    schema_meta: list[dict],
    rules: tuple[PhiRule, ...] = DEFAULT_PHI_RULES,
) -> Column:
    """Column-level PHI redaction for HL7 PID positions (the reference's
    scrub_hl7, etl/scrub_phi.py:199-266), as one codegen expression over
    the ``segments`` array — no UDF.

    Reference token semantics per catalogued PID position: NAME-ish →
    ``[REDACTED_NAME]``; DOB/date-ish → ``[REDACTED_DATE]``; otherwise run
    the regex chain on the field and fall back to ``[REDACTED]`` when no
    rule changed it. Empty fields are left untouched
    (etl/scrub_phi.py:234 ``parts[pos].strip() != ''``).

    Documented divergences (safety-dominant, never redacts less):
    - only ``is_phi`` positions get the positional token (the reference
      iterates ALL catalogued PID-* rows, so its curated zone redacts
      even non-PHI ``PID-3`` patient ids to ``[REDACTED]`` — combined
      with quirk #1 its canonical output still carried raw PHI);
    - un-catalogued PID fields and every non-PID segment still get the
      full regex chain (the reference leaves un-catalogued PID fields
      raw).
    """
    from .hl7 import FIELD_SEP

    phi_positions: dict[int, dict] = {}
    for m in schema_meta:
        cname = str(m.get("column_name", ""))
        if m.get("is_phi") and cname.upper().startswith("PID-"):
            try:
                phi_positions[int(cname.split("-")[1])] = m
            except (ValueError, IndexError):
                continue

    def field_expr(p: Column, i: Column) -> Column:
        expr = redact_expr(p, rules)
        for pos, m in sorted(phi_positions.items()):
            cname = str(m["column_name"]).upper()
            if "NAME" in cname or cname == "PID-5":
                tok = F.lit("[REDACTED_NAME]")
            elif ("DOB" in cname or cname == "PID-7"
                  or "date" in str(m.get("data_type") or "").lower()):
                tok = F.lit("[REDACTED_DATE]")
            else:
                red = redact_expr(p, rules)
                tok = F.when(red != p, red).otherwise(F.lit("[REDACTED]"))
            expr = F.when(
                (i == F.lit(pos)) & (F.trim(p) != ""), tok
            ).otherwise(expr)
        # parts[0] is the segment name itself — never rewritten
        return F.when(i == F.lit(0), p).otherwise(expr)

    def rewrite_pid(s: Column) -> Column:
        return F.array_join(
            F.transform(F.split(s, FIELD_SEP), field_expr), "|"
        )

    return F.transform(
        segments,
        lambda s: F.when(s.startswith("PID|"), rewrite_pid(s)).otherwise(
            redact_expr(s, rules)
        ),
    )


def column_token(column_name: str, data_type: str) -> str:
    """Column-level redaction token choice (etl/scrub_phi.py:98-114):
    name-ish → [REDACTED_NAME], dob/date-ish → [REDACTED_DATE],
    else → [REDACTED]. Decided at plan time from metadata (F4)."""
    lowered = column_name.lower()
    if "name" in lowered:
        return "[REDACTED_NAME]"
    if "dob" in lowered or "date" in (data_type or "").lower() or "date" in lowered:
        return "[REDACTED_DATE]"
    return "[REDACTED]"


def scrub_dataframe(
    df: DataFrame,
    schema_meta: list[dict],
    rules: tuple[PhiRule, ...] = DEFAULT_PHI_RULES,
) -> DataFrame:
    """Compile a full scrub plan for a batch DataFrame:

    1. PHI columns (is_phi in metadata) are replaced with their token
       (plan-time constant — the reference nulls the value before regexes
       even run, etl/scrub_phi.py:98-114);
    2. every remaining string column gets the ordered regex chain (quirk
       #7: rules also run on non-PHI columns).

    ``schema_meta`` rows: {column_name, data_type, is_nullable, is_phi}.
    """
    meta = {m["column_name"]: m for m in schema_meta}
    exprs = []
    for c in df.columns:
        m = meta.get(c)
        if m and m.get("is_phi"):
            exprs.append(F.lit(column_token(c, m.get("data_type", ""))).alias(c))
        elif dict(df.dtypes).get(c) == "string":
            exprs.append(redact_expr(c, rules).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)
