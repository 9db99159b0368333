"""Shared MERGE INTO clause staging for the lakehouse twins.

Both the Delta and Iceberg twins expose the same ``merge`` surface
(matched UPDATE / matched DELETE / not-matched INSERT /
not-matched-by-source DELETE, each optionally conditioned). The
clause semantics — precedence, condition gating, ambiguity rules,
expression aliases ``t`` (target row) and ``s`` (source row) — are
format-independent, so they live here once; each twin supplies its
own physical write (Delta: pruned copy-on-write rewrite + optional
CDF; Iceberg: one MOR snapshot of equality-delete files + appended
data files).

Reference analog: the closest is the Hudi upsert workflow
(hudi/register_hudi.py:58), which is the precombine special case the
twins' ``upsert`` methods cover; full MERGE is capability the
reference's users get from their query engine."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_clauses(
    cols: list[str],
    when_matched_update,
    when_not_matched_insert,
) -> tuple[dict | None, dict | None]:
    """Expand ``"all"`` (SET * / INSERT *) into per-column source
    references and validate the explicit dicts."""
    upd = when_matched_update
    if upd == "all":
        upd = {c: f"s.{c}" for c in cols}
    ins = when_not_matched_insert
    if ins == "all":
        ins = {c: f"s.{c}" for c in cols}
    for spec, label in ((upd, "update"), (ins, "insert")):
        bad = [c for c in (spec or {}) if c not in cols]
        if bad:
            raise ValueError(
                f"{label} clause sets unknown columns {bad}"
            )
    return upd, ins


def require_some_clause(upd, when_matched_delete, ins,
                        when_not_matched_by_source_delete) -> None:
    if when_matched_delete is False and not upd and not ins \
            and when_not_matched_by_source_delete is False:
        raise ValueError("merge needs at least one clause")


def check_ambiguous_source(
    target: DataFrame, source: DataFrame, on: str
) -> None:
    """Delta's ambiguity rule (shared verbatim by the Iceberg twin):
    a target row a matched clause would touch may match at most ONE
    source row."""
    dup = (
        source.groupBy(F.col(on).alias("__k"))
        .count().where(F.col("count") > 1)
    )
    amb = (
        target.join(dup, F.col(on) == F.col("__k"), "leftsemi")
        .limit(1).collect()
    )
    if amb:
        raise ValueError(
            "merge aborted: multiple source rows match the same "
            f"target row on {on!r} (non-deterministic update/delete)"
        )


def _cond(spec, default: Column) -> Column:
    if spec is True:
        return F.lit(True)
    if spec is False or spec is None:
        return default
    return F.expr(spec)


def stage_merge(
    current: DataFrame,
    source: DataFrame,
    on: str,
    upd: dict | None,
    matched_update_condition: str | None,
    when_matched_delete,
    ins: dict | None,
    not_matched_insert_condition: str | None,
    when_not_matched_by_source_delete,
) -> DataFrame:
    """Full-outer-join staging frame with an ``__act`` verdict per
    row: U (matched update), D (matched delete or by-source delete),
    K (keep as-is), I (insert), X (unmatched source, no insert
    clause). The matched DELETE clause evaluates before UPDATE, like
    listing the DELETE clause first in SQL. Null-safe presence comes
    from ``__t``/``__s`` markers, not key nullness."""
    t = current.withColumn("__t", F.lit(True)).alias("t")
    s = source.withColumn("__s", F.lit(True)).alias("s")
    joined = t.join(
        s, F.col(f"t.{on}") == F.col(f"s.{on}"), "full_outer"
    )
    matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()
    t_only = F.col("__t").isNotNull() & F.col("__s").isNull()
    s_only = F.col("__t").isNull() & F.col("__s").isNotNull()
    del_c = _cond(when_matched_delete, F.lit(False))
    upd_c = _cond(matched_update_condition, F.lit(True))
    ins_c = _cond(not_matched_insert_condition, F.lit(True))
    bys_c = _cond(when_not_matched_by_source_delete, F.lit(False))
    act = (
        F.when(matched & del_c, F.lit("D"))
        .when(matched & F.lit(upd is not None) & upd_c, F.lit("U"))
        .when(matched, F.lit("K"))
        .when(t_only & bys_c, F.lit("D"))
        .when(t_only, F.lit("K"))
        .when(s_only & F.lit(ins is not None) & ins_c, F.lit("I"))
        .otherwise(F.lit("X"))
    )
    return joined.withColumn("__act", act)


def merged_column(
    c: str, field: T.StructField, upd: dict | None, ins: dict | None
) -> Column:
    """The post-merge value of target column ``c`` for a staged row:
    the update expression on U rows, the insert expression (or NULL)
    on I rows, the stored value otherwise."""
    col = F.col(f"t.{c}")
    if upd and c in upd:
        col = F.when(
            F.col("__act") == "U",
            F.expr(upd[c]).cast(field.dataType),
        ).otherwise(col)
    ins_val = (
        F.expr(ins[c]).cast(field.dataType)
        if ins and c in ins
        else F.lit(None).cast(field.dataType)
    )
    return F.when(
        F.col("__act") == "I", ins_val
    ).otherwise(col).alias(c)
