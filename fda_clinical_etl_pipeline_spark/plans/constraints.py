"""Declarative table constraints (expectations) — the engine's
data-quality layer (SURVEY.md §2.3 P9–P13 generalized from per-column
validation to table contracts).

The reference validates rows against schema metadata; production
pipelines also need TABLE-level invariants: key uniqueness, accepted
value sets, referential integrity, row-count floors. Each constraint
compiles to an aggregate expression; ALL constraints on a table evaluate
in ONE pass (single job, partial aggregation) — violations come back as
counts, never row collections.

At 100 TB: a constraint sweep costs one scan of the table plus one
broadcast or shuffle per FK check. Uniqueness is exact (count vs
count distinct); approximate mode (approx_count_distinct) is the
constant-memory variant for monitoring-grade checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ConstraintResult:
    name: str
    passed: bool
    violations: int
    detail: str = ""


@dataclass
class TableConstraints:
    """Builder: declare constraints, then ``check(df)`` runs them."""

    not_null: list[str] = field(default_factory=list)
    unique: list[tuple[str, ...]] = field(default_factory=list)
    accepted_values: dict[str, tuple] = field(default_factory=dict)
    ranges: dict[str, tuple[float, float]] = field(default_factory=dict)
    min_rows: int | None = None
    # FK checks: column -> (dim DataFrame, dim column)
    references: dict[str, tuple[DataFrame, str]] = field(default_factory=dict)

    def _agg_exprs(self) -> list[Column]:
        exprs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
        for c in self.not_null:
            exprs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long").alias(f"nn__{c}")
            )
        for i, cols in enumerate(self.unique):
            if len(cols) == 1:
                # raw column: hashes the native type (a string concat per
                # row costs ~3x on numeric keys) and matches SQL
                # COUNT(*) - COUNT(DISTINCT col) exactly (nulls, excluded
                # from the distinct count, read as violations — a null
                # key is not a unique identifier)
                key = F.col(cols[0])
            else:
                key = F.concat_ws("\x1f", *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in cols
                ])
            exprs.append(
                (F.count(F.lit(1)) - F.countDistinct(key))
                .cast("long").alias(f"uq__{i}")
            )
        for c, vals in self.accepted_values.items():
            exprs.append(
                F.sum(
                    F.when(F.col(c).isNotNull() & ~F.col(c).isin(*vals), 1)
                    .otherwise(0)
                ).cast("long").alias(f"av__{c}")
            )
        for c, (lo, hi) in self.ranges.items():
            exprs.append(
                F.sum(
                    F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
                ).cast("long").alias(f"rg__{c}")
            )
        return exprs

    def check_plan(self, df: DataFrame) -> DataFrame:
        """The whole constraint sweep as ONE DataFrame plan — columns
        (constraint, passed, violations, detail), a single action when
        materialized. FK checks fold into the same aggregate pass as the
        scalar checks: each reference left-joins the fact against the
        dim's DISTINCT keys (no multiplicity change) and counts unmatched
        non-null keys. The optimizer picks the join strategy — with AQE
        on (production default) a small distinct-key side broadcasts, so
        the whole sweep is one scan + one aggregation; a huge dim falls
        back to a shuffled join, which is the correct 100 TB plan anyway."""
        base = df
        fk_exprs: list[Column] = []
        for i, (c, (dim, dim_col)) in enumerate(self.references.items()):
            key_col, hit_col = f"_fkkey__{i}", f"_fkhit__{i}"
            dimk = (
                dim.select(F.col(dim_col).alias(key_col))
                .distinct()
                .withColumn(hit_col, F.lit(1))
            )
            base = base.join(dimk, F.col(c) == F.col(key_col), "left")
            fk_exprs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull() & F.col(hit_col).isNull(), 1
                    ).otherwise(0)
                ).cast("long").alias(f"fk__{c}")
            )
        agg = base.agg(*self._agg_exprs(), *fk_exprs)

        entries: list[tuple[str, Column, Column]] = []
        if self.min_rows is not None:
            entries.append((
                "min_rows",
                F.greatest(
                    F.lit(0).cast("long"),
                    (F.lit(self.min_rows) - F.col("_n_rows")).cast("long"),
                ),
                F.format_string(
                    "%d rows, floor %d", F.col("_n_rows"),
                    F.lit(self.min_rows),
                ),
            ))
        empty_detail = F.lit("")
        for c in self.not_null:
            entries.append((f"not_null:{c}", F.col(f"nn__{c}"), empty_detail))
        for i, cols in enumerate(self.unique):
            entries.append(
                (f"unique:{','.join(cols)}", F.col(f"uq__{i}"), empty_detail)
            )
        for c in self.accepted_values:
            entries.append((f"accepted_values:{c}", F.col(f"av__{c}"), empty_detail))
        for c in self.ranges:
            entries.append((f"range:{c}", F.col(f"rg__{c}"), empty_detail))
        for c in self.references:
            entries.append((f"references:{c}", F.col(f"fk__{c}"), empty_detail))

        structs = F.array(*[
            F.struct(
                F.lit(name).alias("constraint"),
                (viol == 0).alias("passed"),
                viol.cast("long").alias("violations"),
                detail.alias("detail"),
            )
            for name, viol, detail in entries
        ])
        return (
            agg.select(F.explode(structs).alias("r"))
            .select("r.constraint", "r.passed", "r.violations", "r.detail")
        )

    def check(self, df: DataFrame) -> list[ConstraintResult]:
        """Materialize check_plan — one action total, regardless of how
        many constraints (the per-FK ``.count()`` variant cost one job
        per reference)."""
        return [
            ConstraintResult(r["constraint"], bool(r["passed"]),
                             int(r["violations"]), r["detail"])
            for r in self.check_plan(df).collect()
        ]

    def check_df(self, df: DataFrame) -> DataFrame:
        """Results as a DataFrame (for persistence alongside provenance)."""
        return self.check_plan(df)
