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
            key = F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                                   F.lit("\x00")) for c in cols])
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

    def check(self, df: DataFrame) -> list[ConstraintResult]:
        row = df.agg(*self._agg_exprs()).collect()[0]
        results: list[ConstraintResult] = []
        n_rows = row["_n_rows"]
        if self.min_rows is not None:
            results.append(
                ConstraintResult(
                    "min_rows", n_rows >= self.min_rows, max(0, self.min_rows - n_rows),
                    f"{n_rows} rows, floor {self.min_rows}",
                )
            )
        for c in self.not_null:
            v = row[f"nn__{c}"]
            results.append(ConstraintResult(f"not_null:{c}", v == 0, v))
        for i, cols in enumerate(self.unique):
            v = row[f"uq__{i}"]
            results.append(
                ConstraintResult(f"unique:{','.join(cols)}", v == 0, v)
            )
        for c in self.accepted_values:
            v = row[f"av__{c}"]
            results.append(ConstraintResult(f"accepted_values:{c}", v == 0, v))
        for c in self.ranges:
            v = row[f"rg__{c}"]
            results.append(ConstraintResult(f"range:{c}", v == 0, v))
        # FK checks need joins — one anti-join count per reference
        for c, (dim, dim_col) in self.references.items():
            v = (
                df.select(F.col(c).alias("_fk"))
                .filter(F.col("_fk").isNotNull())
                .join(
                    dim.select(F.col(dim_col).alias("_fk")).distinct(),
                    "_fk",
                    "left_anti",
                )
                .count()
            )
            results.append(ConstraintResult(f"references:{c}", v == 0, v))
        return results

    def check_df(self, df: DataFrame) -> DataFrame:
        """Results as a DataFrame (for persistence alongside provenance)."""
        spark = df.sparkSession
        return spark.createDataFrame(
            [(r.name, r.passed, r.violations, r.detail) for r in self.check(df)],
            "constraint string, passed boolean, violations long, detail string",
        )
