"""Net-changes folding over a row-churn change feed.

All three format twins emit row-level CHURN (Iceberg
``changelog_scan`` / its streaming source, Delta ``table_changes``
CDF, Hudi ``incremental_read``): every intermediate delete/insert in
the window appears, including copy-on-write rewrite noise and
transient keys. Downstream consumers that maintain a mirror usually
want the NET effect between the window endpoints instead — Iceberg's
``net_changes`` changelog option, Delta's "latest change per key"
recipe. ``net_changes`` derives it from the churn, format-agnostic:

- a key absent at window start and present at the end → one
  ``insert`` carrying the FINAL values;
- present at start, absent at the end → one ``delete`` carrying the
  window-start (pre-state) values;
- present at both ends with different values → ``delete`` (pre) +
  ``insert`` (post) — the net-update encoding Iceberg uses (no
  update rows);
- present at both ends with identical values, or a transient key
  (inserted then deleted inside the window) → NOTHING.

Presence at the window edges is inferred from the first/last event
per key: the first event being a delete means the key pre-existed;
the last event being an insert means it survives. Delta CDF's
``update_preimage``/``update_postimage`` normalize to delete/insert
before folding, so the same call works on ``table_changes`` output
(pass ``ord_col="_commit_version"``).

One shuffle on the key, min_by/max_by aggregation (partial map-side),
conditional explode — no window functions, no second exchange. Keys
must be unique per snapshot (the CDC primary-key contract); ordering
inside one commit is delete-before-insert, which is exactly how an
in-commit update must fold.

Reference analog: none (the reference has no change feed); this is
the consumption API the three CDC surfaces share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_COLS = {
    "_change_type", "_change_ordinal", "_commit_snapshot_id",
    "_commit_version", "_commit_timestamp",
}


def net_changes(
    changes: DataFrame,
    keys: list[str],
    type_col: str = "_change_type",
    ord_col: str = "_change_ordinal",
) -> DataFrame:
    """Fold a churn frame into net changes per ``keys`` (see module
    docstring). Returns the data columns plus ``_change_type``."""
    data_cols = [
        c for c in changes.columns
        if c not in _META_COLS and c != type_col and c != ord_col
    ]
    val_cols = [c for c in data_cols if c not in keys]
    norm = F.when(
        F.col(type_col).isin("delete", "update_preimage"),
        F.lit("delete"),
    ).otherwise(F.lit("insert"))
    ev = changes.select(
        *keys,
        norm.alias("__t"),
        F.col(ord_col).alias("__o"),
        F.struct(*[F.col(c) for c in data_cols]).alias("__v"),
    )
    # first event = min (ordinal, type) — 'delete' < 'insert' makes an
    # in-commit update fold delete-first; last event symmetric
    order_key = F.struct(F.col("__o"), F.col("__t"))
    per_key = ev.groupBy(*keys).agg(
        F.min_by(F.struct("__t", "__v"), order_key).alias("__first"),
        F.max_by(F.struct("__t", "__v"), order_key).alias("__last"),
    )
    first_t = F.col("__first.__t")
    last_t = F.col("__last.__t")
    net = (
        F.when(
            (first_t == "insert") & (last_t == "insert"),
            F.array(F.struct(
                F.lit("insert").alias("t"),
                F.col("__last.__v").alias("v"),
            )),
        )
        .when(
            (first_t == "delete") & (last_t == "delete"),
            F.array(F.struct(
                F.lit("delete").alias("t"),
                F.col("__first.__v").alias("v"),
            )),
        )
        .when(
            (first_t == "delete") & (last_t == "insert")
            & (F.col("__first.__v") != F.col("__last.__v")),
            F.array(
                F.struct(F.lit("delete").alias("t"),
                         F.col("__first.__v").alias("v")),
                F.struct(F.lit("insert").alias("t"),
                         F.col("__last.__v").alias("v")),
            ),
        )
        # transient key / values-equal update: nothing. (An empty
        # SLICE of a correctly-typed array — a bare array() would not
        # coerce to the struct element type.)
        .otherwise(F.slice(
            F.array(F.struct(
                F.lit("x").alias("t"), F.col("__first.__v").alias("v")
            )), 1, 0,
        ))
    )
    exploded = per_key.select(F.explode(net).alias("__n"))
    return exploded.select(
        F.col("__n.t").alias("_change_type"),
        *[F.col(f"__n.v.{c}").alias(c) for c in data_cols],
    )


def read_changes(
    table,
    start=None,
    end=None,
    net: bool = False,
    keys: list[str] | None = None,
) -> DataFrame:
    """ONE change-read call across the three format twins — the
    switching surface a consumer wants when tables migrate formats:

    - ``DeltaProtocolTable`` → ``table_changes(start, end)``
      (``start``/``end`` are commit VERSIONS; default start=1, the
      first commit after create);
    - ``IcebergTable`` → ``changelog_scan(from, to)`` (SNAPSHOT IDS;
      default = full history);
    - ``HudiTable`` → ``changelog(from, to)`` (INSTANTS; default =
      full history).

    ``net=True`` additionally folds the churn through
    ``net_changes`` (``keys`` required), normalizing each format's
    ordinal/meta columns — so one consumer body works against any of
    the three tables."""
    from .delta_log import DeltaProtocolTable
    from .hudi_table import HudiTable
    from .iceberg import IcebergTable

    if isinstance(table, DeltaProtocolTable):
        churn = table.table_changes(
            1 if start is None else int(start), end
        )
        ord_col, drop = "_commit_version", ["_commit_timestamp"]
    elif isinstance(table, IcebergTable):
        churn = table.changelog_scan(
            from_snapshot_id=start, to_snapshot_id=end
        )
        ord_col, drop = "_change_ordinal", ["_commit_snapshot_id"]
    elif isinstance(table, HudiTable):
        churn = table.changelog(
            from_instant=start or "", to_instant=end
        )
        ord_col, drop = "_change_ordinal", ["_commit_instant"]
    else:
        raise TypeError(
            f"read_changes does not support {type(table).__name__}"
        )
    if not net:
        return churn
    if not keys:
        raise ValueError("net=True requires keys=[...]")
    return net_changes(
        churn.drop(*[c for c in drop if c in churn.columns]),
        keys, ord_col=ord_col,
    )
