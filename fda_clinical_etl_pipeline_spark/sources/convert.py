"""Cross-format table conversion — Delta ⇄ Iceberg ⇄ Hudi.

The repo ships spec twins for all three open table formats
(`delta_log.py`, `iceberg.py`, `hudi_table.py`); this module migrates
a table between them, the operation a reference user performs when
switching storage layers (SURVEY.md §1.4 names Delta as the portable
alternative to the reference's Hudi store — this makes the move, in
either direction, one call):

- ``detect_format(path)`` — by on-disk markers (``_delta_log`` /
  ``metadata/version-hint.text`` / ``.hoodie``);
- ``convert_table(spark, src, dst, dst_format, ...)`` — reads the
  source's LOGICAL snapshot (merge-on-read deletes applied, Hudi meta
  columns stripped) through the source twin and writes it through the
  destination twin. ``history_versions=N`` additionally replays the
  last N source versions oldest-first as destination commits, so
  destination-side time travel covers the recent lineage (operation
  types are not reconstructed — each replayed version lands as a full
  snapshot commit, the standard shallow-migration trade-off).

Scale posture: conversion is read-snapshot → write-files per version —
the same distributed scan/write every twin already uses; nothing is
collected driver-side beyond the source's log metadata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .delta_log import DeltaProtocolTable
from .hudi_table import META_COLS as HUDI_META_COLS
from .hudi_table import HudiTable
from .iceberg import IcebergTable

FORMATS = ("delta", "iceberg", "hudi")


def detect_format(path: str) -> str | None:
    if os.path.isdir(os.path.join(path, "_delta_log")):
        return "delta"
    if os.path.isfile(
        os.path.join(path, "metadata", "version-hint.text")
    ):
        return "iceberg"
    if os.path.isfile(
        os.path.join(path, ".hoodie", "hoodie.properties")
    ):
        return "hudi"
    return None


def _open(spark: SparkSession, path: str, fmt: str):
    if fmt == "delta":
        return DeltaProtocolTable(spark, path)
    if fmt == "iceberg":
        return IcebergTable(spark, path)
    if fmt == "hudi":
        return HudiTable(spark, path)
    raise ValueError(f"unknown table format {fmt!r}")


def _partition_cols(table, fmt: str) -> list[str]:
    """Source partition columns (logical names), preserved on the
    destination so the layout survives migration."""
    if fmt == "delta":
        return list(table.partition_columns())
    if fmt == "iceberg":
        return [pf["name"] for pf in table._partition_fields()]
    pf = table.partition_field
    return [pf] if pf else []


def _versions(table, fmt: str) -> list:
    """Source version handles, oldest first."""
    if fmt == "delta":
        return list(range(table.latest_version() + 1))
    if fmt == "iceberg":
        return [
            s["snapshot-id"]
            for s in sorted(
                table.metadata()["snapshots"],
                key=lambda s: s["sequence-number"],
            )
        ]
    return table.commits()


def _snapshot(table, fmt: str, version) -> DataFrame:
    if fmt == "delta":
        return table.snapshot(version)
    if fmt == "iceberg":
        return table.snapshot(snapshot_id=version)
    df = table.snapshot(as_of_instant=version)
    return df.drop(*HUDI_META_COLS)


def _row_counter(table, fmt: str) -> int | None:
    """The source's row-id counter (Delta rowIdHighWaterMark + 1 /
    Iceberg next-row-id), or None when the source doesn't track
    rows. Hudi has no row-identity concept."""
    if fmt == "delta":
        hwm = table._row_id_hwm(table.latest_version())
        return None if hwm is None else hwm + 1
    if fmt == "iceberg":
        return table.metadata().get("next-row-id")
    return None


def _snapshot_with_row_ids(table, fmt: str, version) -> DataFrame:
    """Lineage snapshot carrying ONLY the shared ``_row_id`` identity
    column (the per-format commit-version/sequence companion does not
    transfer across formats — the destination's own commits take
    over). Rows with NULL ids (written before the source's
    enablement) mint fresh ids on the destination, exactly as an
    in-source rewrite would."""
    if fmt == "delta":
        return table.snapshot_row_tracking(version).drop(
            "_row_commit_version"
        )
    return table.snapshot_lineage(version).drop(
        "_last_updated_sequence_number"
    )


def convert_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    dst_format: str,
    record_key: str | None = None,
    precombine: str | None = None,
    table_name: str | None = None,
    history_versions: int = 1,
    hudi_table_type: str = "COPY_ON_WRITE",
):
    """Convert the table at ``src_path`` into ``dst_format`` at
    ``dst_path``; returns the destination table object.

    ``record_key``/``precombine`` are required for a Hudi destination
    (its table config demands them) and optional elsewhere (Delta
    stores them as merge defaults when given). The last
    ``history_versions`` source versions replay oldest-first."""
    if dst_format not in FORMATS:
        raise ValueError(f"unknown destination format {dst_format!r}")
    src_fmt = detect_format(src_path)
    if src_fmt is None:
        raise ValueError(f"no recognizable table at {src_path}")
    if detect_format(dst_path) is not None:
        raise ValueError(f"destination {dst_path} already holds a table")
    if dst_format == "hudi" and not (record_key and precombine):
        raise ValueError(
            "a hudi destination needs record_key and precombine"
        )
    src = _open(spark, src_path, src_fmt)
    versions = _versions(src, src_fmt)
    if not versions:
        raise ValueError(f"source table at {src_path} has no commits")
    replay = versions[-max(1, int(history_versions)):]
    parts = _partition_cols(src, src_fmt)

    # row identity survives a Delta<->Iceberg migration: replayed
    # snapshots carry the source's materialized/inherited _row_id,
    # and the destination enables tracking seeded with the source's
    # counter so its fresh ids never collide with carried ones
    counter = (
        _row_counter(src, src_fmt)
        if src_fmt != "hudi" and dst_format != "hudi" else None
    )
    snap_of = (
        (lambda v: _snapshot_with_row_ids(src, src_fmt, v))
        if counter is not None
        else (lambda v: _snapshot(src, src_fmt, v))
    )

    first = snap_of(replay[0])
    # _row_id is a HIDDEN materialized column in both destination
    # formats, never a schema column: the create derives the table
    # schema from a stripped frame, tracking enables seeded with the
    # source counter, and an overwrite re-materializes the first
    # state's ids (replays then carry theirs through the
    # lineage-aware write alignment)
    plain_first = first.drop("_row_id") if counter is not None else first
    if dst_format == "delta":
        dst = DeltaProtocolTable.create(
            spark, dst_path, plain_first,
            key=record_key, precombine=precombine,
            partition_by=parts or None,
        )
        if counter is not None:
            dst.enable_row_tracking(initial_hwm=counter - 1)
            dst.overwrite(first)
        for v in replay[1:]:
            dst.overwrite(snap_of(v))
    elif dst_format == "iceberg":
        dst = IcebergTable.create(
            spark, dst_path, plain_first, partition_by=parts or None
        )
        if counter is not None:
            dst.enable_row_lineage(initial_next_row_id=counter)
            dst.overwrite(first)
        for v in replay[1:]:
            dst.overwrite(snap_of(v))
    else:
        if len(parts) > 1:
            raise ValueError(
                "the hudi twin supports a single partition field; "
                f"source has {parts}"
            )
        dst = HudiTable.create(
            spark, dst_path,
            table_name or os.path.basename(dst_path.rstrip("/")),
            record_key=record_key, precombine=precombine,
            partition_field=parts[0] if parts else None,
            table_type=hudi_table_type,
        )
        dst.upsert(first)
        prev = first
        for v in replay[1:]:
            cur = _snapshot(src, src_fmt, v)
            # hudi has no overwrite: keys that VANISHED between the
            # source versions are deleted first (anti-join, semi-join
            # delete — never an isin literal list), then the version's
            # rows upsert. A Delta→Hudi migration of a table with a
            # mid-history delete therefore does not resurrect rows in
            # the replayed lineage. MERGE_ON_READ destinations make
            # both steps O(delta) log appends.
            vanished = (
                prev.select(record_key).distinct()
                .join(cur.select(record_key).distinct(),
                      record_key, "left_anti")
            )
            dst.delete_keys(vanished)  # no-op (no commit) when empty
            dst.upsert(cur)
            prev = cur
    return dst
