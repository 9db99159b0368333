"""Metadata-only aggregates: COUNT / MIN / MAX / null-count answered
from table-format STATISTICS, with zero data-file reads and zero
Spark jobs.

The 100 TB shape: ``SELECT count(*), min(c), max(c) FROM t`` against
a lakehouse table does not need to touch a single parquet file — the
commit log (Delta ``stats`` JSON), the manifests (Iceberg
``record_count`` / ``lower_bounds`` / ``upper_bounds``) and the
timeline (Hudi per-file write stats) already hold exact per-file
aggregates, and folding them is O(files) driver work. Real engines
ship the same optimization (Spark's OptimizeMetadataOnlyQuery,
Delta's metadata-only COUNT(*), Trino/DataFusion stats-based
aggregate pushdown). The reference engine has no analog — it counts
by scanning (etl/validate.py) — so this is the Spark-posture
generalization of its row-count bookkeeping.

EXACTNESS is the contract: every answer either equals what a full
scan would return or the call raises ``MetadataOnlyUnavailable`` with
the reason — bounds are never silently widened. The refusal cases:

- Delta: a file-level deletion vector makes data-column min/max and
  null counts inexact (the DV may have killed the extreme row), so
  those refuse; ``row_count`` (numRecords − DV cardinality) and
  PARTITION-column stats (constant per file) stay exact under DVs.
  Files missing ``stats``, columns beyond the stats width, or NaN
  bounds (dropped by the writer, spec-style) also refuse.
- Iceberg: equality deletes refuse everything (matched-row count is
  unknowable from metadata); position deletes / v3 DVs keep
  ``row_count`` exact (their ``record_count`` is the dead-position
  cardinality, deduplicated by this writer) but refuse min/max.
  The twin's manifests record no ``null_value_counts``, so Iceberg
  null counts are never offered.
- Hudi: unmerged MERGE_ON_READ log files refuse (log rows replace or
  tombstone base rows under the precombine fold); COW tables and
  compacted MOR slices answer ``row_count`` and record-key min/max
  from the timeline's write stats.
"""

from __future__ import annotations

import datetime
import struct

__all__ = [
    "MetadataOnlyUnavailable",
    "delta_metadata_aggregate",
    "iceberg_metadata_aggregate",
    "hudi_metadata_aggregate",
]


class MetadataOnlyUnavailable(ValueError):
    """The table's metadata cannot answer this aggregate EXACTLY."""


# ---------------------------------------------------------- Delta


def _delta_decode(v, dt):
    """Decode a stats-JSON bound (or hive partitionValues string) to
    a typed Python value by Spark schema type name."""
    if v is None:
        return None
    t = dt.typeName()
    if t in ("integer", "long", "short", "byte"):
        return int(v)
    if t in ("double", "float"):
        return float(v)
    if t == "date":
        return (v if isinstance(v, datetime.date)
                else datetime.date.fromisoformat(str(v)))
    if t == "timestamp":
        if isinstance(v, datetime.datetime):
            return v
        return datetime.datetime.fromisoformat(str(v))
    if t == "boolean":
        return v if isinstance(v, bool) else str(v) == "true"
    if t == "string":
        return str(v)
    raise MetadataOnlyUnavailable(
        f"unsupported type {t!r} for metadata-only min/max"
    )


def delta_metadata_aggregate(
    table, cols: list[str] | None = None, version: int | None = None
) -> dict:
    """``{"row_count": n, "columns": {c: {"min", "max",
    "null_count"}}}`` from the commit log alone. ``cols`` defaults to
    every schema column; any column the stats cannot answer exactly
    raises. Zero Spark jobs, zero data-file reads, O(files) driver
    work."""
    import json as _json

    from pyspark.sql import types as T

    v = table.latest_version() if version is None else version
    meta, active = table._replay(v)
    schema = T.StructType.fromJson(_json.loads(meta["schemaString"]))
    by_name = {f.name: f for f in schema.fields}
    pcols = set(meta.get("partitionColumns") or [])
    phys = table._phys_map(meta) or {}
    if cols is None:
        cols = [f.name for f in schema.fields]
    unknown = [c for c in cols if c not in by_name]
    if unknown:
        raise MetadataOnlyUnavailable(f"no such columns {unknown}")

    row_count = 0
    acc: dict[str, dict] = {
        c: {"min": None, "max": None, "null_count": 0} for c in cols
    }

    def fold(a: dict, lo, hi) -> None:
        if a["min"] is None or lo < a["min"]:
            a["min"] = lo
        if a["max"] is None or hi > a["max"]:
            a["max"] = hi

    for rel, add in active.items():
        st = table._file_stats(add)
        if not st or "numRecords" not in st:
            raise MetadataOnlyUnavailable(
                f"file {rel!r} carries no stats"
            )
        n = int(st["numRecords"])
        dvd = add.get("deletionVector") or {}
        dv_card = int(dvd.get("cardinality", 0)) if dvd else 0
        live = n - dv_card
        row_count += live
        for c in cols:
            a = acc[c]
            if c in pcols:
                # constant per file: exact even under DVs
                raw = (add.get("partitionValues") or {}).get(c)
                if raw is None:
                    a["null_count"] += live
                elif live > 0:
                    val = _delta_decode(raw, by_name[c].dataType)
                    fold(a, val, val)
                continue
            if dv_card:
                raise MetadataOnlyUnavailable(
                    f"file {rel!r} has a deletion vector: data-column "
                    f"{c!r} stats are no longer exact (row_count and "
                    "partition columns remain available)"
                )
            pc = phys.get(c, c)
            nc = st.get("nullCount", {}).get(pc)
            if nc is None:
                raise MetadataOnlyUnavailable(
                    f"column {c!r} outside the stats columns of file "
                    f"{rel!r}"
                )
            a["null_count"] += int(nc)
            if int(nc) < n:
                mn = st.get("minValues", {}).get(pc)
                mx = st.get("maxValues", {}).get(pc)
                if mn is None or mx is None:
                    raise MetadataOnlyUnavailable(
                        f"column {c!r} lacks a bound in file {rel!r} "
                        "(NaN or unrecorded)"
                    )
                fold(a, _delta_decode(mn, by_name[c].dataType),
                     _delta_decode(mx, by_name[c].dataType))
    return {"row_count": row_count, "columns": acc}


# -------------------------------------------------------- Iceberg


def _ice_bound(raw: bytes, ice_type: str):
    """Single-value deserialization incl. the temporal types the
    shared ``_bound_value`` leaves to its callers."""
    from ..sources.iceberg import _bound_value

    if ice_type == "date":
        days = int.from_bytes(raw, "little", signed=True)
        return datetime.date(1970, 1, 1) + datetime.timedelta(days)
    if ice_type in ("timestamp", "timestamptz"):
        us = struct.unpack("<q", raw)[0]
        return (datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=us))
    if ice_type == "boolean":
        return raw != b"\x00"
    v = _bound_value(raw, ice_type)
    if v is None:
        raise MetadataOnlyUnavailable(
            f"cannot decode bounds of type {ice_type!r}"
        )
    return v


def iceberg_metadata_aggregate(
    table, cols: list[str] | None = None,
    snapshot_id: int | None = None,
) -> dict:
    """``{"row_count": n, "columns": {c: {"min", "max"}}}`` from the
    manifests alone (the twin records no null_value_counts, so null
    counts are not offered). Position deletes / DVs keep row_count
    exact; any delete refuses min/max; equality deletes refuse
    everything."""
    meta = table.metadata()
    sid = (meta.get("current-snapshot-id") if snapshot_id is None
           else snapshot_id)
    snap = next(
        (s for s in meta.get("snapshots", [])
         if s["snapshot-id"] == sid), None,
    )
    if snap is None:
        raise MetadataOnlyUnavailable(f"no snapshot {sid}")
    data = table._entries_of_snapshot(snap, content=0)
    dels = table._entries_of_snapshot(snap, content=1)
    if any(e["data_file"].get("content") == 2 for e in dels):
        raise MetadataOnlyUnavailable(
            "equality deletes present: matched-row count is not "
            "derivable from metadata"
        )
    row_count = (
        sum(int(e["data_file"]["record_count"]) for e in data)
        - sum(int(e["data_file"]["record_count"]) for e in dels)
    )

    fields = meta["schemas"][meta["current-schema-id"]]["fields"]
    by_name = {f["name"]: f for f in fields}
    if cols is None:
        cols = [f["name"] for f in fields]
    unknown = [c for c in cols if c not in by_name]
    if unknown:
        raise MetadataOnlyUnavailable(f"no such columns {unknown}")
    acc: dict[str, dict] = {}
    if cols and dels:
        raise MetadataOnlyUnavailable(
            "position deletes present: min/max bounds are no longer "
            "exact (row_count remains available via cols=[])"
        )
    for c in cols:
        fid = by_name[c]["id"]
        ice_t = by_name[c]["type"]
        a = {"min": None, "max": None}
        for e in data:
            df_ = e["data_file"]
            lo_raw = next(
                (b["value"] for b in (df_.get("lower_bounds") or [])
                 if b["key"] == fid), None,
            )
            hi_raw = next(
                (b["value"] for b in (df_.get("upper_bounds") or [])
                 if b["key"] == fid), None,
            )
            if lo_raw is not None and hi_raw is not None:
                lo = _ice_bound(lo_raw, ice_t)
                hi = _ice_bound(hi_raw, ice_t)
            elif c in (df_.get("partition") or {}):
                pv = df_["partition"][c]
                if pv is None:
                    continue
                lo = hi = pv
            else:
                # this writer records bounds for every non-null,
                # non-binary column: absent means all-NULL here
                continue
            if a["min"] is None or lo < a["min"]:
                a["min"] = lo
            if a["max"] is None or hi > a["max"]:
                a["max"] = hi
        acc[c] = a
    return {"row_count": row_count, "columns": acc}


# ----------------------------------------------------------- Hudi


def hudi_metadata_aggregate(
    table, as_of_instant: str | None = None
) -> dict:
    """``{"row_count": n, "record_key": {"min", "max"}}`` from the
    timeline's per-file write stats (numWrites / minRecordKey /
    maxRecordKey — what real Hudi's metadata-table COLUMN_STATS
    partition serves). Record keys are strings by table contract.
    Unmerged MOR log files refuse."""
    slices = table.file_slices(as_of_instant)
    row_count = 0
    mn = mx = None
    for (pp, fid), s in slices.items():
        if s.get("_logs"):
            raise MetadataOnlyUnavailable(
                f"file group {fid!r} has unmerged log files: rows "
                "replace or tombstone under the precombine fold; "
                "compact first"
            )
        if s.get("numWrites") is None:
            raise MetadataOnlyUnavailable(
                f"file group {fid!r} write stat lacks numWrites"
            )
        row_count += int(s["numWrites"])
        lo, hi = s.get("minRecordKey"), s.get("maxRecordKey")
        if int(s["numWrites"]) > 0 and (lo is None or hi is None):
            raise MetadataOnlyUnavailable(
                f"file group {fid!r} write stat lacks key bounds"
            )
        if lo is not None and (mn is None or lo < mn):
            mn = lo
        if hi is not None and (mx is None or hi > mx):
            mx = hi
    return {
        "row_count": row_count,
        "record_key": {"min": mn, "max": mx},
    }
