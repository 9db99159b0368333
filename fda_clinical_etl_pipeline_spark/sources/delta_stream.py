"""Streaming SOURCE over the Delta-protocol transaction log — the
table's commit feed as a first-class Structured Streaming input,
implemented with Spark 4's Python DataSource API
(pyspark.sql.datasource).

Offsets are LOG VERSIONS: ``latestOffset`` is one `os.listdir` of
`_delta_log` (no data IO), each micro-batch reads exactly the files
ADDED by commits in (start, end], and checkpoint recovery replays from
the committed version — exactly-once delivery of every appended row.
One input partition per added file, so read parallelism follows the
table's file layout.

Semantics match Delta's own streaming source for append-only tables:
every add action's rows are emitted once. Rewriting commits (upsert /
delete / OPTIMIZE) re-add files; with the default
``skip_data_change_false=true`` compaction rewrites (dataChange:false)
are skipped, and other rewrites emit the rewritten files' rows —
callers that need clean upsert semantics should dedup downstream with
``precombine_latest`` (the same contract as Delta's ignoreChanges).

Partitioned tables: data files do not store partition columns; the
reader re-injects them per file from the add action's partitionValues,
so streamed rows carry the full schema.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ._admission import AdmissionControl
from ._pyrows import ts_fixer
from ._pyarrow_compat import refuse_variant_columns as _refuse_variant

_LOG_DIR = "_delta_log"


def _log_versions(path: str) -> list[int]:
    log = os.path.join(path, _LOG_DIR)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(fn[:20])
        for fn in os.listdir(log)
        if fn.endswith(".json") and fn[:20].isdigit()
    )


def _commit_actions(path: str, version: int) -> list[dict]:
    fp = os.path.join(path, _LOG_DIR, f"{version:020d}.json")
    with open(fp) as f:
        return [json.loads(line) for line in f if line.strip()]


def _logical_to_physical(path: str) -> dict[str, str]:
    """Column-mapping translation for the file-level readers: logical
    name -> the physical name data files store ({} when mapping off).
    ``_change_type``/``_commit_version`` are reader-synthesized and
    never mapped."""
    meta = _last_metadata(path)
    if (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode"
    ) != "name":
        return {}
    fields = json.loads(meta["schemaString"])["fields"]
    return {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in fields
    }


def _table_schema(path: str) -> T.StructType:
    # LAST metaData wins — returning the first would serve a stale
    # schema for any evolved (merge_schema / rename / drop) table
    return T.StructType.fromJson(
        json.loads(_last_metadata(path)["schemaString"])
    )


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: T.StructType, options: dict):
        _refuse_variant(schema, type(self).__name__)
        self.path = path
        self.schema = schema
        self.skip_nochange = (
            str(options.get("skip_data_change_false", "true")).lower()
            != "false"
        )
        start = options.get("starting_version")
        self._initial = int(start) - 1 if start is not None else -1
        self.l2p = _logical_to_physical(path)
        self._adm = AdmissionControl(options, "version", self._initial)

    def initialOffset(self):
        return {"version": self._initial}

    def _files_of(self, v: int) -> int:
        return sum(
            1 for a in _commit_actions(self.path, v)
            if a.get("add") is not None
            and not (self.skip_nochange
                     and a["add"].get("dataChange") is False)
        )

    def latestOffset(self):
        versions = _log_versions(self.path)
        head = versions[-1] if versions else self._initial
        return {"version": self._adm.admit(
            head,
            lambda lo, hi: (v for v in versions if lo < v <= hi),
            self._files_of,
        )}

    def partitions(self, start, end):
        self._adm.note_seen(start, end)
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            for a in _commit_actions(self.path, v):
                add = a.get("add")
                if not add:
                    continue
                if self.skip_nochange and add.get("dataChange") is False:
                    continue
                parts.append(
                    InputPartition((
                        add["path"],
                        add.get("partitionValues") or {},
                        add.get("deletionVector"),
                    ))
                )
        if not parts:
            # Spark requires >= 1 partition per batch; an empty marker
            # partition yields no rows
            parts.append(InputPartition((None, {}, None)))
        return parts

    def read(self, partition):
        rel, pvals, dv = partition.value
        if rel is None:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(os.path.join(self.path, rel))
        if dv:
            # a DV re-add emits the file's LIVE rows only — streaming
            # the DV-dead positions would deliver deleted rows
            from .delta_dv import read_dv

            dead = set(read_dv(self.path, dv))
            table = table.take(
                [i for i in range(table.num_rows) if i not in dead]
            )
        cols = table.column_names
        pydata = [table.column(c).to_pylist() for c in cols]
        n = table.num_rows
        field_names = [
            self.l2p.get(f.name, f.name) for f in self.schema.fields
        ]  # physical lookups under column mapping
        fix = ts_fixer([  # keyed by the PHYSICAL name iterated below
            T.StructField(self.l2p.get(f.name, f.name), f.dataType)
            for f in self.schema.fields
        ])
        by_name = dict(zip(cols, pydata))
        for i in range(n):
            yield tuple(
                fix(name,
                    pvals[name] if name in pvals
                    else (by_name[name][i] if name in by_name else None))
                for name in field_names
            )

    def commit(self, end):
        pass


class DeltaStreamSource(DataSource):
    """``spark.readStream.format("delta_log_stream").option("path", p)``
    after ``spark.dataSource.register(DeltaStreamSource)``."""

    @classmethod
    def name(cls) -> str:
        return "delta_log_stream"

    def schema(self):
        return _table_schema(self.options["path"])

    def streamReader(self, schema):
        return _DeltaStreamReader(
            self.options["path"], _table_schema(self.options["path"]),
            dict(self.options),
        )


class _DeltaBatchReader(DataSourceReader):
    """Batch reader: one input partition per ACTIVE file at the
    requested version (default latest) — replayed from the log with
    remove actions honored, so a plain `spark.read` session sees
    exactly the committed snapshot (never vacuum-pending files)."""

    def __init__(self, path: str, schema: T.StructType, options: dict):
        _refuse_variant(schema, type(self).__name__)
        self.path = path
        self.schema = schema
        self.l2p = _logical_to_physical(path)
        self.version = (
            int(options["version_as_of"])
            if options.get("version_as_of") is not None
            else None
        )

    def partitions(self):
        versions = _log_versions(self.path)
        if not versions:
            raise ValueError(f"no delta table at {self.path}")
        upto = versions[-1] if self.version is None else self.version
        active: dict[str, dict] = {}
        for v in versions:
            if v > upto:
                break
            for a in _commit_actions(self.path, v):
                if "add" in a:
                    active[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    active.pop(a["remove"]["path"], None)
        return [
            InputPartition((
                rel,
                add.get("partitionValues") or {},
                add.get("deletionVector"),
            ))
            for rel, add in sorted(active.items())
        ] or [InputPartition((None, {}, None))]

    def read(self, partition):
        rel, pvals, dv = partition.value
        if rel is None:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(os.path.join(self.path, rel))
        if dv:  # merge-on-read: mask DV-dead row positions
            from .delta_dv import read_dv

            dead = set(read_dv(self.path, dv))
            table = table.take(
                [i for i in range(table.num_rows) if i not in dead]
            )
        by_name = {
            c: table.column(c).to_pylist() for c in table.column_names
        }
        field_names = [
            self.l2p.get(f.name, f.name) for f in self.schema.fields
        ]
        fix = ts_fixer([
            T.StructField(self.l2p.get(f.name, f.name), f.dataType)
            for f in self.schema.fields
        ])
        for i in range(table.num_rows):
            # files written before a schema evolution lack the column
            yield tuple(
                fix(name,
                    pvals[name] if name in pvals
                    else (by_name[name][i] if name in by_name else None))
                for name in field_names
            )


class DeltaBatchSource(DataSource):
    """``spark.read.format("delta_log").option("path", p)`` (optionally
    ``.option("version_as_of", n)`` for time travel) after
    ``spark.dataSource.register(DeltaBatchSource)`` — how a VANILLA
    Spark session reads the table without this package's API."""

    @classmethod
    def name(cls) -> str:
        return "delta_log"

    def schema(self):
        return _table_schema(self.options["path"])

    def reader(self, schema):
        return _DeltaBatchReader(
            self.options["path"], _table_schema(self.options["path"]),
            dict(self.options),
        )


# ------------------------------------------------ change data feed
def _last_metadata(path: str) -> dict:
    meta: dict = {}
    for v in _log_versions(path):
        for a in _commit_actions(path, v):
            if "metaData" in a:
                meta = a["metaData"]
    if not meta:
        raise ValueError(f"no delta table metaData under {path}")
    return meta


class _DeltaCdfStreamReader(DataSourceStreamReader):
    """Streams the table's Change Data Feed: each micro-batch emits the
    row-level changes of commits in (start, end] — cdc change files
    when the commit recorded them, derived inserts/deletes for pure
    dataChange add/remove commits, nothing for dataChange:false
    rewrites. A rewriting commit without cdc actions fails the batch at
    PLANNING time (the same refusal as table_changes) instead of
    emitting fabricated rows."""

    def __init__(self, path: str, schema: T.StructType, options: dict):
        _refuse_variant(schema, type(self).__name__)
        self.path = path
        self.schema = schema
        conf = _last_metadata(path).get("configuration") or {}
        if conf.get("delta.enableChangeDataFeed") != "true":
            raise ValueError(
                "change data feed is not enabled on this table "
                "(create with enable_cdf=True)"
            )
        start = options.get("starting_version")
        self._initial = int(start) - 1 if start is not None else -1
        self.l2p = _logical_to_physical(path)
        self._adm = AdmissionControl(options, "version", self._initial)

    def initialOffset(self):
        return {"version": self._initial}

    def _files_of(self, v: int) -> int:
        """Change files this commit contributes to a batch: cdc
        actions when recorded, else dataChange adds + removes."""
        actions = _commit_actions(self.path, v)
        cdc = sum(1 for a in actions if "cdc" in a)
        if cdc:
            return cdc
        return sum(
            1 for a in actions
            for k in ("add", "remove")
            if k in a and a[k].get("dataChange", True)
        )

    def latestOffset(self):
        versions = _log_versions(self.path)
        head = versions[-1] if versions else self._initial
        return {"version": self._adm.admit(
            head,
            lambda lo, hi: (v for v in versions if lo < v <= hi),
            self._files_of,
        )}

    def partitions(self, start, end):
        self._adm.note_seen(start, end)
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            actions = _commit_actions(self.path, v)
            cdc = [a["cdc"] for a in actions if "cdc" in a]
            adds = [a["add"] for a in actions if "add" in a
                    and a["add"].get("dataChange", True)]
            removes = [a["remove"] for a in actions if "remove" in a
                       and a["remove"].get("dataChange", True)]
            if cdc:
                parts += [
                    InputPartition((c["path"], {}, "cdc", v))
                    for c in cdc
                ]
            elif adds and removes:
                raise ValueError(
                    f"version {v} rewrote files without recording "
                    "change data (cdc actions)"
                )
            elif adds:
                parts += [
                    InputPartition(
                        (a["path"], a.get("partitionValues") or {},
                         "insert", v)
                    )
                    for a in adds
                ]
            elif removes:
                parts += [
                    InputPartition((r["path"], {}, "delete", v))
                    for r in removes
                ]
        if not parts:
            parts.append(InputPartition((None, {}, "", -1)))
        return parts

    def read(self, partition):
        rel, pvals, kind, version = partition.value
        if rel is None:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(os.path.join(self.path, rel))
        cols = table.column_names
        by_name = {c: table.column(c).to_pylist() for c in cols}
        n = table.num_rows
        field_names = [f.name for f in self.schema.fields]
        fix = ts_fixer(self.schema.fields)
        for i in range(n):
            out = []
            for name in field_names:
                phys = self.l2p.get(name, name)
                if name == "_commit_version":
                    out.append(version)
                elif name == "_change_type":
                    out.append(
                        by_name[name][i] if kind == "cdc" else kind
                    )
                elif phys in pvals:
                    out.append(fix(name, pvals[phys]))
                else:
                    out.append(fix(
                        name,
                        by_name[phys][i] if phys in by_name else None,
                    ))
            yield tuple(out)

    def commit(self, end):
        pass


class DeltaCdfStreamSource(DataSource):
    """``spark.readStream.format("delta_cdf_stream").option("path", p)``
    after ``spark.dataSource.register(DeltaCdfStreamSource)`` — the
    streaming twin of ``DeltaProtocolTable.table_changes``."""

    @classmethod
    def name(cls) -> str:
        return "delta_cdf_stream"

    def _schema(self) -> T.StructType:
        base = _table_schema(self.options["path"])
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )

    def schema(self):
        return self._schema()

    def streamReader(self, schema):
        return _DeltaCdfStreamReader(
            self.options["path"], self._schema(), dict(self.options)
        )
