"""Streaming SOURCE over the Iceberg metadata tree — the append feed
of an Iceberg table as a Structured Streaming input (Spark 4 Python
DataSource API), the twin of ``delta_stream`` for the second open
table format.

Offsets are METADATA VERSIONS (the HadoopTables ``version-hint`` /
``vN.metadata.json`` sequence): ``latestOffset`` is one small JSON
read, each micro-batch emits exactly the rows of data files whose
``sequence_number`` falls in the offset range — resolved from the end
version's manifest tree, zero data IO at planning beyond the
manifests. Non-append snapshots inside a batch's range fail the batch
at planning time (the same refusal as ``IcebergTable.
incremental_scan`` and the reference Iceberg incremental reader —
their row-level changes are not representable as appends).

Partitioned tables: data files do not store identity-partition
columns; the reader re-injects them per file from the manifest
entry's typed partition struct, so streamed rows carry the full
schema. One input partition per data file — read parallelism follows
the table's file layout, exactly as in the Delta twin.
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


def _current_version(path: str) -> int:
    hint = os.path.join(path, "metadata", "version-hint.text")
    if not os.path.isfile(hint):
        return -1
    return int(open(hint).read().strip())


def _metadata(path: str, version: int) -> dict:
    fp = os.path.join(path, "metadata", f"v{version}.metadata.json")
    with open(fp) as f:
        return json.load(f)


def _spark_schema(meta: dict) -> T.StructType:
    from .iceberg import _ICEBERG_TYPES

    inv = {v: k for k, v in _ICEBERG_TYPES.items()}
    return T.StructType([
        T.StructField(f["name"], inv[f["type"]]())
        for f in meta["schemas"][meta["current-schema-id"]]["fields"]
    ])


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: T.StructType, options: dict):
        _refuse_variant(schema, type(self).__name__)
        self.path = path
        self.schema = schema
        start = options.get("starting_version")
        self._initial = int(start) - 1 if start is not None else -1
        self._adm = AdmissionControl(options, "version", self._initial)

    def initialOffset(self):
        return {"version": self._initial}

    def _files_of(self, v: int) -> int:
        """Data files the step to metadata version ``v`` added —
        manifest-list ``added_files_count`` only, no manifest reads."""
        from .avro_ocf import decode_ocf

        meta = _metadata(self.path, v)
        from_seq = (
            _metadata(self.path, v - 1)["last-sequence-number"]
            if v > 0 else -1
        )
        to_seq = meta["last-sequence-number"]
        sid = meta.get("current-snapshot-id")
        if sid is None or sid == -1:
            return 0
        snap = next(
            (s for s in meta["snapshots"]
             if s["snapshot-id"] == sid), None
        )
        if snap is None:
            return 0
        _, manifests = decode_ocf(
            open(snap["manifest-list"], "rb").read()
        )
        return sum(
            m["added_files_count"] for m in manifests
            if m.get("content", 0) == 0
            and from_seq < m["sequence_number"] <= to_seq
        )

    def latestOffset(self):
        head = max(_current_version(self.path), self._initial)
        return {"version": self._adm.admit(
            head, lambda lo, hi: range(lo + 1, hi + 1), self._files_of
        )}

    def _seq_of(self, meta: dict, version: int) -> int:
        """last-sequence-number recorded at a metadata version; -1 for
        the pre-table offset."""
        if version < 0:
            return -1
        return _metadata(self.path, version)["last-sequence-number"]

    def partitions(self, start, end):
        self._adm.note_seen(start, end)
        parts: list[InputPartition] = []
        if end["version"] > start["version"] and end["version"] >= 0:
            from .avro_ocf import decode_ocf

            meta = _metadata(self.path, end["version"])
            from_seq = self._seq_of(meta, start["version"])
            to_seq = meta["last-sequence-number"]
            non_append = [
                s["snapshot-id"] for s in meta["snapshots"]
                if from_seq < s["sequence-number"] <= to_seq
                and s["summary"]["operation"] != "append"
            ]
            if non_append:
                raise ValueError(
                    f"snapshots {non_append} in the streamed range "
                    "are not appends; the Iceberg stream source only "
                    "supports append history"
                )
            sid = meta.get("current-snapshot-id")
            if sid is not None and sid != -1:
                snap = next(
                    s for s in meta["snapshots"]
                    if s["snapshot-id"] == sid
                )
                _, manifests = decode_ocf(
                    open(snap["manifest-list"], "rb").read()
                )
                for m in manifests:
                    if m.get("content", 0) != 0:
                        continue  # delete manifests are not appends
                    _, entries = decode_ocf(
                        open(m["manifest_path"], "rb").read()
                    )
                    for e in entries:
                        if e["status"] == 2:  # DELETED
                            continue
                        seq = e["sequence_number"] or 0
                        if from_seq < seq <= to_seq:
                            parts.append(InputPartition((
                                e["data_file"]["file_path"],
                                e["data_file"].get("partition") or {},
                            )))
        if not parts:
            parts.append(InputPartition((None, {})))
        return parts

    def read(self, partition):
        fp, pvals = partition.value
        if fp is None:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(fp)
        by_name = {c: table.column(c).to_pylist()
                   for c in table.column_names}
        field_names = [f.name for f in self.schema.fields]
        fix = ts_fixer(self.schema.fields)
        for i in range(table.num_rows):
            yield tuple(
                fix(name,
                    pvals[name] if name in pvals else by_name[name][i])
                for name in field_names
            )

    def commit(self, end):
        pass


class IcebergStreamSource(DataSource):
    """``spark.readStream.format("iceberg_append_stream")
    .option("path", p)`` after
    ``spark.dataSource.register(IcebergStreamSource)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_append_stream"

    def _schema(self) -> T.StructType:
        v = _current_version(self.options["path"])
        if v < 0:
            raise ValueError(
                f"no iceberg table at {self.options['path']}"
            )
        return _spark_schema(_metadata(self.options["path"], v))

    def schema(self):
        return self._schema()

    def streamReader(self, schema):
        return _IcebergStreamReader(
            self.options["path"], self._schema(), dict(self.options)
        )


# ----------------------------------------------------- batch source
class _IcebergBatchReader(DataSourceReader):
    """Batch reader: one input partition per live data file of the
    requested snapshot, planned from the manifest tree only. Position
    deletes (v2 merge-on-read) are applied worker-side: every
    partition carries the snapshot's delete-file list and masks its
    own rows by (file_path, pos) — the reserved-field-id columns those
    files store."""

    def __init__(self, path: str, schema: T.StructType, options: dict):
        _refuse_variant(schema, type(self).__name__)
        self.path = path
        self.schema = schema
        self.options = options

    def _resolve_snapshot(self) -> tuple[dict, dict]:
        """(metadata, snapshot) honoring version_as_of (metadata file
        version), snapshot_id, or timestamp_ms time travel."""
        v_opt = self.options.get("version_as_of")
        v = (
            int(v_opt) if v_opt is not None
            else _current_version(self.path)
        )
        if v < 0:
            raise ValueError(f"no iceberg table at {self.path}")
        meta = _metadata(self.path, v)
        snaps = meta.get("snapshots", [])
        sid_opt = self.options.get("snapshot_id")
        ts_opt = self.options.get("timestamp_ms")
        if sid_opt is not None:
            sid = int(sid_opt)
            snap = next(
                (s for s in snaps if s["snapshot-id"] == sid), None
            )
            if snap is None:
                raise ValueError(f"unknown snapshot {sid}")
        elif ts_opt is not None:
            cut = int(ts_opt)
            eligible = [
                s for s in snaps if s["timestamp-ms"] <= cut
            ]
            if not eligible:
                raise ValueError(
                    "no snapshot at or before that timestamp"
                )
            snap = max(eligible, key=lambda s: s["timestamp-ms"])
        else:
            sid = meta.get("current-snapshot-id")
            if sid is None or sid == -1:
                return meta, {}
            snap = next(
                s for s in snaps if s["snapshot-id"] == sid
            )
        return meta, snap

    def partitions(self):
        from .avro_ocf import decode_ocf

        _meta, snap = self._resolve_snapshot()
        if not snap:
            return [InputPartition((None, {}, []))]
        _, manifests = decode_ocf(
            open(snap["manifest-list"], "rb").read()
        )
        data_parts, delete_paths, eq_deletes = [], [], []
        for m in manifests:
            _, entries = decode_ocf(
                open(m["manifest_path"], "rb").read()
            )
            for e in entries:
                if e["status"] == 2:  # DELETED
                    continue
                d = e["data_file"]
                if m.get("content", 0) == 1:
                    if d.get("content") == 2:
                        # equality delete: applies to data files with
                        # STRICTLY smaller sequence number
                        eq_deletes.append((
                            d["file_path"],
                            e.get("sequence_number") or 0,
                            list(d.get("equality_ids") or []),
                        ))
                    else:
                        delete_paths.append(d["file_path"])
                else:
                    data_parts.append((
                        d["file_path"],
                        d.get("partition") or {},
                        e.get("sequence_number") or 0,
                    ))
        return [
            InputPartition(
                (fp, pvals, dseq, sorted(delete_paths),
                 sorted(eq_deletes))
            )
            for fp, pvals, dseq in sorted(data_parts)
        ] or [InputPartition((None, {}, 0, [], []))]

    def read(self, partition):
        fp, pvals, dseq, delete_paths, eq_deletes = partition.value
        if fp is None:
            return
        import pyarrow.parquet as pq

        def _ids_of(schema):
            out = {}
            for fld in schema:
                md = fld.metadata or {}
                fid = md.get(b"PARQUET:field_id")
                if fid is not None:
                    out[int(fid)] = fld.name
            return out

        table = pq.read_table(fp)
        dead: set[int] = set()
        for dp in delete_paths:
            # file_path is the leading sort column, so row-group
            # stats prune delete files that never mention this file
            dt = pq.read_table(
                dp, filters=[("file_path", "=", fp)]
            )
            dead.update(dt.column("pos").to_pylist())
        if dead:
            table = table.take(
                [i for i in range(table.num_rows) if i not in dead]
            )
        applicable = [
            (dp, ids) for dp, s, ids in eq_deletes if s > dseq
        ]
        if applicable and table.num_rows:
            data_ids = _ids_of(table.schema)
            for dp, ids in applicable:
                dt = pq.read_table(dp)
                del_ids = _ids_of(dt.schema)
                dcols = [
                    dt.column(del_ids[i]).to_pylist() for i in ids
                ]
                doomed = set(zip(*dcols)) if dcols else set()
                cols = []
                for i in ids:
                    name = data_ids.get(i)
                    cols.append(
                        table.column(name).to_pylist()
                        if name in table.column_names
                        else [None] * table.num_rows
                    )
                keep = [
                    j for j, tup in enumerate(zip(*cols))
                    if tup not in doomed
                ]
                if len(keep) != table.num_rows:
                    table = table.take(keep)
        # resolve by parquet field id first (spec rule: names may have
        # been renamed since this file was written), then by name
        file_by_id = {}
        for idx, fld in enumerate(table.schema):
            md = fld.metadata or {}
            fid = md.get(b"PARQUET:field_id")
            if fid is not None:
                file_by_id[int(fid)] = fld.name
        meta = _metadata(self.path, _current_version(self.path))
        want_ids = {
            f["name"]: f["id"]
            for f in meta["schemas"][meta["current-schema-id"]]
            ["fields"]
        }
        by_name = {c: table.column(c).to_pylist()
                   for c in table.column_names}
        n = table.num_rows
        field_names = [f.name for f in self.schema.fields]
        resolved = {
            name: file_by_id.get(want_ids.get(name), name)
            for name in field_names
        }
        fix = ts_fixer(self.schema.fields)
        for i in range(n):
            yield tuple(
                fix(name,
                    pvals[name] if name in pvals
                    else (
                        by_name[resolved[name]][i]
                        if resolved[name] in by_name else None
                    ))
                for name in field_names
            )


class IcebergBatchSource(DataSource):
    """``spark.read.format("iceberg_log").option("path", p)`` —
    optionally ``.option("snapshot_id", sid)``,
    ``.option("timestamp_ms", ms)`` or ``.option("version_as_of",
    metadata_version)`` for time travel — after
    ``spark.dataSource.register(IcebergBatchSource)``: how a VANILLA
    Spark session reads the table (merge-on-read deletes included)
    without this package's API, the twin of ``DeltaBatchSource``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_log"

    def _schema(self) -> T.StructType:
        v_opt = self.options.get("version_as_of")
        v = (
            int(v_opt) if v_opt is not None
            else _current_version(self.options["path"])
        )
        if v < 0:
            raise ValueError(
                f"no iceberg table at {self.options['path']}"
            )
        return _spark_schema(_metadata(self.options["path"], v))

    def schema(self):
        return self._schema()

    def reader(self, schema):
        return _IcebergBatchReader(
            self.options["path"], self._schema(), dict(self.options)
        )
