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
    DataSourceStreamReader,
    InputPartition,
)


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
        self.path = path
        self.schema = schema
        start = options.get("starting_version")
        self._initial = int(start) - 1 if start is not None else -1

    def initialOffset(self):
        return {"version": self._initial}

    def latestOffset(self):
        return {"version": max(_current_version(self.path),
                               self._initial)}

    def _seq_of(self, meta: dict, version: int) -> int:
        """last-sequence-number recorded at a metadata version; -1 for
        the pre-table offset."""
        if version < 0:
            return -1
        return _metadata(self.path, version)["last-sequence-number"]

    def partitions(self, start, end):
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
        for i in range(table.num_rows):
            yield tuple(
                pvals[name] if name in pvals else by_name[name][i]
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
