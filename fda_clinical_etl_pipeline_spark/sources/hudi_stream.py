"""Streaming SOURCE over the Hudi timeline — the incremental feed of
a ``.hoodie`` table as a Structured Streaming input (Spark 4 Python
DataSource API), completing the trio next to ``delta_stream`` and
``iceberg_stream``.

Offsets are COMPLETED INSTANTS (``yyyyMMddHHmmssSSS`` strings — their
lexicographic order IS the timeline order): ``latestOffset`` is one
directory listing, and each micro-batch emits exactly the rows
WRITTEN in the instant range — Hudi's own incremental-query
semantics (``hoodie.datasource.query.type=incremental`` filters
``_hoodie_commit_time`` into (begin, end]), resolved here purely from
timeline commit metadata:

- a COW commit's base files hold carried rows alongside fresh ones;
  the reader filters ``_hoodie_commit_time == instant`` so only the
  rows that instant actually wrote stream out (a parquet predicate —
  carried rows' pages can be skipped via column statistics);
- a MOR deltacommit's updates are Avro log blocks, all stamped with
  the writing instant — parsed per file;
- compaction COMMITs and clustering REPLACECOMMITs rewrite files but
  stamp no new commit times, so they naturally emit nothing;
- DELETE instants (COW rewrites / MOR tombstone blocks) write no rows
  with fresh commit times either — like Hudi's incremental reader,
  deletes are NOT surfaced as retractions; downstream state that must
  observe deletes belongs on the CDF-style Delta source instead.

One input partition per (file, instant) — read parallelism follows
the write layout. ``.option("starting_instant", t)`` begins the feed
at instants > t (exclusive, matching Hudi's
``hoodie.datasource.read.begin.instanttime``).
"""

from __future__ import annotations

import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ._admission import AdmissionControl
from ._pyrows import ts_fixer

from . import hudi_log
from ._pyarrow_compat import refuse_variant_columns as _refuse_variant


def _sparkless(path: str):
    from .hudi_table import HudiTable

    t = HudiTable.__new__(HudiTable)
    t.spark = None
    t.path = path
    t.hoodie_dir = os.path.join(path, ".hoodie")
    return t


class _HudiStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: T.StructType, options: dict):
        _refuse_variant(schema, type(self).__name__)
        self.path = path
        self.schema = schema
        self._initial = options.get("starting_instant", "")
        self._adm = AdmissionControl(options, "instant", self._initial)

    def initialOffset(self):
        return {"instant": self._initial}

    def _files_of(self, inst: str) -> int:
        t = _sparkless(self.path)
        meta = t._any_commit_metadata(inst)
        return sum(
            len(sts)
            for sts in meta.get("partitionToWriteStats", {}).values()
        )

    def latestOffset(self):
        t = _sparkless(self.path)
        done = t.commits()
        head = max(done[-1] if done else "", self._initial)
        return {"instant": self._adm.admit(
            head,
            # archived instants still count toward the window — a
            # cold start's backlog may reach past the archive boundary
            lambda lo, hi: (i for i, _a in t._timeline_from(lo, hi)),
            self._files_of,
        )}

    def partitions(self, start, end):
        self._adm.note_seen(start, end)
        lo, hi = start["instant"], end["instant"]
        parts: list[InputPartition] = []
        if hi > lo:
            t = _sparkless(self.path)
            # archived instants still stream: a fresh consumer's first
            # batch may reach past the archive boundary, where the
            # timeline entries live in the archive OCFs (base files
            # themselves are never archived) — _timeline_from merges
            # them in and skips the archive read when lo is beyond
            # every batch boundary
            for inst, action in t._timeline_from(lo, hi):
                if action == "replacecommit":
                    continue  # clustering: no new rows
                meta = t._any_commit_metadata(inst)
                for pp, stats in meta.get(
                    "partitionToWriteStats", {}
                ).items():
                    for s in stats:
                        kind = ("log" if ".log." in s["path"]
                                else "base")
                        parts.append(InputPartition((
                            os.path.join(self.path, s["path"]),
                            inst,
                            kind,
                            pp,
                        )))
        if not parts:
            parts.append(InputPartition((None, None, None, None)))
        return parts

    def read(self, partition):
        fp, inst, kind, _pp = partition.value
        if fp is None:
            return
        names = [f.name for f in self.schema.fields]
        fix = ts_fixer(self.schema.fields)
        if kind == "base":
            import pyarrow.parquet as pq

            # only the rows this instant wrote — carried rows keep
            # their original commit time and are filtered at the
            # parquet layer (row-group stats prune all-carried pages)
            table = pq.read_table(
                fp, filters=[("_hoodie_commit_time", "==", inst)]
            )
            by_name = {c: table.column(c).to_pylist()
                       for c in table.column_names}
            for i in range(table.num_rows):
                yield tuple(
                    fix(name,
                        by_name[name][i] if name in by_name else None)
                    for name in names
                )
        else:
            for blk in hudi_log.read_log_file(fp):
                if blk["type"] != "data":
                    continue  # tombstones: not surfaced (see module doc)
                for rec in blk["records"]:
                    if rec.get("_hoodie_commit_time") != inst:
                        continue
                    yield tuple(
                        fix(name, rec.get(name)) for name in names
                    )

    def commit(self, end):
        pass


class HudiStreamSource(DataSource):
    """``spark.readStream.format("hudi_append_stream")
    .option("path", p)`` after
    ``spark.dataSource.register(HudiStreamSource)`` — optionally
    ``.option("starting_instant", t)`` (exclusive)."""

    @classmethod
    def name(cls) -> str:
        return "hudi_append_stream"

    def _schema(self) -> T.StructType:
        t = _sparkless(self.options["path"])
        if not t.commits():
            raise ValueError(
                f"no completed hudi commits at {self.options['path']}"
            )
        return t._schema()

    def schema(self):
        return self._schema()

    def streamReader(self, schema):
        return _HudiStreamReader(
            self.options["path"], self._schema(), dict(self.options)
        )
