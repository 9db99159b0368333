"""Streaming CHANGELOG over the Hudi timeline — row-level
insert/delete churn as a Structured Streaming input, completing the
three-format CDC streaming story next to ``delta_cdf_stream`` and
``iceberg_changelog_stream`` (batch twin:
``HudiTable.changelog``; same derivation, same rows).

Offsets are COMPLETED INSTANTS (like ``hudi_append_stream``). Each
micro-batch emits, per data instant c in the range (COMPACT /
CLUSTER / replacecommit are data-identical and emit nothing):

- ``insert`` images: rows stamped ``_hoodie_commit_time == c`` in
  the as-of-c merged view of the file groups c's commit metadata
  names (fresh inserts + update post-images);
- ``delete`` images: the as-of-previous-instant versions of keys
  re-written at c and keys vanished from those groups.

Planning is metadata-only (commit JSON + file-slice resolution, all
sparkless); reading is one pure-Python partition per touched file
group per instant — the slice merge is the SHARED
``hudi_log.merge_slice_rows`` fold, so snapshot, external batch
reads and this feed agree by construction. Reads are bounded to the
TOUCHED groups: a 3-row CDC commit streams one group, never the
table. ``.option("starting_instant", t)`` begins the feed at
instants > t. Losing precombine re-sends emit nothing (the merged
view's winner is unchanged).

Commits RECORDED with full-image CDC blocks (cdc-enabled COW tables,
``hoodie.table.cdc.recorded = data_before_after``) replay straight
from the blocks: one partition per tiny ``-cdc`` file, no slice reads
at all — the streaming twin of the batch reader's pure-block path.
Guarded by a JSON-safe schema check (scalar/date/timestamp columns);
anything richer falls back to the derivation above, as do op_key_only
(MOR) and pre-CDC commits.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from . import hudi_log
from ._admission import AdmissionControl


def _sparkless(path: str):
    from .hudi_table import HudiTable

    t = HudiTable.__new__(HudiTable)
    t.spark = None
    t.path = path
    t.hoodie_dir = os.path.join(path, ".hoodie")
    return t


def _slice_paths(path: str, s: dict | None):
    if s is None:
        return None, []
    return (
        os.path.join(path, s["path"]),
        [os.path.join(path, ls["path"]) for ls in s["_logs"]],
    )


def _json_converters(fields):
    """Per-column JSON-image decoders for the recorded-CDC replay, or
    None when any column type cannot round-trip a to_json image safely
    in pure Python (then the reader falls back to slice derivation —
    the batch path's from_json handles every type, this one only the
    common scalar set)."""
    import datetime

    def ts(v):
        # tz-AWARE UTC: TimestampType rows from a Python data source
        # must carry tzinfo (Arrow refuses naive into timestamptz)
        if v is None:
            return None
        dt = datetime.datetime.fromisoformat(v.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return dt.astimezone(datetime.timezone.utc)

    convs = []
    for f in fields:
        t = f.dataType
        if isinstance(t, (T.ByteType, T.ShortType,
                          T.IntegerType, T.LongType)):
            convs.append(lambda v: None if v is None else int(v))
        elif isinstance(t, (T.FloatType, T.DoubleType)):
            convs.append(lambda v: None if v is None else float(v))
        elif isinstance(t, T.BooleanType):
            convs.append(lambda v: None if v is None else bool(v))
        elif isinstance(t, T.StringType):
            convs.append(lambda v: v)
        elif isinstance(t, T.DateType):
            convs.append(
                lambda v: None if v is None
                else datetime.date.fromisoformat(v)
            )
        elif isinstance(t, T.TimestampType):
            convs.append(ts)
        else:
            return None
    return convs


class _HudiChangelogStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: T.StructType, options: dict):
        self.path = path
        self.schema = schema
        self._initial = options.get("starting_instant", "")
        self._data_fields = [
            f for f in schema.fields
            if f.name not in ("_change_type", "_commit_instant",
                              "_change_ordinal")
        ]
        self._cdc_replayable = (
            _json_converters(self._data_fields) is not None
        )
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
            lambda lo, hi: (i for i in done if lo < i <= hi),
            self._files_of,
        )}

    def partitions(self, start, end):
        self._adm.note_seen(start, end)
        lo, hi = start["instant"], end["instant"]
        parts: list[InputPartition] = []
        if hi > lo:
            t = _sparkless(self.path)
            pc = t.precombine
            done = t.commits()
            ordinal = 0
            for c in (i for i in done if lo < i <= hi):
                meta = t.commit_metadata(c)
                if meta.get("operationType") in ("COMPACT",
                                                 "CLUSTER"):
                    continue
                touched = {
                    (pp, st["fileId"])
                    for pp, sts in meta.get(
                        "partitionToWriteStats", {}
                    ).items()
                    for st in sts
                }
                if not touched:
                    continue
                mode = (meta.get("extraMetadata") or {}).get(
                    "hoodie.table.cdc.recorded"
                )
                if (mode == hudi_log.CDC_DATA_BEFORE_AFTER
                        and self._cdc_replayable):
                    # recorded full-image blocks replace BOTH slice
                    # reads: one tiny -cdc file per touched group is
                    # the whole micro-batch for this commit
                    for rel in sorted(
                        rel
                        for sts in meta.get(
                            "partitionToWriteStats", {}
                        ).values()
                        for st in sts
                        for rel in (st.get("cdcStats") or {})
                    ):
                        parts.append(InputPartition((
                            c, ordinal, "__cdc__",
                            [os.path.join(self.path, rel)],
                            None, [], pc,
                        )))
                    ordinal += 1
                    continue
                cur = t.file_slices(c)
                prev = max((i for i in done if i < c), default=None)
                prevs = t.file_slices(prev) if prev else {}
                for key in sorted(touched):
                    cb, cl = _slice_paths(self.path, cur.get(key))
                    pb, pl = _slice_paths(self.path, prevs.get(key))
                    parts.append(InputPartition((
                        c, ordinal, cb, cl, pb, pl, pc,
                    )))
                ordinal += 1
        if not parts:
            parts.append(InputPartition(
                (None, 0, None, [], None, [], None)
            ))
        return parts

    def read(self, partition):
        c, ordinal, cb, cl, pb, pl, pc = partition.value
        if c is None:
            return
        if cb == "__cdc__":
            import json as _json

            convs = _json_converters(self._data_fields)
            names = [f.name for f in self._data_fields]
            for p in cl:
                for blk in hudi_log.read_log_file(p):
                    if blk["type"] != "cdc":
                        continue
                    for ch in blk["changes"]:
                        op = ch.get("op")
                        if op in ("i", "u"):
                            vals = _json.loads(ch["after"])
                            yield tuple(
                                [cv(vals.get(n))
                                 for cv, n in zip(convs, names)]
                                + ["insert", c, ordinal]
                            )
                        if op in ("d", "u"):
                            vals = _json.loads(ch["before"])
                            yield tuple(
                                [cv(vals.get(n))
                                 for cv, n in zip(convs, names)]
                                + ["delete", c, ordinal]
                            )
            return
        import datetime

        data_names = [f.name for f in self._data_fields]
        # parquet base files carry session-naive timestamps (written
        # under the engine's UTC session); TimestampType rows from a
        # Python data source must be tz-AWARE — localize as UTC.
        # TimestampNTZ columns stay naive.
        ts_names = {
            f.name for f in self._data_fields
            if isinstance(f.dataType, T.TimestampType)
        }

        def fix(n, v):
            if (n in ts_names and isinstance(v, datetime.datetime)
                    and v.tzinfo is None):
                return v.replace(tzinfo=datetime.timezone.utc)
            return v

        # the merge fold needs the hoodie meta columns
        names = list(dict.fromkeys(
            ["_hoodie_record_key", "_hoodie_commit_time", pc]
            + data_names
        ))
        cur_best = hudi_log.merge_slice_rows(cb, cl, names, pc)
        after = {
            k: r for k, r in cur_best.items()
            if r["_hoodie_commit_time"] == c
        }
        for k in sorted(after):
            yield tuple(
                [fix(n, after[k].get(n)) for n in data_names]
                + ["insert", c, ordinal]
            )
        if pb is None and not pl:
            return
        prev_best = hudi_log.merge_slice_rows(pb, pl, names, pc)
        doomed = (set(after)
                  | (set(prev_best) - set(cur_best)))
        for k in sorted(doomed & set(prev_best)):
            yield tuple(
                [fix(n, prev_best[k].get(n)) for n in data_names]
                + ["delete", c, ordinal]
            )

    def commit(self, end):
        pass


class HudiChangelogStreamSource(DataSource):
    """``spark.readStream.format("hudi_changelog_stream")
    .option("path", p)`` after
    ``spark.dataSource.register(HudiChangelogStreamSource)`` —
    optionally ``.option("starting_instant", t)`` (exclusive)."""

    @classmethod
    def name(cls) -> str:
        return "hudi_changelog_stream"

    def _schema(self) -> T.StructType:
        t = _sparkless(self.options["path"])
        if not t.commits():
            raise ValueError(
                f"no completed hudi commits at {self.options['path']}"
            )
        base = t._schema()
        return T.StructType(
            [f for f in base.fields
             if not f.name.startswith("_hoodie_")]
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_instant", T.StringType(),
                              False),
                T.StructField("_change_ordinal", T.IntegerType(),
                              False),
            ]
        )

    def schema(self):
        return self._schema()

    def streamReader(self, schema):
        return _HudiChangelogStreamReader(
            self.options["path"], self._schema(), dict(self.options)
        )
