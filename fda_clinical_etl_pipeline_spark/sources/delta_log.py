"""Delta-protocol table format — write-side transaction log + log-replay
reader, no delta jar required.

The reference's one Spark feature is a Hudi COW table with time travel
(`/root/reference/hudi/register_hudi.py:56-77`, README.md:190-198).
This module provides the same semantics in the OPEN Delta Lake table
format: data as plain parquet files plus a `_delta_log/` of ordered
JSON commit files, exactly as specified by the public Delta protocol
(delta-io/delta PROTOCOL.md). A table written here is readable by any
external Delta reader (Spark+delta-spark, delta-rs, DuckDB's delta
extension, Trino); this environment ships none of them, so tests verify
(a) structural conformance of the log against the spec and (b)
semantic correctness through the built-in log-replay reader.

Protocol subset implemented (documented, spec-cited):
- commit files `_delta_log/%020d.json`, newline-delimited JSON actions;
- `protocol` action: minReaderVersion=1, minWriterVersion=2 (no
  advanced table features used, so the lowest versions apply);
- `metaData` action: id/format(parquet)/schemaString (Spark StructType
  JSON — the exact format Delta uses)/partitionColumns/configuration;
- `add` actions: relative path, partitionValues, size,
  modificationTime, dataChange;
- `remove` actions: deletionTimestamp + dataChange;
- `commitInfo` (informational: operation name + timestamp).
Not implemented (and not required by the protocol for correctness at
this log size): parquet checkpoints / `_last_checkpoint`, partitioned
tables, stats-in-add, deletion vectors, column mapping.

Commit atomicity: POSIX exclusive-create (`open(..., "x")`) of the
next version's file — the filesystem put-if-absent primitive the Delta
spec requires of a LogStore; a lost race surfaces as
``FileExistsError`` (retryable). On object stores you would swap in a
conditional-put LogStore; the log format itself is unchanged.

At 100 TB the log stays tiny (actions, not data); data movement is
ordinary distributed parquet writes. The upsert here is copy-on-write
over the matched subset only: files whose key range cannot contain a
matched key are kept as-is (add actions carry no rewrite), mirroring
Hudi's file-group pruning — see ``upsert``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"


class DeltaProtocolTable:
    """A non-partitioned Delta-format table at a local/posix ``path``.

    ``key``/``precombine`` set the table's default merge identity so
    ``upsert(df)`` works argument-free — which makes the table a valid
    sink for ``streaming.pipeline.stream_upsert`` (streaming CDC into
    the open table format, time travel across micro-batches)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str | None = None,
        precombine: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)
        self.key = key
        self.precombine = precombine

    # ---------------------------------------------------------- log IO
    def _commit_file(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def latest_version(self) -> int:
        """Highest committed version, or -1 for a nonexistent table."""
        if not os.path.isdir(self.log_dir):
            return -1
        versions = [
            int(fn[:20])
            for fn in os.listdir(self.log_dir)
            if fn.endswith(".json") and fn[:20].isdigit()
        ]
        return max(versions, default=-1)

    def _write_commit(self, version: int, actions: list[dict]) -> None:
        os.makedirs(self.log_dir, exist_ok=True)
        payload = "\n".join(json.dumps(a, separators=(",", ":"))
                            for a in actions) + "\n"
        # exclusive create = the put-if-absent commit primitive; a
        # concurrent writer of the same version loses with
        # FileExistsError instead of corrupting the log
        with open(self._commit_file(version), "x") as f:
            f.write(payload)

    def _actions_upto(self, version: int) -> list[dict]:
        out: list[dict] = []
        for v in range(version + 1):
            fp = self._commit_file(v)
            if not os.path.exists(fp):
                raise ValueError(f"missing commit file for version {v}")
            with open(fp) as f:
                out.extend(json.loads(line) for line in f if line.strip())
        return out

    def _replay(self, version: int) -> tuple[dict, dict[str, dict]]:
        """Replay the log → (metaData, {relative_path: add_action})."""
        meta: dict = {}
        active: dict[str, dict] = {}
        for a in self._actions_upto(version):
            if "metaData" in a:
                meta = a["metaData"]
            elif "add" in a:
                active[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                active.pop(a["remove"]["path"], None)
        return meta, active

    def last_txn_version(self, app_id: str) -> int:
        """Highest ``txn`` action version recorded for ``app_id`` — the
        Delta spec's transaction-identifier mechanism: a streaming
        writer stamps each commit with (appId, version) and skips any
        batch whose version it has already recorded, turning replayed
        micro-batches into no-ops (exactly-once effect). Returns -1 if
        the app has never committed."""
        best = -1
        for a in self._actions_upto(self.latest_version()):
            txn = a.get("txn")
            if txn and txn.get("appId") == app_id:
                best = max(best, int(txn.get("version", -1)))
        return best

    # -------------------------------------------------------- data IO
    def _write_data_files(self, df: DataFrame) -> list[dict]:
        """Write df as parquet into the table dir (staged, then renamed
        to uuid-prefixed names) and return the matching add actions."""
        staging = os.path.join(self.path, ".staging", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(staging)
        adds: list[dict] = []
        now_ms = int(time.time() * 1000)
        for fn in sorted(os.listdir(staging)):
            if not fn.endswith(".parquet"):
                continue
            rel = f"{uuid.uuid4().hex[:12]}-{fn}"
            dst = os.path.join(self.path, rel)
            os.rename(os.path.join(staging, fn), dst)
            adds.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.path.getsize(dst),
                        "modificationTime": now_ms,
                        "dataChange": True,
                    }
                }
            )
        shutil.rmtree(os.path.join(self.path, ".staging"),
                      ignore_errors=True)
        return adds

    @staticmethod
    def _remove_actions(active: dict[str, dict]) -> list[dict]:
        now_ms = int(time.time() * 1000)
        return [
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
            for rel in sorted(active)
        ]

    @staticmethod
    def _commit_info(op: str) -> dict:
        return {
            "commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": op,
                "operationParameters": {},
                "engineInfo": "fda-clinical-etl-pipeline-spark delta-protocol writer",
            }
        }

    # ------------------------------------------------------ operations
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key: str | None = None,
        precombine: str | None = None,
    ) -> "DeltaProtocolTable":
        t = cls(spark, path, key=key, precombine=precombine)
        if t.latest_version() >= 0:
            raise ValueError(f"delta table already exists at {path}")
        os.makedirs(path, exist_ok=True)
        adds = t._write_data_files(df)
        actions = [
            t._commit_info("CREATE TABLE AS SELECT"),
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": int(time.time() * 1000),
                }
            },
            *adds,
        ]
        t._write_commit(0, actions)
        return t

    def append(self, df: DataFrame) -> int:
        v = self.latest_version() + 1
        adds = self._write_data_files(df)
        self._write_commit(v, [self._commit_info("WRITE"), *adds])
        return v

    def overwrite(self, df: DataFrame) -> int:
        v = self.latest_version()
        _, active = self._replay(v)
        adds = self._write_data_files(df)
        self._write_commit(
            v + 1,
            [self._commit_info("WRITE"),
             *self._remove_actions(active), *adds],
        )
        return v + 1

    def upsert(
        self,
        incoming: DataFrame,
        key: str | None = None,
        precombine: str | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Hudi-COW-style upsert: precombine-dedup the incoming batch,
        rewrite ONLY the files that can contain a matched key (pruned by
        per-file key membership), union the merged subset back. Files
        with no matched keys keep their add actions untouched — the
        file-group pruning that bounds rewrite volume at scale.

        ``key``/``precombine`` default to the table's merge identity
        (set at create), which is what lets ``stream_upsert`` drive
        this table one micro-batch at a time.

        ``txn=(app_id, version)`` stamps the commit with the spec's
        transaction identifier and makes replays idempotent: if the log
        already records this app at >= version, the upsert is a no-op
        (returns the current table version without committing)."""
        key = key or self.key
        precombine = precombine or self.precombine
        if not key or not precombine:
            raise ValueError("upsert needs key and precombine "
                             "(pass them or set table defaults)")
        if txn is not None and self.last_txn_version(txn[0]) >= txn[1]:
            return self.latest_version()  # replayed batch: exactly-once
        v = self.latest_version()
        meta, active = self._replay(v)
        inc = precombine_latest(incoming, key, precombine)

        keys = [r[0] for r in inc.select(key).distinct().collect()]
        touched: list[str] = []
        for rel in sorted(active):
            fdf = self.spark.read.parquet(os.path.join(self.path, rel))
            if fdf.filter(F.col(key).isin(keys)).limit(1).count() > 0:
                touched.append(rel)
        if touched:
            current = self.spark.read.parquet(
                *[os.path.join(self.path, r) for r in touched]
            )
        else:
            current = self.spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(meta["schemaString"]))
            )
        merged = merge_precombine(current, inc, key, precombine)
        adds = self._write_data_files(merged)
        removes = self._remove_actions({r: active[r] for r in touched})
        actions = [self._commit_info("MERGE"), *removes, *adds]
        if txn is not None:
            actions.insert(
                1,
                {"txn": {"appId": txn[0], "version": int(txn[1]),
                         "lastUpdated": int(time.time() * 1000)}},
            )
        self._write_commit(v + 1, actions)
        return v + 1

    def delete_where(self, condition) -> int:
        """Copy-on-write delete: rewrite only files containing matches."""
        v = self.latest_version()
        _, active = self._replay(v)
        touched = []
        for rel in sorted(active):
            fdf = self.spark.read.parquet(os.path.join(self.path, rel))
            if fdf.filter(condition).limit(1).count() > 0:
                touched.append(rel)
        if not touched:
            return v  # nothing to do; no empty commit
        kept = self.spark.read.parquet(
            *[os.path.join(self.path, r) for r in touched]
        ).filter(~condition)
        adds = self._write_data_files(kept)
        removes = self._remove_actions(
            {r: active[r] for r in touched}
        )
        self._write_commit(
            v + 1, [self._commit_info("DELETE"), *removes, *adds]
        )
        return v + 1

    # --------------------------------------------------------- reads
    def snapshot(self, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v < 0:
            raise ValueError(f"no delta table at {self.path}")
        meta, active = self._replay(v)
        if not active:
            return self.spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(meta["schemaString"]))
            )
        return self.spark.read.parquet(
            *[os.path.join(self.path, rel) for rel in sorted(active)]
        )

    def timestamp_as_of(self, epoch_s: float) -> DataFrame:
        """Time travel by commit timestamp (commitInfo.timestamp, the
        same field external readers use)."""
        best = None
        for v in range(self.latest_version() + 1):
            with open(self._commit_file(v)) as f:
                first = json.loads(f.readline())
            ts = first.get("commitInfo", {}).get("timestamp", 0) / 1000.0
            if ts <= epoch_s:
                best = v
        if best is None:
            raise ValueError("no commit at or before the given timestamp")
        return self.snapshot(best)

    def history(self) -> list[dict]:
        out = []
        for v in range(self.latest_version() + 1):
            with open(self._commit_file(v)) as f:
                actions = [json.loads(line) for line in f if line.strip()]
            info = next(
                (a["commitInfo"] for a in actions if "commitInfo" in a), {}
            )
            out.append(
                {
                    "version": v,
                    "timestamp": info.get("timestamp"),
                    "operation": info.get("operation"),
                    "n_added": sum(1 for a in actions if "add" in a),
                    "n_removed": sum(1 for a in actions if "remove" in a),
                }
            )
        return out

    def compact(self, target_files: int = 1) -> int:
        """Bin-pack the active files into ``target_files`` rewritten
        files (Delta OPTIMIZE): the commit's remove/add actions carry
        ``dataChange: false`` — the spec's signal that the table's
        CONTENT is unchanged, so streaming readers of the log skip the
        rewrite instead of reprocessing it. The small-files problem is
        the steady-state failure mode of streaming ingest into a table;
        periodic compaction keeps the file count (and scan task count)
        bounded."""
        v = self.latest_version()
        _, active = self._replay(v)
        if len(active) <= target_files:
            return v
        df = self.snapshot(v).coalesce(target_files)
        staging_adds = self._write_data_files(df)
        for a in staging_adds:
            a["add"]["dataChange"] = False
        removes = self._remove_actions(active)
        for r in removes:
            r["remove"]["dataChange"] = False
        self._write_commit(
            v + 1, [self._commit_info("OPTIMIZE"), *removes, *staging_adds]
        )
        return v + 1

    def vacuum(self) -> list[str]:
        """Delete data files no longer referenced by the LATEST version
        (earlier versions become unreadable — standard Delta vacuum
        semantics, retention fixed at zero here for test determinism)."""
        _, active = self._replay(self.latest_version())
        deleted = []
        for fn in os.listdir(self.path):
            if fn.endswith(".parquet") and fn not in active:
                os.remove(os.path.join(self.path, fn))
                deleted.append(fn)
        return sorted(deleted)


def precombine_latest(df: DataFrame, key: str, precombine: str) -> DataFrame:
    """One row per key: greatest precombine value wins (Hudi precombine
    semantics, ties broken deterministically by last-in-batch)."""
    w = Window.partitionBy(key).orderBy(F.col(precombine).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_precombine(
    current: DataFrame, incoming: DataFrame, key: str, precombine: str
) -> DataFrame:
    """Upsert merge: per key keep the greatest precombine value; on a
    precombine TIE the incoming row wins (Hudi's combine-and-get-update
    default)."""
    tagged = current.withColumn("_src", F.lit(0)).unionByName(
        incoming.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(
        F.col(precombine).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
