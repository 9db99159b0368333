"""Versioned tables: upsert + time travel (SURVEY.md §2.1 S7, §2.2 K7,
§2.6 W1, §7.4 hard part #4).

The reference uses Hudi copy-on-write upsert keyed by ``patient_id`` with
precombine field ``visit_date`` (hudi/register_hudi.py:56-77) and time
travel via ``as.of.instant`` (README.md:190-198). Neither Hudi nor Delta
jars ship in this environment, so the engine implements the *portable
fallback* SURVEY.md §1.4 names: snapshot versioning on plain parquet —

- every commit writes a full snapshot under ``<table>/v=<n>/`` plus a
  commit log row (commit_n, commit_time, op, rows);
- ``upsert`` = precombine-dedup the incoming batch (W1 window), then
  merge with the current snapshot: matched keys take the incoming row iff
  its precombine value wins (Hudi semantics), unmatched union in;
- reads: ``snapshot()`` (latest), ``version_as_of(n)``,
  ``timestamp_as_of(ts)``, and ``commits()`` ≅ the reference's
  `_hoodie_commit_time` listing (hudi/register_hudi.py:83-88).

Scale posture: the merge is one shuffle on the record key. With a real
lakehouse format this degrades to MERGE INTO (same logical plan); the
window dedup and join keys are identical, so swapping the storage layer
does not change the query layer.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def precombine_dedup(
    df: DataFrame, record_key: str, precombine: str, order_cols: tuple[str, ...] = ()
) -> DataFrame:
    """W1/A6 — Hudi precombine: one row per key, greatest precombine value
    wins; explicit extra tiebreaks make it deterministic where Hudi is not
    (equal precombine values — hard part #4)."""
    order = [F.col(precombine).desc()] + [F.col(c).desc() for c in order_cols]
    w = Window.partitionBy(record_key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


class VersionedTable:
    """Parquet snapshot versioning with Hudi-upsert semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        record_key: str,
        precombine: str,
    ):
        self.spark = spark
        self.path = path
        self.record_key = record_key
        self.precombine = precombine
        os.makedirs(path, exist_ok=True)

    # -- commit log --------------------------------------------------------

    @property
    def _log_path(self) -> str:
        return os.path.join(self.path, "_commits.json")

    def commits(self) -> list[dict]:
        """≅ distinct _hoodie_commit_time listing, newest first
        (hudi/register_hudi.py:83-88)."""
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return sorted(json.load(f), key=lambda c: -c["version"])

    def _next_version(self) -> int:
        commits = self.commits()
        return (commits[0]["version"] + 1) if commits else 0

    def _append_commit(self, op: str, rows: int, version: int | None = None) -> dict:
        commits = self.commits()
        if version is None:
            version = (commits[0]["version"] + 1) if commits else 0
        entry = {
            "version": version,
            "commit_time": time.strftime("%Y%m%d%H%M%S", time.gmtime())
            + f"{int(time.time_ns() % 1_000_000_000):09d}"[:3],
            "epoch_s": time.time(),
            "op": op,
            "rows": rows,
        }
        commits.append(entry)
        with open(self._log_path, "w") as f:
            json.dump(sorted(commits, key=lambda c: c["version"]), f)
        return entry

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    # -- writes --------------------------------------------------------------

    def upsert(self, incoming: DataFrame) -> dict:
        """K7: Hudi COW upsert. Incoming batch is precombine-deduped, then
        merged against the current snapshot; on key match the incoming row
        wins iff its precombine value is >= existing (Hudi keeps the
        greater precombine; arrival order breaks exact ties, matching
        upsert-overwrites semantics)."""
        batch = precombine_dedup(
            incoming, self.record_key, self.precombine, order_cols=()
        )
        current = self.snapshot()
        if current is None:
            merged = batch
        else:
            # union + window: existing rows tagged 0, incoming 1 — on equal
            # precombine the incoming (latest write) wins, like upsert.
            tagged = current.withColumn("_side", F.lit(0)).unionByName(
                batch.withColumn("_side", F.lit(1))
            )
            w = Window.partitionBy(self.record_key).orderBy(
                F.col(self.precombine).desc(), F.col("_side").desc()
            )
            merged = (
                tagged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_side")
            )
        # write once, then count from the committed files (parquet
        # row-group metadata — no second execution of the merge plan)
        version = self._next_version()
        merged.write.mode("overwrite").parquet(self._snapshot_dir(version))
        rows = self.spark.read.parquet(self._snapshot_dir(version)).count()
        return self._append_commit("upsert", rows, version)

    def insert_overwrite(self, df: DataFrame) -> dict:
        version = self._next_version()
        df.write.mode("overwrite").parquet(self._snapshot_dir(version))
        rows = self.spark.read.parquet(self._snapshot_dir(version)).count()
        return self._append_commit("insert_overwrite", rows, version)

    # -- reads -----------------------------------------------------------

    def snapshot(self) -> DataFrame | None:
        commits = self.commits()
        if not commits:
            return None
        return self.spark.read.parquet(self._snapshot_dir(commits[0]["version"]))

    def version_as_of(self, version: int) -> DataFrame:
        """S7 time travel by version (Delta VERSION AS OF ≅ Hudi commit)."""
        return self.spark.read.parquet(self._snapshot_dir(version))

    def vacuum(self, keep_last_n: int = 5) -> list[int]:
        """Storage hygiene for snapshot versioning: drop snapshot dirs
        older than the newest ``keep_last_n`` commits (full snapshots make
        old versions pure storage cost — unlike log-structured formats
        there is nothing to replay). Returns removed versions; the commit
        log keeps their metadata so history stays auditable."""
        import shutil

        commits = self.commits()
        removable = commits[keep_last_n:]
        removed = []
        for c in removable:
            snap = self._snapshot_dir(c["version"])
            if os.path.isdir(snap):
                shutil.rmtree(snap)
                removed.append(c["version"])
        return removed

    def timestamp_as_of(self, epoch_s: float) -> DataFrame:
        """S7 time travel by timestamp (as.of.instant, README.md:190-198):
        latest commit at or before the instant."""
        eligible = [c for c in self.commits() if c["epoch_s"] <= epoch_s]
        if not eligible:
            raise ValueError(f"no commit at or before {epoch_s}")
        return self.version_as_of(eligible[0]["version"])
