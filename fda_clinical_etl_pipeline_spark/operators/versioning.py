"""Versioned tables: upsert + time travel (SURVEY.md §2.1 S7, §2.2 K7,
§2.6 W1, §7.4 hard part #4).

The reference uses Hudi copy-on-write upsert keyed by ``patient_id`` with
precombine field ``visit_date`` (hudi/register_hudi.py:56-77) and time
travel via ``as.of.instant`` (README.md:190-198). Neither Hudi nor Delta
jars ship in this environment, so the engine implements the *portable
fallback* SURVEY.md §1.4 names: BUCKETED snapshot versioning on plain
parquet, mirroring Hudi's file-group model —

- rows hash into ``n_buckets`` fixed buckets on the record key (≅ Hudi
  file groups); a commit writes ``<table>/v=<n>/_bucket=<k>/`` for ONLY
  the buckets containing matched keys, plus a commit-log row
  (version, commit_time, op, rows, buckets);
- ``upsert`` = precombine-dedup the incoming batch (W1 window), read the
  CURRENT state of just the touched buckets, merge (matched keys take
  the incoming row iff its precombine value wins — Hudi semantics),
  rewrite those buckets. Untouched buckets are never read or written:
  a 1-row commit against a 10^9-row table rewrites 1/n_buckets of it,
  not a full snapshot;
- reads resolve each bucket to its newest write ≤ the requested version
  and attach ``_commit_version`` / ``_commit_time`` per row (≅ Hudi's
  ``_hoodie_commit_time`` meta column, hudi/register_hudi.py:83-88);
- ``commits()`` ≅ the reference's distinct commit listing.

Scale posture: the merge is one shuffle on the record key, over touched
buckets only. With a real lakehouse format this degrades to MERGE INTO
(same logical plan); the window dedup and join keys are identical, so
swapping the storage layer does not change the query layer. Raise
``n_buckets`` with table volume (it bounds commit write amplification at
``touched/n_buckets`` of the table).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
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


META_COLS = ("_commit_version", "_commit_time")


class VersionedTable:
    """Parquet bucketed-snapshot versioning with Hudi-upsert semantics."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        record_key: str,
        precombine: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.record_key = record_key
        self.precombine = precombine
        os.makedirs(path, exist_ok=True)
        # bucket count is a TABLE property: fixed at creation, reloaded on
        # reopen (a changed modulus would scatter keys across buckets)
        props_path = os.path.join(path, "_table.json")
        if os.path.exists(props_path):
            with open(props_path) as f:
                self.n_buckets = int(json.load(f)["n_buckets"])
        else:
            self.n_buckets = n_buckets
            with open(props_path, "w") as f:
                json.dump({"n_buckets": n_buckets,
                           "record_key": record_key,
                           "precombine": precombine}, f)

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

    def _append_commit(self, op: str, rows: int, version: int,
                       buckets: list[int]) -> dict:
        commits = self.commits()
        # commit_time: seconds and milliseconds from the SAME clock
        # reading; strictly monotonic across commits (ties bump by 1 ms —
        # anything that sorts by commit_time must agree with version order)
        now = time.time()
        ct = (time.strftime("%Y%m%d%H%M%S", time.gmtime(now))
              + f"{int((now % 1) * 1000):03d}")
        if commits and ct <= commits[0]["commit_time"]:
            ct = str(int(commits[0]["commit_time"]) + 1)
        entry = {
            "version": version,
            "commit_time": ct,
            "epoch_s": now,
            "op": op,
            "rows": rows,          # rows written BY this commit
            "buckets": buckets,    # bucket ids this commit rewrote
        }
        commits.append(entry)
        with open(self._log_path, "w") as f:
            json.dump(sorted(commits, key=lambda c: c["version"]), f)
        return entry

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def _bucket_expr(self) -> Column:
        return F.pmod(
            F.xxhash64(F.col(self.record_key).cast("string")),
            F.lit(self.n_buckets),
        ).cast("int")

    # -- bucket resolution -------------------------------------------------

    def _bucket_map(self, version: int) -> dict[int, dict]:
        """bucket id → the commit holding its newest write ≤ ``version``.
        insert_overwrite resets the mapping (buckets it didn't write are
        empty from that point on — full-table replace semantics)."""
        per: dict[int, dict] = {}
        for c in sorted(self.commits(), key=lambda c: c["version"]):
            if c["version"] > version:
                break
            if c["op"] == "insert_overwrite":
                per = {b: c for b in c["buckets"]}
            else:
                per.update({b: c for b in c["buckets"]})
        return per

    def _read_resolved(
        self,
        per: dict[int, dict],
        buckets: list[int] | None = None,
        with_meta: bool = True,
    ) -> DataFrame | None:
        """Union of per-bucket parquet scans, grouped by owning commit so
        the ``_commit_*`` meta columns are exact per row. The union is
        scan-concatenation — no shuffle."""
        if buckets is not None:
            want = set(buckets)
            per = {b: c for b, c in per.items() if b in want}
        if not per:
            return None  # no bucket ever written (or all requested empty)
        groups: dict[int, tuple[dict, list[int]]] = {}
        for b, c in per.items():
            groups.setdefault(c["version"], (c, []))[1].append(b)
        frames = []
        for ver in sorted(groups):
            c, bs = groups[ver]
            # a delete commit that emptied a bucket wrote no dir for it —
            # the bucket is legitimately empty at this version, not stale
            paths = [
                p
                for b in sorted(bs)
                if os.path.isdir(
                    p := os.path.join(self._snapshot_dir(ver), f"_bucket={b}")
                )
            ]
            if not paths:
                continue
            df = self.spark.read.parquet(*paths)
            if with_meta:
                df = df.withColumn(
                    "_commit_version", F.lit(ver).cast("int")
                ).withColumn("_commit_time", F.lit(c["commit_time"]))
            frames.append(df)
        if not frames:
            return None  # every resolved bucket is empty (deleted out)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    # -- writes --------------------------------------------------------------

    def upsert(self, incoming: DataFrame) -> dict:
        """K7: Hudi COW upsert, file-group style. The incoming batch is
        precombine-deduped and bucketed; ONLY buckets containing incoming
        keys are read back, merged (incoming wins iff precombine >=
        existing; arrival order breaks exact ties, matching
        upsert-overwrites semantics) and rewritten."""
        batch = precombine_dedup(
            incoming, self.record_key, self.precombine, order_cols=()
        ).withColumn("_bucket", self._bucket_expr())
        batch.persist()
        try:
            touched = sorted(
                r["_bucket"]
                for r in batch.select("_bucket").distinct().collect()
            )
            if not touched:
                # empty batch: no bucket changes — commit a no-op entry
                # (history shows the attempt); snapshot carries forward
                # through the unchanged bucket map
                return self._append_commit(
                    "upsert", 0, self._next_version(), []
                )
            current = self._read_resolved(
                self._bucket_map(self._next_version()),
                buckets=touched,
                with_meta=False,
            )
            if current is None:
                merged = batch
            else:
                # union + window: existing rows tagged 0, incoming 1 — on
                # equal precombine the incoming (latest write) wins.
                tagged = current.withColumn(
                    "_bucket", self._bucket_expr()
                ).withColumn("_side", F.lit(0)).unionByName(
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
            version = self._next_version()
            # observed metric: the WRITE job itself counts committed rows
            # as it streams them — the commit is exactly one job, with no
            # post-write count pass (not even a footer scan)
            obs = Observation()
            merged = merged.observe(
                obs, F.count(F.lit(1)).cast("long").alias("rows")
            )
            merged.write.mode("overwrite").partitionBy("_bucket").parquet(
                self._snapshot_dir(version)
            )
            return self._append_commit(
                "upsert", int(obs.get["rows"]), version, touched
            )
        finally:
            batch.unpersist()

    def delete_keys(self, keys: DataFrame) -> dict:
        """Hard-delete by record key (the clinical right-to-be-forgotten:
        a patient's rows must leave the CURRENT snapshot). Same
        partition-pruned shape as upsert: only buckets containing the
        keys are read, anti-joined, and rewritten; untouched buckets are
        never opened. Older snapshots still contain the rows until
        ``vacuum`` retires them — full erasure = delete_keys + vacuum(0).

        ``keys``: a DataFrame whose first column holds the record keys.
        Returns the commit entry (op='delete')."""
        key_col = keys.columns[0]
        kdf = keys.select(
            F.col(key_col).alias(self.record_key)
        ).distinct().withColumn("_bucket", self._bucket_expr())
        kdf.persist()
        try:
            touched = sorted(
                r["_bucket"]
                for r in kdf.select("_bucket").distinct().collect()
            )
            current = self._read_resolved(
                self._bucket_map(self._next_version()),
                buckets=touched,
                with_meta=False,
            )
            version = self._next_version()
            if current is None or not touched:
                return self._append_commit("delete", 0, version, [])
            remaining = current.join(
                kdf.select(self.record_key), self.record_key, "left_anti"
            ).withColumn("_bucket", self._bucket_expr())
            # a bucket whose every row was deleted writes no dir — it must
            # still REMAP to this commit (empty), not fall back to the old
            # data, so record all touched buckets. The observed metric
            # counts surviving rows inside the write job itself (an empty
            # result observes 0 — no fallback scan needed).
            obs = Observation()
            remaining = remaining.observe(
                obs, F.count(F.lit(1)).cast("long").alias("rows")
            )
            remaining.write.mode("overwrite").partitionBy("_bucket").parquet(
                self._snapshot_dir(version)
            )
            return self._append_commit(
                "delete", int(obs.get["rows"]), version, touched
            )
        finally:
            kdf.unpersist()

    def insert_overwrite(self, df: DataFrame) -> dict:
        """Full-table replace: writes every bucket the data lands in and
        resets the bucket mapping (older buckets stop being visible).
        One job total: row count via observed write metric, bucket list
        from the partition directory names the write laid down (driver
        filesystem metadata, no scan)."""
        out = df.withColumn("_bucket", self._bucket_expr())
        version = self._next_version()
        obs = Observation()
        out = out.observe(obs, F.count(F.lit(1)).cast("long").alias("rows"))
        out.write.mode("overwrite").partitionBy("_bucket").parquet(
            self._snapshot_dir(version)
        )
        buckets = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self._snapshot_dir(version))
            if d.startswith("_bucket=")
        )
        return self._append_commit(
            "insert_overwrite", int(obs.get["rows"]), version, buckets
        )

    # -- reads -----------------------------------------------------------

    def snapshot(self, with_meta: bool = True) -> DataFrame | None:
        commits = self.commits()
        if not commits:
            return None
        return self._read_resolved(
            self._bucket_map(commits[0]["version"]), with_meta=with_meta
        )

    def version_as_of(self, version: int, with_meta: bool = True) -> DataFrame:
        """S7 time travel by version (Delta VERSION AS OF ≅ Hudi commit).
        Rows carry ``_commit_version``/``_commit_time`` of the commit that
        last wrote their bucket ≤ the requested version."""
        out = self._read_resolved(self._bucket_map(version),
                                  with_meta=with_meta)
        if out is None:
            raise ValueError(f"no commit at or before version {version}")
        return out

    def timestamp_as_of(self, epoch_s: float, with_meta: bool = True) -> DataFrame:
        """S7 time travel by timestamp (as.of.instant, README.md:190-198):
        latest commit at or before the instant."""
        eligible = [c for c in self.commits() if c["epoch_s"] <= epoch_s]
        if not eligible:
            raise ValueError(f"no commit at or before {epoch_s}")
        return self.version_as_of(eligible[0]["version"], with_meta=with_meta)

    def diff_versions(self, v_from: int, v_to: int) -> DataFrame:
        """Change-data-feed between two versions (≅ Delta CDF /
        Hudi incremental query): one row per changed key with
        change_type ∈ {insert, update, delete}. Full-outer join of the
        two resolved snapshots on the record key, comparing a row hash
        over the data columns — shuffle O(both snapshots) worst case, but
        bucket maps mean unchanged buckets resolve to IDENTICAL files;
        readers that track per-bucket versions can skip them entirely."""
        a = self.version_as_of(v_from, with_meta=False)
        b = self.version_as_of(v_to, with_meta=False)
        cols = [c for c in a.columns if c != self.record_key]

        def hashed(df: DataFrame, tag: str) -> DataFrame:
            return df.select(
                F.col(self.record_key),
                F.sha2(
                    F.concat_ws("\x1f", *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in cols
                    ]),
                    256,
                ).alias(f"_h_{tag}"),
            )

        joined = hashed(a, "a").join(
            hashed(b, "b"), self.record_key, "full_outer"
        )
        change = (
            F.when(F.col("_h_a").isNull(), F.lit("insert"))
            .when(F.col("_h_b").isNull(), F.lit("delete"))
            .when(F.col("_h_a") != F.col("_h_b"), F.lit("update"))
        )
        return (
            joined.select(self.record_key, change.alias("change_type"))
            .filter(F.col("change_type").isNotNull())
        )

    def vacuum(self, keep_last_n: int = 5) -> list[int]:
        """Storage hygiene: drop version dirs that are (a) older than the
        newest ``keep_last_n`` commits AND (b) not the current owner of any
        bucket — a bucketed snapshot stays referenced until every bucket it
        wrote has been rewritten by a newer commit. Returns removed
        versions; the commit log keeps their metadata so history stays
        auditable (time travel to a vacuumed version raises on read)."""
        import shutil

        commits = self.commits()
        if not commits:
            return []
        keep = {c["version"] for c in commits[:keep_last_n]}
        referenced = {
            c["version"]
            for c in self._bucket_map(commits[0]["version"]).values()
        }
        removed = []
        for c in commits:
            v = c["version"]
            if v in keep or v in referenced:
                continue
            snap = self._snapshot_dir(v)
            if os.path.isdir(snap):
                shutil.rmtree(snap)
                removed.append(v)
        return removed
