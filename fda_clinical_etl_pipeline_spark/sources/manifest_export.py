"""External-engine interop exports — the direction the UniForm twins
don't cover: handing a SNAPSHOT to engines that have no Delta/Hudi
log reader at all.

- ``export_symlink_manifest``: the ``symlink_format_manifest`` layout
  Delta's GENERATE command and Hudi's sync tools emit for Presto/
  Athena-class engines — one text file per partition under
  ``<table>/_symlink_format_manifest/`` listing the ABSOLUTE paths of
  the snapshot's live data files. Any engine that can read a file
  list + parquet consumes the snapshot; no log replay required.
  Refusals keep the export honest: a Delta snapshot carrying deletion
  vectors, or a Hudi MOR slice with unmerged log files, cannot be
  represented as a plain file list (readers would resurrect deleted
  rows / miss updates) and raises instead of exporting silently-wrong
  data.
- ``read_symlink_manifest``: consume an export the way an external
  engine would — WITH the staleness gate those engines cannot apply
  themselves: the export records the table version/instant it
  represents, and a read after any newer table commit refuses (a
  stale manifest silently serves deleted/rewritten files; the refusal
  makes regeneration a hard requirement, matching the "generate after
  every write" contract of the real feature).
- ``register_iceberg_table``: Iceberg's catalog ``register_table``
  shape — re-register an existing table's CURRENT metadata file under
  a new location (HadoopTables layout: ``metadata/v1.metadata.json``
  + version-hint). Zero copy: manifests, manifest lists, and data
  files are referenced by the absolute paths the metadata already
  carries. The registration pins the snapshot lineage at registration
  time — commits through the ORIGINAL table do not appear (the real
  catalog semantics), and re-registering over an existing table
  refuses.

Scale shape: exports are metadata-only — O(files) driver work writing
text lines, no data IO; the gate query reads the snapshot THROUGH the
manifest, so a wrong/stale/extra line flips the oracle hash.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_symlink_format_manifest"
_MARKER = "_export_version.json"


def export_symlink_manifest(table) -> str:
    """Write the symlink-format manifest for the table's CURRENT
    snapshot. Returns the manifest root. Overwrites any previous
    export atomically per run (rm + rewrite — the marker is written
    last, so a torn export is detectably incomplete)."""
    from .delta_log import DeltaProtocolTable
    from .hudi_table import HudiTable

    root = os.path.join(table.path, _MANIFEST_DIR)
    if isinstance(table, DeltaProtocolTable):
        v = table.latest_version()
        _meta, active = table._replay(v)
        dv = [r for r, a in active.items() if a.get("deletionVector")]
        if dv:
            raise ValueError(
                f"{len(dv)} live files carry deletion vectors; a "
                "plain file list cannot express row-level deletes — "
                "purge DVs (rewrite) before exporting"
            )
        by_part: dict[str, list[str]] = {}
        for rel, add in sorted(active.items()):
            pvals = add.get("partitionValues") or {}
            part = "/".join(
                f"{k}={v_}" for k, v_ in sorted(pvals.items())
            )
            p = (
                rel if os.path.isabs(rel)
                else os.path.join(table.path, rel)
            )
            by_part.setdefault(part, []).append(p)
        marker = {"format": "delta", "version": v}
    elif isinstance(table, HudiTable):
        inst = table._resolve_instant(None)
        slices = table.file_slices()
        logged = [k for k, s in slices.items() if s.get("_logs")]
        if logged:
            raise ValueError(
                f"{len(logged)} file slices carry unmerged log "
                "files; a plain file list cannot express them — run "
                "compact() first"
            )
        by_part = {}
        for (pp, _fid), s in sorted(slices.items()):
            by_part.setdefault(pp, []).append(
                os.path.join(table.path, s["path"])
            )
        marker = {"format": "hudi", "instant": inst}
    else:
        raise TypeError(
            f"unsupported table type {type(table).__name__}; "
            "Iceberg interop goes through register_iceberg_table "
            "(its metadata is already engine-portable)"
        )

    shutil.rmtree(root, ignore_errors=True)
    for part, files in by_part.items():
        d = os.path.join(root, part) if part else root
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "manifest"), "w") as f:
            f.write("\n".join(sorted(files)) + "\n")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, _MARKER), "w") as f:
        json.dump(marker, f)
    return root


def _current_position(table_path: str) -> dict:
    """The table's CURRENT version/instant, format-detected — what a
    fresh export would record."""
    if os.path.isdir(os.path.join(table_path, "_delta_log")):
        return {"format": "delta", "version": _delta_latest(table_path)}
    if os.path.isdir(os.path.join(table_path, ".hoodie")):
        from .hudi_table import HudiTable

        t = HudiTable.__new__(HudiTable)
        t.spark = None
        t.path = table_path
        t.hoodie_dir = os.path.join(table_path, ".hoodie")
        return {"format": "hudi", "instant": t._resolve_instant(None)}
    raise ValueError(f"no delta or hudi table at {table_path}")


def _delta_latest(table_path: str) -> int:
    log = os.path.join(table_path, "_delta_log")
    vs = [
        int(fn[:20]) for fn in os.listdir(log)
        if fn.endswith(".json") and fn[:20].isdigit()
    ]
    return max(vs) if vs else -1


def manifest_files(table_path: str) -> list[str]:
    """The exported file list, after the staleness gate: raises if the
    table has committed past the export (an external engine reading
    the stale list would serve deleted/rewritten files)."""
    root = os.path.join(table_path, _MANIFEST_DIR)
    mpath = os.path.join(root, _MARKER)
    if not os.path.isfile(mpath):
        raise ValueError(
            f"no symlink manifest under {table_path} — run "
            "export_symlink_manifest first"
        )
    with open(mpath) as f:
        marker = json.load(f)
    cur = _current_position(table_path)
    if marker["format"] == "delta":
        at, now = marker["version"], cur.get("version")
        stale = now is None or now > at
    else:
        at, now = marker["instant"], cur.get("instant")
        stale = now is None or now > at
    if stale:
        raise ValueError(
            f"symlink manifest is STALE: exported at "
            f"{marker['format']} position {at!r} but the table is now "
            f"at {now!r} — regenerate with export_symlink_manifest "
            "(a stale file list silently serves deleted or rewritten "
            "files)"
        )
    return sorted(
        f for _p, fs in _manifest_groups(root) for f in fs
    )


def _manifest_groups(root: str) -> list[tuple[dict, list[str]]]:
    """[(partition values from the manifest's directory path, file
    list)] — the Hive-layout contract external engines apply."""
    out = []
    for dirpath, _dirs, names in os.walk(root):
        if "manifest" not in names:
            continue
        rel = os.path.relpath(dirpath, root)
        pvals = {}
        if rel != ".":
            for seg in rel.split(os.sep):
                k, _, v = seg.partition("=")
                pvals[k] = v
        with open(os.path.join(dirpath, "manifest")) as f:
            files = [ln for ln in f.read().splitlines() if ln]
        if files:
            out.append((pvals, files))
    return sorted(out, key=lambda pf: sorted(pf[0].items()))


def read_symlink_manifest(
    spark: SparkSession, table_path: str
) -> DataFrame:
    """Read the snapshot the way an external engine consumes the
    export: the manifest's file lists straight into parquet scans —
    no log replay, staleness-gated. Partition columns re-inject from
    the manifest directory layout (Hive-style ``col=value`` paths,
    string-typed — exactly what a file-list consumer derives)."""
    from pyspark.sql import functions as F

    root = os.path.join(table_path, _MANIFEST_DIR)
    manifest_files(table_path)  # staleness gate
    with open(os.path.join(root, _MARKER)) as f:
        fmt = json.load(f)["format"]
    dfs = []
    for pvals, files in _manifest_groups(root):
        df = spark.read.parquet(*files)
        if fmt == "delta":
            # Delta data files omit partition columns; re-derive from
            # the Hive-layout manifest path. Hudi base files are
            # self-contained (partition columns live in the parquet),
            # and their partition dirs are raw values, not col=value.
            for k, v in pvals.items():
                df = df.withColumn(k, F.lit(v))
        dfs.append(df)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def register_iceberg_table(
    spark: SparkSession, source_path: str, target_path: str
):
    """Register an existing Iceberg table's CURRENT metadata under a
    new HadoopTables location (the catalog ``register_table``
    operation). Zero copy — the metadata file already references
    manifests and data files by absolute path. The registration is
    PINNED: later commits through the source do not appear here, and
    registering over an existing table refuses."""
    from .iceberg import IcebergTable

    src = IcebergTable(spark, source_path)
    v = src.current_version()
    if v < 0:
        raise ValueError(f"no iceberg table at {source_path}")
    meta_dir = os.path.join(target_path, "metadata")
    if os.path.isdir(meta_dir) and os.listdir(meta_dir):
        raise ValueError(
            f"target {target_path} already holds a table — "
            "register_table never overwrites"
        )
    os.makedirs(meta_dir, exist_ok=True)
    shutil.copyfile(
        os.path.join(source_path, "metadata", f"v{v}.metadata.json"),
        os.path.join(meta_dir, "v1.metadata.json"),
    )
    with open(
        os.path.join(meta_dir, "version-hint.text"), "w"
    ) as f:
        f.write("1")
    return IcebergTable(spark, target_path)
