"""UniForm-style metadata twin: an Iceberg-readable view of a Delta
table over the SAME data files — zero copy.

Delta UniForm's contract: each Delta commit can be mirrored as an
Iceberg snapshot whose manifests reference the Delta table's parquet
files in place, so an Iceberg reader serves the table without a
migration (``convert_table`` in ``sources/convert.py`` is the
rewriting alternative). ``sync_iceberg_uniform`` builds/advances that
view:

- the Iceberg metadata tree lives under ``<delta>/_iceberg`` (or an
  explicit path), created empty on first sync;
- every sync commits ONE 'replace' snapshot listing the Delta
  version's active add files as external data_file structs
  (``IcebergTable.commit_external_snapshot`` — metadata-only,
  O(files)); re-syncing an already-synced version is a no-op
  (``uniform.delta-version`` table property);
- Delta DELETION VECTORS convert to spec v2 position-delete files:
  the DV bitmaps decode worker-side (``_dv_positions_df``) into
  (file_path, pos) rows written through the Iceberg twin's own
  position-delete writer, so merge-on-read delete debt survives the
  format boundary without rewriting a single data file;
- row counts come from the add actions' stats when present, else one
  bounded footer read per uncounted file.

Scope gates (each refuses loudly, mirroring real UniForm's
restrictions): the Delta table must be UNPARTITIONED (Delta strips
hive partition columns out of the data files; Iceberg requires data
files be self-contained) and must not use column mapping (the Iceberg
view resolves parquet columns by name). The Iceberg side is a READ
view — write through the Delta table and re-sync.

Reference analog: none (the reference is single-format Hudi); this is
the interop surface a lakehouse user expects when two engines share
one copy of 100 TB.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .delta_log import DeltaProtocolTable
from .iceberg import IcebergTable


def sync_iceberg_uniform(
    spark: SparkSession,
    delta_path: str,
    iceberg_path: str | None = None,
    dv_mode: str = "v2",
) -> IcebergTable:
    """Create or advance the Iceberg metadata twin of the Delta table
    at ``delta_path``; returns the IcebergTable (current through the
    Delta table's latest version).

    ``dv_mode`` picks how Delta deletion vectors surface to Iceberg
    readers: ``"v2"`` decodes bitmaps worker-side into spec v2
    position-delete parquet files (readable by any v2 reader);
    ``"v3"`` lifts the RAW bitmap bytes verbatim into
    `deletion-vector-v1` Puffin blobs (spec fields 143-145) — zero
    re-encoding, because Delta's portable RoaringBitmapArray bytes ARE
    the Iceberg v3 vector bytes. That byte identity is the UniForm
    design point; v3 syncs stamp format-version 3."""
    import pyarrow.parquet as pq

    d = DeltaProtocolTable(spark, delta_path)
    v = d.latest_version()
    if v < 0:
        raise ValueError(f"no delta table at {delta_path}")
    meta, active = d._replay(v)
    if meta.get("partitionColumns"):
        raise ValueError(
            "uniform sync supports unpartitioned Delta tables only: "
            "Delta keeps hive partition column values in directory "
            "names, not in the data files, and Iceberg data files "
            "must be self-contained"
        )
    if d._mapping_mode(meta) not in (None, "", "none"):
        raise ValueError(
            "uniform sync does not support column-mapping tables: "
            "the Iceberg view resolves parquet columns by name"
        )
    ice_path = iceberg_path or os.path.join(delta_path, "_iceberg")
    t = IcebergTable(spark, ice_path)
    if t.current_version() < 0:
        schema = T.StructType.fromJson(
            json.loads(meta["schemaString"])
        )
        t = IcebergTable.create(
            spark, ice_path, spark.createDataFrame([], schema)
        )
    else:
        synced = t.metadata().get("properties", {}).get(
            "uniform.delta-version"
        )
        if synced is not None and int(synced) >= v:
            return t  # already current

    # Delta per-file stats convert to Iceberg column bounds (the
    # spec's single-value serialization keyed by field id), so the
    # view's skipped_files/read_range prune exactly as a native
    # Iceberg table would
    from .iceberg import _bound_bytes

    ice_meta = t.metadata()
    ice_fields = {
        f["name"]: f
        for f in ice_meta["schemas"][ice_meta["current-schema-id"]]
        ["fields"]
        if f["type"] in ("int", "long", "float", "double",
                         "string", "boolean")
    }

    def _bounds(st: dict, key: str) -> list[dict] | None:
        out = []
        for c, v in (st.get(key) or {}).items():
            f = ice_fields.get(c)
            if f is None or v is None:
                continue
            b = _bound_bytes(v, f["type"])
            if b is not None:
                out.append({"key": f["id"], "value": b})
        return out or None

    data_files = []
    dv_items = []
    for rel in sorted(active):
        add = active[rel]
        abs_path = os.path.join(delta_path, rel)
        st = DeltaProtocolTable._file_stats(add) or {}
        n = st.get("numRecords")
        if n is None:  # stats-less add: one bounded footer read
            n = pq.ParquetFile(abs_path).metadata.num_rows
        df_entry = {
            "content": 0,
            "file_path": abs_path,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": int(n),
            "file_size_in_bytes": int(
                add.get("size") or os.path.getsize(abs_path)
            ),
            "lower_bounds": _bounds(st, "minValues"),
            "upper_bounds": _bounds(st, "maxValues"),
        }
        # Delta row tracking lifts into Iceberg v3 Row Lineage
        # VERBATIM: baseRowId IS the file's first_row_id (both specs
        # define fresh row ids as this base + row position), and the
        # materialized _row_id columns are byte-identical
        if add.get("baseRowId") is not None:
            df_entry["first_row_id"] = int(add["baseRowId"])
        data_files.append(df_entry)
        dv = add.get("deletionVector")
        if dv:
            dv_items.append((os.path.basename(rel), dv))

    if dv_mode not in ("v2", "v3"):
        raise ValueError(f"unknown dv_mode {dv_mode!r}")
    delete_files = []
    if dv_items and dv_mode == "v2":
        abs_of = spark.createDataFrame(
            [(os.path.basename(r), os.path.join(delta_path, r))
             for r in active],
            "__fname string, __abs string",
        )
        deletes = (
            d._dv_positions_df(dv_items)
            .join(F.broadcast(abs_of), "__fname")
            .select(
                F.col("__abs").alias("file_path"),
                F.col("__pos").alias("pos"),
                F.lit("").alias("_pdir"),
            )
        )
        delete_files = t._write_position_delete_files(deletes)
    elif dv_items:  # v3: lift Delta DV bytes verbatim into Puffin
        import uuid as _uuid

        from .delta_dv import deserialize_positions, read_dv_bytes
        from .puffin import DV_BLOB_TYPE, frame_dv_vector, write_puffin

        # snapshot id allocated BEFORE the Puffin write so the blob
        # metadata carries the real id (v3 spec), not a placeholder;
        # commit_external_snapshot below commits under the same id
        snapshot_id = _uuid.uuid4().int >> 65
        abs_by_fname = {
            os.path.basename(r): os.path.join(delta_path, r)
            for r in active
        }
        blobs, ref_info = [], []
        for fname, dv in sorted(dv_items):
            raw = read_dv_bytes(delta_path, dv)
            # the descriptor's cardinality is untrusted input (inline
            # 'i' descriptors carry no CRC frame): decode once at
            # sync time and refuse to stamp a wrong count into
            # Iceberg metadata
            card = len(deserialize_positions(raw))
            if card != dv["cardinality"]:
                raise ValueError(
                    f"uniform: DV for {fname} decodes to {card} "
                    f"positions but descriptor claims "
                    f"{dv['cardinality']} — corrupt source DV"
                )
            payload = frame_dv_vector(raw)
            blobs.append({
                "type": DV_BLOB_TYPE,
                "fields": [2147483546],
                "snapshot-id": snapshot_id,
                "sequence-number": v,
                "payload": payload,
                "properties": {
                    "referenced-data-file": abs_by_fname[fname],
                    "cardinality": str(card),
                },
            })
            ref_info.append((abs_by_fname[fname], card))
        puffin_path = os.path.join(
            t.path, "data", f"{_uuid.uuid4().hex[:12]}-deletes.puffin"
        )
        info = write_puffin(puffin_path, blobs)
        delete_files = [
            {
                "content": 1,
                "file_path": puffin_path,
                "file_format": "PUFFIN",
                "partition": {},
                "record_count": card,
                "file_size_in_bytes": info["file-size-in-bytes"],
                "lower_bounds": None,
                "upper_bounds": None,
                "referenced_data_file": ref,
                "content_offset": bm["offset"],
                "content_size_in_bytes": bm["length"],
            }
            for bm, (ref, card) in zip(
                info["blob-metadata"], ref_info
            )
        ]

    rt_hwm = d._row_id_hwm(v)
    t.commit_external_snapshot(
        data_files, delete_files, "replace",
        format_version=3 if (
            (dv_items and dv_mode == "v3") or rt_hwm is not None
        ) else None,
        snapshot_id=(
            snapshot_id if (dv_items and dv_mode == "v3") else None
        ),
        next_row_id=(rt_hwm + 1) if rt_hwm is not None else None,
        properties={
            "uniform.delta-version": v,
            # Delta writes parquet WITHOUT field ids; the spec's
            # Column Projection rule says external Iceberg readers
            # resolve such columns through the name mapping — the
            # same property real UniForm stamps
            "schema.name-mapping.default": _name_mapping(t),
        },
    )
    return t


def _name_mapping(t: IcebergTable) -> str:
    """``schema.name-mapping.default`` JSON (Iceberg spec, Name
    Mapping Serialization) for the table's current schema — how
    external readers resolve parquet files that carry no field ids
    (Delta- and Hudi-written data files)."""
    meta = t.metadata()
    return json.dumps([
        {"field-id": f["id"], "names": [f["name"]]}
        for f in meta["schemas"][meta["current-schema-id"]]["fields"]
    ])


def sync_delta_uniform(
    spark: SparkSession,
    iceberg_path: str,
    delta_path: str | None = None,
) -> DeltaProtocolTable:
    """REVERSE uniform: create or advance a Delta metadata twin of
    the Iceberg table at ``iceberg_path`` — zero copy, the mirror of
    ``sync_iceberg_uniform`` for shops standardized on Delta readers.

    - the Delta log lives under ``<iceberg>/_delta`` (or an explicit
      path); each sync is ONE Delta commit replacing the previous
      file set (remove + add), stamped ``uniform.iceberg-sequence``
      in the table configuration so re-syncing an already-synced
      snapshot is a no-op;
    - add actions carry ABSOLUTE ``path``s (spec-legal: "a relative
      path ... or an absolute path") referencing the Iceberg table's
      parquet in place; the Delta reader drops its ``basePath`` pin
      for such files (``_scan``), which is safe because the view is
      unpartitioned metadata over self-contained files;
    - Iceberg column bounds convert to Delta per-file stats
      (minValues/maxValues keyed by name), so the view data-skips
      exactly as the source would;
    - Iceberg POSITION DELETES convert to deletion vectors: the
      (file_path, pos) rows group per data file and one DV file per
      file writes worker-side under the Delta root (storageType "u"
      resolves against the view, not the source), with the protocol
      upgraded to reader 3 / writer 7 + deletionVectors.

    Scope gates (refuse loudly):
    - EQUALITY-delete debt: resolving values to positions needs a
      data scan, which would silently weaken the zero-copy claim —
      run ``purge_deletes()`` on the source first;
    - renamed columns anywhere in schema history: Iceberg resolves
      parquet columns by FIELD ID, the Delta view by NAME; a file
      written before the rename would surface the renamed column as
      NULL instead of its values.

    Partitioned (including hidden-partitioned) Iceberg tables work:
    Iceberg data files are self-contained (partition source columns
    live in the parquet), so the view simply carries unpartitioned
    metadata — layout pruning stays the Iceberg side's job. The
    Delta side is a READ view — write through the Iceberg table and
    re-sync (same contract as the forward direction)."""
    ice = IcebergTable(spark, iceberg_path)
    if ice.current_version() < 0:
        raise ValueError(f"no iceberg table at {iceberg_path}")
    meta = ice.metadata()
    snap = ice._snapshot_by(meta, None)
    if ice._equality_deletes_of_snapshot(snap):
        raise ValueError(
            "iceberg table carries equality-delete files; resolving "
            "them to row positions requires a data scan the zero-copy "
            "sync refuses to hide — run purge_deletes() first"
        )
    cur_fields = {
        f["id"]: f
        for f in meta["schemas"][meta["current-schema-id"]]["fields"]
    }
    for sch in meta["schemas"]:
        for f in sch["fields"]:
            cf = cur_fields.get(f["id"])
            if cf is not None and f["name"] != cf["name"]:
                raise ValueError(
                    f"column {f['name']!r} was renamed to "
                    f"{cf['name']!r}: Iceberg reads parquet by field "
                    "id, the Delta view by name — files written "
                    "before the rename would surface the column as "
                    "NULL; rewrite them (rewrite_data_files) first"
                )
    d_path = delta_path or os.path.join(iceberg_path, "_delta")
    d = DeltaProtocolTable(spark, d_path)
    v = d.latest_version()
    seq = int(snap["sequence-number"])
    old_meta: dict = {}
    old_active: dict[str, dict] = {}
    if v >= 0:
        old_meta, old_active = d._replay(v)
        synced = old_meta.get("configuration", {}).get(
            "uniform.iceberg-sequence"
        )
        if synced is not None and int(synced) >= seq:
            return d  # already current

    import time as _time
    import uuid as _uuid

    # Iceberg per-file bounds → Delta stats JSON (keyed by NAME), so
    # skipped_files/read_range prune identically through the view
    from .iceberg import _bound_value

    now_ms = int(_time.time() * 1000)
    adds: list[dict] = []
    for e in ice._entries_of_snapshot(snap, content=0):
        dfile = e["data_file"]
        stats = {
            "numRecords": int(dfile["record_count"]),
            "minValues": {}, "maxValues": {}, "nullCount": {},
        }
        for bkey, skey in (("lower_bounds", "minValues"),
                           ("upper_bounds", "maxValues")):
            for b in dfile.get(bkey) or []:
                f = cur_fields.get(b["key"])
                if f is None:
                    continue
                val = _bound_value(bytes(b["value"]), f["type"])
                if val is not None:
                    stats[skey][f["name"]] = val
        add = {
            "path": dfile["file_path"],  # absolute: external file
            "partitionValues": {},
            "size": int(dfile["file_size_in_bytes"]),
            "modificationTime": now_ms,
            "dataChange": True,
            "stats": json.dumps(stats),
        }
        # Iceberg v3 Row Lineage lifts into Delta Row Tracking
        # VERBATIM (the mirror of the forward lift): first_row_id IS
        # the file's baseRowId; the entry's data sequence number
        # stands in for defaultRowCommitVersion (both mean "commit
        # that last updated the uncarried rows" — materialized
        # _row_id columns read identically by name either way)
        if dfile.get("first_row_id") is not None:
            add["baseRowId"] = int(dfile["first_row_id"])
            add["defaultRowCommitVersion"] = int(
                e["sequence_number"]
            )
        adds.append(add)

    # position deletes → deletion vectors, one DV file per touched
    # data file, positions never on the driver (applyInPandas). The
    # delete-file set is content-addressed into the view config so an
    # unchanged set REUSES the prior sync's DV files instead of
    # rewriting every bitmap — re-syncs stay O(changed files).
    import hashlib

    descs: dict[str, dict] = {}
    pos_files = ice._delete_files_of_snapshot(snap)
    del_digest = ""
    if pos_files:
        del_digest = hashlib.sha256(json.dumps(sorted(
            (os.path.basename(p), os.path.getsize(p))
            for p in pos_files
        )).encode()).hexdigest()
    old_digest = old_meta.get("configuration", {}).get(
        "uniform.delete-files-digest"
    )
    if pos_files and v >= 0 and del_digest == old_digest:
        descs = {
            os.path.basename(p): a["deletionVector"]
            for p, a in old_active.items()
            if a.get("deletionVector")
        }
    elif pos_files:
        os.makedirs(d_path, exist_ok=True)
        doomed = (
            spark.read.schema("file_path string, pos long")
            .parquet(*pos_files)
            .select(
                F.substring_index(F.col("file_path"), "/", -1)
                .alias("__fname"),
                F.col("pos").alias("__pos"),
            )
        )
        descs = d._write_dvs(v, {}, doomed)
    for add in adds:
        dv = descs.get(os.path.basename(add["path"]))
        if dv is not None:
            add["deletionVector"] = dv

    config = {
        "uniform.iceberg-sequence": str(seq),
        "uniform.iceberg-snapshot": str(snap["snapshot-id"]),
        "uniform.delete-files-digest": del_digest,
    }
    # Iceberg v3 Row Lineage → the twin must ENABLE Delta Row
    # Tracking, not just carry baseRowId fields (ADVICE r13): the
    # spec scopes those add fields under the rowTracking feature,
    # external readers only surface row ids when
    # delta.enableRowTracking is set, and without a high-water mark
    # any write through the twin would mint colliding ids. The mark
    # mirrors the forward lift's counter carry: next-row-id - 1.
    next_rid = meta.get("next-row-id")
    rt_actions: list[dict] = []
    if next_rid is not None:
        config["delta.enableRowTracking"] = "true"
        config["delta.rowTracking.materializedRowIdColumnName"] = (
            DeltaProtocolTable.ROW_ID_COL
        )
        config[
            "delta.rowTracking.materializedRowCommitVersionColumnName"
        ] = DeltaProtocolTable.ROW_CV_COL
        rt_actions = [{"domainMetadata": {
            "domain": DeltaProtocolTable._RT_DOMAIN,
            "configuration": json.dumps(
                {"rowIdHighWaterMark": int(next_rid) - 1}
            ),
            "removed": False,
        }}]
    meta_action = {
        "metaData": {
            "id": old_meta.get("id") or str(_uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": ice._spark_schema(meta).json(),
            "partitionColumns": [],
            "configuration": config,
            "createdTime": old_meta.get("createdTime", now_ms),
        }
    }
    if v < 0:
        os.makedirs(d_path, exist_ok=True)
        protocol: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
        wfeatures = set()
        if descs:
            wfeatures.add("deletionVectors")
        if next_rid is not None:
            wfeatures |= {"rowTracking", "domainMetadata"}
        if wfeatures:
            protocol = {
                "minReaderVersion": 3 if descs else 1,
                "minWriterVersion": 7,
                "writerFeatures": sorted(wfeatures),
            }
            if descs:
                protocol["readerFeatures"] = ["deletionVectors"]
        d._write_commit(0, [
            d._commit_info("UNIFORM SYNC"),
            {"protocol": protocol},
            meta_action,
            *rt_actions,
            *({"add": a} for a in adds),
        ])
        return d
    # O(delta) re-sync: only files that appeared, vanished, or whose
    # payload (stats / size / DV descriptor) changed get log actions —
    # an unchanged 1M-file table with one new file commits ONE
    # remove-free add, not a full remove+add churn
    new_by_path = {a["path"]: a for a in adds}
    removes = {
        p: o for p, o in old_active.items() if p not in new_by_path
    }
    to_add: list[dict] = []
    for p, a in new_by_path.items():
        o = old_active.get(p)
        if o is not None and (
            o.get("stats") == a["stats"]
            and o.get("size") == a["size"]
            and o.get("deletionVector") == a.get("deletionVector")
        ):
            continue  # carried unchanged: no action
        if o is not None:
            removes[p] = o
        to_add.append(a)
    rt_upgrade: list[dict] = []
    if next_rid is not None:
        rt_upgrade = d._protocol_upgrade_for_writer_features(
            v, {"rowTracking", "domainMetadata"}
        )
        if descs:
            # merge into one protocol action: a commit carries at
            # most one (fold DV needs into the feature upgrade)
            dv_up = d._protocol_upgrade_for_dv(v)
            if dv_up and rt_upgrade:
                p = rt_upgrade[0]["protocol"]
                q = dv_up[0]["protocol"]
                p["minReaderVersion"] = max(
                    p.get("minReaderVersion", 1),
                    q.get("minReaderVersion", 1),
                )
                rf = set(p.get("readerFeatures") or []) | set(
                    q.get("readerFeatures") or []
                )
                if rf:
                    p["readerFeatures"] = sorted(rf)
                p["writerFeatures"] = sorted(
                    set(p.get("writerFeatures") or [])
                    | set(q.get("writerFeatures") or [])
                )
            elif dv_up:
                rt_upgrade = dv_up
    elif descs:
        rt_upgrade = d._protocol_upgrade_for_dv(v)
    actions = [
        d._commit_info("UNIFORM SYNC"),
        *rt_upgrade,
        meta_action,
        *rt_actions,
        *d._remove_actions(removes),
        *({"add": a} for a in to_add),
    ]
    d._commit_with_retry(v + 1, actions, read_version=v)
    return d


def sync_iceberg_uniform_hudi(
    spark: SparkSession,
    hudi_path: str,
    iceberg_path: str | None = None,
) -> IcebergTable:
    """Iceberg metadata twin of a Hudi table at its latest completed
    instant — zero copy, same contract as the Delta sync. Hudi base
    files are self-contained (meta columns AND partition columns live
    in the parquet; the Iceberg read schema simply prunes the
    ``_hoodie_*`` columns), so partitioned Hudi tables work — the
    view carries an unpartitioned spec (layout pruning is the Hudi
    side's job). MERGE_ON_READ tables with unmerged log files refuse:
    log rows cannot be referenced by Iceberg manifests — run
    ``compact()`` first, the honest boundary."""
    from .avro_ocf import spark_schema_of
    from .hudi_table import HudiTable

    h = HudiTable(spark, hudi_path)
    inst = h._resolve_instant(None)
    slices = h.file_slices()
    logged = [k for k, s in slices.items() if s["_logs"]]
    if logged:
        raise ValueError(
            f"{len(logged)} file slices carry unmerged log files; "
            "Iceberg manifests cannot reference Hudi log rows — run "
            "compact() first"
        )
    ice_path = iceberg_path or os.path.join(hudi_path, "_iceberg")
    t = IcebergTable(spark, ice_path)
    if t.current_version() < 0:
        data_schema = spark_schema_of(
            json.loads(h._schema_avro())
        )  # meta columns excluded: the view prunes them at read
        t = IcebergTable.create(
            spark, ice_path, spark.createDataFrame([], data_schema)
        )
    else:
        synced = t.metadata().get("properties", {}).get(
            "uniform.hudi-instant"
        )
        if synced is not None and synced >= inst:
            return t
    data_files = [
        {
            "content": 0,
            "file_path": os.path.join(hudi_path, s["path"]),
            "file_format": "PARQUET",
            "partition": {},
            "record_count": int(s["numWrites"]),
            "file_size_in_bytes": int(s["fileSizeInBytes"]),
            "lower_bounds": None,
            "upper_bounds": None,
        }
        for _k, s in sorted(slices.items())
    ]
    t.commit_external_snapshot(
        data_files, [], "replace",
        properties={
            "uniform.hudi-instant": inst,
            # Hudi base files carry no parquet field ids either:
            # external readers need the name mapping (see above)
            "schema.name-mapping.default": _name_mapping(t),
        },
    )
    return t
