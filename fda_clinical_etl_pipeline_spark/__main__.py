"""CLI — the engine's operational surface (the reference's stage runner
scripts, test/run_{ingest,validate,scrup,transform}.py, collapsed into
verbs on ONE process; SURVEY.md §3.1).

    python -m fda_clinical_etl_pipeline_spark run-batch <source> <file> --lake DIR
    python -m fda_clinical_etl_pipeline_spark run-all --lake DIR
    python -m fda_clinical_etl_pipeline_spark lineage <batch_id> --lake DIR
    python -m fda_clinical_etl_pipeline_spark failed --lake DIR
    python -m fda_clinical_etl_pipeline_spark serve-api --lake DIR --port 8000
    python -m fda_clinical_etl_pipeline_spark corpus-report --docs PARQUET
    python -m fda_clinical_etl_pipeline_spark resume --lake DIR
    python -m fda_clinical_etl_pipeline_spark violations --lake DIR
    python -m fda_clinical_etl_pipeline_spark chunk --docs PARQUET --out DIR
    python -m fda_clinical_etl_pipeline_spark delta-register --lake DIR --source S
    python -m fda_clinical_etl_pipeline_spark explain <query> [--mode formatted]
    python -m fda_clinical_etl_pipeline_spark bpe-train --docs PARQUET --merges N

Where the reference needs four OS processes + Postgres between stages,
each verb here is one Spark job over the lake directory. delta-register
is the reference's `python -m hudi.register_hudi <source>` flow
(hudi/register_hudi.py:99-106) against the open Delta-protocol format.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(cpus: str | None):
    from .session import get_spark

    master = f"local[{cpus}]" if cpus else None
    return get_spark(master=master)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="fda_clinical_etl_pipeline_spark")
    p.add_argument("--cpus", default=None, help="local[N] cores")
    sub = p.add_subparsers(dest="cmd", required=True)

    rb = sub.add_parser("run-batch", help="one file through all four stages")
    rb.add_argument("source_name")
    rb.add_argument("file_path")
    rb.add_argument("--lake", required=True)

    ra = sub.add_parser("run-all", help="every file of every active source")
    ra.add_argument("--lake", required=True)

    rb2 = sub.add_parser(
        "run-bulk", help="all files of a source in one plan (deployment path)"
    )
    rb2.add_argument("source_name")
    rb2.add_argument("files_dir")
    rb2.add_argument("--lake", required=True)

    lin = sub.add_parser("lineage", help="assembled lineage for a batch")
    lin.add_argument("batch_id")
    lin.add_argument("--lake", required=True)

    fl = sub.add_parser("failed", help="batches in FAILED_* states")
    fl.add_argument("--lake", required=True)

    api = sub.add_parser("serve-api", help="lineage REST API (stdlib HTTP)")
    api.add_argument("--lake", required=True)
    api.add_argument("--port", type=int, default=8000)

    cr = sub.add_parser("corpus-report", help="training-corpus prep accounting")
    cr.add_argument("--docs", required=True, help="documents parquet path")

    rs = sub.add_parser(
        "resume", help="drive every non-terminal batch to completion"
    )
    rs.add_argument("--lake", required=True)

    tv = sub.add_parser(
        "violations", help="status-machine transition violations (sweep)"
    )
    tv.add_argument("--lake", required=True)

    ch = sub.add_parser("chunk", help="chunk documents into training units")
    ch.add_argument("--docs", required=True, help="documents parquet path")
    ch.add_argument("--out", required=True, help="output parquet path")

    dr = sub.add_parser(
        "delta-register",
        help="latest QLM artifact -> Delta-protocol table upsert "
             "(the reference's register_hudi flow, open table format)",
    )
    dr.add_argument("--lake", required=True)
    dr.add_argument("--source", required=True)
    dr.add_argument("--key", default="patient_id")
    dr.add_argument("--precombine", default="visit_date")

    hr = sub.add_parser(
        "hudi-register",
        help="latest QLM artifact -> Hudi COW table upsert + commit "
             "listing (the reference's register_hudi flow, "
             "hudi/register_hudi.py:99-106, in its literal format)",
    )
    hr.add_argument("--lake", required=True)
    hr.add_argument("--source", required=True)
    hr.add_argument("--key", default="patient_id")
    hr.add_argument("--precombine", default="visit_date")
    hr.add_argument(
        "--rollback-incomplete", action="store_true",
        help="first roll back crashed writers' incomplete instants",
    )

    cv = sub.add_parser(
        "convert",
        help="migrate a table between the three open formats "
             "(delta/iceberg/hudi), merge-on-read state folded in",
    )
    cv.add_argument("src", help="source table root (format detected)")
    cv.add_argument("dst", help="destination path (must not exist)")
    cv.add_argument("--to", required=True,
                    choices=["delta", "iceberg", "hudi"])
    cv.add_argument("--key", default=None)
    cv.add_argument("--precombine", default=None)
    cv.add_argument("--history", type=int, default=1,
                    help="replay the last N source versions")

    ex = sub.add_parser(
        "explain",
        help="print a registered query's physical plan (the .explain "
             "discipline, on demand)",
    )
    ex.add_argument("query", help="registry name; 'list' to enumerate")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.add_argument("--mode", default="formatted",
                    choices=["simple", "extended", "formatted", "cost"])

    bt = sub.add_parser(
        "bpe-train", help="learn a BPE merge list from a document corpus"
    )
    bt.add_argument("--docs", required=True)
    bt.add_argument("--merges", type=int, default=16)

    ir = sub.add_parser(
        "iceberg-register",
        help="latest QLM artifact -> Iceberg v2 table upsert (the "
             "same register flow against the second open format)",
    )
    ir.add_argument("--lake", required=True)
    ir.add_argument("--source", required=True)
    ir.add_argument("--key", default="patient_id")
    ir.add_argument("--precombine", default="visit_date")

    dm = sub.add_parser(
        "delta-metrics",
        help="table health from the Delta log alone (zero file reads): "
             "files/bytes/rows/small-file share, plus recent history",
    )
    dm.add_argument("path", help="Delta table root")
    dm.add_argument("--version", type=int, default=None)

    dc = sub.add_parser(
        "delta-changes",
        help="Change Data Feed: row-level changes between two "
             "versions as JSON lines (_change_type/_commit_version)",
    )
    dc.add_argument("path", help="Delta table root")
    dc.add_argument("start", type=int)
    dc.add_argument("--end", type=int, default=None)
    dc.add_argument("--limit", type=int, default=100)

    ch = sub.add_parser(
        "changes",
        help="unified change feed: row-level churn (or --net "
             "window-endpoint deltas) from a delta/iceberg/hudi "
             "table as JSON lines — format detected",
    )
    ch.add_argument("path", help="Delta, Iceberg or Hudi table root")
    ch.add_argument("--start", default=None,
                    help="window start (delta version / iceberg "
                         "snapshot id / hudi instant; exclusive)")
    ch.add_argument("--end", default=None)
    ch.add_argument("--net", action="store_true")
    ch.add_argument("--keys", default=None,
                    help="comma-separated key columns (required "
                         "with --net)")
    ch.add_argument("--limit", type=int, default=100)

    ie = sub.add_parser(
        "iceberg-expire",
        help="expire all but the newest N snapshots and delete files "
             "reachable only from expired ones",
    )
    ie.add_argument("path", help="Iceberg table root")
    ie.add_argument("--keep-last", type=int, default=2)

    ic = sub.add_parser(
        "iceberg-changes",
        help="changelog scan: row-level insert/delete deltas between "
             "two snapshots as JSON lines (the CDF twin of "
             "delta-changes)",
    )
    ic.add_argument("path", help="Iceberg table root")
    ic.add_argument("--from-snapshot", type=int, default=None)
    ic.add_argument("--to-snapshot", type=int, default=None)
    ic.add_argument("--limit", type=int, default=100)

    cp = sub.add_parser(
        "compact",
        help="small-file compaction of a delta or iceberg table "
             "(format detected); --sort-by re-lays iceberg files "
             "range-disjoint on the key",
    )
    cp.add_argument("path", help="table root")
    cp.add_argument("--target-mb", type=int, default=128)
    cp.add_argument("--sort-by", default=None,
                    help="comma-separated sort columns (iceberg)")

    cl = sub.add_parser(
        "clone",
        help="zero-copy (hardlink) shallow clone of a delta table; "
             "--deep copies bytes",
    )
    cl.add_argument("src", help="Delta table root")
    cl.add_argument("dst", help="clone target (must not exist)")
    cl.add_argument("--deep", action="store_true")

    us = sub.add_parser(
        "uniform-sync",
        help="build/advance a zero-copy metadata twin: delta/hudi "
             "source -> Iceberg view (default), or iceberg source -> "
             "Delta view (the reverse direction; format detected)",
    )
    us.add_argument("src", help="Delta, Hudi or Iceberg table root")
    us.add_argument("--iceberg-path", default=None)
    us.add_argument(
        "--delta-path", default=None,
        help="view root for an Iceberg source (default "
             "<src>/_delta)",
    )

    args = p.parse_args(argv)
    from pyspark.sql import SparkSession

    # Only stop the session on exit if this CLI created it — under
    # getOrCreate an embedding process (tests, a notebook) may own an
    # active session that must survive the verb.
    owns_session = SparkSession.getActiveSession() is None
    spark = _spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd in ("run-batch", "run-all", "run-bulk"):
            from .pipeline import ClinicalPipeline, Zones

            pipe = ClinicalPipeline(spark, Zones(args.lake))
            if args.cmd == "run-batch":
                out = pipe.run_batch(args.source_name, args.file_path)
            elif args.cmd == "run-bulk":
                out = pipe.run_bulk(args.source_name, args.files_dir)
            else:
                out = pipe.run_all()
            print(json.dumps(out))
        elif args.cmd == "lineage":
            from .plans.provenance import ProvenanceStore
            import os

            store = ProvenanceStore(spark, os.path.join(args.lake, "provenance"))
            rows = store.lineage(args.batch_id).collect()
            if not rows:
                print(json.dumps({"error": "batch not found"}))
                return 1
            print(json.dumps(rows[0].asDict(), default=str))
        elif args.cmd == "failed":
            from .plans.provenance import ProvenanceStore
            import os

            store = ProvenanceStore(spark, os.path.join(args.lake, "provenance"))
            print(json.dumps(
                [r.asDict() for r in store.failed().collect()], default=str
            ))
        elif args.cmd == "serve-api":
            from .api import serve_stdlib
            from .plans.provenance import ProvenanceStore
            import os

            store = ProvenanceStore(spark, os.path.join(args.lake, "provenance"))
            server = serve_stdlib(store, port=args.port)
            print(f"serving on 127.0.0.1:{server.server_address[1]}",
                  file=sys.stderr)
            server.serve_forever()
        elif args.cmd == "corpus-report":
            from .operators.corpus import corpus_report

            docs = spark.read.parquet(args.docs)
            print(json.dumps(corpus_report(docs)))
        elif args.cmd == "resume":
            from .pipeline import ClinicalPipeline, Zones

            pipe = ClinicalPipeline(spark, Zones(args.lake))
            print(json.dumps(pipe.resume_pending()))
        elif args.cmd == "violations":
            from .plans.provenance import ProvenanceStore
            import os

            store = ProvenanceStore(spark, os.path.join(args.lake, "provenance"))
            print(json.dumps(
                [r.asDict() for r in store.transition_violations().collect()],
                default=str,
            ))
        elif args.cmd == "explain":
            from .registry import all_queries

            qs = all_queries()
            if args.query == "list":
                print(json.dumps(sorted(qs)))
            elif args.query not in qs:
                print(json.dumps({"error": f"unknown query {args.query}",
                                  "hint": "use 'explain list'"}))
                return 1
            else:
                qs[args.query].fn(spark, args.sf_dir).explain(mode=args.mode)
        elif args.cmd == "bpe-train":
            from .operators.bpe import bpe_train

            docs = spark.read.parquet(args.docs).select("text")
            merges = bpe_train(docs, num_merges=args.merges)
            print(json.dumps({"merges": [list(m) for m in merges]}))
        elif args.cmd == "chunk":
            from .operators.llmprep import chunk_documents

            docs = spark.read.parquet(args.docs).select("doc_id", "text")
            chunk_documents(docs).write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(json.dumps({"chunks": n, "out": args.out}))
        elif args.cmd == "delta-metrics":
            from .sources.delta_log import DeltaProtocolTable

            t = DeltaProtocolTable(spark, args.path)
            if t.latest_version() < 0:
                print(json.dumps({"error": f"no delta table at {args.path}"}))
                return 1
            out = t.table_metrics(version=args.version)
            out["history_tail"] = t.history()[-5:]
            print(json.dumps(out, default=str))
        elif args.cmd == "delta-changes":
            from .sources.delta_log import DeltaProtocolTable

            t = DeltaProtocolTable(spark, args.path)
            rows = (
                t.table_changes(args.start, args.end)
                .limit(args.limit)
                .collect()
            )
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
        elif args.cmd == "changes":
            from .sources.cdc import read_changes
            from .sources.convert import detect_format

            fmt = detect_format(args.path)
            if fmt == "delta":
                from .sources.delta_log import DeltaProtocolTable

                table = DeltaProtocolTable(spark, args.path)
                start = (int(args.start)
                         if args.start is not None else None)
                end = int(args.end) if args.end is not None else None
            elif fmt == "iceberg":
                from .sources.iceberg import IcebergTable

                table = IcebergTable(spark, args.path)
                start = (int(args.start)
                         if args.start is not None else None)
                end = int(args.end) if args.end is not None else None
            elif fmt == "hudi":
                from .sources.hudi_table import HudiTable

                table = HudiTable(spark, args.path)
                start, end = args.start, args.end
            else:
                print(json.dumps({
                    "error": f"no table format detected at "
                             f"{args.path}"
                }))
                return 1
            keys = args.keys.split(",") if args.keys else None
            rows = read_changes(
                table, start=start, end=end,
                net=args.net, keys=keys,
            ).limit(args.limit).collect()
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
        elif args.cmd == "iceberg-expire":
            from .sources.iceberg import IcebergTable

            t = IcebergTable(spark, args.path)
            removed = t.expire_snapshots(keep_last=args.keep_last)
            print(json.dumps({
                "removed": len(removed),
                "kept_snapshots": len(t.history()),
            }))
        elif args.cmd == "iceberg-changes":
            from .sources.iceberg import IcebergTable

            t = IcebergTable(spark, args.path)
            rows = (
                t.changelog_scan(args.from_snapshot, args.to_snapshot)
                .limit(args.limit)
                .collect()
            )
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
        elif args.cmd == "compact":
            from .sources.convert import detect_format

            fmt = detect_format(args.path)
            if fmt == "iceberg":
                from .sources.iceberg import IcebergTable

                t = IcebergTable(spark, args.path)
                before = len(t._entries_of_current())
                t.rewrite_data_files(
                    target_file_size_bytes=args.target_mb << 20,
                    sort_by=(args.sort_by.split(",")
                             if args.sort_by else None),
                )
                print(json.dumps({
                    "format": fmt, "files_before": before,
                    "files_after": len(t._entries_of_current()),
                }))
            elif fmt == "delta":
                from .sources.delta_log import DeltaProtocolTable

                t = DeltaProtocolTable(spark, args.path)
                _, a0 = t._replay(t.latest_version())
                if args.sort_by:
                    t.compact(zorder_by=args.sort_by.split(","))
                else:
                    t.compact()
                _, a1 = t._replay(t.latest_version())
                print(json.dumps({
                    "format": fmt, "files_before": len(a0),
                    "files_after": len(a1),
                }))
            else:
                print(json.dumps({
                    "error": f"unsupported format {fmt} (hudi "
                             "compaction: the table's compact()/"
                             "cluster() maintenance verbs)"
                }))
                return 1
        elif args.cmd == "clone":
            from .sources.delta_log import DeltaProtocolTable

            t = DeltaProtocolTable(spark, args.src)
            c = t.clone(
                args.dst, mode="deep" if args.deep else "shallow"
            )
            print(json.dumps({
                "src": args.src, "dst": args.dst,
                "mode": "deep" if args.deep else "shallow",
                "rows": c.snapshot().count(),
            }))
        elif args.cmd == "uniform-sync":
            from .sources.convert import detect_format
            from .sources.uniform import (
                sync_iceberg_uniform, sync_iceberg_uniform_hudi,
            )

            fmt = detect_format(args.src)
            if fmt == "delta":
                t = sync_iceberg_uniform(
                    spark, args.src, args.iceberg_path
                )
            elif fmt == "hudi":
                t = sync_iceberg_uniform_hudi(
                    spark, args.src, args.iceberg_path
                )
            elif fmt == "iceberg":
                from .sources.uniform import sync_delta_uniform

                d = sync_delta_uniform(
                    spark, args.src, args.delta_path
                )
                print(json.dumps({
                    "src": args.src, "src_format": fmt,
                    "delta": d.path,
                    "rows": d.snapshot().count(),
                }))
                return 0
            else:
                print(json.dumps({
                    "error": f"source format {fmt} has no uniform "
                             "sync"
                }))
                return 1
            print(json.dumps({
                "src": args.src, "src_format": fmt,
                "iceberg": t.path,
                "rows": t.snapshot().count(),
            }))
        elif args.cmd == "delta-register":
            # the reference's `python -m hudi.register_hudi <source>`
            # (hudi/register_hudi.py:8-96): pick the latest qlm_ready
            # artifact, upsert into the versioned table, list commits —
            # here against the open Delta-protocol format
            import os

            from .sources.delta_log import DeltaProtocolTable

            base = os.path.join(args.lake, "qlm_ready", args.source)
            stamps = sorted(
                d for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d))
            )
            if not stamps:
                print(json.dumps({"error": "no qlm artifacts"}))
                return 1
            latest = os.path.join(base, stamps[-1])
            # a timestamp dir holds one parquet dir per batch
            # (qlm_ready/<source>/<ts>/<batch_id>/part-*.parquet)
            batches = sorted(
                os.path.join(latest, b) for b in os.listdir(latest)
                if os.path.isdir(os.path.join(latest, b))
            ) or [latest]
            df = spark.read.parquet(*batches)
            tpath = os.path.join(args.lake, "delta", args.source)
            table = DeltaProtocolTable(
                spark, tpath, key=args.key, precombine=args.precombine
            )
            if table.latest_version() < 0:
                table = DeltaProtocolTable.create(
                    spark, tpath, df,
                    key=args.key, precombine=args.precombine,
                )
            else:
                table.upsert(df)
            commits = list(reversed(table.history()))
            print(json.dumps({
                "table": tpath,
                "artifact": latest,
                "rows": table.snapshot().count(),
                "latest_commit": commits[0],
                "n_commits": len(commits),
            }, default=str))
        elif args.cmd == "iceberg-register":
            import os

            from .sources.iceberg import IcebergTable

            base = os.path.join(args.lake, "qlm_ready", args.source)
            stamps = sorted(
                d for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d))
            )
            if not stamps:
                print(json.dumps({"error": "no qlm artifacts"}))
                return 1
            latest = os.path.join(base, stamps[-1])
            batches = sorted(
                os.path.join(latest, b) for b in os.listdir(latest)
                if os.path.isdir(os.path.join(latest, b))
            ) or [latest]
            df = spark.read.parquet(*batches)
            tpath = os.path.join(args.lake, "iceberg", args.source)
            t = IcebergTable(spark, tpath)
            if t.current_version() < 0:
                t = IcebergTable.create(spark, tpath, df)
            else:
                t.upsert(df, key=args.key, precombine=args.precombine)
            hist = t.history()
            print(json.dumps({
                "table": tpath,
                "artifact": latest,
                "rows": t.snapshot().count(),
                "latest_snapshot": hist[-1],
                "n_snapshots": len(hist),
            }, default=str))
        elif args.cmd == "hudi-register":
            # the reference's register_hudi flow verbatim
            # (hudi/register_hudi.py:43-96): latest qlm artifact,
            # upsert keyed by patient_id / precombine visit_date,
            # then the distinct(_hoodie_commit_time) DESC listing
            import os

            from .sources.hudi_table import HudiTable

            base = os.path.join(args.lake, "qlm_ready", args.source)
            stamps = sorted(
                d for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d))
            )
            if not stamps:
                print(json.dumps({"error": "no qlm artifacts"}))
                return 1
            latest = os.path.join(base, stamps[-1])
            batches = sorted(
                os.path.join(latest, b) for b in os.listdir(latest)
                if os.path.isdir(os.path.join(latest, b))
            ) or [latest]
            df = spark.read.parquet(*batches)
            tpath = os.path.join(args.lake, "hudi", args.source)
            t = HudiTable(spark, tpath)
            if not os.path.isfile(os.path.join(
                t.hoodie_dir, "hoodie.properties"
            )):
                t = HudiTable.create(
                    spark, tpath, args.source,
                    record_key=args.key, precombine=args.precombine,
                )
            rolled = (
                t.rollback_incomplete()
                if args.rollback_incomplete else []
            )
            t.upsert(df)
            commit_list = [
                r["_hoodie_commit_time"]
                for r in t.commit_times().collect()
            ]
            print(json.dumps({
                "table": tpath,
                "artifact": latest,
                "rows": t.snapshot().count(),
                "commits": commit_list,
                "latest_commit": commit_list[0] if commit_list
                else None,
                "rolled_back": [r["instant"] for r in rolled],
            }, default=str))
        elif args.cmd == "convert":
            from .sources.convert import convert_table, detect_format

            src_fmt = detect_format(args.src)
            dst = convert_table(
                spark, args.src, args.dst, args.to,
                record_key=args.key, precombine=args.precombine,
                history_versions=args.history,
            )
            print(json.dumps({
                "src": args.src, "src_format": src_fmt,
                "dst": args.dst, "dst_format": args.to,
                "rows": dst.snapshot().count(),
            }, default=str))
        return 0
    finally:
        if args.cmd != "serve-api" and owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
