"""CLI entry points — the reference's operational surface (C8).

The reference is driven by shell scripts (`runJobForInitialLoad.sh`,
`runJobForIncrementalLoad.sh`, `resetForInitialLoad.sh`); here the same
operations are subcommands::

    python -m glue_hudi_spark run     --control control.json --raw RAW --curated CUR
    python -m glue_hudi_spark reset   --control control.json --raw RAW --curated CUR [--table T]
    python -m glue_hudi_spark compact --control control.json --curated CUR --table T
    python -m glue_hudi_spark cluster --control control.json --curated CUR --table T
    python -m glue_hudi_spark show    --control control.json --curated CUR --table T

``run`` is mode-agnostic like the reference's job: each table's initial-
vs-incremental branch is decided by the table-exists probe + bookmark
ledger, so "initial load" is simply the first run.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from glue_hudi_spark.config import ControlStore
from glue_hudi_spark.pipeline import CdcPipeline
from glue_hudi_spark.session import get_spark


def _common(p: argparse.ArgumentParser, raw: bool = True) -> None:
    p.add_argument("--control", required=True, help="control-store JSON path")
    if raw:
        p.add_argument("--raw", required=True, help="raw landing root dir")
    p.add_argument("--curated", required=True, help="curated table root dir")
    p.add_argument("--job", default=None, help="filter control records by glue_job_name")
    p.add_argument("--table", default=None, help="restrict to one table_name")
    p.add_argument("--single-commit", action="store_true",
                   help="atomic one-commit merge instead of the reference's I/U/D commit sequence")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="glue_hudi_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    prun = sub.add_parser("run", help="ingest pending raw files for every managed table")
    _common(prun)
    prun.add_argument("--parallel", type=int, default=1, metavar="N",
                      help="process up to N tables concurrently (tables are "
                           "independent; Spark interleaves their jobs)")
    _common(sub.add_parser("reset", help="drop curated data + bookmarks (replay path)"))
    pc = sub.add_parser("compact", help="force MoR compaction for one table")
    _common(pc, raw=False)
    po = sub.add_parser("optimize", help="bin-pack undersized files "
                                         "(rewrites only slivers; "
                                         "full files carry over)")
    _common(po, raw=False)
    po.add_argument("--target-mb", type=int, default=128, metavar="MB",
                    help="pack files smaller than this (default 128)")
    prw = sub.add_parser("rewrite-files",
                         help="bounded incremental file rewrite (migrate "
                              "legacy-spec files / bounded passes; "
                              "everything else carries by reference)")
    _common(prw, raw=False)
    prw.add_argument("--legacy-spec-only", action="store_true",
                     help="rewrite only files not under the current "
                          "partition spec (evolution migration)")
    prw.add_argument("--max-files", type=int, default=None, metavar="N",
                     help="hard per-pass bound (deterministic order)")
    pcl = sub.add_parser("clone", help="zero-copy shallow clone of a table "
                                       "(hardlinked data, independent "
                                       "timeline)")
    _common(pcl, raw=False)
    pcl.add_argument("--dest", required=True, help="destination table root")
    pk = sub.add_parser("cluster", help="rewrite CoW files at the configured clustering width")
    _common(pk, raw=False)
    pk.add_argument("--zorder", default=None, metavar="COL,COL",
                    help="lay files along a Morton curve over these 2-4 "
                         "columns (multi-dimensional data skipping) "
                         "instead of the record-key range")
    ps = sub.add_parser("show", help="print snapshot stats + commit history")
    _common(ps, raw=False)
    pf = sub.add_parser("fsck", help="manifest-vs-disk consistency report")
    _common(pf, raw=False)
    pr = sub.add_parser("rollback", help="restore a table to a prior commit "
                                         "(default: undo the latest) — "
                                         "non-destructive, history retained")
    _common(pr, raw=False)
    pr.add_argument("--to-commit", type=int, default=None, metavar="ID",
                    help="target commit id (default: the one before latest)")
    pre = sub.add_parser("restore", help="DESTRUCTIVELY rewind the timeline to "
                                         "a commit, deleting later commits' "
                                         "files (Hudi restore --instant)")
    _common(pre, raw=False)
    pre.add_argument("--to-commit", type=int, required=True, metavar="ID",
                     help="target commit id (later commits are erased)")
    pv = sub.add_parser("vacuum", help="delete orphan files crashed/OCC-losing "
                                       "writers left behind")
    _common(pv, raw=False)
    pa = sub.add_parser("analyze", help="one-pass per-column stats (NDV, "
                                        "nulls, min/max) persisted beside "
                                        "the timeline")
    _common(pa, raw=False)
    pa.add_argument("--columns", default=None, metavar="COL,COL",
                    help="restrict to these columns (default: all)")
    pp = sub.add_parser("pull", help="export the incremental change feed "
                                     "since a commit as parquet (downstream "
                                     "consumer hand-off)")
    _common(pp, raw=False)
    pp.add_argument("--since-commit", type=int, required=True, metavar="ID")
    pp.add_argument("--end-commit", type=int, default=None, metavar="ID")
    pp.add_argument("--out", required=True, help="output parquet dir")
    pp.add_argument("--cdf", action="store_true",
                    help="Delta-CDF rows (insert/update pre+post/delete) "
                         "instead of the plain rows-changed feed")
    prp = sub.add_parser("replicate", help="drain a source table's change "
                                           "feed into a replica table "
                                           "(exactly-once, resumable via "
                                           "checkpoint)")
    _common(prp, raw=False)
    prp.add_argument("--dest", required=True, help="replica tables root dir")
    prp.add_argument("--checkpoint", required=True,
                     help="stream checkpoint root dir")
    prp.add_argument("--sync-deletes", action="store_true",
                     help="also run the delete reconciliation pass "
                          "(upstream deletes propagate to the replica)")
    prn = sub.add_parser("rename-column", help="metadata-only column "
                                               "rename (column mapping; "
                                               "zero data rewrite)")
    _common(prn, raw=False)
    prn.add_argument("--from", dest="col_from", required=True,
                     metavar="OLD", help="current column name")
    prn.add_argument("--to", dest="col_to", required=True,
                     metavar="NEW", help="new column name")
    pdc = sub.add_parser("drop-column", help="metadata-only column drop "
                                             "(hidden from reads; compact "
                                             "materializes)")
    _common(pdc, raw=False)
    pdc.add_argument("--column", required=True, help="column to drop")
    pac = sub.add_parser("add-column", help="metadata-only column add "
                                            "(optional DEFAULT backfills "
                                            "pre-add rows at the scan; "
                                            "zero data rewrite)")
    _common(pac, raw=False)
    pac.add_argument("--column", required=True, help="new column name")
    pac.add_argument("--type", dest="col_type", required=True,
                     metavar="DDL", help="Spark DDL type, e.g. string, "
                                         "bigint, decimal(10,2)")
    pac.add_argument("--default", default=None,
                     help="optional DEFAULT literal (JSON scalar; "
                          "numbers auto-detected)")
    pep = sub.add_parser("evolve-partition",
                         help="metadata-only partition-spec change "
                              "(Iceberg partition evolution; old files "
                              "stay put, compact migrates)")
    _common(pep, raw=False)
    pep.add_argument("--spec", nargs="*", default=[], metavar="FIELD",
                     help="new spec entries, e.g. 'months(ts)' "
                          "'bucket(8, user_id)'; empty = unpartitioned")
    prl = sub.add_parser("release", help="pin a named multi-table dataset "
                                         "release: tag EVERY managed table "
                                         "+ write one release manifest")
    _common(prl, raw=False)
    prl.add_argument("--name", required=True)
    pdr = sub.add_parser("drop-release", help="drop a release's tags and "
                                             "manifest (frees its files "
                                             "for retention)")
    _common(pdr, raw=False)
    pdr.add_argument("--name", required=True)
    pmt = sub.add_parser("maintain", help="one-call service pass: compact "
                                          "MoR deltas + bin-pack + clean "
                                          "+ vacuum (+ optional age expiry)")
    _common(pmt, raw=False)
    pmt.add_argument("--target-mb", type=int, default=128,
                     help="bin-pack target file size in MB (default 128)")
    pmt.add_argument("--expire-older-than", default=None,
                     help="also expire history before this ISO timestamp")
    pin = sub.add_parser("inspect", help="metadata tables (Iceberg "
                                         "files/partitions/snapshots/refs "
                                         "class) — zero data reads")
    _common(pin, raw=False)
    pin.add_argument("--kind", required=True,
                     choices=["files", "partitions", "snapshots", "refs"])
    pex = sub.add_parser("expire", help="age-based history expiration "
                                        "(Iceberg expire_snapshots): drop "
                                        "commits older than a timestamp")
    _common(pex, raw=False)
    pex.add_argument("--older-than", required=True,
                     help="ISO-8601 timestamp or epoch seconds")
    pex.add_argument("--retain-last", type=int, default=1,
                     help="always keep the newest N commits (default 1)")
    pbr = sub.add_parser("branch", help="fork a zero-copy named branch "
                                        "from the table head (Iceberg "
                                        "ref class; WAP staging)")
    _common(pbr, raw=False)
    pbr.add_argument("--name", required=True, help="branch name")
    pbr.add_argument("--at", type=int, default=None,
                     help="fork at this commit id (default: head)")
    pdb = sub.add_parser("drop-branch", help="delete a branch's timeline "
                                             "(vacuum reclaims unmerged "
                                             "files)")
    _common(pdb, raw=False)
    pdb.add_argument("--name", required=True)
    ptg = sub.add_parser("tag", help="pin an immutable named tag at a "
                                     "commit — retention-protected, "
                                     "read with tag=...")
    _common(ptg, raw=False)
    ptg.add_argument("--name", required=True)
    ptg.add_argument("--at", type=int, default=None,
                     help="tag this commit id (default: head)")
    pdt = sub.add_parser("drop-tag", help="remove a named tag")
    _common(pdt, raw=False)
    pdt.add_argument("--name", required=True)
    pff = sub.add_parser("fast-forward", help="publish a branch head onto "
                                              "main (metadata-only; "
                                              "refuses if main advanced)")
    _common(pff, raw=False)
    pff.add_argument("--name", required=True)
    pff.add_argument("--drop", action="store_true",
                     help="drop the branch after publishing")
    pcu = sub.add_parser("curate", help="run a config-declared corpus "
                                        "curation pipeline (quality/LM "
                                        "filters, dedup, token budget) "
                                        "into a curated table")
    pcu.add_argument("--pipeline", required=True,
                     help="pipeline JSON (see glue_hudi_spark.curation)")
    pcu.add_argument("--input", required=True,
                     help="input documents parquet path/dir")
    pcu.add_argument("--output", required=True,
                     help="curated NativeTable root dir")
    pcu.add_argument("--id-col", default="doc_id")
    psq = sub.add_parser("sql", help="execute SQL text against a "
                                     "warehouse of ghs tables (GhsSql: "
                                     "CREATE/INSERT/UPDATE/DELETE/MERGE/"
                                     "ALTER/OPTIMIZE/VACUUM/SELECT...)")
    psq.add_argument("--warehouse", required=True,
                     help="warehouse dir (tables auto-discovered via "
                          "_table.json)")
    psq.add_argument("statement", nargs="+",
                     help="one or more SQL statements (each argument "
                          "may itself be a ';'-separated batch)")
    args = ap.parse_args(argv)

    if args.cmd == "sql":
        from glue_hudi_spark.sql import GhsSql

        spark = get_spark(app_name="glue_hudi_spark-sql")
        ghs = GhsSql(spark, args.warehouse)
        out = None
        try:
            for stmt in args.statement:
                out = ghs.sql(stmt)
        except ValueError as exc:
            print(json.dumps({"error": str(exc)}))
            return 2
        if out is not None:
            for row in out.collect():
                print(json.dumps(row.asDict(), default=str))
        print(json.dumps({"ok": True,
                          "tables": sorted(ghs.tables)}))
        return 0

    if args.cmd == "curate":
        from glue_hudi_spark.curation import (
            CurationConfigError, CurationPipeline)
        from glue_hudi_spark.storage.native import NativeTable

        try:
            pipe = CurationPipeline(args.pipeline)
        except (CurationConfigError, FileNotFoundError, ValueError) as exc:
            print(json.dumps({"error": str(exc)}))
            return 2
        spark = get_spark(app_name="glue_hudi_spark-curate")
        docs = spark.read.parquet(args.input)
        table = NativeTable(spark, args.output, record_keys=[args.id_col],
                            precombine=None, partition_keys=[])
        commit = pipe.run_to_table(docs, table)
        print(json.dumps({"commit": commit.commit_id,
                          "stages": commit.stats["curation_stages"]}))
        return 0

    try:
        store = ControlStore(args.control)
        records = store.load(args.job)
    except FileNotFoundError:
        print(json.dumps({"error": f"control file not found: {args.control}"}))
        return 2
    if args.table:
        records = [r for r in records if r.table_name == args.table]
    if not records:
        print(json.dumps({"error": "no matching control records"}))
        return 2

    spark = get_spark(app_name=f"glue_hudi_spark-{args.cmd}")
    pipe = CdcPipeline(
        spark,
        getattr(args, "raw", "/nonexistent"),
        args.curated,
        single_commit=args.single_commit,
    )

    out = []
    if args.cmd == "run" and getattr(args, "parallel", 1) > 1 and len(records) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.parallel) as pool:
            results = list(pool.map(pipe.process_table, records))
        print(json.dumps([
            {"table": ctl.table_name, "mode": res.mode,
             "commits": [c.action for c in res.commits]}
            for ctl, res in zip(records, results)
        ]))
        return 0
    if args.cmd in ("release", "drop-release"):
        # cross-table commands: one release spans EVERY managed table
        from glue_hudi_spark.storage import release as REL

        tables = {ctl.table_name: pipe._table(ctl) for ctl in records}
        if args.cmd == "release":
            m = REL.create_release(args.name, tables, pipe.curated_root)
            print(json.dumps({
                "release": args.name,
                "tables": {k: e["commit_id"]
                           for k, e in m["tables"].items()}}))
        else:
            REL.drop_release(args.name, tables, pipe.curated_root)
            print(json.dumps({"dropped_release": args.name}))
        return 0
    for ctl in records:
        if args.cmd == "run":
            res = pipe.process_table(ctl)
            out.append({"table": ctl.table_name, "mode": res.mode,
                        "commits": [c.action for c in res.commits]})
        elif args.cmd == "reset":
            pipe.reset_table(ctl)
            out.append({"table": ctl.table_name, "reset": True})
        elif args.cmd == "compact":
            table = pipe._table(ctl)
            c = table.compact()
            out.append({"table": ctl.table_name, "compacted": c.commit_id})
        elif args.cmd == "clone":
            table = pipe._table(ctl)
            c = table.clone_to(Path(args.dest) / ctl.table_name)
            out.append({"table": ctl.table_name,
                        "cloned_to": str(c.root),
                        "source_commit":
                            c.timeline.latest().stats["source_commit"]})
        elif args.cmd == "optimize":
            table = pipe._table(ctl)
            c = table.bin_pack(target_bytes=args.target_mb * 1024 * 1024)
            out.append({"table": ctl.table_name,
                        **({"optimized": c.commit_id,
                            "packed": c.stats["packed_files"],
                            "new_files": c.stats["new_files"]}
                           if c else {"optimized": None,
                                      "packed": 0})})
        elif args.cmd == "rewrite-files":
            table = pipe._table(ctl)
            c = table.rewrite_data_files(
                only_legacy_spec=args.legacy_spec_only,
                max_files=args.max_files)
            out.append({"table": ctl.table_name,
                        **({"rewrite_commit": c.commit_id,
                            "rewritten": c.stats["rewritten_files"],
                            "carried": c.stats["carried_files"]}
                           if c else {"rewrite_commit": None,
                                      "rewritten": 0})})
        elif args.cmd == "cluster":
            table = pipe._table(ctl)
            zcols = [c for c in (args.zorder or "").split(",") if c] or None
            c = table.cluster(zorder_by=zcols)
            out.append({"table": ctl.table_name, "clustered": c.commit_id,
                        "files": len(c.files),
                        **({"zorder": zcols} if zcols else {})})
        elif args.cmd == "fsck":
            table = pipe._table(ctl)
            out.append({"table": ctl.table_name, **table.validate()})
        elif args.cmd == "rollback":
            table = pipe._table(ctl)
            c = table.rollback(args.to_commit)
            out.append({"table": ctl.table_name, "rollback": c.commit_id,
                        "restored": c.stats["rolled_back_to"]})
        elif args.cmd == "restore":
            table = pipe._table(ctl)
            r = table.restore(args.to_commit)
            out.append({"table": ctl.table_name,
                        "restored_to": r["restored_to"],
                        "rolled_back": r["rolled_back"],
                        "deleted": len(r["deleted_files"])})
        elif args.cmd == "analyze":
            table = pipe._table(ctl)
            cols = [c for c in (args.columns or "").split(",") if c] or None
            a = table.analyze(cols)
            out.append({"table": ctl.table_name, **a})
        elif args.cmd == "pull":
            table = pipe._table(ctl)
            if args.cdf:
                feed = table.change_feed(args.since_commit, args.end_commit)
            else:
                feed = table.read_incremental(
                    args.since_commit, args.end_commit)
            dest = str(Path(args.out) / ctl.table_name)
            feed.write.mode("overwrite").parquet(dest)
            out.append({"table": ctl.table_name, "out": dest,
                        "rows": spark.read.parquet(dest).count(),
                        "mode": "cdf" if args.cdf else "incremental"})
        elif args.cmd == "vacuum":
            table = pipe._table(ctl)
            v = table.vacuum()
            out.append({"table": ctl.table_name,
                        "deleted": len(v["deleted_files"]),
                        "deleted_blooms": len(v["deleted_blooms"]),
                        "skipped_inflight": len(v["skipped_inflight"])})
        elif args.cmd == "replicate":
            from glue_hudi_spark.storage.native import NativeTable
            from glue_hudi_spark.streaming.replicate import (
                TableReplicationStream)

            src = pipe._table(ctl)
            dest = NativeTable(
                spark, Path(args.dest) / ctl.table_name,
                record_keys=list(src.record_keys),
                precombine=src.precombine,
                partition_keys=list(src.partition_keys),
            )
            rep = TableReplicationStream(
                spark, src.root, dest,
                Path(args.checkpoint) / ctl.table_name)
            rep.run_available()
            deleted = rep.sync_deletes() if args.sync_deletes else 0
            out.append({"table": ctl.table_name,
                        "replica_rows": dest.count_rows(),
                        "deletes_propagated": deleted})
        elif args.cmd == "rename-column":
            table = pipe._table(ctl)
            c = table.rename_column(args.col_from, args.col_to)
            out.append({"table": ctl.table_name, "commit": c.commit_id,
                        **c.stats["renamed"]})
        elif args.cmd == "drop-column":
            table = pipe._table(ctl)
            c = table.drop_column(args.column)
            out.append({"table": ctl.table_name, "commit": c.commit_id,
                        "dropped": c.stats["dropped"]})
        elif args.cmd == "add-column":
            import json as _json

            table = pipe._table(ctl)
            dflt = args.default
            if dflt is not None:
                try:
                    dflt = _json.loads(dflt)  # 7 → int, 1.5 → float, …
                except ValueError:
                    pass  # plain string literal
            c = table.add_column(args.column, args.col_type, default=dflt)
            out.append({"table": ctl.table_name, "commit": c.commit_id,
                        **c.stats["added"]})
        elif args.cmd == "evolve-partition":
            table = pipe._table(ctl)
            c = table.evolve_partition_spec(list(args.spec))
            out.append({"table": ctl.table_name, "commit": c.commit_id,
                        **c.stats["partition_spec"]})
        elif args.cmd == "maintain":
            table = pipe._table(ctl)
            r = table.maintain(
                target_bytes=args.target_mb * 1024 * 1024,
                expire_older_than=args.expire_older_than)
            out.append({"table": ctl.table_name, **r})
        elif args.cmd == "inspect":
            table = pipe._table(ctl)
            rows = [r.asDict() for r in
                    table.metadata_table(args.kind).collect()]
            out.append({"table": ctl.table_name, "kind": args.kind,
                        "rows": rows})
        elif args.cmd == "expire":
            table = pipe._table(ctl)
            older = args.older_than
            try:
                older = float(older)
            except ValueError:
                pass  # ISO string — the timeline parses it
            r = table.expire_snapshots(older, retain_last=args.retain_last)
            out.append({"table": ctl.table_name, "expired": r["expired"],
                        "deleted_files": len(r["deleted_files"])})
        elif args.cmd == "branch":
            table = pipe._table(ctl)
            b = table.create_branch(args.name, at_commit=args.at)
            out.append({"table": ctl.table_name, "branch": args.name,
                        "forked_from": b.timeline.latest().stats[
                            "forked_from"]})
        elif args.cmd == "drop-branch":
            table = pipe._table(ctl)
            table.drop_branch(args.name)
            out.append({"table": ctl.table_name, "dropped_branch": args.name})
        elif args.cmd == "tag":
            table = pipe._table(ctl)
            table.create_tag(args.name, at_commit=args.at)
            out.append({"table": ctl.table_name, "tag": args.name})
        elif args.cmd == "drop-tag":
            table = pipe._table(ctl)
            table.drop_tag(args.name)
            out.append({"table": ctl.table_name, "dropped_tag": args.name})
        elif args.cmd == "fast-forward":
            table = pipe._table(ctl)
            c = table.fast_forward(args.name, drop=args.drop)
            out.append({"table": ctl.table_name, "commit": c.commit_id,
                        **{k: c.stats[k] for k in
                           ("fast_forward_of", "branch_head", "fork_base")}})
        elif args.cmd == "show":
            table = pipe._table(ctl)
            # count_rows is metadata-only on a compacted table; history
            # carries per-commit bytes/rows from the manifest inventory
            hist = [
                {"id": r["commit_id"], "action": r["action"],
                 "files": r["n_files"], "bytes": r["total_bytes"],
                 "rows": r["total_rows"]}
                for r in table.describe_history().collect()
            ]
            out.append({"table": ctl.table_name,
                        "rows": table.count_rows(),
                        "commits": hist})
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
