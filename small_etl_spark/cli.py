"""CLI: run a declarative pipeline sequence from a TOML config.

Mirrors the reference's ``sequence_etl`` binary surface
(/root/reference/src/bin/sequence_etl.rs:1-400): config path,
``--only``/``--skip`` stage selection, ``--dry-run`` plan echo, and a
metrics JSON export. Exit code 0 on success, 1 on spec/validation
errors, 2 on execution failure — the reference's severity-coded exits
(main.rs:59-68) collapsed to three meaningful codes.

Usage:
    python -m small_etl_spark sequence config.toml \
        --output-root ./out --metrics ./out/metrics.json --only a,b
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _table_admin(args) -> int:
    """``table <path> history|report|vacuum|optimize|compact-dv|
    compact-eq|tags|tag|untag|branches|abandon|publish|
    rename-column|drop-column|widen-type|add-column|auto-maintain|
    remove-orphans|restore|files|partitions|add-constraint|
    drop-constraint|constraints|set-sort-order|sql``
    — the maintenance + evolution surface of the versioned sink,
    runnable without writing a config. history prints one JSON line
    per snapshot; report prints the metadata-only health advisor;
    vacuum reports files deleted (tagged versions and live branches
    protected); optimize / compact-dv / compact-eq report the new
    version (or no-op); tag pins an immutable named version; publish
    atomically fast-forwards main to a staged branch; the evolution
    ops are metadata-only commits (r9: column-id rename/drop/widen/
    add never rewrite data); auto-maintain runs the report's
    recommendations (WAP-staged when clean)."""
    from small_etl_spark.sinks import versioned as V

    if V.latest_version(args.path) is None:
        print(f"no snapshots committed at {args.path!r}", file=sys.stderr)
        return 1
    if args.action == "rename-column":
        if not args.column or not args.to:
            print("rename-column requires --column and --to",
                  file=sys.stderr)
            return 1
        v = V.rename_column(args.path, args.column, args.to)
        print(json.dumps({"renamed": [args.column, args.to],
                          "version": v}))
        return 0
    if args.action == "drop-column":
        if not args.column:
            print("drop-column requires --column", file=sys.stderr)
            return 1
        v = V.drop_column(args.path, args.column)
        print(json.dumps({"dropped": args.column, "version": v}))
        return 0
    if args.action == "widen-type":
        if not args.column or not args.to:
            print("widen-type requires --column and --to (a type)",
                  file=sys.stderr)
            return 1
        v = V.widen_type(args.path, args.column, args.to)
        print(json.dumps({"widened": [args.column, args.to],
                          "version": v}))
        return 0
    if args.action == "add-column":
        if not args.column or not args.to:
            print("add-column requires --column and --to (a type)",
                  file=sys.stderr)
            return 1
        v = V.add_column(
            args.path, args.column, args.to, default=args.default
        )
        print(json.dumps({"added": [args.column, args.to],
                          "default": args.default, "version": v}))
        return 0
    if args.action == "report":
        print(json.dumps(V.maintenance_report(
            args.path, target_bytes=args.target_bytes)))
        return 0
    if args.action == "branches":
        print(json.dumps(V.list_branches(args.path)))
        return 0
    if args.action == "abandon":
        if not args.name:
            print("abandon requires --name", file=sys.stderr)
            return 1
        V.branch_abandon(args.path, args.name)
        print(json.dumps({"abandoned_branch": args.name}))
        return 0
    if args.action == "publish":
        if not args.name:
            print("publish requires --name", file=sys.stderr)
            return 1
        v = V.branch_publish(args.path, args.name)
        print(json.dumps({"published_branch": args.name, "version": v}))
        return 0
    if args.action == "set-sort-order":
        cols = args.column.split(",") if args.column else None
        v = V.set_sort_order(args.path, cols)
        print(json.dumps({"sort_order": cols, "version": v}))
        return 0
    if args.action == "constraints":
        print(json.dumps(V.list_constraints(args.path)))
        return 0
    if args.action == "drop-constraint":
        if not args.name:
            print("drop-constraint requires --name", file=sys.stderr)
            return 1
        v = V.drop_constraint(args.path, args.name)
        print(json.dumps({"dropped_constraint": args.name, "version": v}))
        return 0
    if args.action == "remove-orphans":
        removed = V.remove_orphan_files(
            args.path, older_than_ms=args.older_than_ms,
            dry_run=args.dry_run_orphans,
        )
        print(json.dumps({"orphans": removed,
                          "dry_run": args.dry_run_orphans}))
        return 0
    if args.action == "restore":
        if args.at_version is None:
            print("restore requires --at-version", file=sys.stderr)
            return 1
        v = V.restore_snapshot(args.path, args.at_version)
        print(json.dumps({"restored_from": args.at_version,
                          "version": v}))
        return 0
    if args.action == "vacuum":
        deleted = V.vacuum(args.path, keep_last=args.keep_last)
        print(json.dumps({"deleted_files": deleted,
                          "kept_last": args.keep_last}))
        return 0
    if args.action == "tags":
        print(json.dumps(V.list_tags(args.path)))
        return 0
    if args.action == "tag":
        if not args.name:
            print("tag requires --name", file=sys.stderr)
            return 1
        v = V.create_tag(args.path, args.name, version=args.at_version)
        print(json.dumps({"tag": args.name, "version": v}))
        return 0
    if args.action == "untag":
        if not args.name:
            print("untag requires --name", file=sys.stderr)
            return 1
        V.delete_tag(args.path, args.name)
        print(json.dumps({"deleted_tag": args.name}))
        return 0

    from small_etl_spark.session import get_spark

    spark = get_spark("small_etl_spark.table", master=args.tbl_master)
    if args.action == "history":
        for row in V.snapshot_history(spark, args.path).collect():
            print(json.dumps(row.asDict()))
        return 0
    if args.action == "sql":
        # run one SQL statement (SELECT with AS OF, DML, RESTORE /
        # OPTIMIZE / VACUUM) against this table, registered under
        # --name (default "t"); rows print as JSON lines
        if not args.expr:
            print("sql requires --expr '<statement>'", file=sys.stderr)
            return 1
        from small_etl_spark.sql import sql as vsql

        out = vsql(
            spark, args.expr, tables={(args.name or "t"): args.path}
        )
        for row in out.collect():
            print(json.dumps(row.asDict(), default=str))
        return 0
    if args.action == "add-constraint":
        if not args.name or not args.expr:
            print("add-constraint requires --name and --expr",
                  file=sys.stderr)
            return 1
        v = V.add_constraint(spark, args.path, args.name, args.expr)
        print(json.dumps({"added_constraint": args.name,
                          "expr": args.expr, "version": v}))
        return 0
    if args.action == "files":
        for row in V.table_files(
            spark, args.path, version=args.at_version
        ).collect():
            print(json.dumps(row.asDict()))
        return 0
    if args.action == "partitions":
        for row in V.table_partitions(
            spark, args.path, version=args.at_version
        ).collect():
            print(json.dumps(row.asDict()))
        return 0
    if args.action == "compact-dv":
        v = V.compact_dv(spark, args.path)
        print(json.dumps({"new_version": v}))
        return 0
    if args.action == "compact-eq":
        v = V.compact_eq_deletes(spark, args.path)
        print(json.dumps({"new_version": v}))
        return 0
    if args.action == "auto-maintain":
        out = V.auto_maintain(
            spark, args.path, target_bytes=args.target_bytes
        )
        print(json.dumps({"actions": out["actions"],
                          "conflict": out["conflict"]}))
        return 0
    # optimize
    v = V.optimize_snapshot(spark, args.path, target_bytes=args.target_bytes)
    print(json.dumps({"new_version": v}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="small_etl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for cmd, help_text in (
        ("sequence", "run a multi-pipeline TOML sequence"),
        ("run", "run a single-pipeline TOML config (toml_etl layout)"),
    ):
        seq_p = sub.add_parser(cmd, help=help_text)
        seq_p.add_argument("config")
        seq_p.add_argument("--only", help="comma-separated pipeline names to keep")
        seq_p.add_argument("--skip", help="comma-separated pipeline names to drop")
        seq_p.add_argument("--dry-run", action="store_true")
        seq_p.add_argument("--output-root", default=None)
        seq_p.add_argument(
            "--incremental-root",
            default=None,
            help="enable incremental runs: cache each stage's result in "
            "a versioned table under this root, keyed by a chained spec "
            "fingerprint; unchanged stages are served from the snapshot "
            "instead of re-executing",
        )
        seq_p.add_argument("--metrics", default=None, help="metrics JSON path")
        seq_p.add_argument("--master", default=None, help="spark master override")
        # reference CLI surface: toml_etl.rs:54-57 (--mvp overrides
        # extract.first_record_only), domain/ports.rs:17 +
        # config/mod.rs:75-77 (--lookup-files, csv|tsv|json)
        seq_p.add_argument(
            "--lookup-files",
            default=None,
            help="comma-separated csv/tsv/json files preloaded as named "
            "catalog entries (S8)",
        )
        seq_p.add_argument(
            "--mvp",
            action=argparse.BooleanOptionalAction,
            default=None,
            help="override first_record_only on every stage "
            "(--mvp / --no-mvp; default: config decides)",
        )

    tbl_p = sub.add_parser(
        "table", help="versioned-table maintenance (sinks/versioned.py)"
    )
    tbl_p.add_argument("path", help="versioned table root")
    tbl_p.add_argument(
        "action",
        choices=[
            "history", "report", "vacuum", "optimize", "compact-dv",
            "compact-eq", "tags", "tag", "untag", "branches", "abandon",
            "publish", "rename-column", "drop-column", "widen-type",
            "add-column", "auto-maintain", "remove-orphans",
            "restore", "files", "partitions", "add-constraint",
            "drop-constraint", "constraints", "set-sort-order", "sql",
        ],
    )
    tbl_p.add_argument(
        "--column", default=None,
        help="evolution ops: the column to rename/drop/widen/add",
    )
    tbl_p.add_argument(
        "--to", default=None,
        help="rename-column: new name; widen-type/add-column: the type",
    )
    tbl_p.add_argument(
        "--default", default=None,
        help="add-column: initial default for pre-add files",
    )
    tbl_p.add_argument(
        "--keep-last", type=int, default=2, help="vacuum: manifests kept"
    )
    tbl_p.add_argument(
        "--name", default=None,
        help="tag/untag: tag name; publish/abandon: branch name",
    )
    tbl_p.add_argument(
        "--at-version", type=int, default=None,
        help="tag: version to pin (default head); restore: the "
        "version to restore to; files/partitions: version to inspect",
    )
    tbl_p.add_argument(
        "--older-than-ms", type=int, default=24 * 3600 * 1000,
        help="remove-orphans: in-flight-writer age guard",
    )
    tbl_p.add_argument(
        "--expr", default=None,
        help="add-constraint: SQL CHECK expression; sql: the statement",
    )
    tbl_p.add_argument(
        "--dry-run-orphans", action="store_true",
        help="remove-orphans: list without deleting",
    )
    tbl_p.add_argument(
        "--target-bytes",
        type=int,
        default=128 * 1024 * 1024,
        help="optimize: output file size target",
    )
    tbl_p.add_argument("--master", dest="tbl_master", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "table":
        return _table_admin(args)

    from small_etl_spark.plans.spec import SpecError, sequence_from_toml

    lookups = args.lookup_files.split(",") if args.lookup_files else None
    lookup_stems = {
        os.path.splitext(os.path.basename(p))[0] for p in (lookups or [])
    }
    try:
        seq = sequence_from_toml(args.config, external_names=lookup_stems)
    except (SpecError, OSError, ValueError) as e:
        print(f"config error: {e}", file=sys.stderr)
        return 1

    from small_etl_spark.plans.sequencer import (
        PipelineExecutionError,
        run_sequence,
        sequence_metrics,
    )
    from small_etl_spark.session import get_spark
    from small_etl_spark.sinks.files import write_metrics

    spark = get_spark("small_etl_spark.sequence", master=args.master)
    only = args.only.split(",") if args.only else None
    skip = args.skip.split(",") if args.skip else None
    try:
        ctx = run_sequence(
            spark, seq, only=only, skip=skip,
            output_root=args.output_root, dry_run=args.dry_run,
            lookup_files=lookups, mvp=args.mvp,
            incremental_root=args.incremental_root,
        )
    except SpecError as e:
        print(f"config error: {e}", file=sys.stderr)
        return 1
    except PipelineExecutionError as e:
        print(f"execution error: {e}", file=sys.stderr)
        return 2
    if not args.dry_run:
        metrics = sequence_metrics(ctx)
        print(json.dumps(metrics["summary"], indent=2))
        if args.metrics:
            write_metrics(args.metrics, metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
