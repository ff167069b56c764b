"""The spark-submit application surface (north_star: "a single
spark-submit --py-files application"). One subcommand per maintenance
action; each prints exactly one JSON result line to stdout.

    spark-submit --py-files mobility_lakehouse_project_spark.zip app.py <cmd> ...
    python -m mobility_lakehouse_project_spark <cmd> ...          (local)

Commands:
    synth    --table DIR --rows N [--partitions P] [--files F] [--partition-col bucket]
    compact  --table DIR [--target-mb 128] [--chunks 4] [--recompress L]
    cluster  --table DIR [--curve zorder|hilbert] [--cols phash,w,h]
             [--target-mb 128] [--chunks 4] [--recompress L]
    merge    --table DIR --source PATH [--keys image_id]
             [--when-matched update|delete|none] [--when-not-matched insert|none]
             [--update-cols a,b] [--target-mb 64]
    expire   --table DIR [--keep 2]
    remove-orphans --table DIR [--older-than-s 259200]
    rewrite-manifests --table DIR
    verify   --table DIR --pre-snapshot ID [--sample 1.0]
    scan     --table DIR [--limit 5] [--partition P] [--snapshot ID]
    add-files --table DIR --source GLOB
    copy-into --table DIR --source GLOB [--format parquet] [--max-files N]
    stats    --table DIR [--cols a,b]   (metadata-only count/min/max)
    lineage  --table DIR
    snapshots --table DIR
    sql      --warehouse DIR --query 'DELETE FROM ns.t WHERE ...' |
             --file script.sql [--param k=v ...] [--limit 100]

The session is built by session.get_spark (honors SPARK_GRAFT_CPUS);
under spark-submit the submitted master/conf win via getOrCreate.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _mb(v: float) -> int:
    return int(float(v) * 1024 * 1024)


def _parse_key(s: str | None) -> dict | None:
    """``col=value`` -> point_eq dict (value typed as int when it
    parses, else string)."""
    if not s:
        return None
    col, _, raw = s.partition("=")
    if not col or not raw:
        raise SystemExit(f"--key expects col=value, got {s!r}")
    try:
        return {col: int(raw)}
    except ValueError:
        return {col: raw}


def _parse_range(spec: str) -> dict:
    """``col:lo:hi`` -> int_ranges dict; empty bounds open the side,
    non-numeric bounds route to string-stats pruning (a date window)."""
    col, lo, hi = spec.split(":")

    def _bound(v):
        if not v:
            return None
        try:
            return int(v)
        except ValueError:
            return v

    return {col: (_bound(lo), _bound(hi))}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mobility_lakehouse_project_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def t(sp):
        sp.add_argument("--table", required=True)

    sp = sub.add_parser("synth")
    t(sp)
    sp.add_argument("--rows", type=int, required=True)
    sp.add_argument("--partitions", type=int, default=None)
    sp.add_argument("--files", type=int, default=16)
    sp.add_argument("--partition-col", default="bucket")

    sp = sub.add_parser("compact")
    t(sp)
    sp.add_argument("--target-mb", type=float, default=128)
    sp.add_argument("--chunks", type=int, default=4)
    sp.add_argument("--recompress", type=int, default=None)
    sp.add_argument("--partitions", default=None,
                    help="comma-separated partition ids to scope the run")

    sp = sub.add_parser("cluster")
    t(sp)
    sp.add_argument("--curve", choices=["zorder", "hilbert"], default=None,
                    help="omitted = the table's write.sort-order curve, "
                         "else zorder")
    sp.add_argument("--cols", default=None,
                    help="comma-separated key columns; omitted = the "
                         "table's write.sort-order property, else phash,w,h")
    sp.add_argument("--target-mb", type=float, default=128)
    sp.add_argument("--chunks", type=int, default=4)
    sp.add_argument("--recompress", type=int, default=None)
    sp.add_argument("--incremental", action="store_true",
                    help="re-sort only files added since the last full "
                         "cluster (O(ingest), not O(table)); partitions "
                         "with >= --merge-threshold new bytes get a "
                         "full per-partition re-cluster")
    sp.add_argument("--merge-threshold", type=float, default=0.4)

    sp = sub.add_parser("merge")
    t(sp)
    sp.add_argument("--source", required=True, help="parquet path of the source")
    sp.add_argument("--keys", default="image_id")
    sp.add_argument("--when-matched", choices=["update", "delete", "none"], default="update")
    sp.add_argument("--when-not-matched", choices=["insert", "none"], default="insert")
    sp.add_argument("--by-source", choices=["delete", "update", "none"],
                    default="none",
                    help="'delete' = WHEN NOT MATCHED BY SOURCE THEN "
                         "DELETE (full sync); 'update' = ... THEN UPDATE "
                         "SET --by-source-set (mark stale); needs "
                         "--mode mor")
    sp.add_argument("--by-source-set", default=None, metavar="COL=EXPR[,..]",
                    help="assignments for --by-source update")
    sp.add_argument("--update-cols", default=None)
    sp.add_argument("--target-mb", type=float, default=64)
    sp.add_argument("--mode", choices=["cow", "mor"], default="cow",
                    help="mor = position-delete matched rows + append "
                         "new versions; no touched-file rewrite")

    sp = sub.add_parser("expire")
    t(sp)
    sp.add_argument("--keep", type=int, default=2)
    sp.add_argument("--older-than-ms", type=int, default=None,
                    help="also retain any snapshot at/after this epoch "
                         "timestamp (age-based expiry; --keep is the floor)")

    sp = sub.add_parser("remove-orphans")
    t(sp)
    sp.add_argument("--older-than-s", type=float, default=3 * 86400.0)
    sp.add_argument("--dry-run", action="store_true",
                    help="report orphan candidates without deleting")

    sp = sub.add_parser("rewrite-manifests")
    t(sp)

    sp = sub.add_parser("verify")
    t(sp)
    sp.add_argument("--pre-snapshot", type=int, required=True)
    sp.add_argument("--sample", type=float, default=1.0)

    sp = sub.add_parser("scan")
    t(sp)
    sp.add_argument("--limit", type=int, default=5)
    sp.add_argument("--partition", default=None)
    sp.add_argument("--snapshot", type=int, default=None)
    sp.add_argument("--key", default=None,
                    help="col=value point lookup: prunes the file set "
                         "via manifest bloom filters + min/max stats "
                         "and filters rows to the exact match")
    sp.add_argument("--row-ids", action="store_true",
                    help="append the stable _row_id lineage column "
                         "(Iceberg v3 row lineage)")

    sp = sub.add_parser("lineage")
    t(sp)
    sp = sub.add_parser("snapshots")
    t(sp)

    sp = sub.add_parser("delete")
    t(sp)
    sp.add_argument("--where", required=True, help="SQL predicate over non-binary columns")
    sp.add_argument("--range", default=None,
                    help="col:lo:hi stats-pruning hint matching the predicate")
    sp.add_argument("--target-mb", type=float, default=64)
    sp.add_argument("--mode", choices=["cow", "mor"], default="cow",
                    help="cow = rewrite touched files; mor = write "
                         "position-delete files only (no blob rewrite)")
    sp.add_argument("--key", default=None,
                    help="col=value bloom-pruning hint matching an "
                         "equality predicate (GDPR single-key erase)")

    sp = sub.add_parser("drop-partitions",
                        help="remove whole partitions metadata-only "
                             "(retention delete: no data read/written)")
    t(sp)
    sp.add_argument("--values", required=True,
                    help="comma-separated partition values to drop")

    sp = sub.add_parser("rewrite-deletes",
                        help="fold pending position deletes into the data "
                             "and clear the delete manifests")
    t(sp)
    sp.add_argument("--target-mb", type=float, default=64)
    sp.add_argument("--min-delete-ratio", type=float, default=0.0,
                    help="fold only files with >= this fraction of "
                         "rows deleted (targeted fold; manifests kept "
                         "until a full fold)")

    sp = sub.add_parser("update")
    t(sp)
    sp.add_argument("--where", required=True)
    sp.add_argument("--set", required=True, dest="assign",
                    help="col=sql_expr[,col=sql_expr...]")
    sp.add_argument("--range", default=None, help="col:lo:hi pruning hint")
    sp.add_argument("--target-mb", type=float, default=64)
    sp.add_argument("--mode", choices=["cow", "mor"], default="cow")

    sp = sub.add_parser("maintain",
                        help="full maintenance pass: fold deletes, "
                             "migrate specs, compact, optional cluster, "
                             "rewrite manifests, expire, GC, analyze")
    t(sp)
    sp.add_argument("--target-mb", type=float, default=None,
                    help="override; omitted = the table's "
                         "maintenance.target-file-size-mb property, else 128")
    sp.add_argument("--curve", choices=["zorder", "hilbert", "table", "none"],
                    default="none",
                    help="'table' = require the write.sort-order property; "
                         "'none' still clusters when the table declares one")
    sp.add_argument("--cols", default=None)
    sp.add_argument("--cluster-mode", choices=["full", "incremental"],
                    default=None)
    sp.add_argument("--keep", type=int, default=None)
    sp.add_argument("--orphan-grace-s", type=float, default=3 * 86400.0)
    sp.add_argument("--analyze", action="store_true")
    sp.add_argument("--recompress", type=int, default=None)

    sp = sub.add_parser("analyze",
                        help="compute per-column NDV/null statistics "
                             "for the current snapshot")
    t(sp)
    sp.add_argument("--columns", default=None, help="comma-separated subset")

    sp = sub.add_parser("tables",
                        help="list namespaces and tables of a warehouse "
                             "catalog")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--namespace", default=None)

    sp = sub.add_parser("maintain-all",
                        help="run the maintenance orchestrator over every "
                             "table in a warehouse; per-table layout policy "
                             "comes from each table's write.sort-order")
    sp.add_argument("--warehouse", required=True)
    sp.add_argument("--target-mb", type=float, default=None,
                    help="override; omitted = each table's "
                         "maintenance.target-file-size-mb property")
    sp.add_argument("--cluster-mode", choices=["full", "incremental"],
                    default=None)
    sp.add_argument("--keep", type=int, default=None)
    sp.add_argument("--analyze", action="store_true")

    sp = sub.add_parser("evolve-partition",
                        help="change the partition column for future "
                             "writes (metadata-only; no data moves)")
    t(sp)
    sp.add_argument("--col", required=True,
                    help="new partition column, or 'none' to unpartition")
    sp.add_argument("--transform", default=None,
                    help="partition transform: identity, bucket[N], "
                         "truncate[W], year, month, day, hour")

    sp = sub.add_parser("migrate-partitions",
                        help="rewrite older-spec files under the current "
                             "partition spec")
    t(sp)
    sp.add_argument("--target-mb", type=float, default=128)

    sp = sub.add_parser("add-files",
                        help="zero-copy import of existing parquet files "
                             "(hard-linked; footer stats only, no rewrite)")
    t(sp)
    sp.add_argument("--source", required=True,
                    help="glob of parquet files to import")

    sp = sub.add_parser("stats",
                        help="metadata-only count/min/max from manifest "
                             "stats (no data read); falls back flagged")
    t(sp)
    sp.add_argument("--cols", default="",
                    help="comma-separated columns for min/max")

    sp = sub.add_parser("copy-into",
                        help="idempotent exactly-once landing-zone ingest "
                             "(per-file copy ledger; Delta COPY INTO)")
    t(sp)
    sp.add_argument("--source", required=True,
                    help="glob of landing files to ingest")
    sp.add_argument("--format", default="parquet")
    sp.add_argument("--max-files", type=int, default=None,
                    help="cap files per call (trickle ingest)")

    sp = sub.add_parser("branch", help="create/drop/list branch refs")
    t(sp)
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--create", metavar="NAME")
    g.add_argument("--drop", metavar="NAME")
    g.add_argument("--list", action="store_true")
    sp.add_argument("--snapshot", type=int, default=None,
                    help="branch point for --create (default: current)")

    sp = sub.add_parser("publish",
                        help="fast-forward a target ref to a branch head "
                             "(the write-audit-publish publish step); "
                             "--cherrypick republishes a staged append "
                             "snapshot even when main has advanced")
    t(sp)
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--source", dest="source", metavar="BRANCH")
    g.add_argument("--cherrypick", type=int, default=None,
                   metavar="SNAPSHOT_ID")
    sp.add_argument("--target", default="main")

    sp = sub.add_parser("rollback")
    t(sp)
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--snapshot", type=int, help="snapshot id to restore")
    g.add_argument("--as-of-ms", type=int,
                   help="restore the snapshot current at this epoch-ms")

    sp = sub.add_parser("export-shards",
                        help="export the table as deterministic byte-"
                             "balanced training shards (one sorted parquet "
                             "file per shard + _manifest; re-runs resume by "
                             "skipping complete shards)")
    t(sp)
    sp.add_argument("--out", required=True, help="shard output directory")
    sp.add_argument("--target-mb", type=float, default=512)
    sp.add_argument("--id-col", default="image_id")
    sp.add_argument("--weight-col", default=None,
                    help="byte-weight column; default: octet_length of the "
                         "first binary column")
    sp.add_argument("--seed", type=int, default=42)

    sp = sub.add_parser("sql",
                        help="run a SQL statement or ;-script against a "
                             "warehouse catalog (reads return rows, "
                             "writes/DDL dispatch to the engine operators)")
    sp.add_argument("--warehouse", required=True)
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--query", help="SQL text")
    g.add_argument("--file", help="path to a ;-separated SQL script")
    sp.add_argument("--limit", type=int, default=100,
                    help="max rows printed per SELECT result")
    sp.add_argument("--param", action="append", default=[],
                    help="name=value binding for :name placeholders "
                         "(repeatable; value parsed as JSON, else string)")

    a = p.parse_args(argv)

    from .session import get_spark
    from .tableformat import LakehouseTable

    spark = get_spark(f"engine-{a.cmd}")
    out: dict
    if a.cmd == "synth":
        from . import synth

        df = synth.images_df(spark, a.rows, partitions=a.partitions)
        tbl = LakehouseTable(a.table)
        if not tbl.exists:
            tbl = LakehouseTable.create(a.table, df.schema, partition_col=a.partition_col or None)
        snap = tbl.append(df, n_files=a.files)
        out = {"cmd": "synth", "rows": a.rows, "snapshot": snap.snapshot_id,
               "files": snap.summary["added-files"]}
    elif a.cmd == "compact":
        from .operators import compaction

        out = {"cmd": "compact", **compaction.compact(
            LakehouseTable(a.table), spark, target_file_size=_mb(a.target_mb),
            n_chunks=a.chunks, recompress_level=a.recompress,
            only_partitions=set(a.partitions.split(",")) if a.partitions else None)}
    elif a.cmd == "cluster":
        from .operators import clustering

        if a.incremental:
            res = clustering.cluster_incremental(
                LakehouseTable(a.table), spark, curve=a.curve,
                cols=tuple(a.cols.split(",")) if a.cols else None,
                target_file_size=_mb(a.target_mb), n_chunks=a.chunks,
                merge_threshold=a.merge_threshold,
                recompress_level=a.recompress)
        else:
            res = clustering.cluster(
                LakehouseTable(a.table), spark, curve=a.curve,
                cols=tuple(a.cols.split(",")) if a.cols else None,
                target_file_size=_mb(a.target_mb),
                n_chunks=a.chunks, recompress_level=a.recompress)
        out = {"cmd": "cluster", **res}
    elif a.cmd == "merge":
        from .operators import merge

        keys = a.keys.split(",")
        out = {"cmd": "merge", **merge.merge_into(
            LakehouseTable(a.table), spark, spark.read.parquet(a.source),
            key=keys if len(keys) > 1 else keys[0],
            target_file_size=_mb(a.target_mb),
            when_matched=None if a.when_matched == "none" else a.when_matched,
            update_cols=a.update_cols.split(",") if a.update_cols else None,
            when_not_matched=None if a.when_not_matched == "none" else a.when_not_matched,
            when_not_matched_by_source=(None if a.by_source == "none"
                                        else a.by_source),
            by_source_assignments=(
                dict(kv.split("=", 1) for kv in a.by_source_set.split(","))
                if a.by_source_set else None),
            mode=a.mode)}
    elif a.cmd == "expire":
        out = {"cmd": "expire", **LakehouseTable(a.table).expire_snapshots(
            keep_last=a.keep, older_than_ms=a.older_than_ms, spark=spark)}
    elif a.cmd == "remove-orphans":
        out = {"cmd": "remove-orphans",
               **LakehouseTable(a.table).remove_orphan_files(
                   a.older_than_s, spark=spark, dry_run=a.dry_run)}
    elif a.cmd == "rewrite-manifests":
        snap = LakehouseTable(a.table).rewrite_manifests(spark)
        out = {"cmd": "rewrite-manifests",
               "snapshot": snap.snapshot_id if snap else None,
               **(snap.summary if snap else {})}
    elif a.cmd == "verify":
        from .operators import verify

        out = {"cmd": "verify", **verify.verify_maintenance(
            LakehouseTable(a.table), spark, pre_snapshot_id=a.pre_snapshot,
            sample_fraction=a.sample)}
    elif a.cmd == "scan":
        tbl = LakehouseTable(a.table)
        key = _parse_key(a.key)
        df = tbl.scan(
            spark, snapshot_id=a.snapshot,
            partition_values={a.partition} if a.partition is not None else None,
            point_eq=key, with_row_id=a.row_ids,
        )
        if key:
            for c, v in key.items():
                df = df.filter(F.col(c) == v)
        out = {"cmd": "scan", "rows": df.count(),
               "sample": [
                   {k: (v if not isinstance(v, (bytes, bytearray)) else f"<{len(v)}B>")
                    for k, v in r.asDict().items()}
                   for r in df.limit(a.limit).collect()
               ]}
    elif a.cmd == "lineage":
        from .lineage import LineageLog

        rows = LineageLog(a.table).lineage_df(spark).collect()
        out = {"cmd": "lineage", "entries": [r.asDict() for r in rows]}
    elif a.cmd == "delete":
        from .operators import delete as delete_op

        rng = _parse_range(a.range) if a.range else None
        out = {"cmd": "delete", **delete_op.delete_where(
            LakehouseTable(a.table), spark, a.where, int_ranges=rng,
            target_file_size=_mb(a.target_mb), mode=a.mode,
            point_eq=_parse_key(a.key))}
    elif a.cmd == "drop-partitions":
        from .operators import delete as delete_op

        out = {"cmd": "drop-partitions", **delete_op.drop_partitions(
            LakehouseTable(a.table), spark,
            [v.strip() for v in a.values.split(",") if v.strip()])}
    elif a.cmd == "rewrite-deletes":
        from .operators import delete as delete_op

        out = {"cmd": "rewrite-deletes", **delete_op.rewrite_position_deletes(
            LakehouseTable(a.table), spark, target_file_size=_mb(a.target_mb),
            min_delete_ratio=a.min_delete_ratio)}
    elif a.cmd == "update":
        from .operators import delete as delete_op

        rng = _parse_range(a.range) if a.range else None
        # split assignments on top-level commas only (expressions may
        # contain commas inside parens/quotes)
        parts, depth, q, buf = [], 0, None, ""
        for ch in a.assign:
            if q:
                q = None if ch == q else q
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0 and not q:
                parts.append(buf)
                buf = ""
            else:
                buf += ch
        parts.append(buf)
        assigns = {k.strip(): v for kv in parts if kv.strip()
                   for k, v in [kv.split("=", 1)]}
        out = {"cmd": "update", **delete_op.update_where(
            LakehouseTable(a.table), spark, a.where, assigns, int_ranges=rng,
            target_file_size=_mb(a.target_mb), mode=a.mode)}
    elif a.cmd == "maintain":
        from .plans.maintenance import run_maintenance

        out = {"cmd": "maintain", **run_maintenance(
            LakehouseTable(a.table), spark,
            target_file_size=_mb(a.target_mb) if a.target_mb else None,
            cluster_curve=None if a.curve == "none" else a.curve,
            cluster_cols=tuple(a.cols.split(",")) if a.cols else None,
            cluster_mode=a.cluster_mode,
            keep_snapshots=a.keep, orphan_grace_s=a.orphan_grace_s,
            analyze=a.analyze, recompress_level=a.recompress)}
    elif a.cmd == "analyze":
        from .operators import analyze as analyze_op

        out = {"cmd": "analyze", **analyze_op.analyze_table(
            LakehouseTable(a.table), spark,
            columns=a.columns.split(",") if a.columns else None)}
    elif a.cmd == "tables":
        from .tableformat import Catalog

        c = Catalog(a.warehouse)
        out = {"cmd": "tables", "namespaces": c.list_namespaces(),
               "tables": c.list_tables(a.namespace)}
    elif a.cmd == "maintain-all":
        from .tableformat import Catalog

        out = {"cmd": "maintain-all", "tables": Catalog(a.warehouse)
               .maintain_all(
                   spark,
                   target_file_size=_mb(a.target_mb) if a.target_mb else None,
                   cluster_mode=a.cluster_mode,
                   keep_snapshots=a.keep, analyze=a.analyze)}
    elif a.cmd == "evolve-partition":
        tbl = LakehouseTable(a.table)
        v = tbl.evolve_partition(None if a.col == "none" else a.col,
                                 transform=a.transform)
        out = {"cmd": "evolve-partition", "partition_col": tbl._partition_col(),
               "partition_transform": tbl.partition_transform(),
               "specs": tbl.partition_specs(), "metadata_version": v}
    elif a.cmd == "migrate-partitions":
        from .operators import compaction

        out = {"cmd": "migrate-partitions", **compaction.migrate_partitions(
            LakehouseTable(a.table), spark, target_file_size=_mb(a.target_mb))}
    elif a.cmd == "add-files":
        snap = LakehouseTable(a.table).add_files(spark, a.source)
        out = {"cmd": "add-files", "snapshot": snap.snapshot_id,
               "files": snap.summary["added-files"],
               "rows": snap.summary["added-records"]}
    elif a.cmd == "stats":
        tbl = LakehouseTable(a.table)
        cols = [c for c in a.cols.split(",") if c]
        res = tbl.stats_aggregate(spark, cols)
        out = {"cmd": "stats", "metadata_only": res is not None}
        if res is not None:
            out.update(res)
        else:
            agg = tbl.scan(spark).agg(
                F.count("*").alias("n"),
                *[f for c in cols for f in
                  (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))]
            ).collect()[0]
            out["row_count"] = agg["n"]
            out["mins"] = {c: agg[f"min_{c}"] for c in cols}
            out["maxs"] = {c: agg[f"max_{c}"] for c in cols}
    elif a.cmd == "copy-into":
        from .operators.copy_into import copy_into

        out = {"cmd": "copy-into", **copy_into(
            LakehouseTable(a.table), spark, a.source, format=a.format,
            max_files_per_batch=a.max_files)}
    elif a.cmd == "branch":
        tbl = LakehouseTable(a.table)
        if a.create:
            v = tbl.create_branch(a.create, snapshot_id=a.snapshot)
            out = {"cmd": "branch", "created": a.create,
                   "head": tbl.branches()[a.create], "metadata_version": v}
        elif a.drop:
            v = tbl.drop_branch(a.drop)
            out = {"cmd": "branch", "dropped": a.drop, "metadata_version": v}
        else:
            out = {"cmd": "branch", "branches": tbl.branches(),
                   "tags": tbl.tags()}
    elif a.cmd == "publish":
        tbl = LakehouseTable(a.table)
        if a.cherrypick is not None:
            if a.target != "main":
                raise SystemExit("--cherrypick publishes onto main only")
            snap = tbl.cherrypick_snapshot(a.cherrypick)
            out = {"cmd": "publish", "cherrypick": a.cherrypick,
                   "target": "main", "head": snap.snapshot_id}
        else:
            v = tbl.fast_forward(a.source, target=a.target)
            out = {"cmd": "publish", "source": a.source, "target": a.target,
                   "head": tbl.branch_head(a.target), "metadata_version": v}
    elif a.cmd == "rollback":
        tbl = LakehouseTable(a.table)
        sid = (a.snapshot if a.snapshot is not None
               else tbl.snapshot_as_of(a.as_of_ms).snapshot_id)
        v = tbl.rollback_to(sid)
        out = {"cmd": "rollback", "snapshot": sid, "metadata_version": v}
    elif a.cmd == "snapshots":
        out = {"cmd": "snapshots", "snapshots": [
            {"id": s.snapshot_id, "op": s.operation, "seq": s.sequence,
             "summary": s.summary}
            for s in LakehouseTable(a.table).snapshots_list()
        ]}
    elif a.cmd == "export-shards":
        from pyspark.sql import types as T

        from .operators.training_export import write_shards

        tbl = LakehouseTable(a.table)
        df = tbl.scan(spark)
        wcol = a.weight_col
        if wcol is None:
            bins = [f.name for f in tbl.schema().fields
                    if isinstance(f.dataType, T.BinaryType)]
            if not bins:
                raise SystemExit("no binary column; pass --weight-col")
            wcol = "_nbytes"
            df = df.withColumn(wcol, F.octet_length(F.col(bins[0])))
        out = {"cmd": "export-shards", **write_shards(
            spark, df, a.id_col, wcol, a.out,
            target_bytes=_mb(a.target_mb), seed=a.seed)}
    elif a.cmd == "sql":
        from .sql import execute_sql_script
        from .tableformat import Catalog

        args = {}
        for kv in a.param:
            name, _, raw = kv.partition("=")
            try:
                args[name] = json.loads(raw)
            except json.JSONDecodeError:
                args[name] = raw
        script = a.query if a.query else open(a.file).read()
        results = []
        for r in execute_sql_script(spark, script,
                                    catalog=Catalog(a.warehouse),
                                    args=args):
            if isinstance(r, dict):
                results.append(r)
            else:
                results.append({"rows": [row.asDict(recursive=True)
                                         for row in r.limit(a.limit)
                                         .collect()]})
        out = {"cmd": "sql", "results": results}
    else:  # pragma: no cover
        raise SystemExit(2)
    print(json.dumps(out, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
