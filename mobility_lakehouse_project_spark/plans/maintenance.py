"""One-call table maintenance — the policy-driven orchestrator that
makes this engine a single ``spark-submit`` application replacing the
reference's Airflow DAG fan-out (Bronze/Silver/Gold_*_Dag.py schedule
compaction-ish work as separate DAGs; BASELINE.json's north star asks
for ONE submitted app).

Runs, in dependency order, each enabled action:

 1. fold merge-on-read deletes (scan-tax reclamation) — first, so the
    rewrites below never carry anti-joins;
 2. migrate files from older partition specs (unblocks the
    partition-keyed steps after an evolve_partition);
 3. bin-pack compaction (small-file problem);
 4. optional Z-order/Hilbert clustering (scan-pruning layout);
 5. manifest rewrite when the manifest list has fragmented;
 6. snapshot expiry (keep_last) + orphan-file GC;
 7. optional ANALYZE refresh.

Every step is independently resumable (each keeps its own lineage
checkpoints / idempotence), so a killed maintenance run re-runs
safely — the property the reference gets from Airflow retries, here
without the scheduler."""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from ..tableformat import LakehouseTable
from ..tableformat.table import ConcurrentCommitError


def _with_replan(fn, attempts=2):
    """Run a maintenance rewrite; on a concurrent-commit conflict
    (a DML delete/rewrite landing mid-step — the validated-rebase and
    resurrection guards surface these), REPLAN once by re-running the
    op: every step re-derives its plan from the current snapshot and
    is chunk-idempotent, so the retry converges with the concurrent
    change applied. A second conflict propagates — the caller decides
    whether to reschedule the sweep."""
    for i in range(attempts):
        try:
            return fn()
        except ConcurrentCommitError:
            if i == attempts - 1:
                raise
    raise AssertionError("unreachable")


#: table properties read when the matching argument is left at None —
#: the per-table policy surface ``Catalog.maintain_all`` sweeps over
#: (one warehouse call, each table declaring its own maintenance).
POLICY_PROPS = {
    "target_file_size": "maintenance.target-file-size-mb",
    "max_file_size": "maintenance.max-file-size-mb",
    "keep_snapshots": "maintenance.keep-snapshots",
    "cluster_mode": "maintenance.cluster-mode",
    "fold_min_delete_ratio": "maintenance.min-delete-ratio",
    "max_snapshot_age_ms": "maintenance.max-snapshot-age-ms",
}


def run_maintenance(
    table: LakehouseTable,
    spark: SparkSession,
    target_file_size: int | None = None,
    fold_deletes: bool = True,
    fold_min_delete_ratio: float | None = None,
    cluster_curve: str | None = None,
    cluster_cols: tuple[str, ...] | None = None,
    cluster_mode: str | None = None,
    max_file_size: int | None = None,
    rewrite_manifests_min: int = 4,
    keep_snapshots: int | None = None,
    max_snapshot_age_ms: int | None = None,
    orphan_grace_s: float = 3 * 86400.0,
    analyze: bool = False,
    recompress_level: int | None = None,
) -> dict:
    """Run the full maintenance pass; returns per-step metrics.
    ``cluster_curve=None`` skips clustering (compaction alone) UNLESS
    the table declares ``write.sort-order`` — a declared order means
    maintenance always restores the layout, the Iceberg contract;
    ``cluster_curve="table"`` requires the property (errors when
    unset). ``analyze=True`` refreshes column statistics at the end.

    Arguments left at None defer to the table's own properties
    (POLICY_PROPS: ``maintenance.target-file-size-mb`` /
    ``keep-snapshots`` / ``cluster-mode`` / ``min-delete-ratio``), so
    a warehouse sweep applies each table's declared policy; an
    explicit argument always wins over the property."""
    from ..operators import analyze as analyze_op
    from ..operators import clustering, compaction, delete

    meta0 = table.load_metadata()
    props = meta0.get("properties", {})

    def _prop(arg, key, cast, default):
        if arg is not None:
            return arg
        v = props.get(POLICY_PROPS[key])
        return cast(v) if v is not None else default

    target_file_size = _prop(target_file_size, "target_file_size",
                             lambda v: int(float(v) * 1024 * 1024),
                             128 * 1024 * 1024)
    keep_snapshots = _prop(keep_snapshots, "keep_snapshots", int, 5)
    cluster_mode = _prop(cluster_mode, "cluster_mode", str, "full")
    if cluster_mode not in ("full", "incremental"):
        raise ValueError(f"bad maintenance.cluster-mode {cluster_mode!r}")
    # Default 0.05, calibrated (tools/calibrate_fold.py, curve in
    # BENCH/BASELINE.md): the MOR scan tax after DV consolidation is
    # FLAT in delete ratio (~7 ms/file/scan on the bench table — it is
    # per-file apply overhead plus a per-row probe, not per-deleted-
    # row), so folding a file buys the same scan win at 0.2% deleted
    # as at 25% — but costs a full blob rewrite either way. The ratio
    # therefore gates write amplification per reclaimed byte (a fold
    # at ratio r rewrites 1/r bytes per byte reclaimed): 5% caps it at
    # 20x, and measured break-even vs the scan tax is ~8-17 full-table
    # scans — inside a maintenance cadence. Below-threshold files keep
    # ONE consolidated deletion vector (compact_deletion_vectors below
    # holds the tax at its flat floor); set the
    # ``maintenance.min-delete-ratio`` property or pass 0.0 for the
    # full physical clean.
    fold_min_delete_ratio = _prop(fold_min_delete_ratio,
                                  "fold_min_delete_ratio", float, 0.05)
    max_snapshot_age_ms = _prop(max_snapshot_age_ms, "max_snapshot_age_ms",
                                int, None)
    max_file_size = _prop(max_file_size, "max_file_size",
                          lambda v: int(float(v) * 1024 * 1024), None)

    declared = table.sort_order(meta0)
    if cluster_curve == "table":
        if declared is None:
            raise ValueError(
                'cluster_curve="table" but the table declares no '
                "write.sort-order property")
        cluster_curve, cluster_cols = declared
    else:
        # per-axis: an explicit axis wins, an unset one falls back to
        # the declared order; giving EITHER axis (or declaring one)
        # turns clustering on
        if cluster_curve is None and declared is not None:
            cluster_curve = declared[0]
        if cluster_cols is None and declared is not None:
            cluster_cols = declared[1]
        if cluster_curve is None and cluster_cols is not None:
            cluster_curve = "zorder"

    t0 = time.time()
    report: dict = {}
    cur = table.current_snapshot()
    if cur is None:
        return {"skipped": "empty table", "wall_ms": 0}

    if fold_deletes and cur.delete_manifests:
        report["fold_deletes"] = _with_replan(
            lambda: delete.rewrite_position_deletes(
                table, spark, target_file_size=target_file_size,
                min_delete_ratio=fold_min_delete_ratio))
        remaining = table.current_snapshot()
        if (len(remaining.position_delete_manifests())
                + len(remaining.dv_manifests())) > 1:
            # a targeted fold (min_delete_ratio) left below-threshold
            # delete state applied: consolidate it to ONE vector per
            # file so the skipped rewrites don't keep a manifest stack
            report["compact_deletion_vectors"] = \
                delete.compact_deletion_vectors(table, spark)

    if table._current_spec_snapshot_ids(table.load_metadata()) is not None:
        report["migrate_partitions"] = _with_replan(
            lambda: compaction.migrate_partitions(
                table, spark, target_file_size=target_file_size))

    report["compact"] = _with_replan(
        lambda: compaction.compact(
            table, spark, target_file_size=target_file_size,
            recompress_level=recompress_level))

    if max_file_size is not None and not (
            cluster_curve is not None and cluster_mode == "full"):
        # split the skewed-writer tail back to target size; skipped
        # when a FULL cluster pass follows — that rewrite re-sizes
        # every file anyway, so splitting first would read blobs twice
        report["split_oversized"] = _with_replan(
            lambda: compaction.split_oversized(
                table, spark, target_file_size=target_file_size,
                max_file_size=max_file_size))

    if cluster_curve is not None:
        # incremental = the steady-state shape at scale: re-sort only
        # post-baseline files (O(ingest) not O(table)); partitions the
        # ingest mostly rewrote get a full per-partition re-cluster
        cluster_fn = (clustering.cluster_incremental
                      if cluster_mode == "incremental"
                      else clustering.cluster)
        report["cluster"] = _with_replan(
            lambda: cluster_fn(
                table, spark, curve=cluster_curve, cols=cluster_cols,
                target_file_size=target_file_size,
                recompress_level=recompress_level))

    cur = table.current_snapshot()
    if cur is not None and len(cur.manifests) >= rewrite_manifests_min:
        snap = table.rewrite_manifests(spark)
        report["rewrite_manifests"] = {
            "snapshot": snap.snapshot_id if snap else None,
            **(snap.summary if snap else {}),
        }

    report["expire_snapshots"] = table.expire_snapshots(
        keep_last=keep_snapshots,
        older_than_ms=(int(time.time() * 1000) - max_snapshot_age_ms
                       if max_snapshot_age_ms is not None else None),
        spark=spark)
    report["remove_orphans"] = table.remove_orphan_files(
        orphan_grace_s, spark=spark)

    if analyze:
        report["analyze"] = analyze_op.analyze_table(table, spark)

    report["wall_ms"] = int((time.time() - t0) * 1000)
    return report
