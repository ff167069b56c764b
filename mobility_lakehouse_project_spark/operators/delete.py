"""Row-level DELETE / UPDATE — stats-pruned copy-on-write file rewrite.

The reference's only row deletion is the partition-wise DELETE-day
(dags/Silver_Transform_Dag.py:188-207 — covered by
``overwrite_partitions``); this operator adds the general form a
lakehouse user expects (`DELETE FROM t WHERE <predicate>`), executed
the way Iceberg's copy-on-write DELETE plans it:

 1. **Candidate files** from the manifest stats: ``int_ranges`` prunes
    the candidate set distributed over the files() metadata DataFrame
    (a delete of a phash band on a clustered table touches only the
    band's files) — the predicate itself is then re-checked row-level,
    so a too-wide range is safe and a too-narrow one is the caller's
    bug (same contract as ``scan(int_ranges=)``).
 2. **Touch detection** reads only the NON-BINARY columns of the
    candidates (blobs never ride this pass) + input_file_name; files
    with at least one matching row are the touched set.
 3. **Rewrite** touched files WITHOUT the matching rows, one blob read,
    salted-hash write; commit pinned to the plan snapshot
    (``expected_parent``) — a concurrent commit means the matched-row
    classification may be stale, so it surfaces for a replan instead of
    composing (same rule as MERGE).
"""

from __future__ import annotations

import time
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lineage import LineageLog
from ..tableformat import LakehouseTable
from ..tableformat.paths import relativize


def _plan_touched(table, spark, cond, int_ranges):
    """Shared DELETE/UPDATE planning: stats-pruned candidate files ->
    row-level touch detection on NON-BINARY columns -> manifest entries
    of the touched set. Returns (cand_paths, touched_entries,
    n_matched, n_total)."""
    cand = table.plan_files(spark, int_ranges=int_ranges)
    cand_paths = sorted(
        r["file_path"] for r in cand.select("file_path").collect()
    )
    n_total = table.files(spark).count()
    if not cand_paths:
        return [], [], 0, n_total
    schema = table.schema()
    slim_cols = [
        f.name for f in schema.fields if not isinstance(f.dataType, T.BinaryType)
    ]
    probe = (
        table.scan_files(spark, cand_paths, columns=slim_cols)
        .withColumn("_file", F.input_file_name())
        .filter(cond)
        .groupBy("_file")
        .agg(F.count("*").alias("n_hit"))
        .collect()
    )
    touched_rel = {relativize(unquote(r["_file"]), table.location) for r in probe}
    n_matched = sum(r["n_hit"] for r in probe)
    if not touched_rel:
        return cand_paths, [], 0, n_total
    tdf = spark.createDataFrame(
        [(p,) for p in sorted(touched_rel)], "file_path string"
    )
    touched_entries = [
        r.asDict()
        for r in table.files(spark)
        .join(F.broadcast(tdf), "file_path", "left_semi")
        .select("file_path", "partition_id", "file_size_bytes", "record_count")
        .collect()
    ]
    if len(touched_entries) != len(touched_rel):
        resolved = {e["file_path"] for e in touched_entries}
        raise RuntimeError(
            "row-op planning: paths did not all resolve to manifest entries; "
            f"unresolved={sorted(touched_rel - resolved)[:5]}"
        )
    return cand_paths, touched_entries, n_matched, n_total


def delete_where(
    table: LakehouseTable,
    spark: SparkSession,
    predicate: Column | str,
    int_ranges: dict[str, tuple[int | None, int | None]] | None = None,
    target_file_size: int = 64 * 1024 * 1024,
    op_id: str | None = None,
) -> dict:
    """DELETE FROM table WHERE ``predicate``.

    ``predicate`` may reference any non-binary column; pass
    ``int_ranges`` matching the predicate's bounds to let manifest
    stats prune the candidate files (the payoff of clustering)."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    t0 = time.time()
    meta = table.load_metadata()
    cur = table.current_snapshot(meta)
    if cur is None or not cur.manifests:
        return {"files_rewritten": 0, "files_written": 0, "rows_deleted": 0,
                "wall_ms": int((time.time() - t0) * 1000), "snapshot": None}

    cand_paths, touched_entries, n_deleted, n_total = _plan_touched(
        table, spark, cond, int_ranges
    )
    if not touched_entries:
        return {"files_rewritten": 0, "files_written": 0, "rows_deleted": 0,
                "candidate_files": len(cand_paths), "total_files": n_total,
                "wall_ms": int((time.time() - t0) * 1000),
                "snapshot": cur.snapshot_id}

    # 3. rewrite touched files minus matching rows (single blob read)
    survivors = table.scan_matched_files(touched_entries, spark).filter(~cond)
    touched_bytes = sum(e["file_size_bytes"] for e in touched_entries)
    touched_rows = sum(e["record_count"] for e in touched_entries)
    keep_frac = 1.0 - n_deleted / max(touched_rows, 1)
    n_out = max(1, round(touched_bytes * keep_frac / target_file_size))
    n_parts = len({e["partition_id"] for e in touched_entries}) or 1
    new_entries = table.write_data_files(
        survivors, n_files=n_out, n_partitions_hint=n_parts,
    )
    snap = table.commit_replace(
        {e["file_path"] for e in touched_entries},
        new_entries,
        operation="delete",
        summary={"op": "delete", "rows-deleted": n_deleted,
                 "predicate": str(predicate)},
        affected_partitions={e["partition_id"] for e in touched_entries},
        # content-sensitive: the matched-row classification was computed
        # against the plan snapshot — any concurrent commit must force a
        # replan, not compose (same rule as MERGE)
        retries=0,
        expected_parent=cur.snapshot_id,
    )
    wall_ms = int((time.time() - t0) * 1000)
    LineageLog(table.location).record(
        op_id or f"delete-{snap.snapshot_id}", "all",
        sorted({e["partition_id"] for e in touched_entries}),
        len(touched_entries), len(new_entries),
        sum(e["record_count"] for e in new_entries),
        sum(e["file_size_bytes"] for e in new_entries),
        wall_ms, snap.snapshot_id,
    )
    return {
        "files_rewritten": len(touched_entries),
        "files_written": len(new_entries),
        "rows_deleted": n_deleted,
        "candidate_files": len(cand_paths),
        "total_files": n_total,
        "wall_ms": wall_ms,
        "snapshot": snap.snapshot_id,
    }


def update_where(
    table: LakehouseTable,
    spark: SparkSession,
    predicate: Column | str,
    assignments: dict[str, Column | str],
    int_ranges: dict[str, tuple[int | None, int | None]] | None = None,
    target_file_size: int = 64 * 1024 * 1024,
    op_id: str | None = None,
) -> dict:
    """UPDATE table SET col = expr, ... WHERE ``predicate`` — the same
    stats-pruned copy-on-write plan as DELETE: only files holding a
    matching row are rewritten, with the assignments applied to the
    matching rows and every other row carried through untouched.
    Assignments may reference any column (SQL strings or Columns);
    updating the partition column relocates the row (the commit's
    affected set covers both the old and new partitions)."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    t0 = time.time()
    meta = table.load_metadata()
    cur = table.current_snapshot(meta)
    if cur is None or not cur.manifests:
        return {"files_rewritten": 0, "files_written": 0, "rows_updated": 0,
                "wall_ms": int((time.time() - t0) * 1000), "snapshot": None}
    data_cols = [f.name for f in table.schema().fields]
    bad = [c for c in assignments if c not in data_cols]
    if bad:
        raise ValueError(f"unknown assignment columns: {bad}")
    upd = {
        c: (F.expr(e) if isinstance(e, str) else e)
        for c, e in assignments.items()
    }

    cand_paths, touched_entries, n_updated, n_total = _plan_touched(
        table, spark, cond, int_ranges
    )
    if not touched_entries:
        return {"files_rewritten": 0, "files_written": 0, "rows_updated": 0,
                "candidate_files": len(cand_paths), "total_files": n_total,
                "wall_ms": int((time.time() - t0) * 1000),
                "snapshot": cur.snapshot_id}

    out = table.scan_matched_files(touched_entries, spark).select(
        *[
            (F.when(cond, upd[c]).otherwise(F.col(c)).alias(c) if c in upd
             else F.col(c))
            for c in data_cols
        ]
    )
    touched_bytes = sum(e["file_size_bytes"] for e in touched_entries)
    n_out = max(1, round(touched_bytes / target_file_size))
    n_parts = len({e["partition_id"] for e in touched_entries}) or 1
    new_entries = table.write_data_files(
        out, n_files=n_out, n_partitions_hint=n_parts,
    )
    snap = table.commit_replace(
        {e["file_path"] for e in touched_entries},
        new_entries,
        operation="overwrite",
        summary={"op": "update", "rows-updated": n_updated,
                 "predicate": str(predicate),
                 "set": ",".join(sorted(assignments))},
        affected_partitions={e["partition_id"] for e in touched_entries}
        | {e["partition_id"] for e in new_entries},
        retries=0,
        expected_parent=cur.snapshot_id,
    )
    wall_ms = int((time.time() - t0) * 1000)
    LineageLog(table.location).record(
        op_id or f"update-{snap.snapshot_id}", "all",
        sorted({e["partition_id"] for e in touched_entries}),
        len(touched_entries), len(new_entries),
        sum(e["record_count"] for e in new_entries),
        sum(e["file_size_bytes"] for e in new_entries),
        wall_ms, snap.snapshot_id,
    )
    return {
        "files_rewritten": len(touched_entries),
        "files_written": len(new_entries),
        "rows_updated": n_updated,
        "candidate_files": len(cand_paths),
        "total_files": n_total,
        "wall_ms": wall_ms,
        "snapshot": snap.snapshot_id,
    }
