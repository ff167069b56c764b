"""Z-order / Hilbert clustering rewrite.

Replaces the table's data layout with one sorted by a space-filling
curve over (phash, w, h): the engine's substitute for the reference's
ART indexes (SURVEY.md §4) — after clustering, per-file min/max stats
in the manifests make point/range scans on the clustered columns prune
most files.

Plan shape (one shuffle per chunk):
  scan chunk partitions
    -> withColumn(_sfc, <Arrow-vectorized pandas UDF>)   # functions/sfc.py
    -> repartitionByRange(n_out, partition_col, _sfc)    # contiguous slices
    -> sortWithinPartitions(partition_col, _sfc)
    -> drop(_sfc) -> write partitioned files -> replace-files commit

The `bytes` column rides exactly one shuffle (the rewrite itself — the
measured workload); the curve key is computed before the exchange so
range partitioning samples the key, and dropped before write. Because
the curve's top bits are phash's top bits, each output file covers a
tight phash band inside its bucket -> tight manifest stats.

Resumable per chunk via the lineage log, like compaction.
"""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.sfc import CURVES
from ..lineage import LineageLog
from ..tableformat import LakehouseTable
from .compaction import DEFAULT_TARGET_FILE_SIZE, _chunk, _op_fingerprint, chunk_key

_SFC_COL = "_sfc"


def cluster(
    table: LakehouseTable,
    spark: SparkSession,
    curve: str = "zorder",
    cols: tuple[str, str, str] = ("phash", "w", "h"),
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    n_chunks: int = 4,
    op_id: str | None = None,
) -> dict:
    """Rewrite the whole table clustered by ``curve`` over ``cols``."""
    key_udf = CURVES[curve]
    entries = table.all_entries()
    if not entries:
        return {"files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
                "wall_ms": 0, "chunks_skipped": 0, "snapshots": []}
    op_id = op_id or _op_fingerprint("cluster-" + curve, table, ",".join(cols))
    log = LineageLog(table.location)
    done = log.completed_chunks(op_id)
    pcol = table._partition_col()

    # group entries per partition, chunk partitions for resume granularity
    parts: dict[str, list[dict]] = {}
    for e in entries:
        parts.setdefault(e["partition_id"], []).append(e)
    part_ids = sorted(parts)

    metrics = {"files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
               "wall_ms": 0, "chunks_skipped": 0, "snapshots": []}
    for chunk_parts in _chunk(part_ids, n_chunks):
        ck = chunk_key(list(chunk_parts))
        if ck in done:
            metrics["chunks_skipped"] += 1
            continue
        t0 = time.time()
        chunk_entries = [e for p in chunk_parts for e in parts[p]]
        removed = {e["file_path"] for e in chunk_entries}
        chunk_bytes = sum(e["file_size_bytes"] for e in chunk_entries)
        n_out = max(1, round(chunk_bytes / target_file_size))
        df = table.scan_matched_files(chunk_entries, spark)
        keyed = df.withColumn(_SFC_COL, key_udf(*[F.col(c) for c in cols]))
        range_cols = ([pcol] if pcol else []) + [_SFC_COL]
        shaped = (
            keyed.repartitionByRange(n_out, *[F.col(c) for c in range_cols])
            .sortWithinPartitions(*range_cols)
            .drop(_SFC_COL)
        )
        new_entries = table.write_data_files(shaped)  # distribution already set
        snap = table.commit_replace(
            removed, new_entries, operation="replace",
            summary={"op": f"cluster-{curve}", "op_id": op_id, "chunk": ck},
        )
        wall_ms = int((time.time() - t0) * 1000)
        rows = sum(e["record_count"] for e in new_entries)
        nbytes = sum(e["file_size_bytes"] for e in new_entries)
        log.record(op_id, ck, list(chunk_parts), len(removed),
                   len(new_entries), rows, nbytes, wall_ms, snap.snapshot_id)
        metrics["files_in"] += len(removed)
        metrics["files_out"] += len(new_entries)
        metrics["rows"] += rows
        metrics["bytes"] += nbytes
        metrics["wall_ms"] += wall_ms
        metrics["snapshots"].append(snap.snapshot_id)
    return metrics


def pruning_ratio(
    table: LakehouseTable,
    spark: SparkSession,
    col: str,
    lo: int,
    hi: int,
) -> dict:
    """Measure stats-pruning effectiveness for a range predicate: the
    fraction of files a clustered scan can skip (the observable payoff
    of Z-order/Hilbert)."""
    entries = table.all_entries()
    total = len(entries)
    kept = [
        e for e in entries
        if col not in e["int_maxs"]
        or (e["int_maxs"][col] >= lo and e["int_mins"][col] <= hi)
    ]
    return {"total_files": total, "scanned_files": len(kept),
            "pruned_fraction": 1.0 - len(kept) / max(total, 1)}
