"""Bin-pack compaction: rewrite many small data files into few
target-sized ones, per partition, resumable per chunk.

Planning is a DataFrame aggregation over the `files` metadata table
(north-star: "driven by a DataFrame scan of Iceberg metadata tables");
only the per-partition plan rows (one per partition, metadata-sized)
are collected. The rewrite itself is one shuffle per chunk:
``repartitionByRange(n_out, partition_col, sort_col)`` — every output
task gets a contiguous (partition, key) slice, so output file count
per partition is proportional to its bytes and a hot partition is
split across tasks instead of hot-spotting one (explicit skew
handling; AQE skew-join stays on for the rest of the plan).

Chunking over partitions exists for *resume granularity only* (the
reference's monthly-chunk idiom, dags/Gold_Chunked_Dag.py:70-88 — there
it was a memory workaround; Spark spills, so here a chunk is just the
checkpoint/commit unit).
"""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..lineage import LineageLog
from ..tableformat import LakehouseTable
from ..tableformat.distribute import exact_slot_repartition, partitioned_group_expr

DEFAULT_TARGET_FILE_SIZE = 128 * 1024 * 1024


def require_single_spec(table: LakehouseTable, spark: SparkSession) -> None:
    """Partition-keyed rewrites (compact/cluster) assign output slots
    by the CURRENT partition column's row values, assuming they match
    the manifest partition ids — untrue for files written under an
    older spec. Until those are migrated, fail loudly instead of
    mis-slotting."""
    meta = table.load_metadata()
    cur_ids = table._current_spec_snapshot_ids(meta)
    if cur_ids is None:
        return
    old = (
        table.files(spark)
        .filter(~F.col("added_snapshot_id").isin(cur_ids))
        .limit(1).count()
    )
    if old:
        raise ValueError(
            "table has files from an older partition spec; run "
            "compaction.migrate_partitions first"
        )


def migrate_partitions(
    table: LakehouseTable,
    spark: SparkSession,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    chunk_files: int = 50_000,
    op_id: str | None = None,
) -> dict:
    """Rewrite every file written under an OLDER partition spec into
    the current spec (Iceberg's rewrite_data_files migration after
    partition evolution). Old files are walked in chunks grouped by
    their old partition ids (bounded driver collects); the generic
    salted-hash write re-derives partition values from the current
    column; pending MOR deletes are applied by the rewrite scan. After
    this, partition-level ops (overwrite_partitions, compact, cluster)
    are valid again."""
    t0 = time.time()
    meta = table.load_metadata()
    cur_ids = table._current_spec_snapshot_ids(meta)
    metrics = {"files_migrated": 0, "files_written": 0, "chunks": 0}
    if cur_ids is None:
        metrics["wall_ms"] = 0
        return metrics
    log = LineageLog(table.location)
    old_parts = (
        table.files(spark)
        .filter(~F.col("added_snapshot_id").isin(cur_ids))
        .groupBy("partition_id").agg(F.count("*").alias("n_files"))
        .collect()
    )
    chunks: list[list[str]] = []
    cur_chunk: list[str] = []
    n = 0
    for r in sorted(old_parts, key=lambda r: r["partition_id"]):
        if cur_chunk and n + r["n_files"] > chunk_files:
            chunks.append(cur_chunk)
            cur_chunk, n = [], 0
        cur_chunk.append(r["partition_id"])
        n += r["n_files"]
    if cur_chunk:
        chunks.append(cur_chunk)
    metrics["chunks"] = len(chunks)
    for ci, part_ids in enumerate(chunks):
        tc = time.time()
        entries = [
            r.asDict()
            for r in table.files(spark)
            .filter(~F.col("added_snapshot_id").isin(cur_ids)
                    & F.col("partition_id").isin(list(part_ids)))
            .select("file_path", "partition_id", "file_size_bytes",
                    "record_count", "first_row_id").collect()
        ]
        if not entries:
            continue
        plan_snap = table.current_snapshot()
        plan_dm = set(plan_snap.delete_manifests) if plan_snap else set()
        src = table.scan_matched_files(entries, spark, with_row_id=True,
                                       with_last_seq=True)
        nbytes = sum(e["file_size_bytes"] for e in entries)
        new_entries = table.write_data_files(
            src, n_files=max(1, round(nbytes / target_file_size)),
            enforce_constraints=False)
        snap = table.commit_replace(
            {e["file_path"] for e in entries}, new_entries,
            operation="replace",
            summary={"op": "migrate-partitions",
                     "chunk": f"{ci + 1}/{len(chunks)}"},
            affected_partitions={e["partition_id"] for e in entries},
            expected_delete_manifests=plan_dm,
        )
        log.record(
            op_id or f"migrate-{snap.snapshot_id}", f"chunk-{ci}",
            sorted(part_ids), len(entries), len(new_entries),
            sum(e["record_count"] for e in new_entries),
            sum(e["file_size_bytes"] for e in new_entries),
            int((time.time() - tc) * 1000), snap.snapshot_id,
        )
        metrics["files_migrated"] += len(entries)
        metrics["files_written"] += len(new_entries)
        metrics["snapshot"] = snap.snapshot_id
    metrics["wall_ms"] = int((time.time() - t0) * 1000)
    return metrics


def plan_compaction(
    table: LakehouseTable,
    spark: SparkSession,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    small_file_threshold: float = 0.75,
) -> list[dict]:
    """Per-partition compaction plan from the files metadata table.

    A partition is a candidate when it has >=2 files below
    ``small_file_threshold * target_file_size`` (classic bin-pack
    trigger). Returns [{partition_id, bytes, rows, n_files, n_out}] —
    ONE metadata-sized row per partition; the per-chunk file lists are
    fetched later (chunk_file_paths) so the driver never holds more
    than one chunk's paths (at 10^12 scale the manifest set is
    millions of entries — a collect_list here would be the
    scale-killer the rest of the engine avoids)."""
    files = table.files(spark)
    small = files.filter(F.col("file_size_bytes") < int(target_file_size * small_file_threshold))
    plan = (
        small.groupBy("partition_id")
        .agg(
            F.sum("file_size_bytes").alias("bytes"),
            F.sum("record_count").alias("rows"),
            F.count("*").alias("n_files"),
        )
        .filter(F.col("n_files") >= 2)
        .collect()
    )
    out = []
    for r in plan:
        n_out = max(1, round(r["bytes"] / target_file_size))
        if n_out >= r["n_files"]:
            continue  # already at or below target file count
        out.append(
            {
                "partition_id": r["partition_id"],
                "bytes": int(r["bytes"]),
                "rows": int(r["rows"]),
                "n_files": int(r["n_files"]),
                "n_out": n_out,
            }
        )
    return sorted(out, key=lambda p: p["partition_id"])


def chunk_file_paths(
    table: LakehouseTable,
    spark: SparkSession,
    partition_ids: list[str],
    max_file_size: int | None = None,
    min_file_size: int | None = None,
) -> list[str]:
    """Collect the data-file paths of ONE chunk of partitions from the
    manifest scan — the only point where planning materializes paths,
    bounded by chunk size."""
    df = table.plan_files(spark, partition_values=set(partition_ids))
    if max_file_size is not None:
        df = df.filter(F.col("file_size_bytes") < int(max_file_size))
    if min_file_size is not None:
        df = df.filter(F.col("file_size_bytes") >= int(min_file_size))
    return sorted(r["file_path"] for r in df.select("file_path").collect())


def _op_fingerprint(kind: str, table: LakehouseTable, extra: str = "") -> str:
    """Deterministic op id: same snapshot + same op -> same id, so a
    killed run resumes its own checkpoints (lineage keying)."""
    snap = table.current_snapshot()
    basis = f"{kind}:{snap.snapshot_id if snap else 'empty'}:{extra}"
    return kind + "-" + hashlib.sha256(basis.encode()).hexdigest()[:12]


def chunk_key(partition_ids: list[str]) -> str:
    """Stable checkpoint key for a chunk of partitions."""
    return "p" + hashlib.sha256(",".join(partition_ids).encode()).hexdigest()[:10]


def _chunk(seq: list, n_chunks: int) -> list[list]:
    n_chunks = max(1, min(n_chunks, len(seq)))
    size = (len(seq) + n_chunks - 1) // n_chunks
    return [seq[i : i + size] for i in range(0, len(seq), size)]


def resolve_layout_cols(
    table: LakehouseTable,
    sort_col: str | None,
    key_col: str | None,
) -> tuple[str | None, str]:
    """Resolve the rewrite's (sort_col, key_col) against the table
    schema. ``"auto"`` means: key = the first schema column (any stable
    expression works — it only feeds the xxhash64 slot spread), sort =
    the declared ``write.sort-order``'s leading column, else unsorted.
    An explicitly-passed unknown column raises ValueError up front
    instead of an AnalysisException mid-shuffle."""
    known = [f.name for f in table.schema().fields]
    if key_col == "auto":
        key_col = known[0]
    elif key_col not in known:
        raise ValueError(f"compact key_col {key_col!r} not in schema {known}")
    if sort_col == "auto":
        order = table.sort_order()
        sort_col = order[1][0] if order else None
    elif sort_col is not None and sort_col not in known:
        raise ValueError(f"compact sort_col {sort_col!r} not in schema {known}")
    return sort_col, key_col


def compact(
    table: LakehouseTable,
    spark: SparkSession,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    sort_col: str | None = "auto",
    key_col: str = "auto",
    n_chunks: int = 4,
    op_id: str | None = None,
    recompress_level: int | None = None,
    only_partitions: set[str] | None = None,
) -> dict:
    """Bin-pack compact the table. Returns metrics {files_in, files_out,
    rows, bytes, wall_ms, chunks_skipped, snapshots}.

    ``only_partitions`` scopes the run (incremental maintenance: touch
    only the partitions a recent ingest fragmented, instead of
    re-walking the whole table)."""
    require_single_spec(table, spark)
    sort_col, key_col = resolve_layout_cols(table, sort_col, key_col)
    plan = plan_compaction(table, spark, target_file_size)
    if only_partitions is not None:
        plan = [p for p in plan if p["partition_id"] in only_partitions]
    if not plan:
        return {"files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
                "wall_ms": 0, "chunks_skipped": 0, "snapshots": []}
    op_id = op_id or _op_fingerprint("compact", table, str(target_file_size))
    log = LineageLog(table.location)
    done = log.completed_chunks(op_id)
    pcol = table._partition_col()

    metrics = {"files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
               "wall_ms": 0, "chunks_skipped": 0, "snapshots": []}
    # Rewrite plans are fully pinned (exact-slot repartition fixes the
    # reduce count, no joins to re-strategize), so AQE's materialize-
    # and-replan pause at each stage boundary is pure driver latency —
    # same reasoning and measurement as clustering.cluster. Disabled
    # for the rewrite jobs only, restored after.
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        _compact_chunks(table, spark, plan, n_chunks, done, metrics,
                        target_file_size, sort_col, key_col, pcol,
                        recompress_level, log, op_id)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    return metrics


def _compact_chunks(table, spark, plan, n_chunks, done, metrics,
                    target_file_size, sort_col, key_col, pcol,
                    recompress_level, log, op_id):
    for chunk in _chunk(plan, n_chunks):
        ck = chunk_key([p["partition_id"] for p in chunk])
        if ck in done:
            metrics["chunks_skipped"] += 1
            continue
        t0 = time.time()
        removed = set(
            chunk_file_paths(
                table, spark, [p["partition_id"] for p in chunk],
                max_file_size=int(target_file_size * 0.75),
            )
        )
        # the delete-manifest set this chunk's scan will apply — the
        # commit guard that keeps a concurrent MOR/DV delete from
        # silently resurrecting through the rewritten files
        plan_snap = table.current_snapshot()
        plan_dm = set(plan_snap.delete_manifests) if plan_snap else set()
        # with_row_id: carry row lineage through the rewrite (scan
        # computes each row's stable id; write_data_files materializes
        # it as the _lh_row_id physical column — Iceberg v3 semantics)
        df = table.scan_files(spark, sorted(removed), with_row_id=True,
                              with_last_seq=True)
        if recompress_level is not None:
            # storage-optimization rewrite: re-encode payloads in the
            # scan stage (CPU spreads over input splits, before the
            # shuffle moves the new bytes)
            from .multimodal import recompress_images

            df = recompress_images(df, recompress_level)
        # exact-slot shuffle: one output file per reduce task, hot
        # partitions salted over their n_out groups (distribute.py)
        if pcol:
            gexpr, total_out, _ = partitioned_group_expr(
                pcol, key_col, {p["partition_id"]: p["n_out"] for p in chunk},
                partition_expr=table.partition_value_expr(),
            )
        else:
            total_out = sum(p["n_out"] for p in chunk)
            gexpr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(total_out))
        sort_all = ([pcol] if pcol else []) + ([sort_col] if sort_col else [])
        shaped = exact_slot_repartition(spark, df, gexpr, total_out, sort_cols=sort_all)
        new_entries = table.write_data_files(shaped, distribution="none",
                                             enforce_constraints=False)
        snap = table.commit_replace(
            removed, new_entries, operation="replace",
            summary={"op": "compact", "op_id": op_id, "chunk": ck},
            affected_partitions={p["partition_id"] for p in chunk},
            expected_delete_manifests=plan_dm,
        )
        wall_ms = int((time.time() - t0) * 1000)
        rows = sum(e["record_count"] for e in new_entries)
        nbytes = sum(e["file_size_bytes"] for e in new_entries)
        log.record(
            op_id, ck, [p["partition_id"] for p in chunk],
            len(removed), len(new_entries), rows, nbytes, wall_ms,
            snap.snapshot_id,
        )
        metrics["files_in"] += len(removed)
        metrics["files_out"] += len(new_entries)
        metrics["rows"] += rows
        metrics["bytes"] += nbytes
        metrics["wall_ms"] += wall_ms
        metrics["snapshots"].append(snap.snapshot_id)
    return metrics


def split_oversized(
    table: LakehouseTable,
    spark: SparkSession,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    max_file_size: int | None = None,
    sort_col: str | None = "auto",
    key_col: str = "auto",
    n_chunks: int = 4,
    op_id: str | None = None,
    only_partitions: set[str] | None = None,
) -> dict:
    """Split files LARGER than ``max_file_size`` (default 2x target)
    back to target-sized files — the other half of Iceberg's
    rewriteDataFiles contract (bin-pack merges the small tail; this
    handles the skewed-writer tail: one hot partition landing a 20 GB
    file makes that file the unit of every future CoW rewrite,
    DELETE/UPDATE touch, and manifest stats range, regardless of how
    well scans split it by row group).

    Planning mirrors compaction: ONE metadata aggregation row per
    partition, per-chunk bounded path collects, row lineage carried,
    resumable via the lineage log, commit per chunk."""
    require_single_spec(table, spark)
    sort_col, key_col = resolve_layout_cols(table, sort_col, key_col)
    max_file_size = int(max_file_size or 2 * target_file_size)
    if max_file_size <= target_file_size:
        raise ValueError("max_file_size must exceed target_file_size")
    plan_rows = (
        table.files(spark)
        .filter(F.col("file_size_bytes") > max_file_size)
        .groupBy("partition_id")
        .agg(F.sum("file_size_bytes").alias("bytes"),
             F.count("*").alias("n_files"))
        .collect()
    )
    plan = [
        {"partition_id": r["partition_id"], "bytes": int(r["bytes"]),
         "n_files": int(r["n_files"]),
         "n_out": max(int(r["n_files"]) + 1,
                      round(int(r["bytes"]) / target_file_size))}
        for r in plan_rows
    ]
    if only_partitions is not None:
        plan = [p for p in plan if p["partition_id"] in only_partitions]
    metrics = {"files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
               "wall_ms": 0, "chunks_skipped": 0, "snapshots": []}
    if not plan:
        return metrics
    op_id = op_id or _op_fingerprint(
        "split-oversized", table, str(target_file_size))
    log = LineageLog(table.location)
    done = log.completed_chunks(op_id)
    pcol = table._partition_col()
    for chunk in _chunk(sorted(plan, key=lambda p: p["partition_id"]),
                        n_chunks):
        ck = chunk_key([p["partition_id"] for p in chunk])
        if ck in done:
            metrics["chunks_skipped"] += 1
            continue
        t0 = time.time()
        removed = set(
            chunk_file_paths(
                table, spark, [p["partition_id"] for p in chunk],
                min_file_size=max_file_size + 1,
            )
        )
        if not removed:
            continue
        plan_snap = table.current_snapshot()
        plan_dm = set(plan_snap.delete_manifests) if plan_snap else set()
        df = table.scan_files(spark, sorted(removed), with_row_id=True,
                              with_last_seq=True)
        if pcol:
            gexpr, total_out, _ = partitioned_group_expr(
                pcol, key_col, {p["partition_id"]: p["n_out"] for p in chunk},
                partition_expr=table.partition_value_expr(),
            )
        else:
            total_out = sum(p["n_out"] for p in chunk)
            gexpr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(total_out))
        sort_all = ([pcol] if pcol else []) + ([sort_col] if sort_col else [])
        shaped = exact_slot_repartition(spark, df, gexpr, total_out,
                                        sort_cols=sort_all)
        new_entries = table.write_data_files(shaped, distribution="none",
                                             enforce_constraints=False)
        snap = table.commit_replace(
            removed, new_entries, operation="replace",
            summary={"op": "split-oversized", "op_id": op_id, "chunk": ck},
            affected_partitions={p["partition_id"] for p in chunk},
            expected_delete_manifests=plan_dm,
        )
        wall_ms = int((time.time() - t0) * 1000)
        rows = sum(e["record_count"] for e in new_entries)
        nbytes = sum(e["file_size_bytes"] for e in new_entries)
        log.record(
            op_id, ck, [p["partition_id"] for p in chunk],
            len(removed), len(new_entries), rows, nbytes, wall_ms,
            snap.snapshot_id,
        )
        metrics["files_in"] += len(removed)
        metrics["files_out"] += len(new_entries)
        metrics["rows"] += rows
        metrics["bytes"] += nbytes
        metrics["wall_ms"] += wall_ms
        metrics["snapshots"].append(snap.snapshot_id)
    return metrics
