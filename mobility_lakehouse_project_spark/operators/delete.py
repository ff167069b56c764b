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
    (``expected_parent``). A concurrent commit first goes through the
    validated rebase (:mod:`.rebase`): plain appends re-pin the
    finished rewrite (snapshot isolation — appended rows are
    legitimately out of scope), anything content-changing surfaces for
    a replan (same rule as MERGE).
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lineage import LineageLog
from ..tableformat import LakehouseTable
from .rebase import commit_with_rebase, rebase_fingerprint

# driver-side path-materialization bound: planning never collects more
# than this many candidate file paths at once — a non-selective
# `DELETE WHERE true` on a 10^6-file table walks partition chunks of at
# most this size instead of collecting 10^6 paths (the same bounded-
# collect contract as compaction's chunk_file_paths)
DEFAULT_CHUNK_FILES = 50_000


def _partition_chunks(table, spark, int_ranges, chunk_files,
                      point_eq=None):
    """Candidate PARTITION summary (one metadata row per partition —
    the same driver bound plan_compaction accepts) grouped greedily
    into chunks of <= ``chunk_files`` candidate files each."""
    summary = (
        table.plan_files(spark, int_ranges=int_ranges, point_eq=point_eq)
        .groupBy("partition_id")
        .agg(F.count("*").alias("n_files"))
        .collect()
    )
    chunks: list[list[str]] = []
    cur: list[str] = []
    cur_n = 0
    for r in sorted(summary, key=lambda r: r["partition_id"]):
        if cur and cur_n + r["n_files"] > chunk_files:
            chunks.append(cur)
            cur, cur_n = [], 0
        cur.append(r["partition_id"])
        cur_n += r["n_files"]
    if cur:
        chunks.append(cur)
    n_cand = sum(r["n_files"] for r in summary)
    return chunks, n_cand


def _plan_touched_chunk(table, spark, cond, int_ranges, partition_ids,
                        point_eq=None):
    """Per-chunk DELETE/UPDATE planning: stats-pruned candidate files of
    ONE partition chunk -> row-level touch detection on NON-BINARY
    columns -> manifest entries of the touched set. The only path
    materializations are bounded by the chunk size. Returns
    (touched_entries, n_matched)."""
    cand_paths = sorted(
        r["file_path"]
        for r in table.plan_files(
            spark, partition_values=set(partition_ids),
            int_ranges=int_ranges, point_eq=point_eq
        ).select("file_path").collect()
    )
    if not cand_paths:
        return [], 0
    schema = table.schema()
    slim_cols = [
        f.name for f in schema.fields if not isinstance(f.dataType, T.BinaryType)
    ]
    # file identity comes from the scan itself (with_pos) rather than a
    # caller-side input_file_name(): already table-relative, and correct
    # even when the scan applies pending MOR deletes (input_file_name
    # evaluated after that anti-join has no defined "current file")
    probe = (
        table.scan_files(spark, cand_paths, columns=slim_cols, with_pos=True)
        .filter(cond)
        .groupBy("_file")
        .agg(F.count("*").alias("n_hit"))
        .collect()
    )
    hits = {r["_file"]: r["n_hit"] for r in probe}
    n_matched = sum(hits.values())
    if not hits:
        return [], 0
    tdf = spark.createDataFrame(
        [(p,) for p in sorted(hits)], "file_path string"
    )
    touched_entries = [
        {**r.asDict(), "n_hit": hits[r["file_path"]]}
        for r in table.files(spark)
        .join(F.broadcast(tdf), "file_path", "left_semi")
        .select("file_path", "partition_id", "file_size_bytes",
                "record_count", "first_row_id")
        .collect()
    ]
    if len(touched_entries) != len(hits):
        resolved = {e["file_path"] for e in touched_entries}
        raise RuntimeError(
            "row-op planning: paths did not all resolve to manifest entries; "
            f"unresolved={sorted(set(hits) - resolved)[:5]}"
        )
    return touched_entries, n_matched


def _rowlevel_op(
    table: LakehouseTable,
    spark: SparkSession,
    cond: Column,
    kind: str,
    upd: dict[str, Column],
    int_ranges,
    target_file_size: int,
    op_id: str | None,
    chunk_files: int,
    predicate_repr: str,
    point_eq=None,
    rebase_retries: int = 2,
) -> dict:
    """Shared chunked DELETE/UPDATE engine. Partition chunks bound every
    driver-side path collect (<= chunk_files per chunk); each chunk
    plans against the CURRENT snapshot and commits pinned to it, so a
    concurrent external commit surfaces while our own chunk sequence
    chains cleanly. A killed run is resumable by re-running:
    already-rewritten chunks have no matching rows left (DELETE) or are
    detected and re-applied idempotently (UPDATE assignments are plain
    SET expressions).

    A lost commit race first tries a validated REBASE
    (:func:`.rebase.validate_rebase` with no key condition): when every
    concurrent commit is a plain append with no delete files and no
    schema change, the finished chunk rewrite re-commits on the new
    head — under snapshot isolation a predicate-conditioned rewrite
    conflicts with nothing an append can add (the appended rows are
    legitimately outside the plan's snapshot, exactly like Iceberg CoW
    DELETE). Rewrites / deletes / delete-file commits still surface as
    ConcurrentCommitError for a caller replan; ``rebase_retries=0``
    restores surface-on-any-advance."""
    rows_key = "rows_deleted" if kind == "delete" else "rows_updated"
    t0 = time.time()
    meta = table.load_metadata()
    plan_fp = rebase_fingerprint(meta)
    cur = table.current_snapshot(meta)
    if cur is None or not cur.manifests:
        return {"files_rewritten": 0, "files_written": 0, rows_key: 0,
                **({"files_dropped": 0} if kind == "delete" else {}),
                "wall_ms": int((time.time() - t0) * 1000), "snapshot": None}
    data_cols = [f.name for f in table.schema().fields]
    chunks, n_cand = _partition_chunks(table, spark, int_ranges, chunk_files,
                                       point_eq=point_eq)
    n_total = table.files(spark).count()
    log = LineageLog(table.location)
    metrics = {"files_rewritten": 0, "files_written": 0, rows_key: 0,
               **({"files_dropped": 0} if kind == "delete" else {}),
               "candidate_files": n_cand, "total_files": n_total,
               "chunks": len(chunks), "snapshot": cur.snapshot_id}
    for ci, part_ids in enumerate(chunks):
        tc = time.time()
        # replan against the snapshot (and metadata fingerprint) THIS
        # chunk's commit will pin to — a legitimate mid-run metadata
        # change (new constraint, rename) must not spuriously reject a
        # LATER chunk's rebase whose plan postdates it
        meta = table.load_metadata()
        plan_fp = rebase_fingerprint(meta)
        cur = table.current_snapshot(meta)
        touched_entries, n_matched = _plan_touched_chunk(
            table, spark, cond, int_ranges, part_ids, point_eq=point_eq
        )
        if not touched_entries:
            continue
        if kind == "delete":
            # file-granularity fast path (Iceberg's full-file delete):
            # a file whose every LIVE row matches is dropped metadata-
            # only — its blobs are never read. Only boundary files
            # rewrite. n_hit counts rows through the delete-applying
            # scan, so a file with pending MOR deletes (live < physical
            # record_count) conservatively stays on the rewrite path.
            dead = [e for e in touched_entries
                    if e["n_hit"] == e["record_count"]]
            partial = [e for e in touched_entries
                       if e["n_hit"] != e["record_count"]]
        else:
            dead, partial = [], touched_entries
        new_entries: list[dict] = []
        if partial:
            # with_row_id/with_last_seq: survivors keep their lineage
            # ids AND last-updated sequences through the CoW rewrite
            # (materialized as _lh_row_id/_lh_last_seq)
            src = table.scan_matched_files(partial, spark, with_row_id=True,
                                           with_last_seq=True)
            touched_bytes = sum(e["file_size_bytes"] for e in partial)
            touched_rows = sum(e["record_count"] for e in partial)
            if kind == "delete":
                # keep rows where the predicate is NOT TRUE: SQL DELETE
                # removes only predicate-TRUE rows, and a bare ~cond is
                # NULL (dropped by filter) when cond is NULL — silently
                # deleting NULL-predicate rows and disagreeing with
                # rows_deleted
                out = src.filter(~F.coalesce(cond, F.lit(False)))
                part_hits = sum(e["n_hit"] for e in partial)
                keep_frac = 1.0 - part_hits / max(touched_rows, 1)
                n_out = max(1, round(touched_bytes * keep_frac / target_file_size))
            else:
                # F.when(cond, ...) falls to otherwise() on NULL —
                # original value kept, matching UPDATE's TRUE-only
                # semantics
                out = src.select(
                    *[
                        (F.when(cond, upd[c]).otherwise(F.col(c)).alias(c)
                         if c in upd else F.col(c))
                        for c in data_cols
                    ],
                    # an UPDATEd row keeps its lineage id (Iceberg v3)
                    F.col("_row_id"),
                    # ... but its last-updated sequence bumps to this
                    # commit's: NULL inherits the new file's sequence.
                    # Survivors (cond not TRUE) carry theirs forward.
                    F.when(F.coalesce(cond, F.lit(False)),
                           F.lit(None).cast("long"))
                    .otherwise(F.col("_last_updated_seq"))
                    .alias("_last_updated_seq"),
                )
                n_out = max(1, round(touched_bytes / target_file_size))
            n_parts = len({e["partition_id"] for e in partial}) or 1
            new_entries = table.write_data_files(
                out, n_files=n_out, n_partitions_hint=n_parts,
            )
        affected = {e["partition_id"] for e in touched_entries}
        if kind == "update":
            affected |= {e["partition_id"] for e in new_entries}
        # content-sensitive: the matched-row classification was
        # computed against the plan snapshot, so the commit is pinned
        # (retries=0) — but a concurrent plain append rebases instead
        # of surfacing (no key condition: appended rows are outside
        # this plan's snapshot by snapshot-isolation semantics)
        snap = commit_with_rebase(
            lambda pin: table.commit_replace(
                {e["file_path"] for e in touched_entries},
                new_entries,
                operation="delete" if kind == "delete" else "overwrite",
                summary={"op": kind, f"rows-{kind}d": n_matched,
                         "predicate": predicate_repr,
                         **({"set": ",".join(sorted(upd))} if upd else {}),
                         **({"files-dropped": len(dead)} if dead else {}),
                         "chunk": f"{ci + 1}/{len(chunks)}"},
                affected_partitions=affected,
                retries=0,
                expected_parent=pin,
            ),
            table, spark, cur, plan_fp, rebase_retries, op=kind)
        log.record(
            op_id or f"{kind}-{snap.snapshot_id}", f"chunk-{ci}",
            sorted(affected),
            len(touched_entries), len(new_entries),
            sum(e["record_count"] for e in new_entries),
            sum(e["file_size_bytes"] for e in new_entries),
            int((time.time() - tc) * 1000), snap.snapshot_id,
        )
        metrics["files_rewritten"] += len(partial)
        if kind == "delete":
            metrics["files_dropped"] += len(dead)
        metrics["files_written"] += len(new_entries)
        metrics[rows_key] += n_matched
        metrics["snapshot"] = snap.snapshot_id
    metrics["wall_ms"] = int((time.time() - t0) * 1000)
    return metrics


def drop_partitions(
    table: LakehouseTable,
    spark: SparkSession,
    values,
    chunk_files: int = DEFAULT_CHUNK_FILES,
) -> dict:
    """DROP PARTITION: remove every file of the given partition values
    METADATA-ONLY — no data is read or written. The reference's
    DELETE-day (dags/Silver_Transform_Dag.py:188-207) is this plus an
    insert; at 100 TB a retention delete of a day partition must cost
    O(files of that day) metadata, never a rewrite.

    Requires a single partition spec: files written under an older spec
    are not partition-value-pruned, so rows of the target partitions
    could hide in them (run ``compaction.migrate_partitions`` first).
    Delete files that referenced only dropped data files become
    dangling — harmless (the MOR anti-join matches nothing) and folded
    away by maintenance. Chunked commits bound the driver collect; a
    concurrent append INTO a dropped partition composes as Iceberg's
    DROP PARTITION does (the new files survive; re-run to drop them)."""
    from .compaction import require_single_spec

    if table._partition_col() is None:
        raise ValueError("drop_partitions on an unpartitioned table")
    require_single_spec(table, spark)
    t0 = time.time()
    values = {str(v) for v in values}
    cur = table.current_snapshot()
    # rows_dropped must count LIVE rows (the number a retention audit
    # cares about); manifest record_count is physical and over-counts
    # when pending MOR deletes cover some of these rows — one
    # column-pruned count through the delete-applying scan settles it
    live_rows = (
        table.scan(spark, partition_values=sorted(values)).count()
        if cur and cur.delete_manifests else None
    )
    log = LineageLog(table.location)
    seen_parts: set[str] = set()
    metrics: dict = {"files_dropped": 0, "rows_dropped": 0, "chunks": 0,
                     "snapshot": None}
    while True:
        batch = [
            r.asDict()
            for r in table.plan_files(spark, partition_values=values)
            .select("file_path", "partition_id", "record_count")
            .limit(chunk_files).collect()
        ]
        if not batch:
            break
        parts = {e["partition_id"] for e in batch}
        snap = table.commit_replace(
            {e["file_path"] for e in batch}, [],
            operation="delete",
            summary={"op": "drop-partitions",
                     "partitions": ",".join(sorted(parts)[:20]),
                     "files-dropped": len(batch)},
            affected_partitions=parts,
        )
        log.record(
            f"drop-partitions-{snap.snapshot_id}",
            f"chunk-{metrics['chunks']}", sorted(parts),
            len(batch), 0, 0, 0,
            int((time.time() - t0) * 1000), snap.snapshot_id,
        )
        seen_parts |= parts
        metrics["files_dropped"] += len(batch)
        metrics["rows_dropped"] += sum(e["record_count"] for e in batch)
        metrics["chunks"] += 1
        metrics["snapshot"] = snap.snapshot_id
    if live_rows is not None:
        metrics["rows_dropped"] = live_rows
    # a value that matched no partition is a silent no-op otherwise —
    # a typo'd retention job must be visible in the result
    metrics["partitions_dropped"] = sorted(seen_parts)
    metrics["unmatched_values"] = sorted(values - seen_parts)
    metrics["wall_ms"] = int((time.time() - t0) * 1000)
    return metrics


def truncate(
    table: LakehouseTable,
    spark: SparkSession,
    chunk_files: int = DEFAULT_CHUNK_FILES,
) -> dict:
    """TRUNCATE TABLE: remove every data file METADATA-ONLY — the
    result is known a priori, so no row is ever read or written (a
    `DELETE WHERE true` would scan the whole table just to learn that
    every file is fully matched). Works on any partition spec mix
    (everything goes, so old-spec files cannot hide rows). Chunked
    commits bound the driver collect; rows_dropped counts LIVE rows
    (one count through the delete-applying scan when MOR deletes are
    pending, else the manifest record_count sum)."""
    t0 = time.time()
    cur = table.current_snapshot()
    live_rows = (
        table.scan(spark).count() if cur and cur.delete_manifests else None
    )
    log = LineageLog(table.location)
    metrics: dict = {"files_dropped": 0, "rows_dropped": 0, "chunks": 0,
                     "files_rewritten": 0, "snapshot": None}
    while True:
        batch = [
            r.asDict()
            for r in table.plan_files(spark)
            .select("file_path", "partition_id", "record_count")
            .limit(chunk_files).collect()
        ]
        if not batch:
            break
        parts = {e["partition_id"] for e in batch}
        snap = table.commit_replace(
            {e["file_path"] for e in batch}, [],
            operation="delete",
            summary={"op": "truncate", "files-dropped": len(batch)},
            affected_partitions=parts,
        )
        log.record(
            f"truncate-{snap.snapshot_id}",
            f"chunk-{metrics['chunks']}", sorted(parts),
            len(batch), 0, 0, 0,
            int((time.time() - t0) * 1000), snap.snapshot_id,
        )
        metrics["files_dropped"] += len(batch)
        metrics["rows_dropped"] += sum(e["record_count"] for e in batch)
        metrics["chunks"] += 1
        metrics["snapshot"] = snap.snapshot_id
    if live_rows is not None:
        metrics["rows_dropped"] = live_rows
    metrics["rows_deleted"] = metrics["rows_dropped"]
    metrics["wall_ms"] = int((time.time() - t0) * 1000)
    return metrics


def delete_where(
    table: LakehouseTable,
    spark: SparkSession,
    predicate: Column | str,
    int_ranges: dict[str, tuple[int | str | None, int | str | None]] | None = None,
    target_file_size: int = 64 * 1024 * 1024,
    op_id: str | None = None,
    chunk_files: int = DEFAULT_CHUNK_FILES,
    mode: str = "cow",
    point_eq: dict | None = None,
    rebase_retries: int = 2,
) -> dict:
    """DELETE FROM table WHERE ``predicate`` — removes only rows where
    the predicate evaluates TRUE (SQL three-valued semantics: NULL
    keeps the row, exactly like Iceberg/ANSI DELETE).

    ``predicate`` may reference any non-binary column; pass
    ``int_ranges`` matching the predicate's bounds to let manifest
    stats prune the candidate files (the payoff of clustering).
    ``chunk_files`` bounds every driver-side path materialization —
    a non-selective delete walks partition chunks with one pinned
    commit each instead of collecting the whole candidate list.

    ``mode``:

    * ``"cow"`` (default) — copy-on-write: touched files are rewritten
      without the matching rows. Best read performance; write cost is
      a full rewrite of every touched file (a delete of 100 rows
      spread over 1000 image files rewrites ~1000 blobs' worth).
    * ``"mor"`` — merge-on-read (Iceberg v2 position deletes): only
      tiny (file, row-position) delete files are written — write cost
      O(matched rows), no blob rewrite — and every subsequent scan
      anti-joins them away until :func:`rewrite_position_deletes`
      folds them into the data. The right mode for frequent small
      deletes (GDPR erasure of single image_ids) on blob-heavy tables
      at 10^12-image scale, where rewriting a 500 MB file to drop one
      row is the scale-killer.
    * ``"dv"`` — deletion vectors (Iceberg v3 / Delta DV form; see
      :mod:`..tableformat.dv`): like ``"mor"`` but the positions are
      packed into ONE compressed bitmap blob per touched data file,
      and each new DV merges the file's previously pending deletes so
      at most one vector applies per file. Repeated small deletes
      never stack scan-side anti-join work — the steady-state erasure
      mode for hot tables between maintenance folds.

    ``point_eq={'image_id': v}`` (or a list of values) prunes the
    candidate files through the manifest bloom filters before any data
    is read — with blooms on the key column, erasing one image_id
    probes ~1 file instead of row-scanning every candidate.
    """
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    if mode in ("mor", "dv"):
        return _mor_delete(table, spark, cond, int_ranges, op_id,
                           chunk_files, str(predicate), point_eq=point_eq,
                           dv=(mode == "dv"), rebase_retries=rebase_retries)
    if mode != "cow":
        raise ValueError(f"unknown delete mode {mode!r} (cow|mor|dv)")
    return _rowlevel_op(table, spark, cond, "delete", {}, int_ranges,
                        target_file_size, op_id, chunk_files, str(predicate),
                        point_eq=point_eq, rebase_retries=rebase_retries)


# target rows per position-delete file: (path, int64) rows are ~100 B;
# 2M rows ~ a 10-20 MB sorted delete file with tight data-file bounds
ROWS_PER_DELETE_FILE = 2_000_000


def _delete_entries_and_meta(table, spark, positions, n_hits, touched_paths,
                             dv: bool) -> tuple[list[dict], dict]:
    """Write the delete files for a ``(file_path, pos)`` set in the
    requested representation; returns (manifest entries, extra kwargs
    for ``commit_delete_files``). The DV form merges each touched
    file's PRIOR pending deletes into its new vector (merge-on-write
    supersede — the planning scan applied them, so they are absent
    from ``positions``) and stamps the manifest kind so readers apply
    only the newest vector per file."""
    if not dv:
        entries = table.write_position_delete_files(
            positions, max(1, round(n_hits / ROWS_PER_DELETE_FILE)))
        return entries, {}
    touched = sorted(touched_paths)
    prior, _ = table.position_deletes_df(
        spark, None, (touched[0], touched[-1]))
    if prior is not None:
        positions = positions.unionByName(
            prior.filter(F.col("file_path").isin(touched)))
    entries, n_pos = table.write_deletion_vector_files(positions)
    return entries, {"manifest_meta": {"kind": "dv", "positions": n_pos}}


def _mor_delete(table, spark, cond, int_ranges, op_id, chunk_files,
                predicate_repr, point_eq=None, dv=False,
                rebase_retries=2) -> dict:
    """Merge-on-read DELETE: per partition chunk, one slim-column scan
    finds (file, row-position) of predicate-TRUE rows; those pairs are
    written as sorted position-delete files and committed pinned to
    the plan snapshot (positions are content-addressed — a concurrent
    rewrite invalidates them, so it must surface; a concurrent plain
    append leaves every referenced (file, pos) intact, so it REBASES
    via :func:`.rebase.validate_rebase`). The scan applies PRIOR
    pending deletes, so re-deleting an already-deleted row is a no-op
    and re-running a killed job is idempotent."""
    t0 = time.time()
    meta = table.load_metadata()
    plan_fp = rebase_fingerprint(meta)
    cur = table.current_snapshot(meta)
    if cur is None or not cur.manifests:
        return {"delete_files_written": 0, "rows_deleted": 0,
                "files_dropped": 0,
                "wall_ms": int((time.time() - t0) * 1000), "snapshot": None}
    schema = table.schema()
    slim_cols = [
        f.name for f in schema.fields if not isinstance(f.dataType, T.BinaryType)
    ]
    chunks, n_cand = _partition_chunks(table, spark, int_ranges, chunk_files,
                                       point_eq=point_eq)
    log = LineageLog(table.location)
    metrics = {"delete_files_written": 0, "rows_deleted": 0,
               "files_dropped": 0,
               "candidate_files": n_cand, "chunks": len(chunks),
               "snapshot": cur.snapshot_id}
    for ci, part_ids in enumerate(chunks):
        tc = time.time()
        # per-chunk metadata fingerprint: same rationale as _rowlevel_op
        meta = table.load_metadata()
        plan_fp = rebase_fingerprint(meta)
        cur = table.current_snapshot(meta)
        cand_paths = sorted(
            r["file_path"]
            for r in table.plan_files(
                spark, partition_values=set(part_ids),
                int_ranges=int_ranges, point_eq=point_eq
            ).select("file_path").collect()
        )
        if not cand_paths:
            continue
        # ONE counting pass classifies every candidate: a file whose
        # every LIVE row matches dies WHOLE (metadata-only drop — no
        # position-delete entries, which would otherwise cost O(rows)
        # of delete-file writes plus anti-join work on every later
        # scan); only partially-matched files get position deletes.
        per_file = (
            table.scan_files(spark, cand_paths, columns=slim_cols,
                             with_pos=True)
            .groupBy(F.col("_file").alias("file_path"))
            .agg(F.count("*").alias("live"),
                 F.count_if(F.coalesce(cond, F.lit(False))).alias("n_hit"))
            .collect()
        )
        n_matched = sum(r["n_hit"] for r in per_file)
        if not n_matched:
            continue
        # resolution assertion: every matched file identity must be a
        # path we planned — a relativize failure (exotic scheme) would
        # otherwise write delete entries no scan can ever match
        unresolved = {r["file_path"] for r in per_file} - set(cand_paths)
        if unresolved:
            raise RuntimeError(
                "MOR delete: scan file identities did not resolve to "
                f"planned paths; unresolved={sorted(unresolved)[:5]}"
            )
        dead = sorted(r["file_path"] for r in per_file
                      if r["n_hit"] and r["n_hit"] == r["live"])
        partial = sorted(r["file_path"] for r in per_file
                         if r["n_hit"] and r["n_hit"] != r["live"])
        n_partial_hits = sum(r["n_hit"] for r in per_file
                             if r["file_path"] in set(partial))
        # two pinned commits per chunk (drop, then deletes) — readers
        # between them see a consistent PREFIX of this delete, the same
        # contract the chunk loop already gives across chunks
        pin_snap = cur
        if dead:
            snap = commit_with_rebase(
                lambda pin: table.commit_replace(
                    set(dead), [], operation="delete",
                    summary={"op": "mor-delete",
                             "predicate": predicate_repr,
                             "files-dropped": len(dead),
                             "chunk": f"{ci + 1}/{len(chunks)}"},
                    retries=0, expected_parent=pin,
                ),
                table, spark, pin_snap, plan_fp, rebase_retries,
                op="mor-delete")
            pin_snap = snap
            metrics["files_dropped"] += len(dead)
        entries: list[dict] = []
        if partial:
            matched = (
                table.scan_files(spark, partial, columns=slim_cols,
                                 with_pos=True)
                .filter(cond)
                .select(F.col("_file").alias("file_path"),
                        F.col("_pos").alias("pos"))
            )
            entries, extra = _delete_entries_and_meta(
                table, spark, matched, n_partial_hits, partial, dv)
            snap = commit_with_rebase(
                lambda pin: table.commit_delete_files(
                    entries,
                    summary={"predicate": predicate_repr,
                             **({"dv": True} if dv else {}),
                             "chunk": f"{ci + 1}/{len(chunks)}"},
                    expected_parent=pin,
                    **extra,
                ),
                table, spark, pin_snap, plan_fp, rebase_retries,
                op="mor-delete")
        log.record(
            op_id or f"mor-delete-{snap.snapshot_id}", f"chunk-{ci}",
            sorted(part_ids), len(dead) + len(partial), len(entries),
            n_matched, sum(e["file_size_bytes"] for e in entries),
            int((time.time() - tc) * 1000), snap.snapshot_id,
        )
        metrics["delete_files_written"] += len(entries)
        metrics["rows_deleted"] += n_matched
        metrics["snapshot"] = snap.snapshot_id
    metrics["wall_ms"] = int((time.time() - t0) * 1000)
    return metrics


def compact_deletion_vectors(
    table: LakehouseTable,
    spark: SparkSession,
    op_id: str | None = None,
) -> dict:
    """Consolidate the table's pending position-delete state — stacked
    position-delete files AND superseded deletion vectors — into ONE
    newest vector per still-live data file, in one metadata commit
    plus a tiny DV blob write. NO data file is read or rewritten:
    this is the cheap sibling of :func:`rewrite_position_deletes` for
    when the data itself is not worth rewriting yet but the delete
    metadata has grown (many small GDPR erasures between maintenance
    windows at 10^12 scale). Entries referencing since-removed files
    are dropped; equality deletes keep their key/sequence semantics
    untouched. After the commit every scan applies exactly one delete
    manifest for position state."""
    t0 = time.time()
    cur = table.current_snapshot()
    noop = {"delete_manifests_before": 0, "positions": 0,
            "wall_ms": 0, "snapshot": cur.snapshot_id if cur else None}
    if cur is None:
        return noop
    pos_dms = cur.position_delete_manifests()
    dv_dms = cur.dv_manifests()
    if not pos_dms and not dv_dms:
        noop["wall_ms"] = int((time.time() - t0) * 1000)
        return noop
    ddf, _n = table.position_deletes_df(spark)
    live = table.files(spark).select("file_path")
    pending = ddf.join(live, "file_path", "left_semi").persist()
    n_pos = pending.count()
    entries: list[dict] = []
    if n_pos:
        entries, n_pos = table.write_deletion_vector_files(pending)
    pending.unpersist()
    snap = table.commit_rewrite_deletes(
        entries,
        manifest_meta={"kind": "dv", "positions": n_pos},
        summary={"pending-positions": n_pos},
        expected_parent=cur.snapshot_id,
    )
    LineageLog(table.location).record(
        op_id or f"compact-dvs-{snap.snapshot_id}", "all", [],
        len(pos_dms) + len(dv_dms), len(entries), n_pos,
        sum(e["file_size_bytes"] for e in entries),
        int((time.time() - t0) * 1000), snap.snapshot_id,
    )
    return {"delete_manifests_before": len(pos_dms) + len(dv_dms),
            "delete_manifests_after": 1 if entries else 0,
            "positions": n_pos,
            "wall_ms": int((time.time() - t0) * 1000),
            "snapshot": snap.snapshot_id}


def rewrite_position_deletes(
    table: LakehouseTable,
    spark: SparkSession,
    target_file_size: int = 64 * 1024 * 1024,
    op_id: str | None = None,
    chunk_files: int = DEFAULT_CHUNK_FILES,
    min_delete_ratio: float = 0.0,
) -> dict:
    """Fold pending merge-on-read deletes into the data (Iceberg's
    rewrite_position_deletes + the data-file side of its
    rewrite_data_files delete-compaction): every data file a delete
    still affects — referenced by a position-delete entry, or holding
    a live row an equality delete matches (found by a chunked
    key-column probe over earlier-sequenced files) — is rewritten
    WITHOUT its deleted rows (the MOR scan applies them for free),
    chunk by partition chunk with pinned commits; once no delete can
    affect a live row, a final metadata-only commit drops the delete
    manifests. The now-unreferenced delete files are GC'd by
    expire_snapshots / remove_orphan_files like any other unreachable
    file.

    Scans between commits stay correct throughout: rewritten files'
    delete entries become no-ops (their data file is gone), untouched
    files' entries stay applied.

    ``min_delete_ratio`` (Iceberg's delete-file-threshold idiom) makes
    the fold TARGETED: only data files whose pending position-delete
    rows are >= that fraction of their rows are rewritten — at
    10^12-image scale, rewriting a 500 MB blob file to reclaim 0.1% of
    its rows costs more in write amplification than the scan-time
    anti-join it saves. Skipped files keep their delete entries applied
    (the delete manifests are NOT cleared; ``cleared=False`` and
    ``files_below_ratio`` report the remainder); equality deletes are
    always folded in full (their scan tax is per-key-set, not
    per-file). A later ``min_delete_ratio=0`` run folds the remainder
    and clears."""
    t0 = time.time()
    cur = table.current_snapshot()
    if cur is None or not cur.delete_manifests:
        return {"files_rewritten": 0, "files_written": 0, "chunks": 0,
                "cleared": False, "wall_ms": int((time.time() - t0) * 1000),
                "snapshot": cur.snapshot_id if cur else None}
    ddf, n_del = table.position_deletes_df(spark)
    eq_infos = table.equality_deletes_info()
    log = LineageLog(table.location)
    metrics = {"files_rewritten": 0, "files_written": 0,
               "deletes_pending": n_del,
               "eq_delete_keys_pending": sum(i[3] for i in eq_infos),
               "snapshot": cur.snapshot_id}

    # candidate files per delete kind: position = exactly the
    # referenced files; equality = every file sequenced BEFORE the
    # delete (superset — the per-chunk key probe refines it). Both
    # derived from the files() metadata DataFrame; paths materialize
    # only per chunk.
    import os as _os

    cand_df = None
    pos_target_df = None
    if ddf is not None:
        pos_target_df = ddf.select("file_path").distinct()
        if min_delete_ratio > 0:
            refs = ddf.groupBy("file_path").agg(F.count("*").alias("__ndel"))
            pos_target_df = (
                table.files(spark)
                .join(refs, "file_path", "inner")
                .filter(F.col("__ndel")
                        >= F.col("record_count") * F.lit(min_delete_ratio))
                .select("file_path")
            )
        cand_df = (
            table.files(spark)
            .join(pos_target_df, "file_path", "left_semi")
            .select("file_path", "partition_id")
        )
    eq_groups: dict[tuple, dict] = {}
    if eq_infos:
        snap_seqs = table._snapshot_seqs()
        seq_map_df = spark.createDataFrame(
            list(snap_seqs.items()) or [(0, 0)],
            "added_snapshot_id long, __fseq long",
        )
        files_seq = (
            table.files(spark)
            .join(F.broadcast(seq_map_df), "added_snapshot_id", "left")
            .withColumn("__fseq", F.coalesce(F.col("__fseq"), F.lit(0)))
        )
        # one probe per key-column set: union that set's delete files
        # with their per-manifest apply sequence
        for paths, cols, eq_seq, _n in eq_infos:
            g = eq_groups.setdefault(tuple(cols), {"max_seq": 0, "dfs": []})
            g["max_seq"] = max(g["max_seq"], eq_seq)
            schema = table.schema()
            edf = spark.read.schema(
                T.StructType([schema[c] for c in cols])
            ).parquet(*[_os.path.join(table._local_root, p) for p in paths])
            g["dfs"].append(edf.withColumn("__eq_seq", F.lit(eq_seq)))
        for cols_t, g in eq_groups.items():
            u = g["dfs"][0]
            for d in g["dfs"][1:]:
                u = u.unionByName(d)
            g["keys"] = u
            eq_cand = (files_seq.filter(F.col("__fseq") < F.lit(g["max_seq"]))
                       .select("file_path", "partition_id"))
            cand_df = eq_cand if cand_df is None else \
                cand_df.unionByName(eq_cand).distinct()

    chunks: list[list[str]] = []
    if cand_df is not None:
        touched_parts = (
            cand_df.groupBy("partition_id")
            .agg(F.count("*").alias("n_files"))
            .collect()
        )
        cur_chunk: list[str] = []
        cur_n = 0
        for r in sorted(touched_parts, key=lambda r: r["partition_id"]):
            if cur_chunk and cur_n + r["n_files"] > chunk_files:
                chunks.append(cur_chunk)
                cur_chunk, cur_n = [], 0
            cur_chunk.append(r["partition_id"])
            cur_n += r["n_files"]
        if cur_chunk:
            chunks.append(cur_chunk)
    metrics["chunks"] = len(chunks)

    def _eq_touched_in(paths: list[str], seqs: dict[str, int]) -> set[str]:
        """Files among ``paths`` PHYSICALLY holding a row some equality
        delete matches (key equal AND file sequenced earlier). The
        probe must read RAW (apply_deletes=False): a probe through the
        MOR scan would apply the very deletes being folded and see
        nothing. Overcounting rows that other pending deletes already
        hide is harmless — it only re-includes a file the fold was
        going to rewrite anyway."""
        touched: set[str] = set()
        for cols_t, g in eq_groups.items():
            cols = list(cols_t)
            cand = [p for p in paths if seqs.get(p, 0) < g["max_seq"]]
            if not cand:
                continue
            probe = table.scan_files(spark, cand, columns=cols,
                                     with_pos=True, apply_deletes=False)
            sdf = spark.createDataFrame(
                [(p, seqs.get(p, 0)) for p in cand], "__pp string, __ps long")
            probe = probe.join(F.broadcast(sdf),
                               probe["_file"] == F.col("__pp"), "left")
            eq = g["keys"]
            cond = F.col("__ps") < eq["__eq_seq"]
            for c in cols:
                cond = cond & (probe[c] == eq[c])
            hit = (probe.join(eq, cond, "left_semi")
                   .select("_file").distinct().collect())
            touched |= {r["_file"] for r in hit}
        return touched

    for ci, part_ids in enumerate(chunks):
        tc = time.time()
        cur = table.current_snapshot()
        plan_rows = (
            table.plan_files(spark, partition_values=set(part_ids))
            .select("file_path", "partition_id", "file_size_bytes",
                    "record_count", "added_snapshot_id", "first_row_id")
            .collect()
        )
        by_path = {r["file_path"]: r.asDict() for r in plan_rows}
        touched_set: set[str] = set()
        if pos_target_df is not None:
            pos_hit = (
                spark.createDataFrame(
                    [(p,) for p in by_path] or [("",)], "file_path string")
                .join(pos_target_df, "file_path", "left_semi")
                .collect()
            )
            touched_set |= {r["file_path"] for r in pos_hit} & set(by_path)
        if eq_groups:
            snap_seqs = table._snapshot_seqs()
            seqs = {p: snap_seqs.get(r["added_snapshot_id"], 0)
                    for p, r in by_path.items()}
            touched_set |= _eq_touched_in(sorted(by_path), seqs)
        touched_entries = [by_path[p] for p in sorted(touched_set)]
        if not touched_entries:
            continue
        # with_row_id/with_last_seq: folding MOR deletes into data must
        # not reset the surviving rows' lineage ids or sequences
        src = table.scan_matched_files(touched_entries, spark,
                                       with_row_id=True,
                                       with_last_seq=True)
        touched_bytes = sum(e["file_size_bytes"] for e in touched_entries)
        n_out = max(1, round(touched_bytes / target_file_size))
        n_parts = len({e["partition_id"] for e in touched_entries}) or 1
        new_entries = table.write_data_files(
            src, n_files=n_out, n_partitions_hint=n_parts,
            enforce_constraints=False)
        affected = {e["partition_id"] for e in touched_entries}
        snap = table.commit_replace(
            {e["file_path"] for e in touched_entries},
            new_entries,
            operation="rewrite-deletes",
            summary={"op": "rewrite-position-deletes",
                     "chunk": f"{ci + 1}/{len(chunks)}"},
            affected_partitions=affected,
            # the delete application is content-sensitive to the plan
            # snapshot's delete set and file contents: replan on any
            # concurrent commit rather than compose
            retries=0,
            expected_parent=cur.snapshot_id,
        )
        log.record(
            op_id or f"rewrite-deletes-{snap.snapshot_id}", f"chunk-{ci}",
            sorted(affected), len(touched_entries), len(new_entries),
            sum(e["record_count"] for e in new_entries),
            sum(e["file_size_bytes"] for e in new_entries),
            int((time.time() - tc) * 1000), snap.snapshot_id,
        )
        metrics["files_rewritten"] += len(touched_entries)
        metrics["files_written"] += len(new_entries)
        metrics["snapshot"] = snap.snapshot_id
    # clear: safe only once NO delete entry can still affect a live row
    ddf2, _ = table.position_deletes_df(spark)
    if ddf2 is not None:
        remaining = (
            ddf2.select("file_path").distinct()
            .join(table.files(spark), "file_path", "left_semi")
            .count()
        )
        if remaining and min_delete_ratio > 0:
            # targeted fold: sub-threshold files intentionally keep
            # their (still-applied) delete entries; no clear
            metrics["files_below_ratio"] = remaining
            metrics["cleared"] = False
            metrics["wall_ms"] = int((time.time() - t0) * 1000)
            return metrics
        if remaining:
            raise RuntimeError(
                f"rewrite_position_deletes: {remaining} delete-referenced "
                "data files still live after rewrite (concurrent append?)"
            )
    if eq_groups:
        # re-probe every candidate partition: rewritten files carry a
        # NEWER sequence than any pending equality delete, so only an
        # untouched matching row (a planning bug or concurrent append)
        # can remain
        snap_seqs = table._snapshot_seqs()
        for part_ids in chunks:
            plan_rows = (
                table.plan_files(spark, partition_values=set(part_ids))
                .select("file_path", "added_snapshot_id").collect()
            )
            seqs = {r["file_path"]: snap_seqs.get(r["added_snapshot_id"], 0)
                    for r in plan_rows}
            rem = _eq_touched_in(sorted(seqs), seqs)
            if rem:
                raise RuntimeError(
                    "rewrite_position_deletes: equality deletes still "
                    f"match live rows in {sorted(rem)[:5]}"
                )
    snap = table.clear_delete_manifests()
    metrics["snapshot"] = snap.snapshot_id
    metrics["cleared"] = True
    metrics["wall_ms"] = int((time.time() - t0) * 1000)
    return metrics


def update_where(
    table: LakehouseTable,
    spark: SparkSession,
    predicate: Column | str,
    assignments: dict[str, Column | str],
    int_ranges: dict[str, tuple[int | str | None, int | str | None]] | None = None,
    target_file_size: int = 64 * 1024 * 1024,
    op_id: str | None = None,
    chunk_files: int = DEFAULT_CHUNK_FILES,
    mode: str = "cow",
    point_eq: dict | None = None,
    rebase_retries: int = 2,
) -> dict:
    """UPDATE table SET col = expr, ... WHERE ``predicate`` — the same
    stats-pruned copy-on-write plan as DELETE: only files holding a
    matching row are rewritten, with the assignments applied to the
    matching rows and every other row carried through untouched.
    Assignments may reference any column (SQL strings or Columns);
    updating the partition column relocates the row (the commit's
    affected set covers both the old and new partitions). Assignments
    apply only to predicate-TRUE rows (NULL keeps the original row,
    ANSI UPDATE semantics). ``chunk_files`` bounds driver-side path
    materialization exactly as in :func:`delete_where`.

    ``mode="mor"`` updates merge-on-read: matched rows' positions
    become position-delete files and the updated row versions are
    APPENDED in the same snapshot — untouched rows of touched files
    are never rewritten (the write is O(matched rows), the MOR upsert
    shape). Matched rows ARE read (assignments transform the old
    row), so the read-side saving over CoW is the row filter, and the
    write-side saving is total. ``mode="dv"`` is the same plan with
    the old positions packed as deletion vectors (one merged bitmap
    per touched file — see :mod:`..tableformat.dv`)."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    data_cols = [f.name for f in table.schema().fields]
    bad = [c for c in assignments if c not in data_cols]
    if bad:
        raise ValueError(f"unknown assignment columns: {bad}")
    upd = {
        c: (F.expr(e) if isinstance(e, str) else e)
        for c, e in assignments.items()
    }
    if mode in ("mor", "dv"):
        return _mor_update(table, spark, cond, upd, int_ranges,
                           target_file_size, op_id, chunk_files,
                           str(predicate), point_eq=point_eq,
                           dv=(mode == "dv"), rebase_retries=rebase_retries)
    if mode != "cow":
        raise ValueError(f"unknown update mode {mode!r} (cow|mor|dv)")
    return _rowlevel_op(table, spark, cond, "update", upd, int_ranges,
                        target_file_size, op_id, chunk_files, str(predicate),
                        point_eq=point_eq, rebase_retries=rebase_retries)


def _mor_update(table, spark, cond, upd, int_ranges, target_file_size,
                op_id, chunk_files, predicate_repr, point_eq=None,
                dv=False, rebase_retries=2) -> dict:
    """Merge-on-read UPDATE: per partition chunk, matched rows (read
    once, blobs included — the assignments need the old row) become
    (a) position-delete entries for their old locations and (b) an
    appended file of their updated versions, committed atomically via
    ``commit_delete_files(data_entries=)`` pinned to the plan
    snapshot. Re-running after a kill is NOT idempotent the way CoW
    UPDATE is (an idempotent assignment applied to an already-updated
    row re-matches and rewrites it again — same rows, new versions),
    but every intermediate state is consistent. A lost commit race
    rebases over concurrent plain appends (no key condition — see
    :func:`_rowlevel_op`); anything else surfaces for a replan."""
    t0 = time.time()
    meta = table.load_metadata()
    plan_fp = rebase_fingerprint(meta)
    cur = table.current_snapshot(meta)
    if cur is None or not cur.manifests:
        return {"delete_files_written": 0, "files_written": 0,
                "rows_updated": 0,
                "wall_ms": int((time.time() - t0) * 1000), "snapshot": None}
    data_cols = [f.name for f in table.schema().fields]
    chunks, n_cand = _partition_chunks(table, spark, int_ranges, chunk_files,
                                       point_eq=point_eq)
    log = LineageLog(table.location)
    metrics = {"delete_files_written": 0, "files_written": 0,
               "rows_updated": 0, "candidate_files": n_cand,
               "chunks": len(chunks), "snapshot": cur.snapshot_id}
    for ci, part_ids in enumerate(chunks):
        tc = time.time()
        # per-chunk metadata fingerprint: same rationale as _rowlevel_op
        meta = table.load_metadata()
        plan_fp = rebase_fingerprint(meta)
        cur = table.current_snapshot(meta)
        cand_paths = sorted(
            r["file_path"]
            for r in table.plan_files(
                spark, partition_values=set(part_ids),
                int_ranges=int_ranges, point_eq=point_eq
            ).select("file_path").collect()
        )
        if not cand_paths:
            continue
        matched = (
            table.scan_files(spark, cand_paths, with_pos=True)
            .filter(cond)
            .persist()
        )
        per_file = matched.groupBy("_file").count().collect()
        n_matched = sum(r["count"] for r in per_file)
        if not n_matched:
            matched.unpersist()
            continue
        unresolved = {r["_file"] for r in per_file} - set(cand_paths)
        if unresolved:
            matched.unpersist()
            raise RuntimeError(
                "MOR update: scan file identities did not resolve to "
                f"planned paths; unresolved={sorted(unresolved)[:5]}"
            )
        delete_entries, extra = _delete_entries_and_meta(
            table, spark,
            matched.select(F.col("_file").alias("file_path"),
                           F.col("_pos").alias("pos")),
            n_matched, [r["_file"] for r in per_file], dv,
        )
        updated = matched.select(
            *[(upd[c].alias(c) if c in upd else F.col(c)) for c in data_cols]
        )
        # size by the matched fraction of the candidate bytes (one
        # metadata aggregation)
        stats = table.plan_files(
            spark, partition_values=set(part_ids), int_ranges=int_ranges
        ).agg(F.sum("record_count").alias("r"),
              F.sum("file_size_bytes").alias("b")).collect()[0]
        frac = n_matched / max(int(stats["r"] or 1), 1)
        n_out = max(1, round(int(stats["b"] or 0) * frac / target_file_size))
        data_entries = table.write_data_files(
            updated, n_files=n_out,
            n_partitions_hint=len(part_ids) or 1,
        )
        matched.unpersist()
        snap = commit_with_rebase(
            lambda pin: table.commit_delete_files(
                delete_entries, data_entries=data_entries,
                operation="overwrite", op_name="mor-update",
                summary={"predicate": predicate_repr,
                         "set": ",".join(sorted(upd)),
                         **({"dv": True} if dv else {}),
                         "chunk": f"{ci + 1}/{len(chunks)}"},
                expected_parent=pin,
                **extra,
            ),
            table, spark, cur, plan_fp, rebase_retries, op="mor-update")
        log.record(
            op_id or f"mor-update-{snap.snapshot_id}", f"chunk-{ci}",
            sorted(part_ids), len(per_file), len(data_entries), n_matched,
            sum(e["file_size_bytes"] for e in data_entries),
            int((time.time() - tc) * 1000), snap.snapshot_id,
        )
        metrics["delete_files_written"] += len(delete_entries)
        metrics["files_written"] += len(data_entries)
        metrics["rows_updated"] += n_matched
        metrics["snapshot"] = snap.snapshot_id
    metrics["wall_ms"] = int((time.time() - t0) * 1000)
    return metrics
