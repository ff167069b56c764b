"""MERGE INTO — copy-on-write upsert, all the reference's variants.

Reproduces the reference's MERGE surface without any table-format
runtime (plain Spark SQL has no MERGE):

 * full upsert `WHEN MATCHED THEN UPDATE SET ... WHEN NOT MATCHED THEN
   INSERT BY NAME` (dags/Bronze_Ingest_Dag.py:124-130)
 * insert-only `WHEN NOT MATCHED THEN INSERT`
   (dags/Bronze_Ingest_Dag.py:148-152) — fast path: an anti-join
   append, NO file rewrite at all
 * composite keys (`ON t.fecha = s.fecha AND t.zona = s.zona`,
   dags/Bronze_Ingest_Dag.py:178-184)
 * column-subset UPDATE (`UPDATE SET x = s.x` leaving other target
   columns untouched)
 * WHEN MATCHED DELETE

File-level copy-on-write:

 1. **Find touched files** — scan only (keys, _file) of the target
    (column pruning keeps `bytes` out of this join entirely) and
    semi-join against the source keys; collect the distinct file list
    (metadata-sized). Untouched files are never read again. Touched
    stats come from the files() metadata DataFrame (broadcast
    semi-join), never a full manifest materialization.
 2. **Rewrite** — outer-join touched rows with the source on the keys
    and resolve each column per the matched/not-matched clauses.
 3. **Commit** — replace-files snapshot, atomic, parent-validated.

Sizing: output file count covers touched bytes PLUS the estimated
insert volume (source keys x the table's avg row bytes from manifest
stats) — an insert-heavy merge no longer piles into one file.

Skew: target keys are unique, so the key join itself is balanced; the
skew lives in *partition placement* (hot phash duplicates pile into one
bucket — FIXTURES.md F1 makes 5%% of rows share 3 phash values). The
write distributes via the salted-hash shuffle of
``write_data_files(distribution="hash")``: ``repartition(n,
partition_col, pmod(xxhash64(key), n/P))`` — one shuffle, NO sampling
pass (repartitionByRange would execute the blob-carrying child plan
twice), and the deterministic salt splits a hot partition across ~n/P
output tasks (proved by tests/test_skew.py's skewed-source MERGE case).
AQE skew-join handles the join side.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..lineage import LineageLog
from ..tableformat import LakehouseTable
from .rebase import commit_with_rebase, rebase_fingerprint

def evolve_schema_for_source(table: LakehouseTable, source: DataFrame) -> dict:
    """Delta-style ``mergeSchema`` for MERGE: reconcile the target
    schema with the source's BEFORE planning. Source-only columns are
    added to the table (metadata-only; pre-existing rows read NULL);
    a source column whose type is a legal widening of the target's
    (int->bigint, float->double, decimal precision growth) widens the
    target. A source type NARROWER than the target needs no schema
    change — the write-side ANSI cast in ``LakehouseTable.conform``
    promotes it; an incompatible type surfaces there as a cast error.
    Returns ``{"added": [...], "widened": [...]}``."""
    from pyspark.sql import types as T

    # case-INSENSITIVE match: Spark resolves columns case-insensitively
    # by default, so a source 'Lang' against a target 'lang' is the
    # SAME column — adding it would poison the schema with a duplicate
    # the very next select can no longer resolve unambiguously
    tmap = {f.name.lower(): (f.name, f.dataType)
            for f in table.schema().fields}
    adds: dict[str, str] = {}
    widens: dict[str, str] = {}
    for f in source.schema.fields:
        tname, cur = tmap.get(f.name.lower(), (None, None))
        new = f.dataType
        if cur is None:
            adds[f.name] = new.simpleString()
        elif new != cur:
            if isinstance(cur, T.DecimalType) and isinstance(new, T.DecimalType):
                if new.scale == cur.scale and new.precision > cur.precision:
                    widens[tname] = new.simpleString()
            elif new.simpleString() in LakehouseTable._WIDENINGS.get(
                    cur.simpleString(), set()):
                widens[tname] = new.simpleString()
    if adds:
        table.add_columns(adds)
    for name, ddl in widens.items():
        table.widen_column(name, ddl)
    return {"added": sorted(adds), "widened": sorted(widens)}


def _dedupe_source(src: DataFrame, keys: list[str], data_cols: list[str]) -> DataFrame:
    """Deterministic source dedupe on the merge keys (last-writer-wins
    is ill-defined for a batch; pick max over a stable tiebreaker)."""
    w_cols = [c for c in data_cols if c not in keys and c != "bytes"]
    if not w_cols:
        return src.dropDuplicates(keys)
    return (
        src.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(
                    *[F.col(c).desc_nulls_last() for c in w_cols]
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_into(
    table: LakehouseTable,
    spark: SparkSession,
    source: DataFrame,
    key: str | list[str] = "image_id",
    target_file_size: int = 64 * 1024 * 1024,
    op_id: str | None = None,
    when_matched: str | None = "update",
    update_cols: list[str] | None = None,
    when_not_matched: str | None = "insert",
    when_not_matched_by_source: str | None = None,
    by_source_assignments: dict | None = None,
    extra_summary: dict | None = None,
    mode: str = "cow",
    evolve_schema: bool = False,
    source_delete_condition: str | None = None,
    rebase_retries: int = 2,
) -> dict:
    """MERGE INTO table USING source ON keys.

    ``when_matched``: "update" (all columns, or just ``update_cols``),
    "delete", or None (matched rows untouched). ``when_not_matched``:
    "insert" or None. Defaults reproduce the classic full upsert.

    ``when_not_matched_by_source="delete"`` (SQL's WHEN NOT MATCHED BY
    SOURCE THEN DELETE — the full-sync shape: after the merge the
    target's key set equals the source's) additionally position-deletes
    every target row whose key is absent from the source. MOR only:
    the deletes cost O(target keys) as delete files; under CoW every
    file holding an unmatched row would rewrite — effectively a full
    rewrite, which ``overwrite()``/CTAS expresses honestly.

    ``when_not_matched_by_source="update"`` (Delta's third by-source
    action: WHEN NOT MATCHED BY SOURCE THEN UPDATE SET — the
    mark-stale shape) instead rewrites every target-only row with
    ``by_source_assignments`` ({col: SQL expr over the target row})
    applied: old positions are deleted and the updated versions
    appended in the SAME atomic snapshot, lineage ids carried. Cost
    is honest about physics: the key scan stays column-pruned, but
    the rewritten rows themselves must be READ — O(files holding
    target-only rows) blob reads (scan_files subset, never the whole
    table when the unmatched set clusters), vs the delete action's
    zero data reads.

    ``mode``:

    * ``"cow"`` (default) — copy-on-write: files holding matched rows
      are rewritten. Best read performance.
    * ``"mor"`` — merge-on-read upsert (Iceberg v2): matched rows'
      positions become position-delete files and the new row versions
      are APPENDED — the touched files' blobs are never read or
      rewritten. On a 10^12-image table a small upsert costs
      O(source) instead of O(touched files): the key scan is
      column-pruned, the delete files are tiny, and the only data
      write is the source itself. Requires full-row updates
      (``update_cols=None``) — a column-subset MOR update would need
      the old row read back, which is what CoW already does better.
      Read cost until :func:`~.delete.rewrite_position_deletes` runs:
      one broadcast anti-join per scan.
    * ``"dv"`` — the MOR plan with the matched positions packed as
      deletion vectors (one merged bitmap per touched file; see
      :mod:`..tableformat.dv`): repeated upserts never stack delete
      files per data file.

    ``source_delete_condition`` is the one-commit CDC apply
    (Delta's ``WHEN MATCHED AND <cond> THEN DELETE`` with a
    source-side condition): source rows satisfying the predicate —
    which may reference columns NOT in the table schema, e.g. the
    feed's op code — are DELETE commands. Matched commands delete the
    target row, unmatched commands are no-ops (a tombstone for a
    never-seen key), and every other source row follows
    when_matched/when_not_matched as usual, all in ONE atomic commit.
    Requires ``when_matched="update"``. A key should carry one op per
    batch (the standard CDC contract); the dedupe tiebreak otherwise
    picks by data columns, not by op.

    ``evolve_schema=True`` reconciles the target schema with the
    source's first (:func:`evolve_schema_for_source`): source-only
    columns are added (NULL for pre-existing rows), legally-wider
    source types widen the target. The source must still carry every
    target column — the merge rewrites full rows, so a missing column
    has no well-defined update value.

    ``rebase_retries``: when a concurrent commit lands between plan and
    commit, the merge first tries to REBASE instead of surfacing — the
    conflict is validated exactly (:func:`.rebase.validate_rebase`: appends
    only, no delete files, no schema change, zero appended rows whose
    keys match the source) and, if clean, the already-written output is
    re-committed on the new parent. On a 10^12-image table this is the
    difference between absorbing a streaming ingest that landed during
    an hour-long MERGE and redoing the whole blob rewrite. Genuinely
    conflicting commits still raise ConcurrentCommitError (replan by
    re-running merge_into). 0 disables rebasing (round-3 behavior).
    """
    if when_matched not in ("update", "delete", None):
        raise ValueError(f"when_matched={when_matched!r}")
    if when_not_matched not in ("insert", None):
        raise ValueError(f"when_not_matched={when_not_matched!r}")
    if when_not_matched_by_source not in ("delete", "update", None):
        raise ValueError(
            f"when_not_matched_by_source={when_not_matched_by_source!r}")
    if when_not_matched_by_source == "update":
        if not by_source_assignments:
            raise ValueError(
                "when_not_matched_by_source='update' needs "
                "by_source_assignments ({col: expr over the target row})")
        known = {f.name for f in table.schema().fields}
        bad = sorted(set(by_source_assignments) - known)
        if bad:
            raise ValueError(f"by_source_assignments columns {bad} not in "
                             "the table schema")
    elif by_source_assignments:
        raise ValueError("by_source_assignments requires "
                         "when_not_matched_by_source='update'")
    if (when_matched is None and when_not_matched is None
            and when_not_matched_by_source is None):
        raise ValueError("no-op MERGE: all clauses are None")
    if mode not in ("cow", "mor", "dv"):
        raise ValueError(f"unknown merge mode {mode!r} (cow|mor|dv)")
    if when_not_matched_by_source and mode == "cow":
        raise ValueError(
            "when_not_matched_by_source needs mode='mor' or 'dv' "
            "(O(target keys) position deletes); a CoW by-source delete "
            "rewrites every file holding an unmatched row — use "
            "overwrite() for a full replace"
        )
    if mode in ("mor", "dv") and update_cols:
        raise ValueError(
            f"mode={mode!r} supports full-row updates only "
            "(update_cols=None); column-subset updates need the old row "
            "read back — use cow"
        )
    t0 = time.time()
    keys = [key] if isinstance(key, str) else list(key)
    evolved = None
    if evolve_schema:
        evolved = evolve_schema_for_source(table, source)
    meta = table.load_metadata()
    plan_fp = rebase_fingerprint(meta)
    schema = table.schema()
    data_cols = [f.name for f in schema.fields]
    bad = [c for c in (update_cols or []) if c in keys or c not in data_cols]
    if bad:
        raise ValueError(f"update_cols not updatable columns: {bad}")
    if evolved and (evolved["added"] or evolved["widened"]):
        extra_summary = {**(extra_summary or {}), "schema-evolved": evolved}

    src_all = None
    n_delcmd = 0
    if source_delete_condition is not None:
        if when_matched != "update":
            raise ValueError(
                "source_delete_condition requires when_matched='update' "
                "(the CDC apply shape: flagged rows delete, others upsert)")
        del_flag = F.coalesce(
            F.expr(source_delete_condition).cast("boolean"), F.lit(False))
        ext = T.StructType(
            list(schema.fields) + [T.StructField("_s_del", T.BooleanType())])
        src_all = _dedupe_source(
            table.conform(
                source.withColumn("_s_del", del_flag)
                .select(*data_cols, "_s_del"), ext),
            keys, data_cols).persist()
        n_delcmd = src_all.filter(F.col("_s_del")).count()
        src = src_all.filter(~F.col("_s_del")).drop("_s_del")
    else:
        src = _dedupe_source(
            table.conform(source.select(*data_cols), schema), keys, data_cols)
    cur = table.current_snapshot(meta)
    if cur is None or not cur.manifests:
        if when_not_matched != "insert":
            return {"files_rewritten": 0, "files_written": 0, "rows_out": 0,
                    "wall_ms": int((time.time() - t0) * 1000), "snapshot": None}
        # expected_parent pins "the table is still empty": a concurrent
        # writer who inserted matching keys between the cur-is-None
        # check and this commit must surface (re-run merge_into to
        # replan as a real upsert), not compose via the append retry
        # into duplicate keys. cur may be an empty snapshot (manifests
        # == []) whose id is still the correct pin.
        boot_entries = table.write_data_files(src)
        if not boot_entries:  # e.g. a batch of only delete commands
            return {"files_rewritten": 0, "files_written": 0, "rows_out": 0,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "snapshot": cur.snapshot_id if cur is not None else None}
        snap = table.commit_append(
            boot_entries,
            summary={"op": "merge-bootstrap", **(extra_summary or {})},
            retries=0,
            expected_parent=cur.snapshot_id if cur is not None else None,
        )
        return {"files_rewritten": 0, "files_written": snap.summary["added-files"],
                "rows_out": snap.summary["added-records"],
                "wall_ms": int((time.time() - t0) * 1000),
                "snapshot": snap.snapshot_id}

    if src_all is None:
        # Persist the deduped+conformed source: every merge shape below
        # executes it at least twice — once for the key-side planning
        # (src_keys count / touched-file classification) and once for
        # the output write — and an expensive source (a synthesis
        # mapInPandas, a joined CDC feed) plus the dedupe window's
        # payload shuffle would run per execution. The cache fills as a
        # side effect of the first key pass (MEMORY_AND_DISK: a giant
        # backfill source spills instead of OOMing; a merge source is
        # O(change volume), not table-sized, by contract). The
        # source_delete_condition branch already persists src_all.
        src = src.persist()
    src_keys = (src_all.select(*keys) if src_all is not None
                else src.select(*keys)).persist()
    n_src = src_keys.count()  # keys-only; also materializes the cache

    # ---- fast path: insert-only MERGE = anti-join append, no rewrite --
    if (when_matched is None and when_not_matched == "insert"
            and when_not_matched_by_source is None):
        # ONE column-pruned scan of the target's keys: the anti-join
        # result is SOURCE-sized, so persisting it lets the insert
        # count, the sizing, and the write all reuse it — without the
        # persist, the count and the write would each re-execute the
        # full target key scan (2x the metadata-side cost at 100 TB)
        target_keys = table.scan(spark, snapshot_id=cur.snapshot_id,
                                 columns=keys)
        new_keys = src_keys.join(target_keys, keys, "left_anti").persist()
        # size by the ACTUAL insert count (keys-only anti-join count —
        # sizing by all source rows fragments match-heavy merges into
        # target/n_matched-sized slivers)
        n_new = new_keys.count()  # also materializes the cache
        new_rows = src.join(new_keys, keys, "left_semi")
        stats = table.files(spark, snapshot_id=cur.snapshot_id).agg(
            F.sum("file_size_bytes").alias("b"), F.sum("record_count").alias("r")
        ).collect()[0]
        avg_row = (stats["b"] or 1) / max(stats["r"] or 1, 1)
        n_files = max(1, round(n_new * avg_row / target_file_size))
        entries = table.write_data_files(new_rows, n_files=n_files)
        try:
            if not entries:
                return {"files_rewritten": 0, "files_written": 0,
                        "rows_out": 0,
                        "wall_ms": int((time.time() - t0) * 1000),
                        "snapshot": cur.snapshot_id}
            # retries=0 + expected_parent: the anti-join's not-matched
            # premise was computed against the plan snapshot. On a lost
            # race the rebase validates the premise EXACTLY against the
            # concurrently appended keys (only the keys we are
            # inserting can conflict — a concurrent append of a matched
            # key is untouched by an insert-only merge) and re-pins;
            # a real conflict surfaces for a full replan (re-running
            # the merge re-anti-joins).
            snap = commit_with_rebase(
                lambda pin: table.commit_append(
                    entries,
                    summary={"op": "merge-insert-only",
                             **(extra_summary or {})},
                    retries=0, expected_parent=pin),
                table, spark, cur, plan_fp, rebase_retries,
                conflict_keys=new_keys, keys=keys, op="merge")
            return {"files_rewritten": 0, "files_written": len(entries),
                    "rows_out": sum(e["record_count"] for e in entries),
                    "wall_ms": int((time.time() - t0) * 1000),
                    "snapshot": snap.snapshot_id}
        finally:
            new_keys.unpersist()
            src_keys.unpersist()
            src.unpersist()

    if mode in ("mor", "dv"):
        if n_delcmd:
            extra_summary = {**(extra_summary or {}),
                             "rows_delete_commands": n_delcmd}
        try:
            return _merge_mor(table, spark, src, src_keys, n_src - n_delcmd,
                              keys, when_matched, when_not_matched,
                              when_not_matched_by_source, target_file_size,
                              cur, op_id, extra_summary, t0,
                              dv=(mode == "dv"), plan_fp=plan_fp,
                              rebase_retries=rebase_retries,
                              by_source_assignments=by_source_assignments)
        finally:
            src.unpersist()

    # ---- 1. touched files: keys+filename scan (bytes pruned away) ----
    # ONE pass over the target's keys serves BOTH planning questions:
    # which files hold matches (touched set) and how many source keys
    # matched (for insert-volume sizing). The inner-join result is
    # bounded by the deduped SOURCE size (target keys unique), so it is
    # safe to persist — without it, the sizing anti-join below would
    # re-execute the entire target key scan a second time.
    # _file comes from the scan itself (table-relative, decoded,
    # computed on the scan stage BEFORE any MOR delete anti-join —
    # input_file_name() projected after a join has no defined "current
    # file"); the manifest-resolution assertion below still guards any
    # relativize failure for exotic path schemes
    # pinned to the PLAN snapshot: the touch classification, the
    # manifest resolution below, and the commit's expected_parent must
    # all see the same file set — an unpinned scan here raced a
    # concurrent compaction into a planning crash (found by
    # tests/test_chaos_multiprocess.py)
    target_keys = table.scan(spark, snapshot_id=cur.snapshot_id,
                             columns=None, with_pos=True).select(
        *[F.col(k) for k in keys], F.col("_file")
    )
    matched_keys = target_keys.join(src_keys, keys, "inner").persist()
    touched_rel = {
        r["_file"] for r in matched_keys.select("_file").distinct().collect()
    }
    # stats for the touched set come from the manifest DataFrame —
    # bounded by the touched-file count, never the whole table
    if touched_rel:
        tdf = spark.createDataFrame([(p,) for p in sorted(touched_rel)], "file_path string")
        touched_entries = [
            r.asDict()
            for r in table.files(spark, snapshot_id=cur.snapshot_id)
            .join(F.broadcast(tdf), "file_path", "left_semi")
            .select("file_path", "partition_id", "file_size_bytes",
                    "record_count", "first_row_id")
            .collect()
        ]
    else:
        touched_entries = []
    # every semi-join hit MUST resolve to a manifest entry — a miss
    # means relativize/unquote failed for that path scheme and the
    # file's matched rows would be silently kept stale
    if len(touched_entries) != len(touched_rel):
        resolved = {e["file_path"] for e in touched_entries}
        raise RuntimeError(
            "MERGE planning: input_file_name paths did not all resolve "
            f"to manifest entries; unresolved={sorted(touched_rel - resolved)[:5]}"
        )

    # ---- 2. rewrite: touched rows x source ---------------------------
    # Fast path (the classic full-row upsert — when_matched="update",
    # all columns): no target-payload x source-payload join at all.
    # Because an updated row is ENTIRELY the source row and a carried
    # row ENTIRELY the target row, the rewrite decomposes into
    #   carried = touched rows ANTI-JOIN source keys   (payload stays
    #             on its scan partitioning — keys broadcast)
    #   source  = one pass over the source LEFT-JOINED to the touched
    #             rows' (keys, _row_id) metadata (lineage pickup; a
    #             NULL _row_id marks an insert)
    # so the only payload shuffle in the whole MERGE is the final
    # write distribution. The general path below instead shuffles BOTH
    # payload sides by key for its outer join — required only when
    # columns mix (update_cols subset) or rows flip polarity per-row
    # (CDC delete commands, when_matched="delete").
    fast_full_upsert = (
        when_matched == "update" and not update_cols and src_all is None
    )
    if fast_full_upsert:
        tgt_rows = table.scan_matched_files(
            touched_entries, spark, with_row_id=True, with_last_seq=True)
        # a target row with a NULL merge key never equi-joins, and an
        # anti-join keeps exactly the never-matching rows — same
        # preservation semantics as the outer join's presence flags.
        # Broadcast the key set while it is plausibly executor-sized
        # (n_src is already counted); a giant backfill source falls
        # back to the planner's shuffle join rather than an 8 GB+
        # broadcast build
        skeys = F.broadcast(src_keys) if n_src <= 20_000_000 else src_keys
        carried = tgt_rows.join(skeys, keys, "left_anti")
        tgt_meta = (
            tgt_rows.select(*keys, F.col("_row_id").alias("__t_row_id"))
            .withColumn("__t_present", F.lit(True))
        )
        s_out = src.join(tgt_meta, keys, "left")
        if when_not_matched != "insert":
            s_out = s_out.filter(F.col("__t_present").isNotNull())
        out = carried.unionByName(
            s_out.select(
                *data_cols,
                # matched updates keep the target row's id; inserts go
                # NULL and resolve to new-file first_row_id + position
                F.col("__t_row_id").alias("_row_id"),
                # updates and inserts both inherit this commit's seq
                F.lit(None).cast("long").alias("_last_updated_seq"),
            )
        )
    else:
        # presence flags, NOT key-null checks: a target row whose merge
        # key is NULL never joins (== is null-rejecting) yet must be
        # PRESERVED — classifying sides by key nullity would rewrite it
        # from the all-NULL source side (silent corruption)
        tgt = (
            table.scan_matched_files(touched_entries, spark, with_row_id=True,
                                     with_last_seq=True)
            .withColumn("_t_present", F.lit(True)).alias("t")
        )
        s = (src_all if src_all is not None else src).withColumn(
            "_s_present", F.lit(True)).alias("s")
        join_type = "full_outer" if when_not_matched == "insert" else "left_outer"
        cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = c if cond is None else cond & c
        joined = tgt.join(s, cond, join_type)
        matched = F.col("t._t_present").isNotNull() & F.col("s._s_present").isNotNull()
        src_only = F.col("t._t_present").isNull()
        if when_matched == "delete":
            joined = joined.filter(~matched)
        if src_all is not None:
            sdel = F.coalesce(F.col("s._s_del"), F.lit(False))
            joined = joined.filter(~(matched & sdel) & ~(src_only & sdel))
        upd = set(update_cols) if update_cols else set(c for c in data_cols if c not in keys)
        take_src_on_match = when_matched == "update"
        out = joined.select(
            *[
                F.when(src_only, F.col(f"s.{c}"))
                .when(matched & F.lit(take_src_on_match and (c in upd or c in keys)),
                      F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in data_cols
            ],
            # row lineage: carried/updated rows keep the target row's id;
            # inserted rows get NULL and resolve at read time to the new
            # file's first_row_id + position (Iceberg v3)
            F.when(src_only, F.lit(None).cast("long"))
            .otherwise(F.col("t._row_id")).alias("_row_id"),
            # last-updated sequence: rows this MERGE writes (inserts) or
            # modifies (matched updates) go NULL and inherit the commit's
            # sequence; rows merely carried through the rewrite keep theirs
            F.when(src_only | (matched & F.lit(take_src_on_match)),
                   F.lit(None).cast("long"))
            .otherwise(F.col("t._last_updated_seq")).alias("_last_updated_seq"),
        )

    # ---- sizing: touched bytes + estimated insert volume -------------
    touched_bytes = sum(e["file_size_bytes"] for e in touched_entries)
    insert_bytes = 0.0
    if when_not_matched == "insert":
        # actual insert count = source keys minus matched keys — both
        # already materialized; NO second pass over the target
        # (n_src alone would over-fragment match-heavy upserts)
        n_matched_all = matched_keys.select(*keys).distinct().count()
        if src_all is not None:
            n_matched_del = (
                matched_keys.select(*keys).distinct()
                .join(src_all.filter(F.col("_s_del")).select(*keys),
                      keys, "left_semi").count())
            n_new = (n_src - n_delcmd) - (n_matched_all - n_matched_del)
        else:
            n_new = n_src - n_matched_all
        stats = table.files(spark, snapshot_id=cur.snapshot_id).agg(
            F.sum("file_size_bytes").alias("b"), F.sum("record_count").alias("r")
        ).collect()[0]
        insert_bytes = n_new * (stats["b"] or 1) / max(stats["r"] or 1, 1)
    matched_keys.unpersist()
    n_out = max(1, round((touched_bytes + insert_bytes) / target_file_size))
    n_parts = len({e["partition_id"] for e in touched_entries}) or 1
    new_entries = table.write_data_files(
        out, n_files=n_out, sort_cols=keys, n_partitions_hint=n_parts,
        salt_col=keys[0],
    )
    # retries=0: the rewrite's matched/not-matched classification is
    # a table-wide precondition, not a partition-scoped one — a
    # concurrent append of a matching key into a partition OUTSIDE
    # the affected set composes cleanly under a partition-scoped
    # retry and the merge would insert a duplicate key. The commit is
    # pinned to the snapshot the plan read; when a concurrent commit
    # lands, rebase.validate_rebase checks the table-wide precondition EXACTLY
    # (appends only, zero appended merge-key matches) and re-pins —
    # keeping the blob rewrite above — else the conflict surfaces so
    # the caller replans (re-running merge_into re-derives touched
    # files against the new snapshot). Iceberg's copy-on-write MERGE
    # likewise validates conflicting appends against the merge
    # condition table-wide.
    try:
        snap = commit_with_rebase(
            lambda pin: table.commit_replace(
                {e["file_path"] for e in touched_entries},
                new_entries,
                operation="overwrite",
                summary={"op": "merge", "key": ",".join(keys),
                         "when_matched": str(when_matched),
                         "when_not_matched": str(when_not_matched),
                         **({"rows_delete_commands": n_delcmd}
                            if n_delcmd else {}),
                         **(extra_summary or {})},
                # touched + insert-target partitions bound the commit
                affected_partitions={e["partition_id"]
                                     for e in touched_entries}
                | {e["partition_id"] for e in new_entries},
                retries=0,
                expected_parent=pin,
            ),
            table, spark, cur, plan_fp, rebase_retries,
            conflict_keys=src_keys, keys=keys, op="merge")
    finally:
        src_keys.unpersist()
        src.unpersist()  # no-op when src_all is the persisted frame
        if src_all is not None:
            src_all.unpersist()
    wall_ms = int((time.time() - t0) * 1000)
    LineageLog(table.location).record(
        op_id or f"merge-{snap.snapshot_id}", "all",
        sorted({e["partition_id"] for e in touched_entries}),
        len(touched_entries), len(new_entries),
        sum(e["record_count"] for e in new_entries),
        sum(e["file_size_bytes"] for e in new_entries),
        wall_ms, snap.snapshot_id,
    )
    return {
        "files_rewritten": len(touched_entries),
        "files_written": len(new_entries),
        "rows_out": sum(e["record_count"] for e in new_entries),
        "wall_ms": wall_ms,
        "snapshot": snap.snapshot_id,
    }


def _merge_mor(table, spark, src, src_keys, n_src, keys, when_matched,
               when_not_matched, by_source, target_file_size, cur, op_id,
               extra_summary, t0, dv=False, plan_fp=None,
               rebase_retries=0, by_source_assignments=None) -> dict:
    """Merge-on-read MERGE: ONE column-pruned scan of (keys, _file,
    _pos) classifies matched target rows into position-delete files;
    the new row versions (full source rows) are appended. Both land in
    a single atomic snapshot via ``commit_delete_files(data_entries=)``
    pinned to the plan snapshot. The touched files' blobs are never
    read — the cost is O(source + target keys), not O(touched files):
    the scale shape for frequent small upserts on blob tables.
    ``dv=True`` writes the matched positions as deletion vectors (one
    merged bitmap per touched file) instead of position rows."""
    from .delete import _delete_entries_and_meta

    # _row_id rides the same column-pruned key scan so an UPDATEd row's
    # new version can inherit the old row's lineage id (Iceberg v3)
    # pinned to the plan snapshot (same reasoning as the CoW path:
    # position classification, resolution, and commit pin must agree)
    target_keys = table.scan(spark, snapshot_id=cur.snapshot_id,
                             columns=None, with_pos=True,
                             with_row_id=True).select(
        *[F.col(k) for k in keys], F.col("_file"), F.col("_pos"),
        F.col("_row_id")
    )
    target_keys = target_keys.persist()
    matched = target_keys.join(src_keys, keys, "inner").persist()
    n_matched = matched.count()  # target keys unique => matched rows

    to_delete = []
    n_del = 0
    if n_matched and when_matched in ("update", "delete"):
        to_delete.append(matched)
        n_del += n_matched
    unmatched = None
    n_by_src = 0
    if by_source in ("delete", "update"):
        # WHEN NOT MATCHED BY SOURCE: target keys absent from the
        # source — same position-delete currency, one commit (the
        # update action ALSO deletes the old positions; its new row
        # versions join the appended output below)
        unmatched = target_keys.join(src_keys, keys, "left_anti").persist()
        n_by_src = unmatched.count()
        if n_by_src:
            to_delete.append(unmatched)
            n_del += n_by_src
    target_keys.unpersist()

    delete_entries: list[dict] = []
    commit_extra: dict = {}
    if to_delete:
        dels = to_delete[0]
        for extra in to_delete[1:]:
            dels = dels.unionByName(extra)
        # resolution assertion, bounded by the touched-file count
        touched = {r["_file"]
                   for r in dels.select("_file").distinct().collect()}
        tdf = spark.createDataFrame(
            [(p,) for p in sorted(touched)], "file_path string")
        resolved = (
            table.files(spark, snapshot_id=cur.snapshot_id)
            .join(F.broadcast(tdf), "file_path", "left_semi").count()
        )
        if resolved != len(touched):
            raise RuntimeError(
                "MOR MERGE planning: scan file identities did not all "
                "resolve to manifest entries"
            )
        delete_entries, commit_extra = _delete_entries_and_meta(
            table, spark,
            dels.select(F.col("_file").alias("file_path"),
                        F.col("_pos").alias("pos")),
            n_del, touched, dv,
        )

    # old-id carry for updates: (key -> _row_id) of matched target rows;
    # a left join tags replacement rows with their predecessor's lineage
    # id (inserts stay NULL -> fresh id at read time)
    old_ids = matched.select(*keys, "_row_id")
    if when_not_matched == "insert":
        if when_matched == "update":
            out_rows = src.join(old_ids, keys, "left")  # replacements + inserts
            n_out = n_src
        else:  # matched rows deleted; insert the rest
            out_rows = src.join(matched.select(*keys), keys, "left_anti")
            n_out = n_src - n_matched
    else:
        if when_matched == "update":
            out_rows = src.join(old_ids, keys, "inner")
            n_out = n_matched
        else:
            out_rows, n_out = None, 0

    if by_source == "update" and n_by_src:
        # read ONLY the files holding target-only rows (scan_files
        # subset, deletes applied, pinned snapshot), pair on exact
        # (_file, _pos), apply the assignments, carry lineage ids
        data_cols = [f.name for f in table.schema().fields]
        bfiles = sorted({r["_file"] for r in
                         unmatched.select("_file").distinct().collect()})
        refs = unmatched.select("_file", "_pos", "_row_id")
        snap_obj = next(s for s in table.snapshots_list()
                        if s.snapshot_id == cur.snapshot_id)
        full = (table.scan_files(spark, bfiles, with_pos=True,
                                 snapshot=snap_obj)
                .join(refs, ["_file", "_pos"], "inner"))
        assign = {c: (F.expr(v) if isinstance(v, str) else v)
                  for c, v in by_source_assignments.items()}
        by_src_rows = full.select(
            *[(assign[c].alias(c) if c in assign else F.col(c))
              for c in data_cols], "_row_id")
        out_rows = (by_src_rows if out_rows is None
                    else out_rows.unionByName(by_src_rows,
                                              allowMissingColumns=True))
        n_out += n_by_src

    entries: list[dict] = []
    if out_rows is not None and n_out:
        stats = table.files(spark, snapshot_id=cur.snapshot_id).agg(
            F.sum("file_size_bytes").alias("b"),
            F.sum("record_count").alias("r"),
        ).collect()[0]
        avg_row = (stats["b"] or 1) / max(stats["r"] or 1, 1)
        entries = table.write_data_files(
            out_rows,
            n_files=max(1, round(n_out * avg_row / target_file_size)),
            sort_cols=keys, salt_col=keys[0],
        )
    matched.unpersist()
    if unmatched is not None:
        unmatched.unpersist()
    try:
        if not delete_entries and not entries:
            return {"files_rewritten": 0, "files_written": 0, "rows_out": 0,
                    "delete_files_written": 0, "rows_deleted_positions": 0,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "snapshot": cur.snapshot_id}
        summary = {"key": ",".join(keys), "when_matched": str(when_matched),
                   "when_not_matched": str(when_not_matched),
                   **({"when_not_matched_by_source": by_source,
                       ("rows_deleted_by_source" if by_source == "delete"
                        else "rows_updated_by_source"): n_by_src}
                      if by_source else {}),
                   **(extra_summary or {})}
        # same validated rebase as the CoW path; by_source full-sync
        # plans cannot absorb ANY concurrent append (full_sync=True)
        if delete_entries:
            snap = commit_with_rebase(
                lambda pin: table.commit_delete_files(
                    delete_entries, data_entries=entries,
                    operation="merge-mor", op_name="merge-mor",
                    summary={**summary, **({"dv": True} if dv else {})},
                    expected_parent=pin,
                    **commit_extra,
                ),
                table, spark, cur, plan_fp, rebase_retries,
                conflict_keys=src_keys, keys=keys,
                full_sync=bool(by_source), op="merge")
        else:
            # nothing matched: a pure insert — same pinned append the
            # insert-only fast path uses (premise re-validated on replan)
            snap = commit_with_rebase(
                lambda pin: table.commit_append(
                    entries, summary={"op": "merge-mor", **summary},
                    retries=0, expected_parent=pin,
                ),
                table, spark, cur, plan_fp, rebase_retries,
                conflict_keys=src_keys, keys=keys,
                full_sync=bool(by_source), op="merge")
    finally:
        src_keys.unpersist()
    wall_ms = int((time.time() - t0) * 1000)
    LineageLog(table.location).record(
        op_id or f"merge-mor-{snap.snapshot_id}", "all",
        sorted({e["partition_id"] for e in entries}),
        0, len(entries),
        sum(e["record_count"] for e in entries),
        sum(e["file_size_bytes"] for e in entries),
        wall_ms, snap.snapshot_id,
    )
    return {
        "files_rewritten": 0,
        "files_written": len(entries),
        "rows_out": sum(e["record_count"] for e in entries),
        "delete_files_written": len(delete_entries),
        "rows_deleted_positions": n_del,
        "wall_ms": wall_ms,
        "snapshot": snap.snapshot_id,
    }
