"""Structured-Streaming incremental ingest into the lakehouse table.

The reference's incrementality is orchestrated micro-batch: Airflow
@daily catchup with per-day DELETE+INSERT idempotency
(SURVEY.md §2.9; dags/Silver_Transform_Dag.py:188-207). The
Spark-native equivalent is Structured Streaming with
``foreachBatch``-driven exactly-once commits into the table format:

 * each micro-batch -> one append/overwrite snapshot, tagged with the
   batch id in the snapshot summary;
 * restart safety: the last committed batch id is read back from the
   snapshot log, and an already-seen batch id is skipped — idempotent
   sink on top of the checkpointed source offsets (the same
   at-least-once -> exactly-once upgrade the reference gets from
   DELETE day + INSERT day);
 * late data: watermarked windowed aggregation (the capability the
   reference lacks and handles by re-running a day with MERGE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tableformat import LakehouseTable


def last_committed_batch(table: LakehouseTable, stream_id: str = "default") -> int:
    """Max committed batch id FOR THIS STREAM. The key is namespaced by
    ``stream_id`` — a single global max would silently skip new batches
    when a checkpoint dir is recreated (ids restart at 0) or when two
    different streams write the same table."""
    mx = -1
    for s in table.snapshots_list():
        sid = s.summary.get("streaming-id")
        # legacy snapshots (committed before ids were namespaced) carry
        # a batch-id but NO streaming-id — they must match EVERY stream,
        # else a table written pre-upgrade restarts under a derived
        # stream_id, sees max batch -1, and re-commits checkpoint-
        # replayed batches (duplicate rows on upgrade)
        if sid is not None and sid != stream_id:
            continue
        b = s.summary.get("streaming-batch-id")
        if b is not None:
            mx = max(mx, int(b))
    return mx


def stream_append_sink(table: LakehouseTable, n_files: int = 4,
                       stream_id: str = "default"):
    """foreachBatch function committing each micro-batch as a snapshot,
    skipping replayed batch ids (exactly-once on top of checkpointed
    offsets). ``stream_id`` should be stable per (query, checkpoint) —
    e.g. a hash of the checkpoint location — so replay detection is
    scoped to the stream that owns the offsets."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..tableformat.table import ConcurrentCommitError

        if batch_id <= last_committed_batch(table, stream_id):
            return  # replay after restart — already committed
        entries = table.write_data_files(table.conform(batch_df), n_files=n_files)
        # check-then-commit must stay ATOMIC under races: commit with
        # retries=0 and RE-VALIDATE the batch-id precondition before
        # each retry — a blind table-level retry would let a zombie
        # driver and its restarted twin both land the same batch
        last_err: Exception | None = None
        for _ in range(4):
            if batch_id <= last_committed_batch(table, stream_id):
                return  # the racer was us (or our twin): already in
            try:
                table.commit_append(
                    entries,
                    summary={"streaming-batch-id": int(batch_id),
                             "streaming-id": stream_id},
                    retries=0,
                )
                return
            except ConcurrentCommitError as e:
                last_err = e
        raise last_err

    return sink


def stream_merge_sink(table: LakehouseTable, key: str | list[str] = "image_id",
                      stream_id: str = "default",
                      target_file_size: int = 64 * 1024 * 1024,
                      mode: str = "cow",
                      delete_condition: str | None = None):
    """foreachBatch function running each micro-batch as a MERGE INTO
    (CDC-style streaming upsert: late corrections UPDATE, new keys
    INSERT) with the same exactly-once upgrade as stream_append_sink —
    the batch id rides the merge commit's summary, replayed ids are
    skipped, and a concurrent-commit conflict triggers a full replan
    (merge_into re-derives its touched files against the new snapshot)
    after re-validating the batch-id precondition. The reference's
    closest idiom is re-running a day with MERGE
    (dags/Bronze_Ingest_Dag.py:124-130); this is its continuous form.

    ``mode`` passes through to :func:`~..operators.merge.merge_into`:
    ``"mor"``/``"dv"`` make each micro-batch O(batch + target keys)
    with no blob rewrite — the steady-state streaming-upsert shape on
    a blob table; ``"dv"`` additionally keeps one applied vector per
    touched file no matter how many batches land between folds.

    ``delete_condition`` makes the sink a full CDC APPLY: batch rows
    satisfying the (source-side, e.g. op-code) predicate delete their
    target rows, the rest upsert — one atomic commit per micro-batch
    (merge_into's ``source_delete_condition``)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.merge import merge_into
        from ..tableformat.table import ConcurrentCommitError

        last_err: Exception | None = None
        for _ in range(4):
            if batch_id <= last_committed_batch(table, stream_id):
                return  # replay (or our twin's win) — already committed
            try:
                merge_into(
                    table, batch_df.sparkSession, batch_df, key=key,
                    target_file_size=target_file_size, mode=mode,
                    source_delete_condition=delete_condition,
                    extra_summary={"streaming-batch-id": int(batch_id),
                                   "streaming-id": stream_id},
                )
                return
            except ConcurrentCommitError as e:
                last_err = e  # replan: loop re-checks batch id, re-merges
        raise last_err

    return sink


def stream_upsert_eq_sink(table: LakehouseTable,
                          key: str | list[str] = "image_id",
                          n_files: int = 4,
                          stream_id: str = "default"):
    """BLIND streaming upsert via equality deletes: each micro-batch
    commits (equality-delete of the batch's keys + append of the batch
    rows) in ONE snapshot, WITHOUT EVER READING THE TARGET — the
    Flink/Iceberg CDC-writer shape. Sequence scoping makes it correct
    without coordination: the delete erases every EARLIER version of
    each key, while this batch's own rows (and any later writer's)
    are sequenced at-or-after it and survive. Compare
    stream_merge_sink, which scans target keys per batch: at
    10^12-image scale a blind writer's per-batch cost is O(batch),
    independent of table size — the difference between a sink that
    keeps up and one that falls behind as the table grows. Read-side
    cost accumulates one anti-join per batch until
    rewrite_position_deletes folds them, so schedule folds with
    compaction. Exactly-once replay protection as stream_append_sink
    (batch id in the commit summary, re-validated before any retry)."""
    keys = [key] if isinstance(key, str) else list(key)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.merge import _dedupe_source
        from ..tableformat.table import ConcurrentCommitError

        if batch_id <= last_committed_batch(table, stream_id):
            return
        schema = table.schema()
        data_cols = [f.name for f in schema.fields]
        batch = _dedupe_source(
            table.conform(batch_df.select(*data_cols), schema), keys, data_cols)
        cur = table.current_snapshot()
        summary = {"streaming-batch-id": int(batch_id),
                   "streaming-id": stream_id}
        if cur is None or not cur.manifests:
            # bootstrap: nothing earlier to delete — plain append with
            # the empty-table pin (a concurrent first writer surfaces)
            entries = table.write_data_files(batch, n_files=n_files)
            table.commit_append(
                entries, summary=summary, retries=0,
                expected_parent=cur.snapshot_id if cur else None)
            return
        entries = table.write_data_files(batch, n_files=n_files)
        eq_entries = table.write_equality_delete_files(batch, keys)
        last_err: Exception | None = None
        for _ in range(4):
            if batch_id <= last_committed_batch(table, stream_id):
                return  # our twin won — already committed
            try:
                table.commit_equality_deletes(
                    eq_entries, keys, data_entries=entries,
                    summary=summary, retries=0)
                return
            except ConcurrentCommitError as e:
                last_err = e  # re-validate batch id, then plain retry
        raise last_err

    return sink


def windowed_event_counts(events_stream: DataFrame, watermark: str = "10 minutes",
                          window: str = "5 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation over the events schema
    (ts timestamp, event_type string, value double)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "total_value",
        )
    )


def run_file_stream_into_table(
    spark: SparkSession,
    source_dir: str,
    schema,
    table: LakehouseTable,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
) -> None:
    """Drive a file-source stream to completion synchronously (the
    local-mode test harness; a production job would .start() and run
    continuously)."""
    import hashlib

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    # stream identity = the checkpoint that owns the source offsets
    sid = hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]
    q = (
        stream.writeStream.foreachBatch(stream_append_sink(table, stream_id=sid))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_mv_maintenance_sink(catalog, source: str, views: list[str],
                               n_files: int = 4,
                               stream_id: str = "default"):
    """foreachBatch function: exactly-once append into ``source``, then
    change-proportional refresh of every materialized view in
    ``views`` (operators/matview.py) — the continuous form of the
    reference's ingest-then-rebuild-gold DAG chain
    (dags/Bronze_Ingest_Dag.py -> dags/Queries_dag.py), with the gold
    rebuild cost proportional to the BATCH, not the table.

    Exactly-once composition: the append sink dedups replayed batch
    ids; the refresh needs no batch-id bookkeeping of its own because
    it is idempotent BY CONSTRUCTION — it covers the source changelog
    from the MV's recorded snapshot to current, so a crash between the
    append commit and the refresh (or a refresh racing a concurrent
    batch) is simply caught up by the next batch's refresh. The gold
    layer trails the stream by at most one in-flight batch and never
    diverges or double-counts."""

    table = catalog.load_table(source)
    base = stream_append_sink(table, n_files=n_files, stream_id=stream_id)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.matview import refresh_materialized_view

        base(batch_df, batch_id)
        for v in views:
            refresh_materialized_view(batch_df.sparkSession, catalog, v)

    return sink


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    band_sec: int = 1800,
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    the right events of the same key whose timestamp lies in
    ``[left_ts - band_sec, left_ts]`` (the streaming form of
    operators/temporal.py's interval join, restricted to a trailing
    band — unbounded history is impossible in a stream).

    Both sides carry a watermark and the join condition time-bounds
    ``right_ts`` against ``left_ts`` from BOTH directions, which is
    exactly what Structured Streaming requires to evict join state:
    each side's buffered rows are dropped once the other side's
    watermark passes the band, so state is O(key-rate x band), not
    O(stream length).

    Right-side columns are prefixed with ``right_prefix`` (streaming
    joins forbid ambiguous names and post-join renames of the
    watermark column).
    """
    keys = [on] if isinstance(on, str) else list(on)
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"{right_prefix}{c}")
    rkeys = [f"{right_prefix}{k}" for k in keys]
    rts = f"{right_prefix}{right_ts}"
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = r.withWatermark(rts, watermark)
    cond = None
    for lk, rk in zip(keys, rkeys):
        c = l_wm[lk] == r_wm[rk]
        cond = c if cond is None else (cond & c)
    band = (
        (r_wm[rts] >= l_wm[left_ts] - F.expr(f"INTERVAL {int(band_sec)} SECONDS"))
        & (r_wm[rts] <= l_wm[left_ts])
    )
    cond = band if cond is None else (cond & band)
    return l_wm.join(r_wm, cond, "inner").drop(*rkeys)
