"""COPY INTO — idempotent, exactly-once file ingest into a lakehouse
table (the Delta ``COPY INTO`` / Auto Loader analog; reference analog:
the bronze DAG's day-file glob probe that skips already-loaded days,
/root/reference/dags/Bronze_Ingest_Dag.py:30-59 — this generalizes that
skip from "one day file" to "any landing-zone file, exactly once").

Loaded-file state lives in a per-table parquet ledger
(``metadata/copy-ledger/``), read DISTRIBUTED and anti-joined against
the landing listing — never collected: at 10^12-image scale the ledger
has one row per ingested source file (millions), which is a metadata
DataFrame, not a driver list. The ledger survives snapshot expiry
(unlike commit summaries), so files never reload after GC.

Exactly-once across crashes — the two-phase staged-ledger protocol:

1. pending = landing files ∖ ledger (distributed anti-join);
2. the batch's ledger rows are STAGED at
   ``copy-ledger/<batch>.staged.parquet`` (batch = content hash of the
   pending path list) — staged files do NOT count as loaded;
3. the data commit carries ``copy.batch = <batch>`` in its snapshot
   summary (appends compose with concurrent commits, so plain
   commit-retry is safe);
4. the staged ledger is RENAMED to ``<batch>.parquet`` (atomic) —
   only now do the files count as loaded.

Crash windows: before 3 → an orphan ``.staged`` file, superseded or
removed on the next run (files not loaded, will re-ingest — correct);
between 3 and 4 → the next run finds the staged file, looks for its
``copy.batch`` token in the snapshot summaries, and FINALIZES the
rename instead of re-ingesting (the recovery scan runs only when a
staged file exists, and only over the retained snapshot list — O(100),
not O(files)). The recovery window is bounded by snapshot retention:
run ``copy_into`` (or any resume) before expiring the committing
snapshot, as with every checkpointed op in this engine.
"""

from __future__ import annotations

import glob as globmod
import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..tableformat.table import LakehouseTable

LEDGER_DIR = "copy-ledger"
BATCH_PROP = "copy.batch"


def _ledger_dir(table: LakehouseTable) -> str:
    return os.path.join(table.meta_dir, LEDGER_DIR)


def _ledger_files(table: LakehouseTable, staged: bool = False) -> list[str]:
    d = _ledger_dir(table)
    if not os.path.isdir(d):
        return []
    suffix = ".staged.parquet" if staged else ".parquet"
    return sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if f.endswith(suffix) and (staged or not f.endswith(".staged.parquet"))
    )


LEDGER_SCHEMA = "source_path string, file_size long, batch string"


def loaded_files_df(table: LakehouseTable, spark: SparkSession) -> DataFrame:
    """The committed copy ledger as a DataFrame (one row per ingested
    source file) — the distributed skip set."""
    files = _ledger_files(table)
    if not files:
        return spark.createDataFrame([], LEDGER_SCHEMA)
    return spark.read.schema(LEDGER_SCHEMA).parquet(*files)


def _batch_token(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in paths:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:24]


def _finalize(ledger_dir: str, batch: str) -> bool:
    """staged -> committed rename, tolerant of a concurrent finalizer
    having won (recovery and the ingester may race on a COMMITTED
    batch — both outcomes are the same file, so either winning is
    correct)."""
    staged = os.path.join(ledger_dir, f"{batch}.staged.parquet")
    final = os.path.join(ledger_dir, f"{batch}.parquet")
    try:
        os.replace(staged, final)
        return True
    except OSError:
        if os.path.exists(final):
            return False  # the other finalizer won
        raise


def _recover_staged(table: LakehouseTable) -> int:
    """Finalize staged ledgers whose commit landed (crash between
    commit and rename — always safe: the commit is durable). A staged
    ledger with NO matching commit is removed only when its batch lock
    is absent too (the crashed ingester's cleanup released it); a held
    lock means the batch may be in flight right now, so it is left
    alone — a hard-killed ingester's lock is released by rerunning
    copy_into for the same landing set (same batch token) after
    removing the stale lock by hand, as the lock error message says.
    Returns the number finalized."""
    staged = _ledger_files(table, staged=True)
    if not staged:
        return 0
    committed = {
        s.summary.get(BATCH_PROP)
        for s in table.snapshots_list()
        if s.summary.get(BATCH_PROP)
    }
    ledger_dir = _ledger_dir(table)
    done = 0
    for path in staged:
        batch = os.path.basename(path)[: -len(".staged.parquet")]
        lock = os.path.join(ledger_dir, f"{batch}.lock")
        if batch in committed:
            if _finalize(ledger_dir, batch):
                done += 1
            if os.path.exists(lock):
                os.remove(lock)
        elif not os.path.exists(lock):
            shutil.rmtree(path, ignore_errors=True)
    return done


def copy_into(
    table: LakehouseTable,
    spark: SparkSession,
    source: str,
    format: str = "parquet",
    options: dict | None = None,
    n_files: int | None = None,
    max_files_per_batch: int | None = None,
) -> dict:
    """Ingest every landing-zone file matching ``source`` (a glob) that
    has not been loaded before; each source file is loaded exactly
    once across reruns, concurrent appends, and crashes (see module
    docstring for the staged-ledger protocol). ``options`` pass to the
    reader (e.g. ``{"header": "true"}`` for csv); the frame is
    schema-conformed to the table before the append.

    ``max_files_per_batch`` caps one call's intake (the incremental
    trickle-ingest form — rerun to drain); listing is driver-side
    glob, O(landing files), the same budget as the reference's day
    probe."""
    recovered = _recover_staged(table)
    listing = sorted(globmod.glob(source, recursive=True))
    listing = [p for p in listing if os.path.isfile(p)]
    out = {
        "operation": "copy-into", "source": source,
        "candidates": len(listing), "recovered_batches": recovered,
    }
    if not listing:
        out.update({"files_loaded": 0, "rows_loaded": 0, "skipped": 0})
        return out
    cand = spark.createDataFrame(
        [(p, os.path.getsize(p)) for p in listing],
        "source_path string, file_size long")
    pending_rows = (
        cand.join(loaded_files_df(table, spark), ["source_path"], "left_anti")
        .orderBy("source_path")
        .collect())  # O(pending landing files) paths — the list the
    # reader needs verbatim; cap with max_files_per_batch
    pending = [r["source_path"] for r in pending_rows]
    if max_files_per_batch is not None:
        pending = pending[:max_files_per_batch]
    out["skipped"] = len(listing) - len(pending)
    if not pending:
        out.update({"files_loaded": 0, "rows_loaded": 0})
        return out
    batch = _batch_token(pending)
    ledger_dir = _ledger_dir(table)
    os.makedirs(ledger_dir, exist_ok=True)
    # same-batch mutual exclusion: two ingesters racing the same
    # landing set must not both append — the loser sees the lock
    # (O_EXCL create, same primitive as the table's CAS commits)
    lock = os.path.join(ledger_dir, f"{batch}.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise RuntimeError(
            f"copy_into batch {batch} is already in flight (lock "
            f"{lock}); if its ingester crashed, rerun — recovery "
            "clears the lock") from None
    staged_path = os.path.join(ledger_dir, f"{batch}.staged.parquet")
    committed = False
    try:
        reader = spark.read.format(format).options(**(options or {}))
        if format in ("csv", "json"):
            reader = reader.schema(table.schema())
        df = table.conform(reader.load(pending))
        entries = table.write_data_files(df, n_files)
        rows = sum(e["record_count"] for e in entries)
        # 2. stage the ledger rows (does not count as loaded yet)
        sizes = {r["source_path"]: r["file_size"] for r in pending_rows}
        spark.createDataFrame(
            [(p, sizes[p], batch) for p in pending], LEDGER_SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(staged_path)
        # 3. data commit stamped with the batch token (appends compose;
        # commit_append's retry is safe here)
        snap = table.commit_append(
            entries, summary={BATCH_PROP: batch, "copy.files": len(pending)})
        committed = True
        # 4. finalize: staged -> committed (atomic rename; recovery may
        # have won the rename if another call interleaved — same file)
        _finalize(ledger_dir, batch)
    except BaseException:
        # PRE-commit failure only: drop the staged ledger so it cannot
        # linger as a maybe-in-flight batch once the lock is released.
        # Post-commit the staged file must SURVIVE for recovery to
        # finalize (the commit is durable; losing the ledger rows
        # would re-ingest the batch).
        if not committed:
            shutil.rmtree(staged_path, ignore_errors=True)
        raise
    finally:
        if os.path.exists(lock):
            os.remove(lock)
    out.update({
        "files_loaded": len(pending), "rows_loaded": rows,
        "batch": batch, "snapshot_id": snap.snapshot_id,
    })
    return out
