"""Structured Streaming SOURCE over a lakehouse table: incremental
snapshot consumption with checkpointed offsets.

`spark.readStream.format("lakehouse_stream").option("location", ...)`
streams a table's APPENDED rows, one micro-batch per offset range,
with exactly-once progress tracking through the query checkpoint —
the Iceberg "streaming read" surface (Iceberg streams append
snapshots and fails on overwrite/delete; same contract here, with
``onchange=skip`` as the opt-out). The reference's consumers re-read
whole day partitions on a cron (dags/Queries_dag.py); a streaming
source turns the same table into a push-style feed any Spark sink
(including this package's stream_merge_sink) can consume.

Scale shape: offsets are snapshot sequence numbers (tiny JSON);
`partitions()` diffs the MANIFEST LIST between a snapshot and its
parent, so planning a micro-batch reads only the manifests the commit
added — O(new files), never O(table). Each new data file becomes one
input partition, read executor-side as Arrow record batches (the
Python-data-source path; at 1000 executors the per-file reads fan out
like any parquet scan).

Built on the public PySpark 4 Python Data Source API
(pyspark.sql.datasource) — no private interfaces.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

from ..tableformat import LakehouseTable
from .changelog import _classify

FORMAT_NAME = "lakehouse_stream"


def _arrow_type(dt: T.DataType) -> pa.DataType:
    m = {
        T.StringType: pa.string(),
        T.LongType: pa.int64(),
        T.IntegerType: pa.int32(),
        T.ShortType: pa.int16(),
        T.ByteType: pa.int8(),
        T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(),
        T.BooleanType: pa.bool_(),
        T.BinaryType: pa.binary(),
        T.DateType: pa.date32(),
        T.TimestampType: pa.timestamp("us"),
    }
    for k, v in m.items():
        if isinstance(dt, k):
            return v
    raise ValueError(f"unsupported streaming column type: {dt.simpleString()}")


class _FilePartition(InputPartition):
    def __init__(self, path: str, snapshot_id: int, renames: dict):
        self.path = path
        self.snapshot_id = snapshot_id
        # current name -> prior physical names; carried per partition
        # because read() runs executor-side on a pickled copy of the
        # reader whose state from partitions() may not travel
        self.renames = renames


def _project(tbl: pa.Table, schema: T.StructType, renames: dict) -> pa.Table:
    """Arrow projection of a physical parquet table onto the CURRENT
    logical schema: renamed columns resolve through their prior
    physical names, added columns null-fill."""
    cols = []
    names = []
    present = set(tbl.schema.names)
    n = tbl.num_rows
    for f in schema.fields:
        if f.name in present:
            cols.append(tbl.column(f.name))
        else:
            phys = next((p for p in renames.get(f.name, [])
                         if p in present), None)
            if phys is not None:
                cols.append(tbl.column(phys))
            else:
                cols.append(pa.nulls(n, type=_arrow_type(f.dataType)))
        names.append(f.name)
    return pa.table(cols, names=names)


class LakehouseStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: T.StructType):
        self._location = options.get("location")
        if not self._location:
            raise ValueError("option 'location' is required")
        self._on_change = options.get("onchange", "error")
        if self._on_change not in ("error", "skip"):
            raise ValueError("option 'onchange' must be 'error' or 'skip'")
        self._start = options.get("start", "earliest")
        mft = options.get("max-files-per-trigger")
        self._max_files = int(mft) if mft is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("max-files-per-trigger must be >= 1")
        # last batch-end sequence this reader planned or committed —
        # the admission-control cursor (driver-side reader instance
        # persists across micro-batches)
        self._pos: int | None = None
        self._schema = schema

    def _table(self) -> LakehouseTable:
        return LakehouseTable(self._location)

    @staticmethod
    def _max_seq(table: LakehouseTable) -> int:
        snaps = table.snapshots_list()
        return max((s.sequence for s in snaps), default=0)

    def initialOffset(self) -> dict:
        if self._start == "latest":
            self._pos = self._max_seq(self._table())
        else:
            self._pos = 0
        return {"seq": self._pos}

    def latestOffset(self) -> dict:
        """Next batch end. With ``max-files-per-trigger`` (Iceberg's
        streaming rate limit) the advance stops before the snapshot
        that would exceed the file budget — per-snapshot costs come
        from the commit summary (``added-files``), so throttling is
        metadata-only. The first snapshot past the cursor is always
        admitted (an oversized commit must still drain).

        Cursor recovery is total (verified against Spark 4's observed
        call order): fresh queries may see latestOffset BEFORE
        initialOffset, so an unset cursor seeds from the ``start``
        option exactly as initialOffset would; restarted queries —
        with the last batch committed OR uncommitted — re-plan the
        checkpointed batch first, whose ``partitions(start, end)``
        call reconciles the cursor before any latestOffset (traced on
        pyspark 4.1.2; partitions additionally reconciles from the
        START offset as defense in depth)."""
        snaps = sorted(self._table().snapshots_list(),
                       key=lambda s: s.sequence)
        mx = snaps[-1].sequence if snaps else 0
        if self._max_files is None:
            return {"seq": mx}
        if self._pos is None:
            # the engine may ask for the latest offset before
            # initialOffset (observed on fresh queries) — seed the
            # cursor the way initialOffset would. Restarts never reach
            # this branch: Spark 4 re-plans the checkpointed batch
            # first (verified for BOTH committed and uncommitted last
            # batches), and partitions() reconciles the cursor.
            self._pos = mx if self._start == "latest" else 0
        budget = self._max_files
        end = self._pos
        for snap in snaps:
            if snap.sequence <= self._pos:
                continue
            cost = (int(snap.summary.get("added-files", 0))
                    if _classify(snap) == "insert" else 0)
            if end > self._pos and budget - cost < 0:
                break
            budget -= cost
            end = snap.sequence
        return {"seq": end}

    def partitions(self, start: dict, end: dict):
        # reconcile the admission cursor from BOTH offsets (checkpoint
        # restarts re-plan the last batch before any latestOffset —
        # initialOffset is never called there)
        self._pos = max(self._pos or 0, start["seq"], end["seq"])
        return self._plan(start, end)

    def _plan(self, start: dict, end: dict):
        t = self._table()
        meta = t.load_metadata()
        renames = t.column_renames(meta)
        snaps = sorted(t.snapshots_list(meta), key=lambda s: s.sequence)
        by_id = {s.snapshot_id: s for s in snaps}
        parts: list[_FilePartition] = []
        for snap in snaps:
            if not (start["seq"] < snap.sequence <= end["seq"]):
                continue
            kind = _classify(snap)
            if kind == "skip":
                continue
            if kind != "insert":
                if self._on_change == "skip":
                    continue
                raise ValueError(
                    f"snapshot {snap.snapshot_id} is a {kind} change; the "
                    "streaming source reads APPEND snapshots only (set "
                    ".option('onchange', 'skip') to pass over row-level "
                    "changes, or consume changelog_df for full CDC)"
                )
            parent = by_id.get(snap.parent_id)
            prev = set(parent.manifests) if parent is not None else set()
            for m in snap.manifests:
                if m in prev:
                    continue
                for e in t.read_manifest_entries(m):
                    if e["added_snapshot_id"] != snap.snapshot_id:
                        continue
                    parts.append(_FilePartition(
                        os.path.join(t._local_root, e["file_path"]),
                        snap.snapshot_id,
                        renames,
                    ))
        return parts

    def read(self, partition: _FilePartition) -> Iterator[pa.RecordBatch]:
        out = _project(pq.read_table(partition.path), self._schema,
                       partition.renames)
        for b in out.to_batches():
            yield b

    def commit(self, end: dict) -> None:
        self._pos = max(self._pos or 0, end["seq"])


class LakehouseStreamDataSource(DataSource):
    """`spark.dataSource.register(LakehouseStreamDataSource)`, then
    `spark.readStream.format("lakehouse_stream")
    .option("location", path).load()`.

    Options: ``location`` (table path, required), ``start``
    ('earliest' streams existing rows as the first batch, 'latest'
    only new commits), ``onchange`` ('error' | 'skip' for non-append
    snapshots), ``max-files-per-trigger`` (admission control: cap the
    data files admitted per micro-batch; snapshot boundaries are
    respected, an oversized single commit still drains)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        loc = self.options.get("location")
        if not loc:
            raise ValueError("option 'location' is required")
        t = LakehouseTable(loc)
        return T.StructType.fromJson(
            json.loads(t.load_metadata()["schema_json"])
        )

    def streamReader(self, schema: T.StructType) -> LakehouseStreamReader:
        return LakehouseStreamReader(dict(self.options), schema)


# ---------------- CDC changelog streaming source ----------------

CDC_FORMAT_NAME = "lakehouse_cdc"


def _parent_delete_specs(t: LakehouseTable, parent) -> list[tuple]:
    """The parent snapshot's pending-delete files as picklable specs
    ``(delete_file_path, seq, kind, fp_lo, fp_hi)`` (kind 'pos' | 'dv';
    bounds = the delete file's referenced-data-file range from manifest
    stats). Metadata-only: reads manifests, never delete-file rows."""
    specs: list[tuple] = []
    if parent is None:
        return specs
    for m in parent.delete_manifests:
        info = parent.delete_manifest_meta.get(m, {})
        mkind = info.get("kind")
        if mkind == "equality":
            continue
        seq = int(info.get("seq", 0))
        for e in t.read_manifest_entries(m):
            specs.append((
                e["file_path"], seq, "dv" if mkind == "dv" else "pos",
                (e.get("str_mins") or {}).get("file_path"),
                (e.get("str_maxs") or {}).get("file_path"),
            ))
    return specs


def _prune_specs(specs: list[tuple], lo: str | None,
                 hi: str | None) -> list[tuple]:
    """Keep only delete files whose referenced-data-file bounds can
    overlap [lo, hi] (unknown bounds are kept)."""
    if lo is None or hi is None:
        return specs
    return [s for s in specs
            if s[3] is None or s[4] is None or (s[4] >= lo and s[3] <= hi)]


def _removed_files(t: LakehouseTable, snap, parent) -> list[str]:
    """Data files present in the parent but absent from ``snap``,
    diffing only the manifests the commit swapped out/in."""
    if parent is None:
        return []
    old_ms = [m for m in parent.manifests if m not in set(snap.manifests)]
    if not old_ms:
        return []
    new_ms = [m for m in snap.manifests if m not in set(parent.manifests)]
    present = {e["file_path"] for m in new_ms
               for e in t.read_manifest_entries(m)}
    return sorted({e["file_path"] for m in old_ms
                   for e in t.read_manifest_entries(m)}
                  - present)


def _pending_positions(data_fp: str, specs: list[tuple], root: str) -> set:
    """Executor-side: the parent's pending deleted positions of one
    data file. The newest DV for the file is a superset of everything
    pending when it was written; later position rows union on top, so
    newest-DV ∪ all-position-rows is exact in every commit order."""
    from ..tableformat.dv import unpack_positions

    dv_blob, dv_seq = None, -1
    pending: set = set()
    for path, seq, kind, lo, hi in specs:
        if lo is not None and hi is not None and not (lo <= data_fp <= hi):
            continue
        full = os.path.join(root, path)
        if kind == "dv":
            tbl = pq.read_table(full, columns=["file_path", "dv"])
            for fp, blob in zip(tbl.column("file_path").to_pylist(),
                                tbl.column("dv").to_pylist()):
                if fp == data_fp and seq > dv_seq:
                    dv_blob, dv_seq = blob, seq
        else:
            tbl = pq.read_table(
                full, columns=["file_path", "pos"],
                filters=[("file_path", "==", data_fp)])
            pending.update(tbl.column("pos").to_pylist())
    if dv_blob is not None:
        pending.update(unpack_positions(dv_blob).tolist())
    return pending


class _CDCPartition(InputPartition):
    """One unit of changelog work, planned metadata-only:

    * kind='insert' — one data file the snapshot ADDED; its rows stream
      as _change_type='insert'.
    * kind='delete' — one POSITION-DELETE file the snapshot added; the
      executor reads its (file, pos) pairs (bounded: delete files are
      written ROWS_PER_DELETE_FILE-capped) and fetches exactly those
      rows from the referenced data files as _change_type='delete'. A
      pair appears in exactly one delete manifest (MOR planning scans
      with prior deletes applied), so no already-deleted row re-emits.
    * kind='dv' — one DELETION-VECTOR file the snapshot added. A DV is
      the touched data file's FULL pending set (merge-on-write
      superset), so the rows deleted BY THIS COMMIT are its positions
      minus the parent's pending deletes; ``specs`` carries the
      parent's delete-file list (path, seq, kind, file_path bounds),
      pruned driver-side against the DV file's referenced-data-file
      bounds, and the executor computes the per-file delta.
    * kind='removed' — one data file this commit dropped metadata-only
      (full-file MOR delete / drop-partitions / truncate); every LIVE
      parent row (all positions minus the parent pending set from
      ``specs``) emits as a delete.
    """

    def __init__(self, kind: str, path: str, root: str,
                 snapshot_id: int, renames: dict,
                 specs: list | None = None):
        self.kind = kind
        self.path = path
        self.root = root
        self.snapshot_id = snapshot_id
        self.renames = renames
        self.specs = specs or []


class LakehouseCDCStreamReader(DataSourceStreamReader):
    """Streaming CDC feed: every committed row-level change, tagged
    ``_change_type`` ('insert' | 'delete') + ``_snapshot_id`` — the
    streaming twin of ``changelog_df`` (same classification), built on
    the same offsets-by-sequence/checkpoint contract as
    `LakehouseStreamReader`. Supported exactly: appends, MOR deletes,
    MOR upserts; maintenance rewrites emit nothing. Content rewrites
    (CoW ops) and equality deletes raise — or skip with
    ``.option('onchange', 'skip')`` — matching changelog_df's refusal
    to fabricate row-level attribution it cannot prove."""

    def __init__(self, options: dict, schema: T.StructType):
        self._location = options.get("location")
        if not self._location:
            raise ValueError("option 'location' is required")
        self._on_change = options.get("onchange", "error")
        if self._on_change not in ("error", "skip"):
            raise ValueError("option 'onchange' must be 'error' or 'skip'")
        self._start = options.get("start", "earliest")
        self._schema = schema
        # table columns only (the two _-prefixed CDC columns are ours)
        self._base_schema = T.StructType(
            [f for f in schema.fields
             if f.name not in ("_change_type", "_snapshot_id")]
        )

    def _table(self) -> LakehouseTable:
        return LakehouseTable(self._location)

    def initialOffset(self) -> dict:
        if self._start == "latest":
            return {"seq": LakehouseStreamReader._max_seq(self._table())}
        return {"seq": 0}

    def latestOffset(self) -> dict:
        return {"seq": LakehouseStreamReader._max_seq(self._table())}

    def partitions(self, start: dict, end: dict):
        t = self._table()
        meta = t.load_metadata()
        renames = t.column_renames(meta)
        snaps = sorted(t.snapshots_list(meta), key=lambda s: s.sequence)
        by_id = {s.snapshot_id: s for s in snaps}
        parts: list[_CDCPartition] = []
        for snap in snaps:
            if not (start["seq"] < snap.sequence <= end["seq"]):
                continue
            kind = _classify(snap)
            if kind == "skip":
                continue
            if kind in ("unsupported", "eq-delete", "eq-upsert"):
                if self._on_change == "skip":
                    continue
                raise ValueError(
                    f"snapshot {snap.snapshot_id} ({snap.operation}/"
                    f"{snap.summary.get('op')}) cannot stream row-level: "
                    "the CDC source supports appends and merge-on-read "
                    "deletes/upserts (set .option('onchange','skip') to "
                    "pass over it, or consume changelog_df driver-side "
                    "for equality deletes)"
                )
            parent = by_id.get(snap.parent_id)
            if kind in ("insert", "mor-upsert"):
                prev = set(parent.manifests) if parent is not None else set()
                for m in snap.manifests:
                    if m in prev:
                        continue
                    for e in t.read_manifest_entries(m):
                        if e["added_snapshot_id"] != snap.snapshot_id:
                            continue
                        parts.append(_CDCPartition(
                            "insert", e["file_path"], t._local_root,
                            snap.snapshot_id, renames))
            if kind in ("mor-delete", "mor-upsert"):
                parent_dm = (set(parent.delete_manifests)
                             if parent is not None else set())
                parent_specs = _parent_delete_specs(t, parent)
                for m in snap.delete_manifests:
                    if m in parent_dm:
                        continue
                    info = snap.delete_manifest_meta.get(m, {})
                    if info.get("kind") == "equality":
                        continue
                    is_dv = info.get("kind") == "dv"
                    for e in t.read_manifest_entries(m):
                        if is_dv:
                            lo = (e.get("str_mins") or {}).get("file_path")
                            hi = (e.get("str_maxs") or {}).get("file_path")
                            parts.append(_CDCPartition(
                                "dv", e["file_path"], t._local_root,
                                snap.snapshot_id, renames,
                                _prune_specs(parent_specs, lo, hi)))
                        else:
                            parts.append(_CDCPartition(
                                "delete", e["file_path"], t._local_root,
                                snap.snapshot_id, renames))
                # files this commit REMOVED metadata-only (full-file MOR
                # delete / drop-partitions / truncate): diff only the
                # CHANGED manifests — O(changed entries), never O(table)
                removed = _removed_files(t, snap, parent)
                if removed and parent is not None and any(
                    parent.delete_manifest_meta.get(m, {}).get("kind")
                    == "equality" for m in parent.delete_manifests
                ):
                    # a removed file's live set depends on the parent's
                    # equality deletes, which are key- not position-
                    # scoped — refuse rather than fabricate (same stance
                    # as changelog_df's eq handling, which resolves them
                    # driver-side with a full scan plan)
                    if self._on_change == "skip":
                        removed = []
                    else:
                        raise ValueError(
                            f"snapshot {snap.snapshot_id} removes whole "
                            "files while the parent has pending equality "
                            "deletes; the CDC source cannot attribute "
                            "live rows executor-side (set .option("
                            "'onchange','skip') or use changelog_df)"
                        )
                for fp in removed:
                    parts.append(_CDCPartition(
                        "removed", fp, t._local_root,
                        snap.snapshot_id, renames,
                        _prune_specs(parent_specs, fp, fp)))
        return parts

    def read(self, partition: _CDCPartition) -> Iterator[pa.RecordBatch]:
        import collections

        sid = partition.snapshot_id
        if partition.kind == "insert":
            rows = _project(
                pq.read_table(os.path.join(partition.root, partition.path)),
                self._base_schema, partition.renames)
            tagged = rows.append_column(
                "_change_type", pa.array(["insert"] * rows.num_rows))
            tagged = tagged.append_column(
                "_snapshot_id", pa.array([sid] * rows.num_rows,
                                         type=pa.int64()))
            yield from tagged.to_batches()
            return
        pairs: dict[str, list[int]] = collections.defaultdict(list)
        if partition.kind == "dv":
            from ..tableformat.dv import unpack_positions

            dd = pq.read_table(os.path.join(partition.root, partition.path),
                               columns=["file_path", "dv"])
            for fp, blob in zip(dd.column("file_path").to_pylist(),
                                dd.column("dv").to_pylist()):
                delta = (set(unpack_positions(blob).tolist())
                         - _pending_positions(fp, partition.specs,
                                              partition.root))
                if delta:
                    pairs[fp] = sorted(delta)
        elif partition.kind == "removed":
            fp = partition.path
            n = pq.read_metadata(
                os.path.join(partition.root, fp)).num_rows
            live = (set(range(n))
                    - _pending_positions(fp, partition.specs,
                                         partition.root))
            if live:
                pairs[fp] = sorted(live)
        else:
            dd = pq.read_table(os.path.join(partition.root, partition.path))
            for fp, pos in zip(dd.column("file_path").to_pylist(),
                               dd.column("pos").to_pylist()):
                pairs[fp].append(pos)
        for fp in sorted(pairs):
            data = pq.read_table(os.path.join(partition.root, fp))
            take = data.take(sorted(pairs[fp]))
            rows = _project(take, self._base_schema, partition.renames)
            tagged = rows.append_column(
                "_change_type", pa.array(["delete"] * rows.num_rows))
            tagged = tagged.append_column(
                "_snapshot_id", pa.array([sid] * rows.num_rows,
                                         type=pa.int64()))
            yield from tagged.to_batches()

    def commit(self, end: dict) -> None:
        pass


class LakehouseCDCDataSource(DataSource):
    """`spark.dataSource.register(LakehouseCDCDataSource)`, then
    `spark.readStream.format("lakehouse_cdc")
    .option("location", path).load()` → the table's columns +
    ``_change_type`` + ``_snapshot_id``, streamed incrementally.
    Options as `LakehouseStreamDataSource`."""

    @classmethod
    def name(cls) -> str:
        return CDC_FORMAT_NAME

    def schema(self):
        loc = self.options.get("location")
        if not loc:
            raise ValueError("option 'location' is required")
        t = LakehouseTable(loc)
        base = T.StructType.fromJson(
            json.loads(t.load_metadata()["schema_json"]))
        return T.StructType(
            list(base.fields)
            + [T.StructField("_change_type", T.StringType()),
               T.StructField("_snapshot_id", T.LongType())]
        )

    def streamReader(self, schema: T.StructType) -> LakehouseCDCStreamReader:
        return LakehouseCDCStreamReader(dict(self.options), schema)
