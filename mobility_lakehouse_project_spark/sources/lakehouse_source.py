"""`lakehouse` Python Data Source — the table format exposed through
Spark's OWN source API (pyspark.sql.datasource, Spark 4):

    spark.dataSource.register(LakehouseDataSource)
    spark.read.format("lakehouse").load(location)              # batch
    spark.readStream.format("lakehouse").load(location)        # incremental

This is the idiomatic-Spark face of the engine: Catalyst plans the
query, calls ``pushFilters`` with the WHERE conjuncts, and the source
answers with a file-pruned plan driven by the SAME manifest machinery
every native operator uses — manifest-list bounds skip whole manifests,
per-file min/max stats skip files, and only the surviving files become
input partitions. Filters are reported back as un-handled, so Spark
re-applies them row-level: pruning is pure I/O savings, exactness is
Spark's. (Reference entry point analog: the DuckDB `read_parquet` scans
in dags/Queries_dag.py:54-95 — here the scan is snapshot-isolated and
stats-pruned instead of a directory glob.)

The STREAMING side reads the commit log incrementally: offsets are
commit sequence numbers, each micro-batch is exactly the data files
added by the snapshots in (start, end] — deterministic replay from any
checkpointed offset because snapshots are immutable. Append commits
stream; metadata-only commits are skipped; content-changing commits
(overwrite/delete/merge) fail the stream unless
``skip_change_snapshots`` is set — Iceberg's
streaming-skip-overwrite/delete-snapshots semantics.

Scale note: like every file-based Spark source (and Iceberg's own
planning), the DRIVER enumerates the pruned file list to build input
partitions — O(surviving files) after manifest+stats pruning, never
the full manifest row set.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from ..tableformat.table import LakehouseTable

_DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024


@dataclass
class _FileSplit(InputPartition):
    """One task's worth of data files (bin-packed to ~split_bytes)."""

    paths: list  # absolute parquet paths
    seqs: list = None  # parallel commit sequences (streaming lineage)


def _location(options) -> str:
    loc = options.get("location") or options.get("path")
    if not loc:
        # catalog addressing: .option("warehouse", ...) + .option("table",
        # "ns.name") resolves through the same Catalog the SQL front-end
        # uses (refusing views — a source reads tables, not definitions)
        wh, tbl = options.get("warehouse"), options.get("table")
        if wh and tbl:
            from ..tableformat.catalog import Catalog

            return Catalog(wh).load_table(tbl).location
        raise ValueError(
            "lakehouse source needs a table location: .load(<location>), "
            ".option('location', ...), or .option('warehouse', ...) + "
            ".option('table', 'ns.name')")
    return loc


def _spark_schema(table: LakehouseTable) -> T.StructType:
    meta = table.load_metadata()
    return T.StructType.fromJson(json.loads(meta["schema_json"]))


def _arrow_schema(schema: T.StructType) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _ranges_from_filters(filters, schema: T.StructType) -> dict:
    """Translate pushed Catalyst filters into the engine's
    ``int_ranges`` hint dict ({col: (lo, hi)} — the manifest/stats
    pruning currency). Only top-level columns of integer or string
    type participate; everything else is ignored (the filters are
    all re-applied by Spark regardless)."""
    kinds = {}
    for f in schema.fields:
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType,
                                   T.ByteType, T.DateType)):
            kinds[f.name] = "int"
        elif isinstance(f.dataType, T.StringType):
            kinds[f.name] = "str"
    ranges: dict = {}

    def narrow(col, lo=None, hi=None):
        cur_lo, cur_hi = ranges.get(col, (None, None))
        if lo is not None:
            cur_lo = lo if cur_lo is None else max(cur_lo, lo)
        if hi is not None:
            cur_hi = hi if cur_hi is None else min(cur_hi, hi)
        ranges[col] = (cur_lo, cur_hi)

    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        col = attr[0]
        kind = kinds.get(col)
        if kind is None:
            continue
        v = getattr(f, "value", None)
        ok_type = isinstance(v, (int, str)) and not isinstance(v, bool)
        if not ok_type:
            continue
        if (kind == "int") != isinstance(v, int):
            continue
        if isinstance(f, EqualTo):
            narrow(col, lo=v, hi=v)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            # strict vs inclusive collapses for file-level pruning:
            # [v, inf) is a superset of (v, inf) — conservative
            narrow(col, lo=v)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            narrow(col, hi=v)
    return {c: b for c, b in ranges.items() if b != (None, None)}


def _entry_overlaps(entry: dict, int_ranges: dict,
                    skip_lower: frozenset = frozenset()) -> bool:
    """Per-file stats test — same semantics as plan_files' row-level
    filter (files missing the stat are kept). ``int_ranges`` must be
    NORMALIZED (double bounds in the encoded domain,
    ``LakehouseTable._normalize_ranges``); ``skip_lower`` names
    columns whose lower test is NaN-unsafe and disabled."""
    for col, (lo, hi) in int_ranges.items():
        is_str = isinstance(lo, str) or isinstance(hi, str)
        mins = entry.get("str_mins" if is_str else "int_mins") or {}
        maxs = entry.get("str_maxs" if is_str else "int_maxs") or {}
        if col not in mins or col not in maxs:
            continue
        if lo is not None and col not in skip_lower and maxs[col] < lo:
            return False
        if hi is not None and mins[col] > hi:
            return False
    return True


def _bin_pack(entries: list[dict], root: str, split_bytes: int,
              with_seq: dict | None = None) -> list[_FileSplit]:
    splits: list[_FileSplit] = []
    cur: list[str] = []
    cur_seq: list[int] = []
    cur_bytes = 0
    for e in entries:
        p = os.path.join(root, e["file_path"])
        if cur and cur_bytes + e["file_size_bytes"] > split_bytes:
            splits.append(_FileSplit(cur, cur_seq))
            cur, cur_seq, cur_bytes = [], [], 0
        cur.append(p)
        if with_seq is not None:
            cur_seq.append(with_seq[e["file_path"]])
        cur_bytes += e["file_size_bytes"]
    if cur:
        splits.append(_FileSplit(cur, cur_seq))
    return splits


def _read_files(paths: Sequence[str],
                target: pa.Schema) -> Iterator[pa.RecordBatch]:
    """Executor-side parquet read: project to the logical schema (data
    files may carry extra physical columns — _lh_row_id lineage — and
    files predating a schema addition read missing columns as null),
    cast to the exact Arrow types Spark expects, stream batches."""
    names = set(target.names)
    for p in paths:
        pf = pq.ParquetFile(p)
        have = [c for c in pf.schema_arrow.names if c in names]
        tbl = pf.read(columns=have)
        n = tbl.num_rows
        cols = []
        for field in target:
            if field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(n, type=field.type))
        yield from pa.table(cols, schema=target).to_batches()


class LakehouseBatchReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options):
        self._schema = schema
        self._options = options
        self._int_ranges: dict = {}
        self._table = LakehouseTable(_location(options))
        snap_id = options.get("snapshot_id")
        ref = options.get("ref")
        meta = self._table.load_metadata()
        if ref:
            snap_id = (self._table.tags(meta).get(ref)
                       or self._table.branches(meta).get(ref))
            if snap_id is None:
                raise ValueError(f"no tag or branch {ref!r}")
        self._snap = (self._table.snapshot_by_id(int(snap_id))
                      if snap_id is not None
                      else self._table.current_snapshot(meta))
        if self._snap is not None and self._snap.delete_manifests:
            raise ValueError(
                "lakehouse source cannot apply pending merge-on-read "
                "deletes; fold them first (rewrite_position_deletes) or "
                "read via LakehouseTable.scan()")
        self._meta = meta

    def pushFilters(self, filters):
        self._int_ranges = _ranges_from_filters(filters, self._schema)
        # report every filter un-handled: Spark re-applies them all
        # row-level; ours are advisory file pruning only
        return filters

    def partitions(self):
        if self._snap is None:
            return [_FileSplit([], [])]
        subset, _ = self._table._prune_manifests(
            self._snap, self._meta,
            int_ranges=self._int_ranges or None)
        # entry-level test runs in the NORMALIZED domain (doubles are
        # stored encoded; their lower test is NaN-unsafe and disabled)
        norm, skip_lower = self._table._normalize_ranges(
            self._int_ranges or None)
        entries = []
        for m in subset:
            for e in self._table.read_manifest_entries(m):
                if not norm or _entry_overlaps(e, norm,
                                               frozenset(skip_lower)):
                    entries.append(e)
        split_bytes = int(self._options.get("split_bytes",
                                            _DEFAULT_SPLIT_BYTES))
        splits = _bin_pack(entries, self._table._local_root, split_bytes)
        return splits or [_FileSplit([], [])]

    def read(self, partition: _FileSplit):
        yield from _read_files(partition.paths, _arrow_schema(self._schema))


_SKIP_OPS = {"rewrite-manifests", "expire-snapshots"}


class LakehouseStreamReader(DataSourceStreamReader):
    """Micro-batch incremental read: offset = commit sequence; a batch
    is the data files ADDED by snapshots in (start, end]. Replayable:
    the same offset range always yields the same files (snapshots are
    immutable; expired history raises rather than silently dropping)."""

    def __init__(self, schema: T.StructType, options):
        self._schema = schema
        self._options = options
        self._table = LakehouseTable(_location(options))
        self._skip_changes = str(
            options.get("skip_change_snapshots", "false")).lower() == "true"
        start = options.get("starting_sequence")
        if start is not None:
            self._initial = {"sequence": int(start)}
        else:
            meta = self._table.load_metadata()
            self._initial = {"sequence": int(meta["last_sequence"])}
        # rate limiting (Iceberg streaming-max-files-per-micro-batch
        # analog, at commit granularity): cap how far latestOffset
        # advances past the previously announced offset, so a stream
        # catching up on a long backlog takes bounded bites instead of
        # one giant first batch. Offset->files stays deterministic for
        # any (start, end] range, so exactly-once replay is unaffected.
        max_seqs = options.get("max_sequences_per_batch")
        self._max_seqs = int(max_seqs) if max_seqs is not None else None
        if self._max_seqs is not None and self._max_seqs < 1:
            raise ValueError("max_sequences_per_batch must be >= 1")
        self._announced = int(self._initial["sequence"])

    def initialOffset(self) -> dict:
        return self._initial

    def latestOffset(self) -> dict:
        meta = self._table.load_metadata()
        last = int(meta["last_sequence"])
        if self._max_seqs is not None:
            last = min(last, self._announced + self._max_seqs)
            if last > self._announced:
                self._announced = last
        return {"sequence": last}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["sequence"], end["sequence"]
        # restart sync: the engine's committed offset (batch start) is
        # the true progress floor — without this, a restarted reader's
        # rate cap would re-announce offsets below the checkpoint
        if self._announced < hi:
            self._announced = hi
        if hi <= lo:
            return []
        meta = self._table.load_metadata()
        snaps = sorted(self._table.snapshots_list(meta),
                       key=lambda s: s.sequence)
        window = [s for s in snaps if lo < s.sequence <= hi]
        by_id = {s.snapshot_id: s for s in snaps}
        # expired history guard: the earliest snapshot we need must
        # still exist (its parent may be expired — that's fine, we
        # diff manifests against the parent's LIST which each snapshot
        # carries itself only via parent lookup; a missing parent for
        # the first window snapshot means we cannot diff)
        entries: list[dict] = []
        seq_of: dict[str, int] = {}
        for s in window:
            if s.operation in _SKIP_OPS:
                continue
            if s.operation != "append":
                if self._skip_changes:
                    continue
                raise ValueError(
                    f"snapshot {s.snapshot_id} is a content-changing "
                    f"{s.operation!r} commit; the lakehouse stream reads "
                    "appends only — set skip_change_snapshots=true to "
                    "pass over it (Iceberg streaming-skip-*-snapshots)")
            parent = by_id.get(s.parent_id)
            if s.parent_id is not None and parent is None:
                # without the parent's manifest list we cannot tell the
                # commit's NEW manifests from carried ones — re-emitting
                # old files would break exactly-once, so refuse
                raise ValueError(
                    f"snapshot {s.snapshot_id}'s parent expired; cannot "
                    "replay from before the retained history")
            parent_manifests = set(parent.manifests) if parent else set()
            for m in s.manifests:
                if m in parent_manifests:
                    continue
                for e in self._table.read_manifest_entries(m):
                    # an append's new manifest holds exactly its files
                    entries.append(e)
                    seq_of[e["file_path"]] = s.sequence
        split_bytes = int(self._options.get("split_bytes",
                                            _DEFAULT_SPLIT_BYTES))
        return _bin_pack(entries, self._table._local_root, split_bytes,
                         with_seq=seq_of)

    def read(self, partition: _FileSplit):
        yield from _read_files(partition.paths, _arrow_schema(self._schema))

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the query checkpoint


class LakehouseDataSource(DataSource):
    """spark.dataSource.register(LakehouseDataSource) then
    spark.read.format("lakehouse").load(location)."""

    @classmethod
    def name(cls) -> str:
        return "lakehouse"

    def schema(self):
        return _spark_schema(LakehouseTable(_location(self.options)))

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return LakehouseBatchReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return LakehouseStreamReader(schema, self.options)

    def writer(self, schema: T.StructType, overwrite: bool):
        return LakehouseBatchWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return LakehouseStreamWriter(schema, self.options, overwrite)


def register_lakehouse_source(spark) -> None:
    # get_spark sets this at build time; set it here too for sessions
    # built elsewhere (it is a planning conf, runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseDataSource)


# ---------------- write side ----------------


@dataclass
class _WriteResult(WriterCommitMessage):
    entries: list  # manifest entries for the files this task wrote


def _stats_of(tbl: pa.Table) -> tuple[dict, dict, dict, dict]:
    """Per-file min/max stats from the Arrow data — the same manifest
    currency the native writers record (ints -> int_mins/maxs, strings
    -> str_mins/maxs; all-null or other-typed columns skipped)."""
    import pyarrow.compute as pc

    int_mins: dict = {}
    int_maxs: dict = {}
    str_mins: dict = {}
    str_maxs: dict = {}
    for field in tbl.schema:
        col = tbl.column(field.name)
        if col.null_count == len(col):
            continue
        if pa.types.is_integer(field.type):
            mm = pc.min_max(col)
            int_mins[field.name] = mm["min"].as_py()
            int_maxs[field.name] = mm["max"].as_py()
        elif pa.types.is_string(field.type) or pa.types.is_large_string(field.type):
            mm = pc.min_max(col)
            str_mins[field.name] = mm["min"].as_py()
            str_maxs[field.name] = mm["max"].as_py()
    return int_mins, int_maxs, str_mins, str_maxs


class LakehouseBatchWriter(DataSourceArrowWriter):
    """`df.write.format("lakehouse").mode("append")` — each task writes
    its batches as table-layout parquet files (grouped by partition
    value) and reports manifest entries; the DRIVER commit is ONE
    atomic commit_append through the same CAS as every native writer,
    so a failed job leaves only orphan files (GC'd by
    remove_orphan_files), never a partial commit.

    Identity partition transforms only: bucket[]/truncate/date
    transforms are Catalyst expressions (xxhash64 has no stable Python
    twin — see partition_values_of) and those tables must be written
    via LakehouseTable.append."""

    def __init__(self, schema: T.StructType, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "lakehouse source supports mode('append') only; use "
                "LakehouseTable.commit_replace / CTAS for overwrite")
        self._options = options
        table = LakehouseTable(_location(options))
        meta = table.load_metadata()
        if (meta.get("partition_col") is not None
                and table.partition_transform(meta) != "identity"):
            raise ValueError(
                f"lakehouse source writes identity-partitioned tables "
                f"only (table uses {table.partition_transform(meta)!r}); "
                "write via LakehouseTable.append")
        declared = T.StructType.fromJson(json.loads(meta["schema_json"]))
        if [f.name for f in schema.fields] != [f.name for f in declared.fields]:
            raise ValueError(
                f"schema mismatch: writing {[f.name for f in schema.fields]} "
                f"into table columns {[f.name for f in declared.fields]}")
        self._location = table.location
        self._pcol = meta.get("partition_col")

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _WriteResult:
        import uuid as _uuid

        table = LakehouseTable(self._location)
        root = table._local_root
        batches = list(iterator)
        if not batches:
            return _WriteResult([])
        data = pa.Table.from_batches(batches)
        write_id = _uuid.uuid4().hex[:12]
        entries = []
        if self._pcol is None:
            groups = [("", data)]
        else:
            import pyarrow.compute as pc

            keys = pc.unique(data.column(self._pcol))
            groups = [
                (k.as_py(),
                 data.filter(pc.equal(data.column(self._pcol), k)))
                for k in keys
            ]
        for pid_val, part in groups:
            pid = str(pid_val)
            rel_dir = (os.path.join("data", f"snap-{write_id}", f"_p={pid}")
                       if self._pcol is not None
                       else os.path.join("data", f"snap-{write_id}"))
            os.makedirs(os.path.join(root, rel_dir), exist_ok=True)
            rel = os.path.join(
                rel_dir, f"part-{_uuid.uuid4().hex[:16]}.zstd.parquet")
            fp = os.path.join(root, rel)
            pq.write_table(part, fp, compression="zstd")
            im, ix, sm, sx = _stats_of(part)
            entries.append({
                "file_path": rel,
                "partition_id": pid,
                "record_count": part.num_rows,
                "file_size_bytes": os.path.getsize(fp),
                "added_snapshot_id": -1,
                "int_mins": im, "int_maxs": ix,
                "str_mins": sm, "str_maxs": sx,
            })
        return _WriteResult(entries)

    def _all_entries(self, messages) -> list[dict]:
        return [e for m in messages if m is not None for e in m.entries]

    def commit(self, messages) -> None:
        entries = self._all_entries(messages)
        if entries:
            LakehouseTable(self._location).commit_append(
                entries, summary={"writer": "datasource"})

    def abort(self, messages) -> None:
        table = LakehouseTable(self._location)
        for e in self._all_entries(messages):
            fp = os.path.join(table._local_root, e["file_path"])
            if os.path.exists(fp):
                os.remove(fp)


class LakehouseStreamWriter(LakehouseBatchWriter, DataSourceStreamArrowWriter):
    """`writeStream.format("lakehouse")` — exactly-once append sink:
    every micro-batch commits atomically with its epoch id in the
    commit summary, and a REPLAYED batch (restart between sink commit
    and checkpoint advance) is detected by scanning recent summaries
    for the same (stream-id, epoch) and dropped — its files deleted,
    no duplicate commit. Same idempotency idiom as
    streaming/incremental.py's foreachBatch sink, expressed through
    Spark's own sink API."""

    def commit(self, messages, batchId: int) -> None:  # type: ignore[override]
        entries = self._all_entries(messages)
        table = LakehouseTable(self._location)
        stream_id = self._options.get("stream_id", "datasource-stream")
        for s in table.snapshots_list():
            summ = s.summary or {}
            if (summ.get("stream-id") == stream_id
                    and summ.get("stream-epoch") == batchId):
                # replayed epoch: drop this attempt's files, keep the
                # original commit — exactly-once
                self.abort(messages)
                return
        if entries:
            table.commit_append(
                entries,
                summary={"writer": "datasource", "stream-id": stream_id,
                         "stream-epoch": batchId})

    def abort(self, messages, batchId: int | None = None) -> None:  # type: ignore[override]
        LakehouseBatchWriter.abort(self, messages)
