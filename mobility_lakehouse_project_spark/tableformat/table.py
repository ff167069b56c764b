"""Iceberg-style table format, implemented from scratch on parquet + JSON.

The reference delegates this layer to DuckLake: Postgres-hosted catalog
metadata + parquet data files on S3, with commits as catalog
transactions (`ATTACH 'ducklake:postgres:...' (DATA_PATH 's3://...')`,
dags/Gold_Chunked_Dag.py:36-41). We re-implement that split natively:

    <location>/
      metadata/
        v<N>.metadata.json        # schema, snapshot log, current snapshot
        version-hint.text         # atomic pointer to the current version
        manifests/manifest-*.parquet   # one row per data file + stats
      data/snap-<writeid>/[_p=<v>/]part-*.parquet
      _lineage/<op_id>/<chunk>.json    # maintenance checkpoints

Commit = write v<N+1>.metadata.json, then atomically swap
version-hint.text (tmp + os.replace), validating the expected parent
snapshot id first — the single-writer analog of DuckLake's Postgres
transaction (SURVEY.md §7.0). Snapshot isolation: readers resolve the
hint once and only ever see a fully-committed file list; time travel =
reading an older snapshot's manifests.

Manifests are parquet so the *metadata itself is a Spark DataFrame*
(``table.files(spark)`` / ``snapshots`` / ``manifests``) — maintenance
planning (compaction grouping, expiry reachability) runs as DataFrame
scans of these tables, per the north-star requirement. At 10^12-image
scale the manifest set is millions of rows: far too big to collect,
fine to scan/aggregate distributed; driver-side pyarrow is used only
for writing manifest files at commit time (the writer-side stats
collection that, on a real cluster, arrives via task commit messages).

Partitioning follows Iceberg's model: the partition value is *derived*
from a data column that stays in the data files (here the column
itself, identity transform); the physical layout duplicates it as an
``_p=<value>`` directory so partition-targeted rewrites are file-level
operations. Per-file min/max stats for integer-ish and string columns
make scans prunable without any secondary index — the engine's answer
to the reference's ART indexes (src/sql/silver.sql:123-132).
"""

from __future__ import annotations

import contextlib
import datetime
import glob as globmod
import json
import math
import os
import re
import shutil
import struct
import time
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PART_DIR = "_p"
# physical row-lineage column materialized into rewritten data files
# (compaction/clustering/CoW): carries each surviving row's original
# _row_id through the rewrite. Never part of the logical schema.
_LH_ROW_ID = "_lh_row_id"
# physical twin for the second row-lineage field: the commit sequence
# that last UPDATED the row. Rewrites that merely carry a row forward
# (compaction, clustering, CoW survivors, delete fold) materialize it
# so the new file's own sequence doesn't masquerade as an update;
# rows genuinely written/updated by a commit leave it null and inherit
# the file's sequence at read time (Iceberg v3 inheritance).
_LH_LAST_SEQ = "_lh_last_seq"
_STAT_TYPES = (T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.DateType)
_DOUBLE_STAT_TYPES = (T.DoubleType, T.FloatType)


def double_order_key(x: float) -> int:
    """Order-preserving int64 image of an IEEE-754 double (the Lucene/
    ORC sortable-bits idiom, public): non-negative doubles map to their
    raw bits, negatives to ``2^63 - bits`` — total order over all
    non-NaN doubles incl. infinities matches ``<`` (monotonicity is
    property-tested). Double/float column stats live in the manifest
    int_mins/int_maxs maps in THIS domain; NaN has no image (a file
    whose footer min/max is NaN is poisoned, and range pruning keeps
    the NaN-safe test only — see ``_normalize_ranges``)."""
    u = struct.unpack("<Q", struct.pack("<d", float(x)))[0]
    return u if u < (1 << 63) else (1 << 63) - u

_INTEGRAL_TYPES = (T.IntegerType, T.LongType, T.ShortType, T.ByteType)
_TIME_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)


def parse_transform(transform: str | None) -> tuple[str, int | None]:
    """Parse a partition transform spec into (kind, param).

    Supported (Iceberg's hidden-partitioning transform set,
    iceberg spec §Partition Transforms — public spec, re-expressed
    over Spark expressions):

    * ``identity``            — the column value itself
    * ``bucket[N]``           — ``pmod(xxhash64(col), N)``
    * ``truncate[W]``         — string prefix / integer floor-to-W
    * ``year|month|day|hour`` — calendar truncation of a date/timestamp
    """
    if transform is None or transform == "identity":
        return "identity", None
    if transform in ("year", "month", "day", "hour"):
        return transform, None
    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", transform)
    if m and int(m.group(2)) > 0:
        return m.group(1), int(m.group(2))
    raise ValueError(
        f"unknown partition transform {transform!r} (want identity, "
        f"bucket[N], truncate[W], year, month, day or hour)"
    )


def validate_transform(transform: str | None, col: str,
                       schema: T.StructType) -> None:
    kind, _ = parse_transform(transform)
    dt = schema[col].dataType
    if isinstance(dt, T.BinaryType):
        raise ValueError("cannot partition by a binary column")
    if kind in ("year", "month", "day") and not isinstance(dt, _TIME_TYPES):
        raise ValueError(f"{kind} transform needs a date/timestamp column, "
                         f"got {dt.simpleString()} for {col!r}")
    if kind == "hour" and not isinstance(
            dt, (T.TimestampType, T.TimestampNTZType)):
        raise ValueError(f"hour transform needs a timestamp column, "
                         f"got {dt.simpleString()} for {col!r}")
    if kind == "truncate" and not isinstance(
            dt, (T.StringType,) + _INTEGRAL_TYPES):
        raise ValueError(f"truncate transform needs a string or integer "
                         f"column, got {dt.simpleString()} for {col!r}")


def transform_expr(col: "F.Column", transform: str | None,
                   dtype: T.DataType) -> "F.Column":
    """The partition-VALUE expression for a source column — pure
    Catalyst (whole-stage codegen), NULL-preserving (null source values
    land in the Hive default-partition directory under EVERY transform,
    exactly as identity nulls do).

    ``day``/``month``/... truncate in the SESSION timezone via
    date_format — the same session that writes also plans, so writer
    and pruner agree by construction."""
    kind, p = parse_transform(transform)
    if kind == "identity":
        return col
    if kind == "bucket":
        return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(
            F.pmod(F.xxhash64(col), F.lit(p)).cast("int"))
    if kind == "truncate":
        if isinstance(dtype, T.StringType):
            return F.substring(col, 1, p)
        return (col - F.pmod(col, F.lit(p))).cast(dtype.simpleString())
    fmt = {"year": "yyyy", "month": "yyyy-MM", "day": "yyyy-MM-dd",
           "hour": "yyyy-MM-dd-HH"}[kind]
    return F.date_format(col, fmt)


class ConcurrentCommitError(RuntimeError):
    """Another writer advanced the table between plan and commit."""


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    sequence: int
    timestamp_ms: int
    operation: str  # append | overwrite | replace | delete | rewrite-manifests
    manifests: list[str]  # paths relative to metadata/
    summary: dict = field(default_factory=dict)
    # manifest-list partition summaries (Iceberg's manifest_list role):
    # manifest path -> sorted partition ids it contains, letting commits
    # and planners skip manifests disjoint from the affected partitions
    # without opening them. Missing entry (legacy snapshot) = must read.
    manifest_parts: dict = field(default_factory=dict)
    # merge-on-read deletes (Iceberg v2 delete manifests): manifests
    # listing position-delete files (rows of data-file path + row
    # position) or equality-delete files (rows of key values) that
    # scans of THIS snapshot must anti-join away. Empty for
    # copy-on-write-only tables — the common, zero-cost case.
    delete_manifests: list[str] = field(default_factory=list)
    # per-delete-manifest metadata: manifest -> {"kind": "equality",
    # "cols": [...], "seq": N}. A manifest with no entry is a
    # position-delete manifest (back-compat). Equality deletes apply
    # only to data files committed at a sequence BEFORE the delete's —
    # Iceberg's sequence-number scoping, which is what lets a writer
    # upsert blindly (delete-by-key + append) without reading the
    # table: later inserts of the same key are untouched.
    delete_manifest_meta: dict = field(default_factory=dict)
    # manifest-list column summaries (Iceberg's manifest-list
    # lower/upper bounds): manifest path -> {"int": {col: [lo, hi]},
    # "str": {col: [lo, hi]}} — recorded at manifest-write time ONLY
    # when every entry in the manifest carries stats for the column
    # (a stats-less file must keep its manifest readable). Lets
    # plan_files skip whole manifests whose bound range is disjoint
    # from a predicate before opening them: at 10^12 scale planning
    # cost drops from O(all manifest entries) to O(surviving
    # manifests). Missing entry (legacy snapshot / carried manifest)
    # = must read. Declared LAST so the positional Snapshot(...)
    # constructions throughout this file keep their meaning.
    manifest_bounds: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "sequence": self.sequence,
            "timestamp_ms": self.timestamp_ms,
            "operation": self.operation,
            "manifests": self.manifests,
            "summary": self.summary,
            "manifest_parts": self.manifest_parts,
            "delete_manifests": self.delete_manifests,
            "delete_manifest_meta": self.delete_manifest_meta,
            "manifest_bounds": self.manifest_bounds,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            d["snapshot_id"], d["parent_id"], d["sequence"], d["timestamp_ms"],
            d["operation"], list(d["manifests"]), dict(d.get("summary", {})),
            dict(d.get("manifest_parts", {})),
            list(d.get("delete_manifests", [])),
            dict(d.get("delete_manifest_meta", {})),
            dict(d.get("manifest_bounds", {})),
        )

    def position_delete_manifests(self) -> list[str]:
        return [m for m in self.delete_manifests
                if self.delete_manifest_meta.get(m, {}).get("kind")
                not in ("equality", "dv")]

    def dv_manifests(self) -> list[tuple[str, int, int]]:
        """(manifest, commit_sequence, pending_positions) triples for
        deletion-vector manifests. Sequence orders supersede: a newer
        DV for a data file is a superset of every older one (merged at
        write time), so readers apply only the newest per file."""
        out = []
        for m in self.delete_manifests:
            info = self.delete_manifest_meta.get(m, {})
            if info.get("kind") == "dv":
                out.append((m, int(info["seq"]), int(info.get("positions", 0))))
        return out

    def equality_delete_manifests(self) -> list[tuple[str, list[str], int]]:
        """(manifest, key_cols, apply_sequence) triples."""
        out = []
        for m in self.delete_manifests:
            info = self.delete_manifest_meta.get(m, {})
            if info.get("kind") == "equality":
                out.append((m, list(info["cols"]), int(info["seq"])))
        return out


# default for ``expected_parent``: no plan-snapshot pinning requested.
# Distinct from None, which pins the commit to "the table has NO parent
# snapshot yet" (the bootstrap-path precondition — a concurrent first
# writer must surface, not compose).
UNPINNED = object()


def _atomic_write(path: str, data: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


def _exclusive_write(path: str, data: str) -> None:
    """Compare-and-swap write: create ``path`` atomically, FAILING if it
    already exists. This is what makes the version-file write a true
    CAS — two committers racing to write v<N+1>.metadata.json cannot
    both win (os.replace would let the second silently overwrite the
    first: a lost commit). Iceberg's HadoopTableOperations relies on
    rename-fails-if-existing for exactly this; the POSIX equivalent is
    ``os.link`` (atomic, EEXIST on collision, works across fsyncs).

    Known shared limitation (documented for Iceberg's HadoopCatalog
    too): a committer that crashes AFTER creating v<N+1> but BEFORE
    swapping version-hint leaves an orphan that blocks the next commit
    at that version until removed (metadata files > hint are orphans).
    """
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise ConcurrentCommitError(
            f"{os.path.basename(path)} already exists — a concurrent "
            "committer won this version"
        ) from None
    finally:
        with contextlib.suppress(OSError):
            os.remove(tmp)


_MANIFEST_SCHEMA = pa.schema(
    [
        ("file_path", pa.string()),          # relative to table location
        ("partition_id", pa.string()),       # "" for unpartitioned
        ("record_count", pa.int64()),
        ("file_size_bytes", pa.int64()),
        ("added_snapshot_id", pa.int64()),
        ("int_mins", pa.map_(pa.string(), pa.int64())),
        ("int_maxs", pa.map_(pa.string(), pa.int64())),
        ("str_mins", pa.map_(pa.string(), pa.string())),
        ("str_maxs", pa.map_(pa.string(), pa.string())),
        # per-file bloom filters (col -> 64-bit words), Iceberg-puffin
        # analog: point-lookup file skipping on high-cardinality columns
        # where min/max stats cannot prune (every file spans the range)
        ("blooms", pa.map_(pa.string(), pa.list_(pa.int64()))),
        # row lineage (Iceberg v3): the file's first assigned row id —
        # a row's stable id is first_row_id + its position in the file,
        # unless the file materializes a _lh_row_id column (rewrites).
        # Null = file committed before row lineage (ids unknown).
        ("first_row_id", pa.int64()),
    ]
)

# Bloom sizing: ~10 bits/row, 7 probes => ~1% false-positive rate at any
# file size (m scales with the file's record count, rounded to whole
# 64-bit words so bit-index arithmetic can use `pos % 64 == C % 64`).
_BLOOM_K = 7
_BLOOM_BITS_PER_ROW = 10
BLOOM_COLS_PROP = "write.metadata.bloom-columns"
SORT_ORDER_PROP = "write.sort-order"
PREV_VERSIONS_PROP = "write.metadata.previous-versions-max"
CONSTRAINTS_PREFIX = "constraints."


def _bloom_m(n_rows: int) -> int:
    words = max(1, -(-(max(1, n_rows) * _BLOOM_BITS_PER_ROW) // 64))
    return int(words * 64)


class LakehouseTable:
    def __init__(self, location: str):
        from .paths import join_path, normalize_location

        self.location = normalize_location(location)
        # driver-side I/O root: file:-scheme URIs -> plain local path;
        # self.location keeps the URI form (the relativize() base for
        # input_file_name matching and the user-facing identity)
        from .paths import to_local

        self._local_root = to_local(self.location)
        self.meta_dir = join_path(self._local_root, "metadata")
        self.manifest_dir = join_path(self.meta_dir, "manifests")
        self.data_dir = join_path(self._local_root, "data")

    # ---------------- metadata I/O ----------------

    @property
    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def current_version(self) -> int:
        with open(self._hint_path) as f:
            return int(f.read().strip())

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.metadata.json")

    def load_metadata(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(self._meta_path(v)) as f:
            meta = json.load(f)
        meta["_version"] = v
        return meta

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.load_metadata()["schema_json"]))

    def conform(self, df: DataFrame, schema: T.StructType | None = None) -> DataFrame:
        """Normalize a writer's DataFrame to the table schema: exact
        column set (any order), each column cast to the declared type.
        Under ANSI mode a lossy value (bigint overflowing an int
        column, a non-numeric string into a numeric) fails AT WRITE
        TIME instead of landing as a file whose physical types disagree
        with the table schema — the write-side half of schema
        enforcement (readers already read through the declared schema).
        Same-type casts are folded away by Catalyst, so conforming an
        already-correct frame costs nothing."""
        schema = schema or self.schema()
        names = [f.name for f in schema.fields]
        have = set(df.columns)
        missing = [c for c in names if c not in have]
        extra = [c for c in df.columns if c not in names]
        if missing or extra:
            raise ValueError(
                f"DataFrame does not match table schema: "
                f"missing {missing}, unexpected {extra}")
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name)
              for f in schema.fields])

    @property
    def exists(self) -> bool:
        return os.path.exists(self._hint_path)

    # ---------------- create ----------------

    @classmethod
    def create(
        cls,
        location: str,
        schema: T.StructType,
        partition_col: str | None = None,
        properties: dict | None = None,
        partition_transform: str | None = None,
    ) -> "LakehouseTable":
        """``properties``: free-form table properties (Iceberg's table
        property map). Understood keys:

        * ``write.parquet.compression-codec`` — parquet codec for data
          files of THIS table (zstd/snappy/uncompressed/...). Blob
          tables whose payload is already compressed (jpeg/png bytes)
          should set ``uncompressed``: measured 2.2x faster writes AND
          reads for +0.7% size on the image payload — general-purpose
          codecs cannot shrink high-entropy blobs, only burn CPU.
        * ``write.parquet.dictionary-enabled`` — ``false`` disables
          parquet dictionary encoding for THIS table's data files.
          High-entropy blob columns never dictionary-hit; the encoder
          builds and abandons the dictionary per page — measured
          ~5-7% faster warm writes for +0.23% size on the bench image
          payload (3x interleaved A/B at 130 MB, local[8]).
        """
        t = cls(location)
        if t.exists:
            raise FileExistsError(f"table already exists at {location}")
        if partition_transform is not None and partition_col is None:
            raise ValueError("partition_transform needs a partition_col")
        if partition_col is not None:
            if partition_col not in {f.name for f in schema.fields}:
                raise ValueError(f"unknown partition column {partition_col!r}")
            validate_transform(partition_transform, partition_col, schema)
        os.makedirs(t.manifest_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        meta = {
            "format_version": 1,
            "table_uuid": uuid.uuid4().hex,
            "location": t.location,
            "schema_json": schema.json(),
            "partition_col": partition_col,
            "partition_transform": partition_transform or "identity",
            "properties": dict(properties or {}),
            "current_snapshot_id": None,
            "last_sequence": 0,
            "next_row_id": 0,
            "snapshots": [],
        }
        # exclusive v1 write: two racing create() calls can both pass
        # the exists-check; only one may win the table
        _exclusive_write(t._meta_path(1), json.dumps(meta, indent=1))
        _atomic_write(t._hint_path, "1")
        return t

    # ---------------- schema evolution ----------------

    def _commit_metadata(self, meta: dict) -> int:
        """Metadata-only commit (schema change): validate the version,
        write v<N+1>, swap the pointer — no new snapshot (Iceberg's
        schema updates are likewise pure metadata transactions)."""
        cur_v = self.current_version()
        if cur_v != meta["_version"]:
            raise ConcurrentCommitError(
                f"table advanced v{meta['_version']} -> v{cur_v} during commit"
            )
        m = {k: v for k, v in meta.items() if not k.startswith("_")}
        new_v = cur_v + 1
        _exclusive_write(self._meta_path(new_v), json.dumps(m, indent=1))
        _atomic_write(self._hint_path, str(new_v))
        self._prune_metadata_versions(m, new_v)
        return new_v

    def _prune_metadata_versions(self, meta: dict, new_v: int) -> None:
        """Iceberg's ``write.metadata.previous-versions-max``: after a
        successful pointer swap, unlink metadata version files older
        than the newest K. Unbounded version history is a real leak at
        commit rates that matter (1M commits = 1M JSON files in one
        directory); snapshots, time travel, refs, and lineage all live
        INSIDE the current metadata, so old version files serve only
        forensic replay. Off unless the property is set (keep-all
        default, matching create()'s behavior); minimum 1 previous
        version is always kept so a torn pointer write can be recovered
        by hand. Missing files are fine — racing committers may prune
        the same range."""
        v = meta.get("properties", {}).get(PREV_VERSIONS_PROP)
        if v is None:
            return
        keep = max(int(v), 1)
        floor = new_v - 1 - keep
        if floor < 1:
            return  # fewer than K previous versions exist — nothing to prune
        for old in range(floor, 0, -1):
            p = self._meta_path(old)
            if not os.path.exists(p):
                break  # older ones were pruned by an earlier pass
            os.remove(p)

    def tags(self, meta: dict | None = None) -> dict[str, int]:
        """name -> snapshot_id (Iceberg's tag refs)."""
        return dict((meta or self.load_metadata()).get("tags", {}))

    def create_tag(self, name: str, snapshot_id: int | None = None,
                   retries: int = 3) -> int:
        """Pin a snapshot under a name (metadata-only CAS commit).
        Tagged snapshots are PROTECTED from expire_snapshots — the
        audit/repro handle Iceberg tags exist for. Defaults to the
        current snapshot."""
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            sid = (snapshot_id if snapshot_id is not None
                   else meta["current_snapshot_id"])
            if not any(s.snapshot_id == sid for s in self.snapshots_list(meta)):
                raise ValueError(f"unknown snapshot {sid}")
            tags = dict(meta.get("tags", {}))
            if name in tags and tags[name] != sid:
                raise ValueError(f"tag {name!r} already points at {tags[name]}")
            tags[name] = sid
            meta["tags"] = tags
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    def drop_tag(self, name: str, retries: int = 3) -> int:
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            tags = dict(meta.get("tags", {}))
            if name not in tags:
                raise ValueError(f"no tag {name!r}")
            del tags[name]
            meta["tags"] = tags
            if name in meta.get("ref_retention", {}):
                meta["ref_retention"] = {
                    k: v for k, v in meta["ref_retention"].items() if k != name}
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    # ---------------- branches (write-audit-publish) ----------------

    def branches(self, meta: dict | None = None) -> dict[str, int]:
        """name -> head snapshot_id (Iceberg branch refs). ``main`` is
        implicit — its head is ``current_snapshot_id``."""
        return dict((meta or self.load_metadata()).get("branches", {}))

    def branch_head(self, name: str, meta: dict | None = None) -> int:
        meta = meta or self.load_metadata()
        if name == "main":
            head = meta["current_snapshot_id"]
            if head is None:
                raise ValueError("main has no snapshot yet")
            return head
        br = meta.get("branches", {})
        if name not in br:
            raise ValueError(
                f"no branch {name!r} (existing: {sorted(br) or 'none'})"
            )
        return br[name]

    def create_branch(self, name: str, snapshot_id: int | None = None,
                      retries: int = 3) -> int:
        """Create a named branch at a snapshot (default: current).
        Branches are mutable refs that ``append(..., branch=)`` can
        advance independently of main — the write-audit-publish
        staging area (Iceberg branch refs): ingest to an ``audit``
        branch, run the quality gates against ``scan(ref='audit')``,
        then :meth:`fast_forward` main. Branch heads are pinned
        through snapshot expiry like tags."""
        if name == "main":
            raise ValueError("main is implicit; it cannot be re-created")
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            sid = (snapshot_id if snapshot_id is not None
                   else meta["current_snapshot_id"])
            if not any(s.snapshot_id == sid for s in self.snapshots_list(meta)):
                raise ValueError(f"unknown snapshot {sid}")
            if name in meta.get("tags", {}):
                raise ValueError(f"{name!r} is already a tag")
            br = dict(meta.get("branches", {}))
            if name in br and br[name] != sid:
                raise ValueError(f"branch {name!r} already at {br[name]}")
            br[name] = sid
            meta["branches"] = br
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    def drop_branch(self, name: str, retries: int = 3) -> int:
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            br = dict(meta.get("branches", {}))
            if name not in br:
                raise ValueError(f"no branch {name!r}")
            del br[name]
            meta["branches"] = br
            if name in meta.get("ref_retention", {}):
                meta["ref_retention"] = {
                    k: v for k, v in meta["ref_retention"].items() if k != name}
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    def fast_forward(self, source: str, target: str = "main",
                     retries: int = 3) -> int:
        """Publish a branch: move ``target``'s head to ``source``'s
        head, valid only when the move is a FAST-FORWARD (target's
        current head is an ancestor of — or equal to — source's head,
        walking snapshot parent ids). A target that advanced
        divergently since the branch was cut raises ValueError: the
        staged work must be re-based (re-run against current main),
        never silently merged — exactly Iceberg's
        fast_forward(branch) contract. The audit->main publish is a
        metadata-only CAS commit: atomic, and concurrent publishes
        serialize through the version swap."""
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            snaps = {s.snapshot_id: s for s in self.snapshots_list(meta)}
            src_head = self.branch_head(source, meta)
            tgt_head = (meta["current_snapshot_id"] if target == "main"
                        else self.branch_head(target, meta))
            if src_head == tgt_head:
                return meta["_version"]  # already published
            sid: int | None = src_head
            while sid is not None and sid != tgt_head:
                sid = snaps[sid].parent_id if sid in snaps else None
            if sid != tgt_head:
                raise ValueError(
                    f"not a fast-forward: {target!r} head {tgt_head} is not "
                    f"an ancestor of {source!r} head {src_head}; re-base the "
                    "branch against the current target"
                )
            if target == "main":
                meta["current_snapshot_id"] = src_head
            else:
                br = dict(meta.get("branches", {}))
                br[target] = src_head
                meta["branches"] = br
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    def set_ref_retention(self, name: str,
                          min_snapshots_to_keep: int | None = None,
                          max_snapshot_age_ms: int | None = None,
                          max_ref_age_ms: int | None = None,
                          retries: int = 3) -> int:
        """Per-ref retention (Iceberg's branch/tag ref options):

        * ``min_snapshots_to_keep`` / ``max_snapshot_age_ms`` — branch
          history depth: :meth:`expire_snapshots` keeps the branch's
          newest N ancestors and every ancestor younger than the age
          cutoff, not just its head. Lets an ``audit`` branch keep its
          own time-travel window while main expires aggressively.
        * ``max_ref_age_ms`` — a ref whose target snapshot committed
          longer ago than this is DROPPED by expire_snapshots (auto-GC
          of stale audit branches / CI tags, Iceberg's maxRefAgeMs).

        All-None clears the ref's config. ``main`` accepts the ancestor
        options but can never age out."""
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            known = (set(meta.get("branches", {})) | set(meta.get("tags", {}))
                     | {"main"})
            if name not in known:
                raise ValueError(f"no ref {name!r}")
            if name == "main" and max_ref_age_ms is not None:
                raise ValueError("main cannot age out (max_ref_age_ms)")
            if name in meta.get("tags", {}) and (
                    min_snapshots_to_keep is not None
                    or max_snapshot_age_ms is not None):
                raise ValueError(
                    "tags pin a single snapshot; ancestor retention "
                    "(min_snapshots_to_keep/max_snapshot_age_ms) is for branches")
            cfg = {k: v for k, v in (
                ("min_snapshots_to_keep", min_snapshots_to_keep),
                ("max_snapshot_age_ms", max_snapshot_age_ms),
                ("max_ref_age_ms", max_ref_age_ms)) if v is not None}
            rr = dict(meta.get("ref_retention", {}))
            if cfg:
                rr[name] = cfg
            else:
                rr.pop(name, None)
            meta["ref_retention"] = rr
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    def properties(self, meta: dict | None = None) -> dict:
        return dict((meta or self.load_metadata()).get("properties", {}))

    def update_properties(self, updates: dict, retries: int = 3) -> int:
        """Set/overwrite table properties (None value deletes a key) —
        a metadata-only commit through the same CAS as every commit."""
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            props = dict(meta.get("properties", {}))
            for k, v in updates.items():
                if v is None:
                    props.pop(k, None)
                else:
                    props[k] = v
            meta["properties"] = props
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    def sort_order(self, meta: dict | None = None) -> tuple[str, tuple[str, ...]] | None:
        """Parsed ``write.sort-order`` property (Iceberg's table sort
        order, declared once so every maintenance pass agrees on the
        layout): ``zorder(a,b,c)`` / ``hilbert(a,b)`` / ``sort(a)``.
        Returns ``(curve, cols)`` or None when unset; ``sort`` is the
        single-column plain order (stored as the degenerate curve).
        Columns are validated against the current schema."""
        meta = meta or self.load_metadata()
        v = meta.get("properties", {}).get(SORT_ORDER_PROP)
        if not v:
            return None
        m = re.fullmatch(r"(zorder|hilbert|sort)\(([^()]+)\)", v.strip())
        if not m:
            raise ValueError(
                f"bad {SORT_ORDER_PROP} {v!r}: expected "
                "zorder(cols)/hilbert(cols)/sort(col)")
        curve = m.group(1)
        cols = tuple(c.strip() for c in m.group(2).split(",") if c.strip())
        if not cols or (curve == "sort" and len(cols) != 1):
            raise ValueError(f"bad {SORT_ORDER_PROP} {v!r}")
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        known = {f.name for f in schema.fields}
        for c in cols:
            if c not in known:
                raise ValueError(
                    f"{SORT_ORDER_PROP} references unknown column {c!r}")
        if curve == "sort":
            curve = "zorder"  # 1-col curve degenerates to a plain sort
        return curve, cols

    def constraints(self, meta: dict | None = None) -> dict[str, str]:
        """Declared CHECK constraints: ``{name: sql_expression}``,
        stored as ``constraints.<name>`` table properties (the Delta
        ``delta.constraints.*`` idiom — metadata-only, versioned with
        the table, visible in DESCRIBE EXTENDED)."""
        props = self.properties(meta)
        n = len(CONSTRAINTS_PREFIX)
        return {k[n:]: v for k, v in props.items()
                if k.startswith(CONSTRAINTS_PREFIX)}

    def constraint_guard(self, df: DataFrame) -> DataFrame:
        """Wrap a to-be-written DataFrame so every declared CHECK
        constraint is enforced DURING the write pass itself: each row
        evaluates ``coalesce(expr, true)`` (ANSI CHECK semantics — a
        NULL predicate passes) and the first violating row aborts the
        job with the constraint name and the offending row's non-binary
        columns as JSON. Zero extra scans — the guard is a Catalyst
        filter whose error branch only evaluates on violation, the
        single-pass invariant-operator shape Delta uses; with no
        constraints declared the frame is returned untouched."""
        cons = self.constraints()
        if not cons:
            return df
        binary = {f.name for f in df.schema.fields
                  if isinstance(f.dataType, T.BinaryType)}
        shown = [c for c in df.columns if c not in binary]
        cond = None
        for name in sorted(cons):
            expr = cons[name]
            ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(True))
            msg = F.concat(
                F.lit(f"CHECK constraint {name} ({expr}) "
                      "violated by row: "),
                F.to_json(F.struct(*[F.col(c) for c in shown])),
            )
            guard = F.when(~ok, F.raise_error(msg)).otherwise(F.lit(True))
            cond = guard if cond is None else cond & guard
        return df.filter(cond)

    def add_constraint(self, name: str, expr: str, spark: SparkSession,
                       validate: bool = True) -> int:
        """Declare a CHECK constraint (``ALTER TABLE ... ADD CONSTRAINT
        name CHECK (expr)``). The expression must analyze against the
        table schema, and — like Delta — the EXISTING data must already
        satisfy it (one column-pruned scan that stops at the first
        violation; blobs are never read unless the expression touches
        them). Enforcement of future writes happens inside
        :meth:`write_data_files` via :meth:`constraint_guard`."""
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise ValueError(f"bad constraint name {name!r}")
        if name in self.constraints():
            raise ValueError(f"constraint {name!r} already exists")
        probe = spark.createDataFrame([], self.schema())
        try:
            probe.filter(F.expr(expr)).schema
        except Exception as e:
            raise ValueError(
                f"constraint expression {expr!r} does not analyze "
                f"against the table schema: {e}") from None
        if validate and self.current_snapshot() is not None:
            bad = (
                self.scan(spark)
                .filter(~F.coalesce(F.expr(expr).cast("boolean"),
                                    F.lit(True)))
                .limit(1)
                .count()
            )
            if bad:
                raise ValueError(
                    f"cannot add constraint {name!r}: existing rows "
                    f"violate CHECK ({expr})")
        return self.update_properties({CONSTRAINTS_PREFIX + name: expr})

    def drop_constraint(self, name: str) -> int:
        """Remove a CHECK constraint (metadata-only commit)."""
        if name not in self.constraints():
            raise ValueError(f"no constraint {name!r}")
        return self.update_properties({CONSTRAINTS_PREFIX + name: None})

    def drop_column(self, name: str) -> int:
        """Drop a column (metadata-only; Iceberg's dropColumn). Data
        files keep the physical column — scans simply stop selecting it
        (the explicit read schema of scan_files ignores extras), and the
        bytes age out as rewrites touch the files. The dropped name and
        its rename history are retired permanently: re-adding the same
        name is refused because old files still carry the physical
        column and would silently resurrect stale values."""
        meta = self.load_metadata()
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        if name not in [f.name for f in schema.fields]:
            raise ValueError(f"no column {name!r}")
        if meta.get("partition_col") == name:
            raise ValueError(f"cannot drop the partition column {name!r}")
        renames = self.column_renames(meta)
        retired = [name] + renames.pop(name, [])
        meta["column_renames"] = renames
        meta["retired_columns"] = sorted(
            set(meta.get("retired_columns", [])) | set(retired)
        )
        meta["schema_json"] = T.StructType(
            [f for f in schema.fields if f.name != name]
        ).json()
        if name in meta.get("column_defaults", {}):
            meta["column_defaults"] = {
                k: v for k, v in meta["column_defaults"].items() if k != name
            }
        so = meta.get("properties", {}).get(SORT_ORDER_PROP, "")
        if re.search(rf"[(,]\s*{re.escape(name)}\s*[,)]", so):
            props = dict(meta["properties"])
            del props[SORT_ORDER_PROP]  # declared order no longer valid
            meta["properties"] = props
        return self._commit_metadata(meta)

    def column_renames(self, meta: dict | None = None) -> dict[str, list[str]]:
        """current column name -> prior physical names (oldest last)."""
        return dict((meta or self.load_metadata()).get("column_renames", {}))

    def add_columns(self, cols: dict[str, str],
                    defaults: dict | None = None) -> int:
        """Additive schema evolution: ``{name: spark_type_ddl}``.
        Metadata-only commit; existing data files are read through the
        new schema with NULLs for the added columns (the Iceberg
        behavior DuckLake gives the reference's inferred-schema tables,
        src/ingest_bronze.py:86-99). Type changes go through
        ``widen_column``.

        ``defaults={name: value}`` records an INITIAL DEFAULT (Iceberg
        v3 ``initial-default`` semantics): rows in files written BEFORE
        the column existed read as the default; files written after
        carry the physical column, so an explicit NULL stored later
        stays NULL — this is sequence-scoped, not a blanket coalesce.
        Values must be JSON-storable scalars."""
        meta = self.load_metadata()
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        taken = {f.name for f in schema.fields} | {
            o for olds in self.column_renames(meta).values() for o in olds
        } | set(meta.get("retired_columns", []))
        for name in (defaults or {}):
            if name not in cols:
                raise ValueError(f"default for {name!r} without adding it")
        for name, ddl in cols.items():
            if name in taken:
                raise ValueError(f"column {name!r} already exists (or is a prior name)")
            field = T.StructType.fromDDL(f"`{name}` {ddl}").fields[0]
            schema = schema.add(T.StructField(name, field.dataType, True))
        meta["schema_json"] = schema.json()
        if defaults:
            dmap = dict(meta.get("column_defaults", {}))
            for name, value in defaults.items():
                if value is not None and not isinstance(
                        value, (str, int, float, bool)):
                    raise ValueError(
                        f"default for {name!r} must be a scalar")
                dmap[name] = {"value": value,
                              "added_seq": meta["last_sequence"] + 1}
            meta["column_defaults"] = dmap
        return self._commit_metadata(meta)

    _WIDENINGS = {
        "tinyint": {"smallint", "int", "bigint", "double"},
        "smallint": {"int", "bigint", "double"},
        "int": {"bigint", "double"},
        "float": {"double"},
    }

    def widen_column(self, name: str, new_type_ddl: str) -> int:
        """Type widening (metadata-only; Iceberg's allowed type
        promotions): tinyint/smallint/int -> wider integral or double,
        float -> double, decimal(p,s) -> decimal(p',s) with p' > p.
        Old data files keep their narrow physical type; Spark's parquet
        reader promotes at scan time under the explicit read schema
        (verified natively — no per-file cast pass).

        Refused when the column is the source of a bucket[] partition
        transform (xxhash64 hashes int and bigint differently — new
        writes would land in different buckets than old ones). A
        widened column's per-file BLOOMS are invalidated (same hash-
        by-type issue): recorded in ``bloom_invalid_cols`` and skipped
        by the probe; min/max skipping still applies."""
        meta = self.load_metadata()
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        if name not in [f.name for f in schema.fields]:
            raise ValueError(f"no column {name!r}")
        cur = schema[name].dataType
        new_field = T.StructType.fromDDL(f"`{name}` {new_type_ddl}").fields[0]
        new = new_field.dataType
        ok = False
        if isinstance(cur, T.DecimalType) and isinstance(new, T.DecimalType):
            ok = new.scale == cur.scale and new.precision > cur.precision
        else:
            ok = new.simpleString() in self._WIDENINGS.get(
                cur.simpleString(), set())
        if not ok:
            raise ValueError(
                f"cannot widen {name!r} from {cur.simpleString()} to "
                f"{new.simpleString()}")
        if (meta.get("partition_col") == name
                and parse_transform(
                    self.partition_transform(meta))[0] == "bucket"):
            raise ValueError(
                f"cannot widen {name!r}: it feeds a bucket[] partition "
                "transform (hash changes with the physical type)")
        meta["schema_json"] = T.StructType(
            [T.StructField(name, new, f.nullable) if f.name == name else f
             for f in schema.fields]
        ).json()
        meta["bloom_invalid_cols"] = sorted(
            set(meta.get("bloom_invalid_cols", [])) | {name})
        return self._commit_metadata(meta)

    def rename_column(self, old: str, new: str) -> int:
        """Rename a column (metadata-only). Old data files keep the old
        physical name; scans read both and coalesce — the field-id
        mapping of Iceberg expressed as a rename history."""
        meta = self.load_metadata()
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"no column {old!r}")
        taken = set(names) | {
            o for olds in self.column_renames(meta).values() for o in olds
        } | set(meta.get("retired_columns", []))
        if new in taken:
            raise ValueError(
                f"column {new!r} already exists (or is a retired physical "
                "name still present in old data files)"
            )
        renames = self.column_renames(meta)
        prior = renames.pop(old, [])  # chained renames carry full history
        renames[new] = [old] + prior
        meta["schema_json"] = T.StructType(
            [
                T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        ).json()
        meta["column_renames"] = renames
        if old in meta.get("column_defaults", {}):
            dmap = dict(meta["column_defaults"])
            dmap[new] = dmap.pop(old)
            meta["column_defaults"] = dmap
        if meta.get("partition_col") == old:
            meta["partition_col"] = new  # physical _p=<v> dirs are name-free
        if meta.get("partition_specs"):
            meta["partition_specs"] = [
                {**s, "col": new} if s.get("col") == old else s
                for s in meta["partition_specs"]
            ]
        so = meta.get("properties", {}).get(SORT_ORDER_PROP, "")
        if re.search(rf"[(,]\s*{re.escape(old)}\s*[,)]", so):
            props = dict(meta["properties"])
            props[SORT_ORDER_PROP] = re.sub(
                rf"([(,]\s*){re.escape(old)}(\s*[,)])", rf"\g<1>{new}\g<2>",
                so)
            meta["properties"] = props
        return self._commit_metadata(meta)

    # ---------------- snapshots ----------------

    def snapshots_list(self, meta: dict | None = None) -> list[Snapshot]:
        meta = meta or self.load_metadata()
        return [Snapshot.from_json(s) for s in meta["snapshots"]]

    def current_snapshot(self, meta: dict | None = None) -> Snapshot | None:
        meta = meta or self.load_metadata()
        cur = meta["current_snapshot_id"]
        if cur is None:
            return None
        return next(s for s in self.snapshots_list(meta) if s.snapshot_id == cur)

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        return next(
            s for s in self.snapshots_list() if s.snapshot_id == snapshot_id
        )

    def snapshot_as_of(self, timestamp_ms: int) -> Snapshot:
        """Latest snapshot committed at or before ``timestamp_ms`` —
        timestamp time travel (Iceberg's FOR SYSTEM_TIME AS OF)."""
        snaps = self.snapshots_list()
        cands = [s for s in snaps if s.timestamp_ms <= timestamp_ms]
        if not cands:
            earliest = (f"earliest is {min(s.timestamp_ms for s in snaps)}"
                        if snaps else "table has no snapshots")
            raise ValueError(
                f"no snapshot at or before {timestamp_ms} ({earliest})"
            )
        return max(cands, key=lambda s: s.sequence)

    def rollback_to(self, snapshot_id: int, retries: int = 3) -> int:
        """Point the table back at an existing snapshot (Iceberg's
        rollback). Metadata-only commit through the same CAS as every
        other commit; NO snapshot is deleted, so the abandoned branch
        stays time-travelable until expire_snapshots drops it, and the
        next data commit simply parents off the restored snapshot."""
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            if not any(
                s.snapshot_id == snapshot_id for s in self.snapshots_list(meta)
            ):
                raise ValueError(f"unknown snapshot {snapshot_id}")
            meta["current_snapshot_id"] = snapshot_id
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    # ---------------- data write path ----------------

    def _partition_col(self, meta: dict | None = None) -> str | None:
        return (meta or self.load_metadata())["partition_col"]

    def partition_transform(self, meta: dict | None = None) -> str:
        return (meta or self.load_metadata()).get(
            "partition_transform") or "identity"

    def partition_value_expr(self, meta: dict | None = None) -> "F.Column | None":
        """The partition VALUE as a Catalyst expression over the source
        column — identity for plain tables, the hidden-partitioning
        transform (bucket/truncate/year..hour) otherwise. Everything
        that derives a partition value from row data (write layout,
        compaction/clustering group keys, evolved-scan re-filters) MUST
        go through this so writer and planner agree bit-for-bit."""
        meta = meta or self.load_metadata()
        pcol = meta["partition_col"]
        if pcol is None:
            return None
        dt = T.StructType.fromJson(json.loads(meta["schema_json"]))[pcol].dataType
        return transform_expr(F.col(pcol), self.partition_transform(meta), dt)

    def partition_values_of(self, spark: SparkSession, values: list,
                            meta: dict | None = None) -> list[str]:
        """Partition values (string domain, as recorded in manifests)
        for SOURCE-column literals — computed by the SAME Catalyst
        expression the write path used, in one tiny local job, so a
        driver-side reimplementation can never drift from the layout
        (the xxhash64 in bucket[] has no stable Python twin)."""
        meta = meta or self.load_metadata()
        pcol = meta["partition_col"]
        if pcol is None:
            raise ValueError("unpartitioned table")
        dt = T.StructType.fromJson(json.loads(meta["schema_json"]))[pcol].dataType
        lits = F.array(*[F.lit(v).cast(dt.simpleString()) for v in values])
        expr = transform_expr(F.col(pcol), self.partition_transform(meta), dt)
        rows = (
            spark.range(1)
            .select(F.posexplode(lits).alias("i", pcol))
            .select("i", expr.cast("string").alias("pv"))
            .collect()
        )
        out: list[str | None] = [None] * len(values)
        for r in rows:
            out[r["i"]] = r["pv"]
        return out  # type: ignore[return-value]

    # ---------------- partition evolution ----------------

    def partition_specs(self, meta: dict | None = None) -> list[dict]:
        """Spec history: [{"col": <col|None>, "from_seq": N}, ...] in
        order; the last entry is the current spec. A never-evolved
        table has a single implicit spec from sequence 0."""
        meta = meta or self.load_metadata()
        specs = meta.get("partition_specs")
        if specs:
            return list(specs)
        return [{"col": meta.get("partition_col"),
                 "transform": self.partition_transform(meta),
                 "from_seq": 0}]

    def evolve_partition(self, new_col: str | None, retries: int = 3,
                         transform: str | None = None) -> int:
        """Change the partition column for FUTURE writes (Iceberg
        partition evolution): a metadata-only commit — no data moves.
        Existing files keep their old layout; planning stops
        value-pruning them on partition (stats pruning still applies)
        and ``scan(partition_values=)`` re-filters row-level so
        results stay exact. ``compaction.migrate_partitions`` rewrites
        the old-spec files under the current spec (Iceberg's
        rewrite_data_files migration path); until it runs,
        partition-KEYED ops — ``overwrite_partitions``, compact,
        cluster — refuse the mixed-spec table loudly rather than
        mis-map old files."""
        if transform is not None and new_col is None:
            raise ValueError("partition transform needs a partition column")
        if new_col is not None:
            schema = self.schema()
            names = {f.name for f in schema.fields}
            if new_col not in names:
                raise ValueError(f"unknown partition column {new_col!r}")
            validate_transform(transform, new_col, schema)
        new_tr = transform or "identity"
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            if (meta.get("partition_col") == new_col
                    and self.partition_transform(meta) == new_tr):
                return meta["_version"]
            specs = self.partition_specs(meta)
            specs.append({"col": new_col, "transform": new_tr,
                          "from_seq": meta["last_sequence"] + 1})
            meta["partition_specs"] = specs
            meta["partition_col"] = new_col
            meta["partition_transform"] = new_tr
            try:
                return self._commit_metadata(meta)
            except ConcurrentCommitError as e:
                last = e
        raise last

    def _current_spec_snapshot_ids(self, meta: dict) -> list[int] | None:
        """Snapshot ids whose files were written under the CURRENT
        spec, or None for a never-evolved table (every file current —
        the zero-cost fast path). Resolved through the permanent
        ``snapshot_seqs`` record, so attribution survives snapshot
        expiry; only pre-record legacy ids fall back to the oldest
        spec (conservative: never partition-value-pruned)."""
        specs = self.partition_specs(meta)
        if len(specs) == 1:
            return None
        cur_from = specs[-1]["from_seq"]
        return [sid for sid, seq in self._snapshot_seqs(meta).items()
                if seq >= cur_from]

    def write_data_files(
        self,
        df: DataFrame,
        n_files: int | None = None,
        sort_cols: list[str] | None = None,
        distribution: str = "hash",
        salt_col: str = "image_id",
        n_partitions_hint: int | None = None,
        enforce_constraints: bool = True,
    ) -> list[dict]:
        """Write a DataFrame as new data files; return manifest entries
        (NOT yet committed — callers pair this with a commit_* call).

        Distribution (one shuffle, chosen for blob-heavy rows):

        * ``hash`` (default): ``repartition(n, partition_col, salt)``
          with ``salt = pmod(xxhash64(salt_col), n/P)``. NO input
          sampling — ``repartitionByRange`` would execute the child
          plan twice (RangePartitioner's sample pass), i.e. read every
          image blob twice; at 100 TB that doubles the dominant cost.
          The salt also splits a hot partition (skewed phash bucket)
          across ~n/P tasks deterministically.
        * ``range``: ``repartitionByRange(n, partition_col, *sort_cols)``
          — only for small/key-only frames where contiguous output
          ranges are worth the sampling pass.
        * ``none``: caller pre-shaped the distribution (clustering does
          its own quantile-based grouping from a key-only scan).

        ``sort_cols`` adds a within-partition sort (local, no extra
        shuffle) so every file is internally ordered and gets tight
        manifest min/max stats.
        """
        meta = self.load_metadata()
        pcol = meta["partition_col"]
        pexpr = self.partition_value_expr(meta)
        if enforce_constraints:
            # every write of NEW or MODIFIED rows passes the CHECK
            # guard in the same pass; pure-carry rewrites (compaction /
            # clustering) opt out — their rows were checked when first
            # written, and add_constraint validates history
            df = self.constraint_guard(df)
        if "_row_id" in df.columns:
            # rewrite carrying row lineage: materialize each surviving
            # row's id as the physical _lh_row_id column (Iceberg v3 —
            # rewritten rows keep their ids; null rows, e.g. MERGE
            # inserts mixed into a CoW rewrite, resolve at read time to
            # the new file's first_row_id + position)
            df = df.withColumnRenamed("_row_id", _LH_ROW_ID)
        if "_last_updated_seq" in df.columns:
            # same contract for the last-updated sequence: carried rows
            # keep their value; rows the committing op modified should
            # arrive as NULL here and inherit the new file's sequence
            df = df.withColumnRenamed("_last_updated_seq", _LH_LAST_SEQ)
        write_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.data_dir, f"snap-{write_id}")
        if sort_cols is None and distribution != "none":
            # Iceberg write contract: a declared write.sort-order means
            # engines sort ON WRITE, so files carry tight stats from
            # ingest instead of waiting for the first maintenance pass.
            # Lexicographic by the declared columns (the write-side
            # approximation of a zorder/hilbert REWRITE order — same
            # leading-column stats, no quantile pass in the write path).
            # distribution="none" writers (clustering/compaction) pre-
            # shaped their own order and must not be re-sorted.
            order = self.sort_order(meta)
            if order:
                sort_cols = [c for c in order[1] if c in df.columns]
        if distribution == "hash" and sort_cols:
            # write.distribution-mode=range (Iceberg): cluster the
            # WRITE itself on the sort columns so new files carry
            # near-disjoint stat ranges from ingest — pruning without
            # waiting for maintenance. Opt-in by property: the range
            # sampler executes the child plan twice, the documented
            # blob-read tradeoff hash avoids by default.
            if self.properties(meta).get("write.distribution-mode") == "range":
                distribution = "range"
        sort_all = ([pcol] if pcol else []) + [c for c in (sort_cols or []) if c != pcol]
        if n_files and distribution == "hash":
            n_parts = n_partitions_hint or 16
            salts = max(1, round(n_files / max(n_parts, 1)))
            if salt_col not in df.columns:
                # fall back to the first non-binary column as salt key
                salt_col = next(
                    (f.name for f in df.schema.fields
                     if not isinstance(f.dataType, T.BinaryType)),
                    df.columns[0],
                )
            salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salts))
            keys = ([pexpr] if pcol else []) + [salt]
            df = df.repartition(n_files, *keys)
            if sort_cols:
                df = df.sortWithinPartitions(*sort_all)
        elif n_files and distribution == "range" and sort_all:
            df = df.repartitionByRange(n_files, *[F.col(c) for c in sort_all])
            df = df.sortWithinPartitions(*sort_all)
        elif n_files:
            df = df.repartition(n_files)
        elif sort_cols:
            df = df.sortWithinPartitions(*sort_all)
        writer = df
        if pcol:
            writer = writer.withColumn(_PART_DIR, pexpr)
            w = writer.write.partitionBy(_PART_DIR).mode("append")
        else:
            w = writer.write.mode("append")
        codec = meta.get("properties", {}).get("write.parquet.compression-codec")
        if codec:
            w = w.option("compression", codec)
        dic = meta.get("properties", {}).get("write.parquet.dictionary-enabled")
        if dic:  # truthiness like codec: empty/unset means "leave default"
            w = w.option("parquet.enable.dictionary", str(dic).lower())
        tw = time.time()
        w.parquet(out_dir)
        tf = time.time()
        entries = self._collect_entries(out_dir, meta)
        tb = time.time()
        bloom_cols = [
            c.strip()
            for c in meta.get("properties", {}).get(BLOOM_COLS_PROP, "").split(",")
            if c.strip()
        ]
        if bloom_cols and entries:
            self._attach_blooms(df.sparkSession, out_dir, entries, bloom_cols, meta)
        # sub-phase timings for scaling diagnostics: the footer pass is
        # driver-serial locally (Amdahl term), the write job is parallel
        self.last_write_phases = {
            "write_job_ms": int((tf - tw) * 1000),
            "footer_stats_ms": int((tb - tf) * 1000),
            "bloom_build_ms": int((time.time() - tb) * 1000),
        }
        return entries

    def _attach_blooms(
        self,
        spark: SparkSession,
        out_dir: str,
        entries: list[dict],
        cols: list[str],
        meta: dict,
    ) -> None:
        """Compute per-file bloom filters for ``cols`` over the freshly
        written files and attach them to the manifest entries.

        One distributed job per column, shaped for 10^12-row scale:

        * the read-back is COLUMN-PRUNED to the bloom column (never the
          image blobs), so it costs a tiny fraction of the write;
        * hashing stays JVM-side (``xxhash64`` twice, Kirsch-
          Mitzenmacher double hashing for the k=7 probe positions);
        * the shuffle is O(files x bloom_words), NOT O(rows):
          ``bit_or`` partial aggregation OR-combines probe masks
          map-side, so each task emits at most one (file, word, mask)
          row per set word (~m/64 rows/file) regardless of row count.

        Bloom size scales with the file's record count (~10 bits/row,
        whole 64-bit words), pinned per file from the footer stats
        already collected — the probe side recovers m as
        ``size(bloom)*64``."""
        schema_cols = {f.name for f in
                       T.StructType.fromJson(json.loads(meta["schema_json"])).fields}
        missing = [c for c in cols if c not in schema_cols]
        if missing:
            raise ValueError(
                f"{BLOOM_COLS_PROP} names columns not in the table "
                f"schema: {missing}"
            )
        # join key = last TWO path segments: a partitioned write reuses
        # the same part-file basename in every partition directory, so
        # basename alone collides; (partition dir, basename) is unique
        # within one write job
        def keyof(rel: str) -> str:
            return "/".join(rel.split("/")[-2:])

        by_base = {keyof(e["file_path"]): e for e in entries}
        if len(by_base) != len(entries):
            raise RuntimeError(
                "bloom build: non-unique (dir, basename) keys in write"
            )
        mdf = spark.createDataFrame(
            [(b, e["file_path"], _bloom_m(e["record_count"]))
             for b, e in by_base.items()],
            "b string, rel string, m long",
        )
        # the reported URI may percent-encode partition-dir characters;
        # decode each segment back to the on-disk (entry) form
        seg = ("coalesce(try_url_decode(element_at(split(_f, '/'), {i})), "
               "element_at(split(_f, '/'), {i}))")
        src = (
            spark.read.parquet(out_dir)
            .select(F.col("_metadata.file_path").alias("_f"), *cols)
            .withColumn(
                "b",
                F.expr(f"concat_ws('/', {seg.format(i=-2)}, {seg.format(i=-1)})"),
            )
            .drop("_f")
            .join(F.broadcast(mdf), "b")
        )
        blooms: dict[str, dict[str, list[int]]] = {
            e["file_path"]: {} for e in entries
        }
        for c in cols:
            probes = (
                src.select(
                    "rel",
                    "m",
                    F.pmod(F.xxhash64(F.col(c)), F.lit(2 ** 31)).alias("h1"),
                    (F.pmod(F.xxhash64(F.col(c), F.lit(1)), F.lit(2 ** 30)) * 2
                     + 1).alias("h2"),
                )
                .select(
                    "rel",
                    "m",
                    F.explode(
                        F.array(*[
                            (F.col("h1") + F.lit(i) * F.col("h2"))
                            for i in range(_BLOOM_K)
                        ])
                    ).alias("hk"),
                )
                .select("rel", "m", F.pmod(F.col("hk"), F.col("m")).alias("pos"))
            )
            words = (
                probes.select(
                    "rel",
                    "m",
                    F.floor(F.col("pos") / F.lit(64)).cast("long").alias("word"),
                    F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
                )
                .groupBy("rel", "m", "word")
                .agg(F.expr("bit_or(mask)").alias("mask"))
                .groupBy("rel", "m")
                .agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("word", "mask"))
                    ).alias("wm")
                )
                .select(
                    "rel",
                    F.expr(
                        "transform(sequence(0L, m div 64 - 1), "
                        "w -> coalesce(element_at(wm, w), 0L))"
                    ).alias("bloom"),
                )
            )
            for r in words.collect():
                blooms[r["rel"]][c] = list(r["bloom"])
        for e in entries:
            e["blooms"] = blooms.get(e["file_path"], {})

    def _collect_entries(self, out_dir: str, meta: dict) -> list[dict]:
        """Build manifest entries from freshly-written parquet footers.

        Footer-only reads (O(files) metadata, no data pages),
        thread-pooled: footer I/O releases the GIL, and serial driver
        time is exactly what Amdahl charges the high-parallelism level
        for (measured: serial footer reads were ~8% of a local[8]
        rewrite). On a real cluster these stats come back from executor
        task-commit messages; locally the driver reads footers
        directly."""
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        int_cols = {f.name for f in schema.fields if isinstance(f.dataType, _STAT_TYPES)}
        str_cols = {f.name for f in schema.fields if isinstance(f.dataType, T.StringType)}
        dbl_cols = {f.name for f in schema.fields
                    if isinstance(f.dataType, _DOUBLE_STAT_TYPES)}

        def one(fp: str) -> dict:
            rel = os.path.relpath(fp, self._local_root)
            partition_id = ""
            for seg in rel.split(os.sep):
                if seg.startswith(_PART_DIR + "="):
                    partition_id = seg.split("=", 1)[1]
            md = pq.ParquetFile(fp).metadata
            imins: dict[str, int] = {}
            imaxs: dict[str, int] = {}
            smins: dict[str, str] = {}
            smaxs: dict[str, str] = {}
            # A row group whose stats are OMITTED (parquet drops
            # BYTE_ARRAY min/max over max_statistics_size, ~4KB) makes
            # the file-level bounds from the OTHER groups an
            # UNDERSTATEMENT — pruning on them would skip live rows.
            # Poison such columns (no stats -> never pruned, fail-safe).
            # An all-NULL group contributes no values, so skipping it
            # keeps the file bounds exact — the only safe skip.
            poisoned: set[str] = set()
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if (name not in int_cols and name not in str_cols
                            and name not in dbl_cols):
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        if not (st is not None
                                and st.null_count is not None
                                and st.null_count == g.num_rows):
                            poisoned.add(name)
                        continue
                    if name in dbl_cols:
                        lo, hi = float(st.min), float(st.max)
                        # a NaN min/max carries no order information
                        # (and parquet SILENTLY EXCLUDES NaN from
                        # finite min/max, which _normalize_ranges
                        # compensates for at prune time)
                        if math.isnan(lo) or math.isnan(hi):
                            poisoned.add(name)
                            continue
                        k_lo, k_hi = double_order_key(lo), double_order_key(hi)
                        imins[name] = min(imins.get(name, k_lo), k_lo)
                        imaxs[name] = max(imaxs.get(name, k_hi), k_hi)
                    elif name in int_cols:
                        lo, hi = st.min, st.max
                        if isinstance(lo, datetime.date):
                            # dates as days-since-epoch (Iceberg's encoding)
                            epoch = datetime.date(1970, 1, 1)
                            lo, hi = (lo - epoch).days, (hi - epoch).days
                        lo, hi = int(lo), int(hi)
                        imins[name] = min(imins.get(name, lo), lo)
                        imaxs[name] = max(imaxs.get(name, hi), hi)
                    elif name in str_cols:
                        lo, hi = str(st.min), str(st.max)
                        # parquet-cpp drops an OVERSIZED (>4KB) max but
                        # still reports has_min_max=True with max="" —
                        # an understated bound that would mis-prune.
                        # max=="" carries no pruning value even when
                        # legit (an all-empty column), so poison it;
                        # min>max is impossible for real data.
                        if hi == "" or lo > hi:
                            poisoned.add(name)
                            continue
                        smins[name] = min(smins.get(name, lo), lo)
                        smaxs[name] = max(smaxs.get(name, hi), hi)
            for name in poisoned:
                for d in (imins, imaxs, smins, smaxs):
                    d.pop(name, None)
            return {
                "file_path": rel,
                "partition_id": partition_id,
                "record_count": md.num_rows,
                "file_size_bytes": os.path.getsize(fp),
                "added_snapshot_id": -1,  # patched at commit
                "int_mins": imins,
                "int_maxs": imaxs,
                "str_mins": smins,
                "str_maxs": smaxs,
            }

        paths = sorted(
            globmod.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
        )
        if len(paths) <= 4:
            return [one(p) for p in paths]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(paths))) as ex:
            return list(ex.map(one, paths))

    @staticmethod
    def _manifest_column_bounds(entries: list[dict]) -> dict:
        """Manifest-level column summaries for the manifest list:
        {"int"|"str": {col: [lo, hi]}} over the entries' per-file
        stats. A column is summarized ONLY when every entry carries
        both its min and max — one stats-less file and the manifest
        must stay un-skippable for that column."""
        out: dict = {}
        for kind, mins_k, maxs_k in (("int", "int_mins", "int_maxs"),
                                     ("str", "str_mins", "str_maxs")):
            cols = set()
            for e in entries:
                cols |= set(e.get(mins_k) or {})
            summ = {}
            for col in cols:
                if all(col in (e.get(mins_k) or {})
                       and col in (e.get(maxs_k) or {}) for e in entries):
                    summ[col] = [min(e[mins_k][col] for e in entries),
                                 max(e[maxs_k][col] for e in entries)]
            if summ:
                out[kind] = summ
        return out

    def _write_manifest(
        self, entries: list[dict], snapshot_id: int,
    ) -> tuple[str, list[str], dict]:
        """Write a manifest file; returns (relative path, sorted
        partition ids it covers, column bounds) — the manifest-list
        summary pair that lets planners skip this manifest without
        opening it.

        ``added_snapshot_id`` is stamped only on FRESH entries (the -1
        sentinel from the writer); survivor entries carried through a
        commit_replace manifest rewrite KEEP the id of the commit that
        actually added their file — it is the file's data lineage
        (Iceberg's data sequence number), and re-stamping it would
        make equality-delete sequence scoping and partition-spec
        attribution silently wrong for every file that survives any
        rewrite commit."""
        for e in entries:
            if e.get("added_snapshot_id", -1) == -1:
                e["added_snapshot_id"] = snapshot_id
            # survivor entries read from pre-bloom manifests
            e.setdefault("blooms", {})
            # entries predating row lineage carry no first_row_id
            e.setdefault("first_row_id", None)
        name = f"manifest-{snapshot_id}-{uuid.uuid4().hex[:8]}.parquet"
        cols = {
            k: [
                (list(e[k].items()) if isinstance(e[k], dict) else e[k])
                for e in entries
            ]
            for k in [f.name for f in _MANIFEST_SCHEMA]
        }
        tbl = pa.table(cols, schema=_MANIFEST_SCHEMA)
        pq.write_table(tbl, os.path.join(self.manifest_dir, name))
        return (os.path.join("manifests", name),
                sorted({e["partition_id"] for e in entries}),
                self._manifest_column_bounds(entries))

    def read_manifest_entries(self, manifest_rel: str) -> list[dict]:
        tbl = pq.read_table(os.path.join(self.meta_dir, manifest_rel))
        rows = tbl.to_pylist()
        for r in rows:
            for k in ("int_mins", "int_maxs", "str_mins", "str_maxs", "blooms"):
                r[k] = dict(r.get(k) or [])
            r.setdefault("first_row_id", None)
        return rows

    # ---------------- commits ----------------

    def _next_ids(self, meta: dict) -> tuple[int, int]:
        seq = meta["last_sequence"] + 1
        # snapshot ids: sequence-scoped but unique & monotonic
        snap_id = int(time.time() * 1000) * 1000 + seq % 1000
        existing = {s["snapshot_id"] for s in meta["snapshots"]}
        while snap_id in existing:
            snap_id += 1
        return snap_id, seq

    def _assign_row_ids(self, entries: list[dict], meta: dict) -> int:
        """Row lineage (Iceberg v3): allocate each FRESH data-file
        entry's ``first_row_id`` range from the table-level
        ``next_row_id`` counter; return the advanced counter for the
        commit to persist. A row's stable id is
        ``coalesce(materialized _lh_row_id, first_row_id + position)``.
        Fresh = ``added_snapshot_id == -1`` (the writer sentinel);
        survivor/cherry-picked entries keep their original allocation —
        the counter is table-level (shared across branches), so ids
        allocated on a branch stay globally unique after publish.
        Assignment OVERWRITES on commit retry: the counter may have
        advanced, and the retry re-reads ``meta`` anyway."""
        cursor = int(meta.get("next_row_id", 0))
        for e in entries:
            if e.get("added_snapshot_id", -1) == -1:
                e["first_row_id"] = cursor
                cursor += int(e["record_count"])
        return cursor

    def _commit(
        self,
        base_meta: dict,
        new_snapshot: Snapshot,
        expected_parent: int | None,
        branch: str = "main",
        next_row_id: int | None = None,
    ) -> Snapshot:
        """Atomic commit: validate parent, write v<N+1>, swap pointer.
        ``branch`` selects which ref the commit advances; the parent
        validation runs against THAT ref's live head (a branch dropped
        concurrently surfaces as a head mismatch)."""
        cur_v = self.current_version()
        if cur_v != base_meta["_version"]:
            raise ConcurrentCommitError(
                f"table advanced v{base_meta['_version']} -> v{cur_v} during commit"
            )
        live = self.load_metadata(cur_v)
        live_head = (live["current_snapshot_id"] if branch == "main"
                     else live.get("branches", {}).get(branch))
        if live_head != expected_parent:
            raise ConcurrentCommitError(
                f"expected parent snapshot {expected_parent} on {branch!r}, "
                f"found {live_head}"
            )
        meta = {k: v for k, v in base_meta.items() if not k.startswith("_")}
        meta["snapshots"] = meta["snapshots"] + [new_snapshot.to_json()]
        # permanent (never expired) snapshot_id -> sequence record: the
        # data lineage of files OUTLIVES their adding snapshot (manifest
        # entries keep added_snapshot_id after expiry), and both
        # equality-delete scoping and partition-spec attribution resolve
        # through it. ~30 bytes per commit, bounded by commit count.
        seqs = dict(meta.get("snapshot_seqs", {}))
        seqs[str(new_snapshot.snapshot_id)] = new_snapshot.sequence
        meta["snapshot_seqs"] = seqs
        if branch == "main":
            meta["current_snapshot_id"] = new_snapshot.snapshot_id
        else:
            br = dict(meta.get("branches", {}))
            br[branch] = new_snapshot.snapshot_id
            meta["branches"] = br
        meta["last_sequence"] = new_snapshot.sequence
        if next_row_id is not None:
            # never regress: a caller that assigned nothing passes the
            # base counter back; a concurrent branch commit cannot have
            # advanced it (version CAS above already failed that case)
            meta["next_row_id"] = max(
                int(meta.get("next_row_id", 0)), next_row_id)
        new_v = cur_v + 1
        # exclusive create = the CAS: a concurrent committer who also
        # passed the checks above loses here instead of silently
        # overwriting our v<N+1> (lost commit)
        _exclusive_write(self._meta_path(new_v), json.dumps(meta, indent=1))
        _atomic_write(self._hint_path, str(new_v))
        self._prune_metadata_versions(meta, new_v)
        return new_snapshot

    def commit_append(self, entries: list[dict], summary: dict | None = None,
                      retries: int = 3,
                      expected_parent: "int | None | object" = UNPINNED,
                      branch: str = "main") -> Snapshot:
        """Append commit with optimistic-concurrency retry: the FILES of
        an append compose with any concurrent commit, so on
        ConcurrentCommitError the commit re-reads the advanced metadata
        and re-applies itself (Iceberg's retryable snapshot producer).

        Callers whose SEMANTICS carry a check-then-commit precondition
        (the streaming exactly-once batch check, insert-only MERGE's
        anti-join) must pass ``retries=0`` and re-validate the
        precondition themselves before retrying — a blind retry would
        commit data whose premise a concurrent commit just broke.
        ``expected_parent=None`` pins "no parent snapshot yet" (the
        bootstrap precondition); the default UNPINNED disables the
        check. ``branch`` appends onto a named branch's head instead
        of main — the write-audit-publish staging write (the branch
        must exist; only appends support branches, rewrites stay
        main-only)."""
        last: Exception | None = None
        # entries fresh on ENTRY (writer's -1 sentinel): a losing
        # attempt's _write_manifest stamp must not stick — the retry's
        # manifest would otherwise carry the uncommitted attempt's
        # snapshot id (breaking sequence scoping) and a stale
        # first_row_id range (breaking row-id uniqueness)
        fresh = [e for e in entries if e.get("added_snapshot_id", -1) == -1]
        for _ in range(max(1, retries + 1)):
            for e in fresh:
                e["added_snapshot_id"] = -1
            meta = self.load_metadata()
            next_row_id = self._assign_row_ids(entries, meta)
            if branch == "main":
                parent = meta["current_snapshot_id"]
            else:
                parent = self.branch_head(branch, meta)  # ValueError if absent
            if expected_parent is not UNPINNED and parent != expected_parent:
                # caller's check-then-commit premise (anti-join, batch-id
                # scan) was computed against expected_parent — any commit
                # since then must surface for re-validation, not compose
                raise ConcurrentCommitError(
                    f"table advanced past plan snapshot {expected_parent} "
                    f"(now {parent}); precondition must be re-validated"
                )
            snap_id, seq = self._next_ids(meta)
            manifest, parts, mb = self._write_manifest(entries, snap_id)
            prev = (self.current_snapshot(meta) if branch == "main"
                    else next(s for s in self.snapshots_list(meta)
                              if s.snapshot_id == parent))
            manifests = (prev.manifests if prev else []) + [manifest]
            mparts = dict(prev.manifest_parts if prev else {})
            mparts[manifest] = parts
            mbounds = dict(prev.manifest_bounds if prev else {})
            mbounds[manifest] = mb
            snap = Snapshot(
                snap_id, parent, seq, int(time.time() * 1000), "append", manifests,
                {"added-files": len(entries),
                 "added-records": sum(e["record_count"] for e in entries),
                 "added-bytes": sum(e["file_size_bytes"] for e in entries),
                 **(summary or {})},
                mparts,
                list(prev.delete_manifests) if prev else [],
                dict(prev.delete_manifest_meta) if prev else {},
                manifest_bounds=mbounds,
            )
            try:
                return self._commit(meta, snap, parent, branch=branch,
                                    next_row_id=next_row_id)
            except ConcurrentCommitError as e:
                last = e
                # drop the attempt's manifest rather than leave litter
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(self.meta_dir, manifest))
        # restore the writer sentinel before surfacing: a caller that
        # re-validates (the rebase path) re-invokes commit_append with
        # the SAME entry dicts — without the reset they would keep the
        # losing attempt's snapshot-id stamp and stale first_row_id
        # range (dead-id sequence scoping + duplicate row ids)
        for e in fresh:
            e["added_snapshot_id"] = -1
        raise last

    def commit_replace(
        self,
        removed_paths: set[str],
        entries: list[dict],
        operation: str = "replace",
        summary: dict | None = None,
        affected_partitions: set[str] | None = None,
        retries: int = 3,
        expected_parent: "int | None | object" = UNPINNED,
        expected_delete_manifests: "set[str] | None" = None,
    ) -> Snapshot:
        """Replace-files commit (compaction / clustering / MERGE / partition
        overwrite). Surviving entries of affected manifests are rewritten
        into a fresh manifest — the incremental form of manifest rewrite;
        untouched manifests are carried over by reference.

        ``expected_delete_manifests`` — REQUIRED correctness guard for
        content-neutral rewrites (compaction / clustering / split /
        migrate) that replace files with content scanned earlier: the
        delete-manifest set the rewrite's SCAN applied. The commit
        carries pending delete files forward on the premise that
        entries referencing the removed files were already applied by
        the rewrite's MOR scan; a delete file that landed AFTER that
        scan was NOT applied, so carrying it against the removed files
        silently resurrects the concurrently deleted rows (Iceberg's
        RewriteFiles validates the same thing via
        validateNoNewDeletesForDataFiles). When the current
        delete-manifest set differs, the commit raises a non-retryable
        ConcurrentCommitError on EVERY attempt — the caller must
        rescan (the chunked maintenance ops resume per-chunk).
        Pinned commits (``expected_parent``) don't need it: any
        concurrent commit already surfaces there.

        ``affected_partitions`` lets the commit SKIP manifests whose
        manifest-list partition summary is disjoint (never opened) — at
        10^12 scale the commit cost becomes O(affected manifests), not
        O(table). Safety: the removed-paths count check below still
        fails loudly if a caller passes a wrong partition set.

        Optimistic concurrency: on ConcurrentCommitError the commit
        re-reads the advanced metadata and re-derives survivors; a
        DISJOINT concurrent commit (different partitions) then composes
        cleanly, and for content-neutral rewrites (those passing
        ``expected_delete_manifests``) so does a concurrent commit that
        only ADDED files into the affected partitions — the additions
        are not in the removed set, so they survive next to the
        rewritten output (a streaming ingest landing during compaction
        composes instead of killing the chunk). A conflicting one is
        non-retryable: our removed files gone -> ValueError (stale
        plan), files vanished from the affected partitions, or — for
        declarative partition replaces, which must supersede everything
        — ANY affected-set change -> ConcurrentCommitError surfaces so
        the caller replans. Without ``affected_partitions`` there is no
        way to prove the concurrent commit disjoint, so no retry.

        ``expected_parent`` pins the commit to the snapshot the caller's
        PLAN was derived from: if any commit (even a partition-disjoint
        append) landed since, the commit fails with
        ConcurrentCommitError so the caller replans. This is what
        content-sensitive rewrites (MERGE) need — their matched/
        not-matched classification is a table-wide precondition, and a
        concurrent append of a matching key into an untouched partition
        would otherwise compose silently into duplicate keys (Iceberg's
        copy-on-write MERGE likewise validates conflicting appends
        against the merge condition table-wide, not per partition).
        Content-neutral rewrites (compaction/clustering) should leave it
        UNPINNED and keep the compose-with-retry behavior."""
        last: Exception | None = None
        baseline: dict = {"affected_files": None}
        attempts = max(1, retries + 1) if affected_partitions is not None else 1
        for _ in range(attempts):
            try:
                return self._commit_replace_once(
                    removed_paths, entries, operation, summary,
                    affected_partitions, baseline, expected_parent,
                    expected_delete_manifests,
                )
            except ConcurrentCommitError as e:
                if getattr(e, "non_retryable", False):
                    raise  # baseline can never match again: replan now
                last = e
        raise last

    def _commit_replace_once(
        self,
        removed_paths: set[str],
        entries: list[dict],
        operation: str,
        summary: dict | None,
        affected_partitions: set[str] | None,
        baseline: dict | None = None,
        expected_parent: "int | None | object" = UNPINNED,
        expected_delete_manifests: "set[str] | None" = None,
    ) -> Snapshot:
        meta = self.load_metadata()
        parent = meta["current_snapshot_id"]
        if expected_parent is not UNPINNED and parent != expected_parent:
            raise ConcurrentCommitError(
                f"table advanced past plan snapshot {expected_parent} "
                f"(now {parent}); content-sensitive rewrite must replan"
            )
        if expected_delete_manifests is not None:
            cur_snap = self.current_snapshot(meta)
            cur_dm = set(cur_snap.delete_manifests) if cur_snap else set()
            if cur_dm != set(expected_delete_manifests):
                # see commit_replace docstring: a delete file that
                # landed after the rewrite's scan was never applied to
                # the replacement files — carrying it forward against
                # the removed files resurrects concurrently deleted
                # rows. Never compose; the caller must rescan.
                err = ConcurrentCommitError(
                    "delete files changed since the rewrite scanned its "
                    "input — concurrently deleted rows would resurrect "
                    "through the rewritten files; rescan required"
                )
                err.non_retryable = True
                raise err
        # ``entries`` are always freshly-written files (every caller
        # pairs this with write_data_files); re-arm the writer sentinel
        # so a retry after a losing attempt re-stamps snapshot id and
        # re-allocates the first_row_id range against the reloaded meta
        for e in entries:
            e["added_snapshot_id"] = -1
        next_row_id = self._assign_row_ids(entries, meta)
        prev = self.current_snapshot(meta)
        snap_id, seq = self._next_ids(meta)
        prev_manifests = prev.manifests if prev else []
        prev_parts = prev.manifest_parts if prev else {}
        prev_bounds = prev.manifest_bounds if prev else {}
        kept_manifests: list[str] = []
        mparts: dict[str, list[str]] = {}
        mbounds: dict[str, dict] = {}
        to_read: list[str] = []
        for m in prev_manifests:
            parts = prev_parts.get(m)
            if (affected_partitions is not None and parts is not None
                    and not (set(parts) & affected_partitions)):
                kept_manifests.append(m)  # disjoint: keep without opening
                mparts[m] = parts
                if m in prev_bounds:
                    mbounds[m] = prev_bounds[m]
            else:
                to_read.append(m)
        if len(to_read) > 1:  # thread-pooled manifest reads (I/O)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(to_read))) as ex:
                manifest_rows = list(ex.map(self.read_manifest_entries, to_read))
        else:
            manifest_rows = [self.read_manifest_entries(m) for m in to_read]
        survivors: list[dict] = []
        removed_seen = 0
        affected_files: set[str] = set()
        for m, rows in zip(to_read, manifest_rows):
            hit = [r for r in rows if r["file_path"] in removed_paths]
            if affected_partitions is not None:
                affected_files |= {
                    r["file_path"] for r in rows
                    if r["partition_id"] in affected_partitions
                }
            if not hit:
                kept_manifests.append(m)
                mparts[m] = prev_parts.get(m) or sorted({r["partition_id"] for r in rows})
            else:
                removed_seen += len(hit)
                survivors.extend(r for r in rows if r["file_path"] not in removed_paths)
        # retry safety: the affected partitions' live file set must
        # match the first attempt's — a concurrent commit that removed
        # files there invalidates the rewrite plan. For CONTENT-NEUTRAL
        # rewrites (the expected_delete_manifests callers: compaction /
        # clustering / split / migrate), pure ADDITIONS compose: the
        # added file is not in the removed set, so it simply survives
        # next to the rewritten output — Iceberg RewriteFiles likewise
        # accepts concurrent appends while validating files-exist and
        # no-new-deletes. Declarative partition replaces (overwrite)
        # must keep surfacing on additions, or the replaced partition
        # silently retains rows the replace was meant to supersede.
        if baseline is not None and affected_partitions is not None:
            adds_ok = expected_delete_manifests is not None
            if baseline["affected_files"] is None:
                baseline["affected_files"] = affected_files
            elif baseline["affected_files"] != affected_files:
                vanished = baseline["affected_files"] - affected_files
                if adds_ok and not vanished:
                    # additions only: adopt and compose
                    baseline["affected_files"] = affected_files
                else:
                    # files vanished (or a replace that cannot absorb
                    # additions): retrying composes data the plan never
                    # saw, so surface for a REPLAN — non-retryable (the
                    # baseline can never match again within this plan)
                    err = ConcurrentCommitError(
                        "affected partitions changed under the rewrite "
                        "plan (concurrent commit into "
                        f"{sorted(affected_partitions)}); replan required"
                    )
                    err.non_retryable = True
                    raise err
        if removed_seen != len(removed_paths):
            # a concurrent rewrite/delete already replaced files this
            # plan is removing — the caller's contract is the same
            # catch-and-REPLAN as every other conflict surface here
            # (was a bare ValueError, which replan loops don't catch);
            # a wrong affected_partitions set from an external caller
            # surfaces with the same message and keeps failing on
            # replan, so the bug still shows loudly.
            err = ConcurrentCommitError(
                f"{len(removed_paths) - removed_seen} removed paths not "
                "found in current snapshot (stale plan — concurrent "
                "rewrite/delete — or affected_partitions excluded a "
                "manifest that held removed files); replan required"
            )
            err.non_retryable = True
            raise err
        new_manifests = list(kept_manifests)
        if survivors:
            m, parts, mb = self._write_manifest(survivors, snap_id)
            new_manifests.append(m)
            mparts[m] = parts
            mbounds[m] = mb
        if entries:
            m, parts, mb = self._write_manifest(entries, snap_id)
            new_manifests.append(m)
            mparts[m] = parts
            mbounds[m] = mb
        snap = Snapshot(
            snap_id, parent, seq, int(time.time() * 1000), operation, new_manifests,
            {"removed-files": len(removed_paths), "added-files": len(entries),
             "added-records": sum(e["record_count"] for e in entries),
             **(summary or {})},
            mparts,
            # pending position deletes survive a file rewrite: entries
            # referencing the removed files become no-ops (their data
            # file is gone AND the rewrite applied them via the MOR
            # scan), entries for untouched files stay live. Clearing is
            # rewrite_position_deletes' explicit final commit.
            list(prev.delete_manifests) if prev else [],
            dict(prev.delete_manifest_meta) if prev else {},
            manifest_bounds=mbounds,
        )
        return self._commit(meta, snap, parent, next_row_id=next_row_id)

    def append(self, df: DataFrame, n_files: int | None = None,
               sort_cols: list[str] | None = None,
               branch: str = "main", wap_id: str | None = None) -> Snapshot:
        """``wap_id`` stamps the commit with a write-audit-publish id
        (Iceberg's ``wap.id`` summary property): the job's unique id
        rides the staged snapshot, and :meth:`cherrypick_snapshot`
        refuses to publish the same id twice — replay protection for
        at-least-once orchestrators re-running a publish step."""
        summary = {"wap.id": wap_id} if wap_id else None
        return self.commit_append(
            self.write_data_files(self.conform(df), n_files, sort_cols),
            summary=summary, branch=branch)

    def overwrite(self, df: DataFrame, n_files: int | None = None,
                  summary: dict | None = None, retries: int = 3) -> Snapshot:
        """Full-content replace in ONE commit — the reference's
        CREATE OR REPLACE / INSERT-after-truncate gold rebuild
        (src/sql/gold.sql runs it per DAG pass), with snapshot history
        preserved: the new snapshot simply carries NO previous
        manifests (and no delete manifests — replaced rows' pending
        deletes die with them), so the removal is metadata-only and
        O(new data) regardless of how many files the table held.
        Time travel to pre-replace snapshots keeps working; prior
        files are reclaimed by ``expire_snapshots`` + GC like any
        rewrite. Schema stays the declared one (``conform`` casts the
        frame); use drop+create for a schema-changing replace.

        Concurrency: a replace supersedes EVERYTHING, including any
        commit that lands mid-write, so it composes with concurrent
        appends by retrying onto the advanced head — last write wins,
        the Iceberg dynamic-overwrite semantic."""
        entries = self.write_data_files(self.conform(df), n_files)
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            for e in entries:
                e["added_snapshot_id"] = -1  # fresh per attempt
            meta = self.load_metadata()
            next_row_id = self._assign_row_ids(entries, meta)
            parent = meta["current_snapshot_id"]
            snap_id, seq = self._next_ids(meta)
            manifest, parts, mb = self._write_manifest(entries, snap_id)
            snap = Snapshot(
                snap_id, parent, seq, int(time.time() * 1000), "replace",
                [manifest],
                {"added-files": len(entries),
                 "added-records": sum(e["record_count"] for e in entries),
                 "added-bytes": sum(e["file_size_bytes"] for e in entries),
                 "replaced-all": True, **(summary or {})},
                {manifest: parts},
                [], {}, manifest_bounds={manifest: mb},
            )
            try:
                return self._commit(meta, snap, parent,
                                    next_row_id=next_row_id)
            except ConcurrentCommitError as e:
                last = e
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(self.meta_dir, manifest))
        raise last

    def cherrypick_snapshot(self, snapshot_id: int, retries: int = 3) -> Snapshot:
        """Publish a staged APPEND snapshot onto current main even when
        main has advanced since the snapshot was cut — Iceberg's
        cherrypick_snapshot, the write-audit-publish publish path that
        :meth:`fast_forward` cannot serve once main moved. An append
        is pure addition, so replaying it on a newer base is always
        content-safe: the staged snapshot's added files are re-committed
        as a NEW snapshot (new sequence — so equality deletes committed
        on main in between do NOT apply to the republished rows,
        matching Iceberg's data-sequence-at-publish semantics).

        Guards:

        * only ``operation == "append"`` snapshots (a rewrite's removals
          cannot be replayed onto a diverged base);
        * a snapshot already in main's ancestry is a no-op (returns the
          current head);
        * a ``wap.id`` already published to main (as ``wap.id`` or
          ``published-wap-id`` on any ancestor) raises ValueError —
          Iceberg's duplicate-WAP-commit protection;
        * refused if the partition spec evolved after the snapshot was
          staged (its files' partition values belong to the older spec;
          re-stamping them into the current era would mis-prune).

        The dedup check is re-validated on every commit attempt (the
        commit pins the head the ancestry walk saw), so two racing
        publishes of the same wap.id serialize: one wins, the other
        re-walks the new ancestry and refuses.
        """
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            snaps = {s.snapshot_id: s for s in self.snapshots_list(meta)}
            if snapshot_id not in snaps:
                raise ValueError(f"unknown snapshot {snapshot_id}")
            src = snaps[snapshot_id]
            head = meta["current_snapshot_id"]
            # already an ancestor of main? publishing again must be a no-op
            wap_id = src.summary.get("wap.id")
            sid = head
            while sid is not None:
                s = snaps.get(sid)
                if s is None:
                    break
                if sid == snapshot_id or str(
                    s.summary.get("source-snapshot-id")
                ) == str(snapshot_id):
                    # staged id in ancestry, OR an ancestor IS a prior
                    # cherry-pick of it (publish commits a NEW id, so
                    # an at-least-once replay without wap.id would
                    # otherwise re-append the same files)
                    return self.current_snapshot(meta)
                if wap_id and wap_id in (s.summary.get("wap.id"),
                                         s.summary.get("published-wap-id")):
                    raise ValueError(
                        f"wap.id {wap_id!r} was already published to main "
                        f"(snapshot {sid}); duplicate publish refused")
                sid = s.parent_id
            if src.operation != "append":
                raise ValueError(
                    f"cherrypick supports append snapshots only; "
                    f"{snapshot_id} is {src.operation!r} (publish rewrites "
                    "via fast_forward on an unchanged target, or re-run "
                    "them against main)")
            cur_spec_from = self.partition_specs(meta)[-1]["from_seq"]
            if src.sequence < cur_spec_from:
                raise ValueError(
                    "partition spec evolved after the staged snapshot; its "
                    "files belong to the older spec — re-stage against the "
                    "current spec instead of cherry-picking")
            parent = (snaps.get(src.parent_id)
                      if src.parent_id is not None else None)
            parent_manifests = set(parent.manifests) if parent else set()
            entries: list[dict] = []
            for m in src.manifests:
                if m not in parent_manifests:
                    entries.extend(self.read_manifest_entries(m))
            entries = [dict(e, added_snapshot_id=-1) for e in entries
                       if e["added_snapshot_id"] == snapshot_id]
            if not entries:
                return self.current_snapshot(meta)
            summary = {"op": "cherrypick", "source-snapshot-id": snapshot_id}
            if wap_id:
                summary["published-wap-id"] = wap_id
            try:
                return self.commit_append(entries, summary=summary,
                                          retries=0, expected_parent=head)
            except ConcurrentCommitError as e:
                last = e  # head moved: re-walk ancestry, re-check dedup
        raise last

    def overwrite_partitions(self, df: DataFrame, n_files: int | None = None) -> Snapshot:
        """Dynamic-partition-overwrite: the Spark-native form of the
        reference's idempotent `DELETE FROM t WHERE fecha = ds` + INSERT
        (dags/Silver_Transform_Dag.py:188-207). Partitions present in
        ``df`` are replaced wholesale; others untouched.

        Refused on a partially-migrated evolved table: "replace the
        partition" is ill-defined while files from an older spec still
        hold rows of the target partitions — compact/cluster first
        (rewrites re-partition under the current spec)."""
        meta = self.load_metadata()
        cur_ids = self._current_spec_snapshot_ids(meta)
        if cur_ids is not None:
            spark = df.sparkSession
            old_left = (
                self.files(spark)
                .filter(~F.col("added_snapshot_id").isin(cur_ids))
                .limit(1).count()
            )
            if old_left:
                raise ValueError(
                    "overwrite_partitions on an evolved table with "
                    "older-spec files present; run compaction/clustering "
                    "to migrate them to the current spec first"
                )
        entries = self.write_data_files(self.conform(df), n_files)
        new_parts = {e["partition_id"] for e in entries}
        removed = {
            r["file_path"]
            for r in self.plan_files(df.sparkSession, partition_values=new_parts)
            .select("file_path").collect()
        }
        return self.commit_replace(removed, entries, operation="overwrite",
                                   affected_partitions=new_parts)

    # ---------------- metadata as DataFrames ----------------

    def all_entries(self, snapshot_id: int | None = None) -> list[dict]:
        snap = (
            self.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.current_snapshot()
        )
        if snap is None:
            return []
        out: list[dict] = []
        for m in snap.manifests:
            out.extend(self.read_manifest_entries(m))
        return out

    def files(self, spark: SparkSession, snapshot_id: int | None = None,
              manifest_subset: list[str] | None = None) -> DataFrame:
        """The `files` metadata table as a Spark DataFrame (manifest scan).

        This is the planning surface for every maintenance op: at
        10^12-image scale this DataFrame has ~millions of rows and is
        aggregated distributed, never collected whole.

        ``manifest_subset`` restricts the scan to the named manifests
        (the manifest-list pruning hook — plan_files passes the
        `_prune_manifests` survivors so a partition/range-scoped plan
        opens only the manifests that can contain matches)."""
        snap = (
            self.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.current_snapshot()
        )
        if snap is None or not snap.manifests:
            return spark.createDataFrame([], self._files_spark_schema())
        manifests = snap.manifests
        if manifest_subset is not None:
            unknown = set(manifest_subset) - set(manifests)
            if unknown:
                raise ValueError(
                    f"manifest_subset names manifests outside the "
                    f"snapshot: {sorted(unknown)[:3]}")
            manifests = list(manifest_subset)
            if not manifests:
                return spark.createDataFrame([], self._files_spark_schema())
        paths = [os.path.join(self.meta_dir, m) for m in manifests]
        # explicit schema: manifests written before a schema addition
        # (e.g. the blooms column) read the missing column as null
        return spark.read.schema(self._files_spark_schema()).parquet(*paths)

    def _bounds_from_files_df(self, files_df: DataFrame) -> dict:
        """Manifest column bounds computed DISTRIBUTED from a files
        metadata DataFrame (for manifests written by Spark —
        rewrite_manifests / clone — where no driver-side entry list
        exists). Same all-entries-must-have-stats rule as
        `_manifest_column_bounds`; the driver receives O(columns)
        rows."""
        total = files_df.count()
        if total == 0:
            return {}
        out: dict = {}
        for kind, mins_c, maxs_c in (("int", "int_mins", "int_maxs"),
                                     ("str", "str_mins", "str_maxs")):
            lo = (files_df.select(F.explode(mins_c).alias("col", "v"))
                  .groupBy("col")
                  .agg(F.count("*").alias("n"), F.min("v").alias("lo")))
            hi = (files_df.select(F.explode(maxs_c).alias("col", "v"))
                  .groupBy("col")
                  .agg(F.count("*").alias("n"), F.max("v").alias("hi")))
            rows = (lo.filter(F.col("n") == total).drop("n")
                    .join(hi.filter(F.col("n") == total).drop("n"), "col")
                    .collect())
            if rows:
                out[kind] = {r["col"]: [r["lo"], r["hi"]] for r in rows}
        return out

    def _normalize_ranges(
        self, int_ranges: dict | None,
    ) -> "tuple[dict | None, set[str]]":
        """Canonicalize stats-prune ranges: double/float columns' bounds
        map through ``double_order_key`` into the encoded int-stats
        domain, and their LOWER-bound prune test is disabled unless the
        range is a point. Why: parquet writes finite min/max even when
        the file holds NaN rows (NaN silently excluded), and Spark
        orders NaN ABOVE every value — so skipping a file on
        ``max < lo`` could drop NaN rows that satisfy ``col > lo``.
        The ``min > hi`` test stays safe (NaN satisfies no upper
        bound), and point ranges keep both (NaN equals nothing).
        Returns (normalized ranges, columns whose lower test is off).
        A NaN bound disables stats pruning for that column entirely."""
        if not int_ranges:
            return int_ranges, set()
        fields = {f.name: f.dataType for f in self.schema().fields}
        out: dict = {}
        skip_lower: set[str] = set()
        for col, (lo, hi) in int_ranges.items():
            if not isinstance(fields.get(col), _DOUBLE_STAT_TYPES):
                out[col] = (lo, hi)
                continue
            if ((lo is not None and math.isnan(float(lo)))
                    or (hi is not None and math.isnan(float(hi)))):
                continue
            point = (lo is not None and hi is not None
                     and float(lo) == float(hi))
            out[col] = (double_order_key(lo) if lo is not None else None,
                        double_order_key(hi) if hi is not None else None)
            if not point:
                skip_lower.add(col)
        return out, skip_lower

    def _prune_manifests(
        self,
        snap: "Snapshot",
        meta: dict,
        partition_values: set | None = None,
        int_ranges: dict | None = None,
    ) -> tuple[list[str], int]:
        """Manifest-list pruning: the subset of ``snap.manifests`` a
        scan with these predicates must open, plus how many were
        skipped. Pure driver-side set logic over the snapshot's
        manifest_parts / manifest_bounds summaries — O(#manifests),
        no manifest file is opened. Conservative everywhere: a
        manifest with no summary for a dimension is kept, and
        partition-based skipping is disabled on spec-evolved tables
        (old-spec partition ids live in a different value domain —
        same guard as the row-level branch in plan_files)."""
        cands = list(snap.manifests)
        skipped = 0
        int_ranges, skip_lower = self._normalize_ranges(int_ranges)
        if (partition_values is not None
                and self._current_spec_snapshot_ids(meta) is None):
            pv = {str(v) for v in partition_values}
            keep = []
            for m in cands:
                parts = snap.manifest_parts.get(m)
                if parts is not None and not (set(parts) & pv):
                    skipped += 1
                else:
                    keep.append(m)
            cands = keep
        for col, (lo, hi) in (int_ranges or {}).items():
            is_str = isinstance(lo, str) or isinstance(hi, str)
            kind = "str" if is_str else "int"
            keep = []
            for m in cands:
                b = (snap.manifest_bounds.get(m) or {}).get(kind, {}).get(col)
                if b is None:
                    keep.append(m)
                    continue
                bmin, bmax = b
                ok = ((lo is None or col in skip_lower
                       or bmax >= (lo if is_str else int(lo)))
                      and (hi is None or bmin <= (hi if is_str else int(hi))))
                if ok:
                    keep.append(m)
                else:
                    skipped += 1
            cands = keep
        return cands, skipped

    def _manifest_paths_df(self, spark: SparkSession,
                           manifests: set[str] | list[str]) -> DataFrame:
        """DISTINCT ``file_path`` across a set of manifests as a
        DataFrame — the GC planning primitive. Reads only the path
        column (works for data AND delete manifests, whose stats
        columns differ); the driver handles manifest NAMES only."""
        paths = [os.path.join(self.meta_dir, m) for m in manifests]
        schema = T.StructType([T.StructField("file_path", T.StringType())])
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths).distinct()

    def size_stats(self, spark: SparkSession) -> dict:
        """Table-level (files, bytes, rows) as ONE aggregation of the
        files metadata DataFrame — the planning-safe substitute for
        materializing ``all_entries()`` on the driver (which at 10^12
        scale is millions of rows)."""
        row = self.files(spark).agg(
            F.count("*").alias("files"),
            F.sum("file_size_bytes").alias("bytes"),
            F.sum("record_count").alias("rows"),
        ).collect()[0]
        return {"files": int(row["files"] or 0), "bytes": int(row["bytes"] or 0),
                "rows": int(row["rows"] or 0)}

    def stats_aggregate(
        self, spark: SparkSession, cols: "list[str] | tuple[str, ...]" = (),
        snapshot_id: int | None = None,
        partition_eq: "tuple[str, object] | None" = None,
    ) -> dict | None:
        """COUNT(*)/MIN/MAX answered from manifest stats alone — the
        Iceberg aggregate-pushdown analog (reference dashboards run
        these as full-table DuckDB scans,
        /root/reference/src/sql/gold.sql): at 10^12-image scale this
        turns a 100 TB data scan into ONE O(files) aggregation of the
        manifest DataFrame, never touching a data file.

        Returns ``{"row_count": n, "mins": {col: v}, "maxs": {col: v}}``
        or **None when metadata cannot answer exactly**, and the caller
        must fall back to a data scan:

        - the snapshot carries delete files (position/DV/equality
          deletes make ``record_count`` and file bounds overstatements);
        - a requested column is not an int-stat or string type;
        - a live file lacks min/max stats for a requested column — an
          absent entry is either all-NULL rows (skippable: SQL MIN/MAX
          ignore NULLs) or poisoned oversized stats (NOT skippable),
          and the manifest cannot distinguish them, so the same
          every-entry-must-have-stats rule as manifest-list bounds
          applies (`_manifest_column_bounds`).

        MIN/MAX over an EMPTY table is NULL (``mins[col] is None``).
        Date columns come back as days-since-epoch ints (the manifest
        encoding); callers convert.

        ``partition_eq=(col, value)`` scopes the aggregate to one
        partition — exact ONLY when the partition transform is
        identity on that column and the spec never evolved (an
        identity partition's files contain exactly the rows with that
        value; a bucket/truncate partition or an old-spec file does
        not), else None.
        """
        snap = (self.snapshot_by_id(snapshot_id) if snapshot_id is not None
                else self.current_snapshot())
        if snap is not None and snap.delete_manifests:
            return None
        part_pv = None
        if partition_eq is not None:
            meta = self.load_metadata()
            pcol, pval = partition_eq
            if (pval is None or pcol != meta.get("partition_col")
                    or self.partition_transform(meta) != "identity"
                    or len(self.partition_specs(meta)) != 1):
                return None
            part_pv = self.partition_values_of(spark, [pval], meta)[0]
        schema = self.schema()
        kinds: dict[str, str] = {}
        for c in cols:
            field = next((f for f in schema.fields if f.name == c), None)
            if field is None:
                raise ValueError(f"no column {c!r} in table schema")
            if isinstance(field.dataType, _STAT_TYPES):
                kinds[c] = "int"
            elif isinstance(field.dataType, T.StringType):
                kinds[c] = "str"
            else:
                return None
        files = self.files(spark, snapshot_id)
        if part_pv is not None:
            files = files.filter(F.col("partition_id") == part_pv)
        nonempty = F.col("record_count") > 0  # zero-row files: exact skips
        aggs = [F.sum("record_count").alias("__rows"),
                F.count(F.when(nonempty, F.lit(1))).alias("__files")]
        for i, c in enumerate(cols):
            mins_c, maxs_c = ((f"{kinds[c]}_mins", f"{kinds[c]}_maxs"))
            lo = F.when(nonempty, F.element_at(F.col(mins_c), F.lit(c)))
            hi = F.when(nonempty, F.element_at(F.col(maxs_c), F.lit(c)))
            aggs += [F.min(lo).alias(f"__lo{i}"), F.max(hi).alias(f"__hi{i}"),
                     F.count(lo).alias(f"__nlo{i}"),
                     F.count(hi).alias(f"__nhi{i}")]
        row = files.agg(*aggs).collect()[0]
        n_files = int(row["__files"] or 0)
        mins: dict = {}
        maxs: dict = {}
        for i, c in enumerate(cols):
            if int(row[f"__nlo{i}"]) != n_files or \
                    int(row[f"__nhi{i}"]) != n_files:
                return None
            mins[c], maxs[c] = row[f"__lo{i}"], row[f"__hi{i}"]
        return {"row_count": int(row["__rows"] or 0),
                "mins": mins, "maxs": maxs}

    @staticmethod
    def _files_spark_schema() -> T.StructType:
        return T.StructType(
            [
                T.StructField("file_path", T.StringType()),
                T.StructField("partition_id", T.StringType()),
                T.StructField("record_count", T.LongType()),
                T.StructField("file_size_bytes", T.LongType()),
                T.StructField("added_snapshot_id", T.LongType()),
                T.StructField("int_mins", T.MapType(T.StringType(), T.LongType())),
                T.StructField("int_maxs", T.MapType(T.StringType(), T.LongType())),
                T.StructField("str_mins", T.MapType(T.StringType(), T.StringType())),
                T.StructField("str_maxs", T.MapType(T.StringType(), T.StringType())),
                T.StructField(
                    "blooms",
                    T.MapType(T.StringType(), T.ArrayType(T.LongType())),
                ),
                T.StructField("first_row_id", T.LongType()),
            ]
        )

    def register(self, spark: SparkSession, name: str,
                 ref: str | None = None,
                 snapshot_id: int | None = None,
                 updated_since: int | None = None) -> None:
        """Expose the table as a temp view for ad-hoc SQL — the
        reference's parameterized-query entry point
        (dags/Queries_dag.py:54-95 `con.execute(query)`) maps to
        `table.register(spark, 'images'); spark.sql(...)`.
        ``ref``/``snapshot_id`` register a time-travel view (a tag,
        branch, or snapshot pinned under its own view name — SQL's
        VERSION AS OF, as a view); ``updated_since`` registers the
        incremental net-upsert view (rows created/updated after that
        commit sequence — SQL's UPDATED SINCE, see scan)."""
        self.scan(spark, snapshot_id=snapshot_id, ref=ref,
                  updated_since=updated_since).createOrReplaceTempView(name)

    def snapshots_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (s.snapshot_id, s.parent_id, s.sequence, s.timestamp_ms, s.operation,
             len(s.manifests), json.dumps(s.summary))
            for s in self.snapshots_list()
        ]
        return spark.createDataFrame(
            rows,
            "snapshot_id long, parent_id long, sequence long, timestamp_ms long, "
            "operation string, n_manifests int, summary string",
        )

    def manifests_df(self, spark: SparkSession) -> DataFrame:
        rows = []
        for s in self.snapshots_list():
            for m in s.manifests:
                rows.append((s.snapshot_id, m,
                             os.path.getsize(os.path.join(self.meta_dir, m))))
        return spark.createDataFrame(
            rows, "snapshot_id long, manifest_path string, manifest_size_bytes long"
        )

    def partitions_df(
        self, spark: SparkSession, snapshot_id: int | None = None,
        use_cached: bool = True,
    ) -> DataFrame:
        """The `partitions` inspection table (Iceberg `table$partitions`,
        reference dashboard rollup shape): per-partition file/row/byte
        rollup computed as ONE distributed aggregation of the files
        metadata DataFrame — at 10^12-image scale this is a manifest
        scan, never a data read, and never a driver materialization.
        When the snapshot carries position-delete manifests, the
        pending delete rows are attributed to partitions by joining the
        delete (file_path, pos) set against the file->partition map, so
        the ``live_record_count`` column reports post-MOR visibility.

        When a partition statistics file exists for EXACTLY the
        requested snapshot (``operators.analyze.compute_partition_stats``
        — Iceberg's partition stats files), it is read instead of
        re-aggregating the manifests; the file is snapshot-addressed
        and immutable, so the exact-match cache is always consistent.
        ``use_cached=False`` forces the live aggregation.
        """
        snap = (
            self.snapshot_by_id(snapshot_id)
            if snapshot_id is not None
            else self.current_snapshot()
        )
        if use_cached and snap is not None:
            meta = self.load_metadata()
            name = meta.get("partition_statistics", {}).get(
                str(snap.snapshot_id))
            if name is not None:
                path = os.path.join(self.meta_dir, name)
                if os.path.exists(path):
                    return spark.read.parquet(path)
        files = self.files(spark, snapshot_id)
        agg = files.groupBy("partition_id").agg(
            F.count("*").alias("file_count"),
            F.sum("record_count").alias("record_count"),
            F.sum("file_size_bytes").alias("total_size_bytes"),
            F.min("added_snapshot_id").alias("oldest_added_snapshot_id"),
            F.max("added_snapshot_id").alias("newest_added_snapshot_id"),
        )
        deletes, _ = self.position_deletes_df(spark, snapshot=snap)
        if deletes is None:
            return agg.withColumn(
                "position_delete_count", F.lit(0).cast("long")
            ).withColumn(
                "live_record_count", F.col("record_count").cast("long")
            )
        per_file = deletes.groupBy("file_path").agg(
            F.count("*").alias("position_delete_count")
        )
        per_part = (
            files.select("file_path", "partition_id")
            .join(F.broadcast(per_file), "file_path", "inner")
            .groupBy("partition_id")
            .agg(F.sum("position_delete_count").alias("position_delete_count"))
        )
        return (
            agg.join(per_part, "partition_id", "left")
            .withColumn(
                "position_delete_count",
                F.coalesce(F.col("position_delete_count"), F.lit(0)).cast("long"),
            )
            .withColumn(
                "live_record_count",
                (F.col("record_count") - F.col("position_delete_count")).cast("long"),
            )
        )

    def history_df(self, spark: SparkSession) -> DataFrame:
        """The `history` inspection table (Iceberg `table$history`):
        every snapshot ever committed, with ``is_current_ancestor``
        marking the lineage of the CURRENT head — snapshots stranded by
        a rollback_to() stay listed but flagged false, which is how a
        reader distinguishes time-travelable history from abandoned
        line(s)."""
        ancestors: set[int] = set()
        by_id = {s.snapshot_id: s for s in self.snapshots_list()}
        cur = self.current_snapshot()
        sid = cur.snapshot_id if cur is not None else None
        while sid is not None and sid in by_id:
            ancestors.add(sid)
            sid = by_id[sid].parent_id
        rows = [
            (s.timestamp_ms, s.snapshot_id, s.parent_id, s.operation,
             s.snapshot_id in ancestors)
            for s in sorted(by_id.values(), key=lambda s: s.sequence)
        ]
        return spark.createDataFrame(
            rows,
            "made_current_at_ms long, snapshot_id long, parent_id long, "
            "operation string, is_current_ancestor boolean",
        )

    def refs_df(self, spark: SparkSession) -> DataFrame:
        """The `refs` inspection table (Iceberg `table$refs`): every
        named ref — the implicit ``main`` branch, explicit branches,
        and tags — with the snapshot it points at."""
        meta = self.load_metadata()
        rows: list[tuple[str, str, int]] = []
        head = meta.get("current_snapshot_id")
        if head is not None:
            rows.append(("main", "branch", int(head)))
        for name, sid in sorted(self.branches(meta).items()):
            rows.append((name, "branch", int(sid)))
        for name, sid in sorted(self.tags(meta).items()):
            rows.append((name, "tag", int(sid)))
        return spark.createDataFrame(
            rows, "name string, type string, snapshot_id long"
        )

    def stats_df(self, spark: SparkSession) -> DataFrame:
        """The `stats` inspection table: one row per (analyzed
        snapshot, column) from the persisted ANALYZE statistics files
        (operators/analyze.py — HLL++ NDV + null counts), so ad-hoc
        SQL can read the optimizer-facing statistics the same way it
        reads files/snapshots. Empty (same schema) when the table was
        never analyzed."""
        import json as _json
        import os as _os

        meta = self.load_metadata()
        rows: list[tuple] = []
        for sid, name in sorted(meta.get("statistics", {}).items()):
            try:
                with open(_os.path.join(self.meta_dir, name)) as f:
                    st = _json.load(f)
            except FileNotFoundError:
                continue
            for col, cs in sorted(st.get("columns", {}).items()):
                rows.append((int(sid), col, int(st["row_count"]),
                             int(cs["ndv"]), int(cs["null_count"]),
                             float(st.get("rsd", 0.0)),
                             int(st.get("computed_at_ms", 0))))
        return spark.createDataFrame(
            rows,
            "snapshot_id long, column string, row_count long, ndv long, "
            "null_count long, rsd double, computed_at_ms long",
        )

    def register_metadata(self, spark: SparkSession, name: str) -> None:
        """Register every inspection table as `{name}_{files,snapshots,
        manifests,partitions,history,refs,stats}` temp views, so ad-hoc
        SQL can audit the table the way the reference's dashboards
        query DuckDB information tables (dags/Queries_dag.py)."""
        self.files(spark).createOrReplaceTempView(f"{name}_files")
        self.snapshots_df(spark).createOrReplaceTempView(f"{name}_snapshots")
        self.manifests_df(spark).createOrReplaceTempView(f"{name}_manifests")
        self.partitions_df(spark).createOrReplaceTempView(f"{name}_partitions")
        self.history_df(spark).createOrReplaceTempView(f"{name}_history")
        self.refs_df(spark).createOrReplaceTempView(f"{name}_refs")
        self.stats_df(spark).createOrReplaceTempView(f"{name}_stats")

    # ---------------- scan (with manifest pruning) ----------------

    def plan_files(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        partition_values: set | None = None,
        int_ranges: dict[str, tuple[int | str | None, int | str | None]] | None = None,
        point_eq: dict[str, object] | None = None,
    ) -> DataFrame:
        """Pruned `files` metadata DataFrame — the planning surface.

        ``point_eq={'image_id': v}`` adds point-lookup file skipping:
        per-file bloom filters (written when the table property
        ``write.metadata.bloom-columns`` names the column) plus min/max
        stats; see `_bloom_prune`.

        All partition/stats pruning happens as DataFrame filters over
        the manifest scan, never by materializing entries on the
        driver: at 10^12-image scale the manifest set is millions of
        rows, and only the (already-pruned) file list a job actually
        reads is ever collected. Before the row-level filters, the
        MANIFEST LIST is pruned (`_prune_manifests`): whole manifests
        whose partition/bound summaries are disjoint from the
        predicates are never opened — the row-level filters below then
        re-apply the same tests exactly, so skipping is purely an I/O
        optimization, never a semantics change."""
        meta = self.load_metadata()
        snap = (self.snapshot_by_id(snapshot_id) if snapshot_id is not None
                else self.current_snapshot(meta))
        subset = None
        if snap is not None and (partition_values is not None or int_ranges):
            subset, _ = self._prune_manifests(
                snap, meta, partition_values=partition_values,
                int_ranges=int_ranges)
        # read at the RESOLVED snapshot: a commit landing between this
        # plan and the manifest scan must not shift the file set under
        # the already-computed manifest subset
        df = self.files(
            spark, snap.snapshot_id if snap is not None else snapshot_id,
            manifest_subset=subset)
        int_ranges, _skip_lower = self._normalize_ranges(int_ranges)
        if partition_values is not None:
            pv = [str(v) for v in partition_values]
            cur_ids = self._current_spec_snapshot_ids(meta)
            if cur_ids is None:
                df = df.filter(F.col("partition_id").isin(pv))
            else:
                # evolved table: partition ids of files written under an
                # OLDER spec live in a different value domain — keep
                # them un-pruned (the caller/scan re-filters row-level);
                # prune only current-spec files
                df = df.filter(
                    ~F.col("added_snapshot_id").isin(cur_ids)
                    | F.col("partition_id").isin(pv)
                )
        for col, (lo, hi) in (int_ranges or {}).items():
            # string bounds route to the str_mins/str_maxs stats — the
            # same inclusive-overlap test, so `dt BETWEEN '2024-01-01'
            # AND '2024-01-31'` prunes exactly like an integer range
            # (parquet/Iceberg string stats order = Spark's binary
            # collation). Mixed-type bounds are a caller bug.
            is_str = isinstance(lo, str) or isinstance(hi, str)
            if is_str and not all(
                    isinstance(v, str) for v in (lo, hi) if v is not None):
                raise ValueError(
                    f"range for {col!r} mixes string and non-string "
                    f"bounds: {(lo, hi)!r}")
            mins, maxs = (("str_mins", "str_maxs") if is_str
                          else ("int_mins", "int_maxs"))
            cond = F.lit(True)
            if lo is not None and col not in _skip_lower:
                cond = cond & (
                    F.col(maxs)[col] >= F.lit(lo if is_str else int(lo)))
            if hi is not None:
                cond = cond & (
                    F.col(mins)[col] <= F.lit(hi if is_str else int(hi)))
            # files with no stats for the column can never be pruned
            df = df.filter(F.col(maxs)[col].isNull() | cond)
        for col, val in (point_eq or {}).items():
            df = self._bloom_prune(spark, df, col, val)
        if point_eq:
            # hidden partitioning: a point predicate on the partition
            # SOURCE column also prunes on partition value — the
            # transform (bucket/truncate/day) is applied to the literal
            # by the same Catalyst expression the writer used, so e.g.
            # bucket[32] point lookups touch 1/32 of the partitions
            # before any stats/bloom check runs
            meta = self.load_metadata()
            pcol = meta.get("partition_col")
            if pcol in point_eq:
                val = point_eq[pcol]
                many = isinstance(val, (list, tuple, set, frozenset))
                vals = list(val) if many else [val]
                pv = [v for v in
                      self.partition_values_of(spark, vals, meta)
                      if v is not None]
                cur_ids = self._current_spec_snapshot_ids(meta)
                if cur_ids is None:
                    df = df.filter(F.col("partition_id").isin(pv))
                else:
                    df = df.filter(
                        ~F.col("added_snapshot_id").isin(cur_ids)
                        | F.col("partition_id").isin(pv)
                    )
        return df

    def _bloom_prune(
        self, spark: SparkSession, df: DataFrame, col: str, val
    ) -> DataFrame:
        """Keep only files that might contain ``col = val`` (or, when
        ``val`` is a list/set/tuple, ``col IN vals`` — a file survives
        if ANY of the values may be present; the batch-key-fetch
        shape).

        Two independent file-skipping signals, both fail-safe (a file
        with no stats / no bloom for the column is always kept):

        * min/max stats — effective when the column is (nearly) sorted
          across files;
        * the per-file bloom filter — effective on high-cardinality
          UNSORTED columns where every file spans the whole value range
          and min/max can never prune. ~1% of files survive as false
          positives; at 10^12 rows this is the difference between
          touching ~1 file and scanning the table.

        The probe is a pure Catalyst filter over the manifest scan:
        because every bloom is a whole number of 64-bit words, the bit
        index of probe i is the CONSTANT ``(h1 + i*h2) % 64`` and only
        the word index depends on the file's bloom size.

        IN-lists over ~128 values skip the bloom term (the filter
        expression would outgrow codegen for negligible extra skipping)
        and keep the min/max ENVELOPE [min(vals), max(vals)] — a valid
        relaxation of the per-value disjunction."""
        many = isinstance(val, (list, tuple, set, frozenset))
        vals = list(val) if many else [val]
        if not vals:
            return df.filter(F.lit(False))  # IN () matches nothing
        arr = f"blooms['{col}']"
        # a widened column's old blooms hashed the NARROW physical type
        # — probing them with the wide literal would false-negative
        # (skip a file that holds the row); min/max still applies
        bloom_valid = col not in self.load_metadata().get(
            "bloom_invalid_cols", [])
        if bloom_valid and len(vals) <= 128:
            per_val = []
            for h1, h2 in self._bloom_point_hashes_many(spark, col, vals):
                per_val.append("(" + " AND ".join(
                    f"((shiftright(element_at({arr}, "
                    f"cast(pmod({h1 + i * h2}L, size({arr}) * 64L) div 64 "
                    f"as int) + 1), "
                    f"{(h1 + i * h2) % 64}) & 1L) = 1L)"
                    for i in range(_BLOOM_K)
                ) + ")")
            tests = " OR ".join(per_val)
            df = df.filter(
                F.expr(f"blooms IS NULL OR {arr} IS NULL OR ({tests})")
            )
        if any(isinstance(v, bool) for v in vals):
            return df
        if all(isinstance(v, int) for v in vals):
            lo, hi = F.lit(min(vals)), F.lit(max(vals))
            df = df.filter(
                F.col("int_maxs")[col].isNull()
                | ((F.col("int_maxs")[col] >= lo) & (F.col("int_mins")[col] <= hi))
            )
        elif all(isinstance(v, str) for v in vals):
            lo, hi = F.lit(min(vals)), F.lit(max(vals))
            df = df.filter(
                F.col("str_maxs")[col].isNull()
                | ((F.col("str_maxs")[col] >= lo) & (F.col("str_mins")[col] <= hi))
            )
        return df

    def _bloom_point_hashes_many(
        self, spark: SparkSession, col: str, values: list
    ) -> list[tuple[int, int]]:
        """(h1, h2) per value, ONE tiny local job for the whole list
        (posexplode over an array literal). Each literal is cast to the
        column's declared type first — the probe must use the SAME JVM
        xxhash64 the build side used, and Spark hashes int and long (or
        any two physical types) differently."""
        dt = next(
            (f.dataType.simpleString() for f in self.schema().fields
             if f.name == col),
            None,
        )
        lits = [F.lit(v).cast(dt) if dt else F.lit(v) for v in values]
        rows = (
            spark.range(1)
            .select(F.posexplode(F.array(*lits)).alias("i", "v"))
            .select(
                "i",
                F.pmod(F.xxhash64(F.col("v")), F.lit(2 ** 31)).alias("h1"),
                (F.pmod(F.xxhash64(F.col("v"), F.lit(1)), F.lit(2 ** 30)) * 2
                 + 1).alias("h2"),
            )
            .collect()
        )
        out: list[tuple[int, int] | None] = [None] * len(values)
        for r in rows:
            out[r["i"]] = (int(r["h1"]), int(r["h2"]))
        return out  # type: ignore[return-value]

    def scan(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        partition_values: set | None = None,
        int_ranges: dict[str, tuple[int | str | None, int | str | None]] | None = None,
        columns: list[str] | None = None,
        ref: str | None = None,
        with_pos: bool = False,
        with_row_id: bool = False,
        with_last_seq: bool = False,
        updated_since: int | None = None,
        point_eq: dict[str, object] | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot, pruning files via manifest stats.

        ``updated_since=N`` returns only rows whose
        ``_last_updated_seq`` > N — the incremental-consumption read
        the v3 lineage field exists for. File-level pruning theorem: a
        file added at sequence S holds only rows with last-updated
        sequence <= S (fresh/updated rows inherit S, carried rows keep
        older), so every file with S <= N is skipped WITHOUT reading it
        — the read stays proportional to the change volume even after
        compaction/clustering/CoW rewrites have rewritten every file
        (where snapshot-diff changelogs give up, see
        streaming/changelog.py ChangelogUnsupportedError). Semantics
        are the net upsert feed (current live version of each row
        created or updated after N); rows deleted since N do not
        appear — use changelog_df / the CDC source for delete events.

        ``point_eq={'image_id': v}`` narrows the FILE set via bloom +
        min/max skipping (see plan_files); like int_ranges, the
        row-level residual predicate stays with the caller.

        ``int_ranges={'phash': (lo, hi)}`` keeps only files whose
        [min,max] overlaps [lo,hi] — the stats-pruning path that Z-order
        clustering makes effective. String bounds route to the string
        stats (``{'dt': ('2024-01-01', '2024-01-31')}`` — the retention
        window shape). The residual predicate is re-applied
        row-level by the caller; this method only narrows the file set.
        Pruning runs distributed over the manifest scan (plan_files);
        only surviving paths are collected (the list spark.read needs).
        Position deletes of the SCANNED snapshot are applied (time
        travel to a pre-delete snapshot shows the undeleted rows)."""
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id or ref, not both")
            meta = self.load_metadata()
            tags = self.tags(meta)
            branches = self.branches(meta)
            if ref in tags:
                snapshot_id = tags[ref]
            elif ref in branches:
                snapshot_id = branches[ref]
            else:
                raise ValueError(
                    f"no tag or branch {ref!r} (tags: "
                    f"{sorted(tags) or 'none'}; branches: "
                    f"{sorted(branches) or 'none'})"
                )
        # a scan with every knob at its default returns the FULL table
        # exactly as committed — tag the frame (below) so consumers
        # that only need "these rows, somewhere else" (imagepipe bronze
        # bootstrap) can clone the files instead of decoding and
        # re-encoding every byte through a CTAS
        pristine = (
            snapshot_id is None and partition_values is None
            and int_ranges is None and columns is None
            and not with_pos and not with_row_id and not with_last_seq
            and updated_since is None and point_eq is None
        )
        pruned = self.plan_files(spark, snapshot_id, partition_values, int_ranges,
                                 point_eq=point_eq)
        snap = (self.snapshot_by_id(snapshot_id) if snapshot_id is not None
                else self.current_snapshot())
        need_seqs = bool(
            (snap is not None and snap.equality_delete_manifests())
            or with_last_seq or updated_since is not None)
        # one collect serves the path list plus whatever per-file maps
        # the read needs (eq-delete sequence scoping, row-id bases,
        # last-updated sequences)
        want = ["file_path"]
        if need_seqs:
            want.append("added_snapshot_id")
        if with_row_id:
            want.append("first_row_id")
        rows = pruned.select(*want).collect()
        paths = [r["file_path"] for r in rows]
        if need_seqs:
            snap_seqs = self._snapshot_seqs()
            file_seqs = {r["file_path"]: snap_seqs.get(r["added_snapshot_id"], 0)
                         for r in rows}
        else:
            file_seqs = None
        if updated_since is not None:
            # file-seq prune: files at sequence <= N cannot hold any
            # row updated after N (see docstring theorem)
            paths = [p for p in paths if file_seqs[p] > updated_since]
        first_row_ids = ({r["file_path"]: r["first_row_id"] for r in rows}
                         if with_row_id else None)
        df = self.scan_files(spark, paths, columns, snapshot=snap,
                             with_pos=with_pos, file_seqs=file_seqs,
                             with_row_id=with_row_id,
                             first_row_ids=first_row_ids,
                             with_last_seq=(with_last_seq
                                            or updated_since is not None))
        if updated_since is not None:
            df = df.filter(F.col("_last_updated_seq") > updated_since)
            if not with_last_seq:
                df = df.drop("_last_updated_seq")
        if partition_values is not None:
            meta = self.load_metadata()
            if self._current_spec_snapshot_ids(meta) is not None:
                # evolved table: older-spec files survive the file-level
                # prune, so make the partition predicate exact row-level
                pcol = meta.get("partition_col")
                if pcol is None:
                    raise ValueError(
                        "partition_values scan on a table whose current "
                        "spec is unpartitioned"
                    )
                if columns is not None and pcol not in columns:
                    raise ValueError(
                        f"partition_values scan on an evolved table needs "
                        f"{pcol!r} in columns for the row-level re-filter"
                    )
                pv = [str(v) for v in partition_values]
                df = df.filter(
                    self.partition_value_expr(meta).cast("string").isin(pv))
        if pristine and snap is not None:
            # (table, resolved snapshot id) — the snapshot is pinned at
            # scan time, so a later clone sees exactly this file set;
            # any transformation returns a NEW DataFrame without the tag
            df._lh_pristine_scan = (self, snap.snapshot_id)
        return df

    def _file_seqs_for(self, spark: SparkSession, rel_paths: list[str],
                       snapshot_id: int | None = None) -> dict[str, int]:
        """rel path -> commit sequence of the snapshot that added the
        file (for equality-delete scoping), resolved against the given
        snapshot's manifests. Files whose adding snapshot was expired
        resolve to 0 = oldest — correct, since an expired snapshot is
        older than every retained one, hence older than any live
        equality delete."""
        snap_seqs = self._snapshot_seqs()
        tdf = spark.createDataFrame([(p,) for p in rel_paths],
                                    "file_path string")
        rows = (
            self.files(spark, snapshot_id)
            .join(F.broadcast(tdf), "file_path", "left_semi")
            .select("file_path", "added_snapshot_id").collect()
        )
        return {r["file_path"]: snap_seqs.get(r["added_snapshot_id"], 0)
                for r in rows}

    def _first_row_ids_for(self, spark: SparkSession, rel_paths: list[str],
                           snapshot_id: int | None = None
                           ) -> dict[str, "int | None"]:
        """rel path -> manifest ``first_row_id`` (row-lineage base) for
        an explicit file list, resolved like `_file_seqs_for`: one
        semi-joined manifest scan, metadata-sized collect."""
        tdf = spark.createDataFrame([(p,) for p in rel_paths],
                                    "file_path string")
        rows = (
            self.files(spark, snapshot_id)
            .join(F.broadcast(tdf), "file_path", "left_semi")
            .select("file_path", "first_row_id").collect()
        )
        return {r["file_path"]: r["first_row_id"] for r in rows}

    def scan_files(self, spark: SparkSession, rel_paths: list[str],
                   columns: list[str] | None = None, *,
                   snapshot: "Snapshot | None" = None,
                   apply_deletes: bool = True,
                   with_pos: bool = False,
                   file_seqs: dict[str, int] | None = None,
                   with_row_id: bool = False,
                   first_row_ids: dict[str, "int | None"] | None = None,
                   with_last_seq: bool = False,
                   ) -> DataFrame:
        """Read an explicit (already-planned) set of table-relative data
        files through the CURRENT schema, resolving schema evolution:
        columns added later are NULL in old files (explicit read
        schema), renamed columns read every historical physical name
        and coalesce into the current one.

        Merge-on-read: when the governing snapshot (``snapshot``, else
        the current one) carries position-delete manifests and
        ``apply_deletes`` is on (the default — EVERY internal reader
        must see deletes applied, or a copy-on-write rewrite would
        resurrect MOR-deleted rows), deleted rows are removed by a
        left-anti join on (file, row position); both sides are
        computed JVM-side (``_metadata`` columns), the delete side is
        stats-pruned to the scanned file range and broadcast when
        small, so the data side — the blobs — never shuffles. A table
        with no pending deletes (the common case) pays nothing.

        ``with_pos=True`` appends ``_file`` (table-relative path) and
        ``_pos`` (row position in that file) columns, computed BEFORE
        any anti-join — the file-identity surface MERGE/DELETE
        planning needs (``input_file_name()`` would be unreliable
        after the MOR join).

        ``with_row_id=True`` appends ``_row_id`` — the row's STABLE
        lineage id (Iceberg v3 row lineage):
        ``coalesce(materialized _lh_row_id, first_row_id + _pos)``.
        Fresh files resolve through their manifest ``first_row_id``
        (one broadcast metadata-sized map); rewritten files carry ids
        physically in ``_lh_row_id``. Null for rows of files committed
        before row lineage. Stable under MOR deletes (positions don't
        shift) and — once materialized — under compaction/clustering.

        ``with_last_seq=True`` appends ``_last_updated_seq`` — the
        second Iceberg v3 row-lineage field
        (``_last_updated_sequence_number``): the commit sequence that
        last wrote or updated the row, resolved as
        ``coalesce(materialized _lh_last_seq, file's own sequence)``.
        Fresh/updated rows inherit their file's sequence; rewrites
        that only carry rows (compaction, clustering, CoW survivors,
        delete fold) materialize the old value so the carry isn't
        mistaken for an update. Rows predating the feature resolve to
        the sequence of the commit that added (or last carried) their
        file — the same inheritance a v2->v3 Iceberg upgrade
        exhibits."""
        meta = self.load_metadata()
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        pos_cols = ((["_file", "_pos"] if with_pos else [])
                    + (["_row_id"] if with_row_id else [])
                    + (["_last_updated_seq"] if with_last_seq else []))
        if not rel_paths:
            # JVM-only empty relation (createDataFrame([]) plans an
            # applySchemaToPythonRDD node — a Python scan in every
            # downstream .explain, and a pickle round-trip for nothing)
            df = spark.range(0).select(
                *[F.lit(None).cast(f.dataType).alias(f.name)
                  for f in schema.fields]
            )
            for c in pos_cols:
                df = df.withColumn(
                    c, F.lit(None).cast("string" if c == "_file" else "long"))
            return df.select(*(columns + pos_cols)) if columns else df
        renames = self.column_renames(meta)
        phys_fields = list(schema.fields)
        for new, olds in renames.items():
            dt = schema[new].dataType
            phys_fields += [T.StructField(o, dt, True) for o in olds]
        if with_row_id:
            # physical lineage column: present in rewritten files,
            # null-filled by the explicit read schema everywhere else
            phys_fields.append(T.StructField(_LH_ROW_ID, T.LongType(), True))
        if with_last_seq:
            phys_fields.append(T.StructField(_LH_LAST_SEQ, T.LongType(), True))
        df = spark.read.schema(T.StructType(phys_fields)).parquet(
            *[os.path.join(self._local_root, p) for p in rel_paths]
        )
        snap = snapshot if snapshot is not None else self.current_snapshot(meta)
        mor = bool(apply_deletes and snap is not None and snap.delete_manifests)
        live_defaults = {
            c: d for c, d in meta.get("column_defaults", {}).items()
            if c in {f.name for f in schema.fields}
        }
        if mor or with_pos or live_defaults or with_row_id or with_last_seq:
            df = (
                df.withColumn("_file", self._rel_path_col())
                .withColumn("_pos", F.col("_metadata.row_index"))
            )
        # one file->sequence resolution shared by last-seq lineage,
        # initial-default scoping, and equality-delete scoping
        _seqs_memo = [file_seqs]

        def _seqs() -> dict[str, int]:
            if _seqs_memo[0] is None:
                _seqs_memo[0] = self._file_seqs_for(
                    spark, rel_paths, snap.snapshot_id if snap else None)
            return _seqs_memo[0]

        if with_last_seq:
            ls_df = spark.createDataFrame(
                [(p, _seqs().get(p, 0)) for p in rel_paths],
                "__lsp string, __lsq long",
            )
            df = (
                df.join(F.broadcast(ls_df),
                        df["_file"] == F.col("__lsp"), "left")
                .drop("__lsp")
                .withColumn(
                    "_last_updated_seq",
                    F.coalesce(F.col(_LH_LAST_SEQ), F.col("__lsq")))
                .drop("__lsq", _LH_LAST_SEQ)
            )
        if with_row_id:
            frids = (first_row_ids if first_row_ids is not None
                     else self._first_row_ids_for(
                         spark, rel_paths,
                         snap.snapshot_id if snap else None))
            frid_df = spark.createDataFrame(
                [(p, frids.get(p)) for p in rel_paths],
                "__rfp string, __rfr long",
            )
            df = (
                df.join(F.broadcast(frid_df),
                        df["_file"] == F.col("__rfp"), "left")
                .drop("__rfp")
                .withColumn(
                    "_row_id",
                    F.coalesce(F.col(_LH_ROW_ID),
                               F.col("__rfr") + F.col("_pos")))
                .drop("__rfr", _LH_ROW_ID)
            )
        extra = [c for c in ("_file", "_pos", "_row_id", "_last_updated_seq")
                 if c in df.columns]
        if renames:
            # resolve schema evolution BEFORE applying deletes: equality
            # deletes reference CURRENT column names, and a pre-rename
            # file's rows only carry the key under its old physical name
            # — joining before the coalesce would silently miss them
            df = df.select(
                *[
                    (F.coalesce(f.name, *renames[f.name]).alias(f.name)
                     if f.name in renames else F.col(f.name))
                    for f in schema.fields
                ],
                *extra,
            )
        live_defaults = {
            c: d for c, d in meta.get("column_defaults", {}).items()
            if c in {f.name for f in schema.fields}
        }
        if live_defaults:
            # initial-default resolution (sequence-scoped): rows from
            # files older than the column get the default; later files
            # carry the physical column (so an explicit NULL survives).
            # One broadcast (path, seq) map join — metadata-sized.
            seqs = _seqs()
            oldest = min(seqs.values(), default=0)
            apply = {c: d for c, d in live_defaults.items()
                     if oldest < d["added_seq"]}
            if apply:
                fcol = (F.col("_file") if "_file" in df.columns
                        else self._rel_path_col())
                seq_df = spark.createDataFrame(
                    [(p, seqs.get(p, 0)) for p in rel_paths],
                    "__dfp string, __dseq long",
                )
                df = df.join(F.broadcast(seq_df), fcol == F.col("__dfp"),
                             "left").drop("__dfp")
                dseq = F.coalesce(F.col("__dseq"), F.lit(0))
                for c, d in apply.items():
                    df = df.withColumn(
                        c,
                        F.when(dseq < F.lit(d["added_seq"]),
                               F.lit(d["value"]).cast(schema[c].dataType))
                        .otherwise(F.col(c)),
                    )
                df = df.drop("__dseq")
        if mor:
            ddf, n_del = self.position_deletes_df(
                spark, snap, (min(rel_paths), max(rel_paths)))
            if ddf is not None:
                dd = ddf.select(F.col("file_path").alias("__del_file"),
                                F.col("pos").alias("__del_pos"))
                if n_del <= self.MOR_BROADCAST_ROWS:
                    dd = F.broadcast(dd)
                df = df.join(
                    dd,
                    (df["_file"] == dd["__del_file"])
                    & (df["_pos"] == dd["__del_pos"]),
                    "left_anti",
                )
            eq_infos = self.equality_deletes_info(snap)
            if eq_infos:
                # per-row file sequence via a broadcast (path, seq) map
                # — equality deletes apply only to earlier-sequenced
                # files (a later re-insert of the key survives)
                seqs = _seqs()
                seq_df = spark.createDataFrame(
                    [(p, seqs.get(p, 0)) for p in rel_paths],
                    "__fsp string, __fseq long",
                )
                df = df.join(F.broadcast(seq_df),
                             df["_file"] == F.col("__fsp"), "left").drop("__fsp")
                df = df.withColumn("__fseq",
                                   F.coalesce(F.col("__fseq"), F.lit(0)))
                for paths, cols, eq_seq, n_keys in eq_infos:
                    eq_schema = T.StructType([schema[c] for c in cols])
                    eq = spark.read.schema(eq_schema).parquet(
                        *[os.path.join(self._local_root, p) for p in paths]
                    ).select(*[F.col(c).alias(f"__eq_{c}") for c in cols])
                    if n_keys <= self.MOR_BROADCAST_ROWS:
                        eq = F.broadcast(eq)
                    cond = F.col("__fseq") < F.lit(eq_seq)
                    for c in cols:
                        cond = cond & (df[c] == eq[f"__eq_{c}"])
                    df = df.join(eq, cond, "left_anti")
                df = df.drop("__fseq")
        drop_extra = [c for c in extra
                      if (c in ("_file", "_pos") and not with_pos)
                      or (c == "_row_id" and not with_row_id)
                      or (c == "_last_updated_seq" and not with_last_seq)]
        if drop_extra:
            df = df.drop(*drop_extra)
        return df.select(*(columns + pos_cols)) if columns else df

    def scan_matched_files(self, entries: list[dict], spark: SparkSession,
                           columns: list[str] | None = None,
                           with_pos: bool = False,
                           with_row_id: bool = False,
                           with_last_seq: bool = False) -> DataFrame:
        return self.scan_files(spark, [e["file_path"] for e in entries], columns,
                               with_pos=with_pos, with_row_id=with_row_id,
                               first_row_ids=(
                                   {e["file_path"]: e.get("first_row_id")
                                    for e in entries}
                                   if with_row_id else None),
                               with_last_seq=with_last_seq)

    # -------- merge-on-read position deletes (Iceberg v2 model) --------

    def _rel_path_col(self) -> "F.Column":
        """Executor-side table-relative path of the file each row came
        from, derived from ``_metadata.file_path`` — the JVM-native
        replacement for driver-side ``relativize_reported`` over
        ``input_file_name()`` (which is unreliable after a join: the
        expression evaluates wherever it is projected, and post-shuffle
        there is no "current file"). Decoding mirrors
        paths.relativize_reported: percent-decode BOTH sides
        (``url_decode`` is form-decoding, so ``+`` is pre-escaped to
        survive literally), strip the URI scheme, strip the decoded
        base prefix. A path outside the table location passes through
        un-relativized — callers' resolution assertions then fail
        loudly instead of matching the wrong file."""
        from urllib.parse import unquote

        from .paths import strip_scheme

        base = strip_scheme(unquote(self.location)).rstrip("/")
        dec = F.expr("url_decode(replace(_metadata.file_path, '+', '%2B'))")
        stripped = F.regexp_replace(
            dec, r"^[a-zA-Z][a-zA-Z0-9+.\-]*:(//)?", "")
        return F.when(
            stripped.startswith(base + "/"),
            F.substring(stripped, len(base) + 2, 2_000_000_000),
        ).otherwise(stripped)

    def write_position_delete_files(
        self, matched: DataFrame, n_files: int = 1
    ) -> list[dict]:
        """Write position-delete files from a DataFrame of
        ``(file_path string, pos long)`` — the data-file-relative row
        positions to delete (Iceberg v2 position deletes, spec §Delete
        Formats). Files are range-distributed and sorted on
        (file_path, pos) so each carries tight min/max stats over the
        data files it references — scans prune delete files against
        the scanned file range the same way data scans prune on column
        stats. Returns delete-manifest entries for
        :meth:`commit_delete_files`; like ``write_data_files`` nothing
        is committed here."""
        write_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.data_dir, f"deletes-{write_id}")
        df = matched.select(
            F.col("file_path").cast("string"), F.col("pos").cast("long")
        )
        if n_files > 1:
            df = df.repartitionByRange(n_files, "file_path", "pos")
        else:
            df = df.coalesce(1)
        df = df.sortWithinPartitions("file_path", "pos")
        df.write.mode("append").parquet(out_dir)
        fake_meta = {
            "schema_json": T.StructType([
                T.StructField("file_path", T.StringType()),
                T.StructField("pos", T.LongType()),
            ]).json()
        }
        return self._collect_entries(out_dir, fake_meta)

    # schema of a deletion-vector delete file: one row PER DATA FILE
    _DV_SCHEMA_DDL = "file_path string, dv binary, cardinality long"

    def write_deletion_vector_files(
        self, positions: DataFrame, n_files: int = 1
    ) -> tuple[list[dict], int]:
        """Pack a ``(file_path, pos)`` DataFrame into deletion-vector
        delete files: one ``(file_path, dv binary, cardinality)`` row
        per data file (Iceberg v3 DV form — see
        :mod:`.dv`). The caller must pass the file's FULL pending
        delete set (new matches merged with any prior pending deletes
        for that file): a committed DV supersedes every older DV of
        the same file, so it has to be a superset. Rows are
        sorted by file_path so the delete file carries tight
        referenced-data-file bounds for scan pruning, exactly like
        position-delete files. Returns (manifest entries for
        :meth:`commit_delete_files`, total packed positions)."""
        import pandas as pd

        from .dv import pack_positions

        write_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.data_dir, f"deletes-{write_id}")

        def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
            fp = pdf["file_path"].iloc[0]
            blob = pack_positions(pdf["pos"].to_numpy())
            from .dv import cardinality as _card
            return pd.DataFrame(
                {"file_path": [fp], "dv": [blob],
                 "cardinality": [_card(blob)]}
            )

        packed = (
            positions.select(
                F.col("file_path").cast("string"), F.col("pos").cast("long")
            )
            .groupBy("file_path")
            .applyInPandas(_pack, self._DV_SCHEMA_DDL)
        )
        if n_files > 1:
            packed = packed.repartitionByRange(n_files, "file_path")
        else:
            packed = packed.coalesce(1)
        packed.sortWithinPartitions("file_path").write.mode("append").parquet(
            out_dir
        )
        fake_meta = {
            "schema_json": T.StructType([
                T.StructField("file_path", T.StringType()),
                T.StructField("dv", T.BinaryType()),
                T.StructField("cardinality", T.LongType()),
            ]).json()
        }
        entries = self._collect_entries(out_dir, fake_meta)
        # exact pending-position total from the written footers' column
        # chunks would need a data read; the cardinality column is tiny
        # (one row per touched file), so read just it
        n_pos = 0
        for e in entries:
            t = pq.read_table(
                os.path.join(self._local_root, e["file_path"]),
                columns=["cardinality"],
            )
            n_pos += int(sum(t.column("cardinality").to_pylist()))
        return entries, n_pos

    def _dv_positions_df(
        self,
        spark: SparkSession,
        dv_infos: list[tuple[str, int, int]],
        rel_path_bounds: tuple[str, str] | None = None,
    ) -> tuple[DataFrame | None, int]:
        """Expand deletion-vector manifests into a ``(file_path, pos)``
        DataFrame. Newest-wins per data file: among DV rows for the
        same file only the highest-sequence one applies (it is a
        superset of the others by the merge-on-write contract), so
        repeated DV deletes never stack scan work. Returns
        (None, 0) when nothing survives pruning; the count is the
        manifest-stats upper bound (superseded rows included), which
        only errs toward skipping the broadcast fast path."""
        import pandas as pd

        from .dv import unpack_positions

        parts: list[DataFrame] = []
        n_upper = 0
        for m, seq, npos in dv_infos:
            entries = self.read_manifest_entries(m)
            if rel_path_bounds is not None:
                lo, hi = rel_path_bounds
                entries = [
                    e for e in entries
                    if e["str_mins"].get("file_path") is None
                    or (e["str_maxs"]["file_path"] >= lo
                        and e["str_mins"]["file_path"] <= hi)
                ]
            if not entries:
                continue
            n_upper += npos
            df = spark.read.schema(self._DV_SCHEMA_DDL).parquet(
                *[os.path.join(self._local_root, e["file_path"])
                  for e in entries]
            ).withColumn("__dvseq", F.lit(seq))
            parts.append(df)
        if not parts:
            return None, 0
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        from pyspark.sql.window import Window

        w = Window.partitionBy("file_path").orderBy(F.col("__dvseq").desc())
        latest = (
            u.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("file_path", "dv")
        )

        def _expand(it):
            for pdf in it:
                for fp, blob in zip(pdf["file_path"], pdf["dv"]):
                    pos = unpack_positions(blob)
                    yield pd.DataFrame({"file_path": fp, "pos": pos})

        return latest.mapInPandas(_expand, "file_path string, pos long"), n_upper

    def commit_delete_files(
        self,
        delete_entries: list[dict],
        summary: dict | None = None,
        expected_parent: "int | None | object" = UNPINNED,
        data_entries: list[dict] | None = None,
        operation: str = "delete",
        op_name: str = "mor-delete",
        manifest_meta: dict | None = None,
    ) -> Snapshot:
        """Commit position-delete files as a merge-on-read DELETE
        snapshot: data manifests carry over untouched (no rewrite —
        that is the point of MOR), and the new delete manifest appends
        to the snapshot's delete set. ``data_entries`` additionally
        appends new data files in the SAME atomic snapshot — the MOR
        upsert shape (MERGE/UPDATE = position-delete the old row
        versions + append the new ones). No retry composition: row
        POSITIONS are content-addressed against the plan snapshot's
        files, so any concurrent commit (a compaction moves rows to
        new files) invalidates them — callers pin ``expected_parent``
        and replan on ConcurrentCommitError, like MERGE."""
        meta = self.load_metadata()
        parent = meta["current_snapshot_id"]
        if expected_parent is not UNPINNED and parent != expected_parent:
            raise ConcurrentCommitError(
                f"table advanced past plan snapshot {expected_parent} "
                f"(now {parent}); position-delete plan must be re-derived"
            )
        prev = self.current_snapshot(meta)
        if prev is None:
            raise ValueError("cannot position-delete from an empty table")
        # fresh-at-entry sets: restored on a lost CAS so a rebase
        # re-invocation restamps and re-allocates (see commit_append)
        fresh_del = [e for e in delete_entries
                     if e.get("added_snapshot_id", -1) == -1]
        fresh_data = [e for e in (data_entries or [])
                      if e.get("added_snapshot_id", -1) == -1]
        snap_id, seq = self._next_ids(meta)
        dm, _, _ = self._write_manifest(delete_entries, snap_id)
        dmm = dict(prev.delete_manifest_meta)
        if manifest_meta:
            # deletion-vector (or future kinds): stamp the commit
            # sequence so readers can order supersedes
            dmm[dm] = {**manifest_meta, "seq": seq}
        manifests = list(prev.manifests)
        mparts = dict(prev.manifest_parts)
        mbounds = dict(prev.manifest_bounds)
        added = list(data_entries or [])
        next_row_id = self._assign_row_ids(added, meta) if added else None
        data_manifest = None
        if added:
            data_manifest, parts, mb = self._write_manifest(added, snap_id)
            manifests.append(data_manifest)
            mparts[data_manifest] = parts
            mbounds[data_manifest] = mb
        snap = Snapshot(
            snap_id, parent, seq, int(time.time() * 1000), operation,
            manifests,
            {"op": op_name,
             "added-delete-files": len(delete_entries),
             "deleted-records": sum(e["record_count"] for e in delete_entries),
             **({"added-files": len(added),
                 "added-records": sum(e["record_count"] for e in added)}
                if added else {}),
             **(summary or {})},
            mparts,
            list(prev.delete_manifests) + [dm],
            dmm,
            manifest_bounds=mbounds,
        )
        try:
            return self._commit(meta, snap, parent, next_row_id=next_row_id)
        except ConcurrentCommitError:
            # lost the CAS: drop this attempt's manifests (no litter)
            # and restore writer sentinels so a validated-rebase
            # re-invocation restamps and re-allocates row ids
            with contextlib.suppress(OSError):
                os.remove(os.path.join(self.meta_dir, dm))
            if data_manifest is not None:
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(self.meta_dir, data_manifest))
            for e in fresh_del + fresh_data:
                e["added_snapshot_id"] = -1
            raise

    def commit_rewrite_deletes(
        self,
        delete_entries: list[dict],
        manifest_meta: dict | None = None,
        summary: dict | None = None,
        expected_parent: "int | None | object" = UNPINNED,
    ) -> Snapshot:
        """Replace the snapshot's position-delete state (position-row
        manifests AND deletion-vector manifests) with ONE new delete
        manifest — the delete-compaction commit shape. Equality-delete
        manifests are carried over untouched (their key + sequence
        scoping cannot be folded into positions without a data probe).
        Data manifests are untouched; ``operation`` is
        ``rewrite-deletes`` so the changelog treats it as a no-op (no
        logical row change). Pass empty ``delete_entries`` to just
        drop the position-delete state (every pending delete
        referenced a since-removed file)."""
        meta = self.load_metadata()
        parent = meta["current_snapshot_id"]
        if expected_parent is not UNPINNED and parent != expected_parent:
            raise ConcurrentCommitError(
                f"table advanced past plan snapshot {expected_parent} "
                f"(now {parent}); delete-compaction plan must be re-derived"
            )
        prev = self.current_snapshot(meta)
        if prev is None:
            raise ValueError("empty table has no deletes to rewrite")
        snap_id, seq = self._next_ids(meta)
        dms = []
        dmm: dict = {}
        for m in prev.delete_manifests:
            info = prev.delete_manifest_meta.get(m, {})
            if info.get("kind") == "equality":
                dms.append(m)
                dmm[m] = info
        if delete_entries:
            dm, _, _ = self._write_manifest(delete_entries, snap_id)
            dms.append(dm)
            dmm[dm] = {**(manifest_meta or {}), "seq": seq}
        snap = Snapshot(
            snap_id, parent, seq, int(time.time() * 1000),
            "rewrite-deletes", list(prev.manifests),
            {"op": "compact-deletion-vectors",
             "removed-delete-manifests":
                 len(prev.delete_manifests) - (len(dms) - bool(delete_entries)),
             **(summary or {})},
            dict(prev.manifest_parts),
            dms,
            dmm,
            manifest_bounds=dict(prev.manifest_bounds),
        )
        return self._commit(meta, snap, parent)

    def clear_delete_manifests(
        self, expected_parent: "int | None | object" = UNPINNED
    ) -> Snapshot:
        """Metadata-only commit dropping the snapshot's delete
        manifests — the final step of rewrite_position_deletes, valid
        only once no delete entry references a live data file (the
        caller's responsibility to verify; entries referencing removed
        files are no-ops either way, so a premature clear can
        resurrect nothing that a scan was still hiding ONLY if a
        referenced data file is still live — hence the check)."""
        meta = self.load_metadata()
        parent = meta["current_snapshot_id"]
        if expected_parent is not UNPINNED and parent != expected_parent:
            raise ConcurrentCommitError(
                f"table advanced past plan snapshot {expected_parent} "
                f"(now {parent})"
            )
        prev = self.current_snapshot(meta)
        if prev is None or not prev.delete_manifests:
            return prev
        snap_id, seq = self._next_ids(meta)
        snap = Snapshot(
            snap_id, parent, seq, int(time.time() * 1000), "rewrite-deletes",
            list(prev.manifests),
            {"op": "clear-delete-manifests",
             "removed-delete-manifests": len(prev.delete_manifests)},
            dict(prev.manifest_parts),
            [],
            {},
            manifest_bounds=dict(prev.manifest_bounds),
        )
        return self._commit(meta, snap, parent)

    def position_deletes_df(
        self,
        spark: SparkSession,
        snapshot: Snapshot | None = None,
        rel_path_bounds: tuple[str, str] | None = None,
    ) -> tuple[DataFrame | None, int]:
        """The snapshot's pending position deletes as a DataFrame of
        ``(file_path, pos)`` plus their total row count (from manifest
        stats — no data read). ``rel_path_bounds=(lo, hi)`` prunes
        delete FILES whose referenced-data-file range is disjoint from
        the scanned file range, using the min/max the sorted delete
        write left in the delete manifest. Returns (None, 0) when the
        snapshot has no (surviving) deletes."""
        snap = snapshot if snapshot is not None else self.current_snapshot()
        if snap is None or not snap.delete_manifests:
            return None, 0
        entries: list[dict] = []
        for m in snap.position_delete_manifests():
            entries.extend(self.read_manifest_entries(m))
        if rel_path_bounds is not None:
            lo, hi = rel_path_bounds
            entries = [
                e for e in entries
                if e["str_mins"].get("file_path") is None
                or (e["str_maxs"]["file_path"] >= lo
                    and e["str_mins"]["file_path"] <= hi)
            ]
        df = None
        n = 0
        if entries:
            n = sum(e["record_count"] for e in entries)
            df = spark.read.schema("file_path string, pos long").parquet(
                *[os.path.join(self._local_root, e["file_path"])
                  for e in entries]
            )
        dv_df, dv_n = self._dv_positions_df(
            spark, snap.dv_manifests(), rel_path_bounds)
        if dv_df is not None:
            if df is None:
                df = dv_df
            else:
                # mixed v2 + DV pending sets can overlap: a DV merged
                # the prior position rows of its file, but those rows'
                # manifests still list. Dedup so counting consumers
                # (partitions_df live counts, fold's min_delete_ratio)
                # are exact; the shuffle is paid only in this mixed case
                df = df.unionByName(dv_df).dropDuplicates(
                    ["file_path", "pos"])
            n += dv_n
        if df is None:
            return None, 0
        return df, n

    # broadcast the delete set into the anti-join below this many rows:
    # (short string + long) rows hash-build at ~100 B/row -> ~100 MB,
    # map-side join, blobs never shuffle. Above it, Catalyst/AQE picks
    # the strategy — and 1M pending delete rows also means many files
    # sit over maintenance's calibrated fold trigger
    # (maintenance.min-delete-ratio = 0.05; tools/calibrate_fold.py),
    # so the next sweep folds them into the data.
    MOR_BROADCAST_ROWS = 1_000_000

    def write_equality_delete_files(
        self, keys_df: DataFrame, cols: list[str], n_files: int = 1
    ) -> list[dict]:
        """Write equality-delete files: rows of key values whose EVERY
        prior version must disappear (Iceberg v2 equality deletes —
        the delete flavor a writer can produce WITHOUT reading the
        table, which is what makes blind streaming upserts possible).
        Returns entries for :meth:`commit_equality_deletes`."""
        write_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.data_dir, f"deletes-eq-{write_id}")
        df = keys_df.select(*cols).dropDuplicates(cols)
        df = df.coalesce(n_files) if n_files else df
        df.write.mode("append").parquet(out_dir)
        schema = self.schema()
        fake_meta = {"schema_json": T.StructType(
            [schema[c] for c in cols]).json()}
        return self._collect_entries(out_dir, fake_meta)

    def commit_equality_deletes(
        self,
        delete_entries: list[dict],
        cols: list[str],
        data_entries: list[dict] | None = None,
        summary: dict | None = None,
        retries: int = 3,
    ) -> Snapshot:
        """Commit equality-delete files (+ optionally appended data in
        the same snapshot — the blind-upsert shape: delete-by-key every
        prior version, append the new one). Unlike position deletes,
        equality deletes are NOT content-addressed: they scope by the
        commit SEQUENCE (apply only to data files sequenced earlier),
        so the commit composes with concurrent commits under plain
        optimistic retry — either serialization order is consistent,
        which is exactly why a streaming CDC writer can use this path
        without coordination."""
        bad = [c for c in cols if c not in {f.name for f in self.schema().fields}]
        if bad:
            raise ValueError(f"unknown equality-delete columns: {bad}")
        last: Exception | None = None
        for _ in range(max(1, retries + 1)):
            meta = self.load_metadata()
            parent = meta["current_snapshot_id"]
            prev = self.current_snapshot(meta)
            if prev is None:
                raise ValueError("cannot equality-delete from an empty table")
            snap_id, seq = self._next_ids(meta)
            dm, _, _ = self._write_manifest(delete_entries, snap_id)
            manifests = list(prev.manifests)
            mparts = dict(prev.manifest_parts)
            mbounds = dict(prev.manifest_bounds)
            added = list(data_entries or [])
            if added:
                m, parts, mb = self._write_manifest(added, snap_id)
                manifests.append(m)
                mparts[m] = parts
                mbounds[m] = mb
            dmeta = dict(prev.delete_manifest_meta)
            dmeta[dm] = {"kind": "equality", "cols": list(cols), "seq": seq}
            snap = Snapshot(
                snap_id, parent, seq, int(time.time() * 1000),
                "delete" if not added else "eq-upsert",
                manifests,
                {"op": "eq-delete" if not added else "eq-upsert",
                 "equality-cols": ",".join(cols),
                 "added-delete-files": len(delete_entries),
                 "delete-keys": sum(e["record_count"] for e in delete_entries),
                 **({"added-files": len(added),
                     "added-records": sum(e["record_count"] for e in added)}
                    if added else {}),
                 **(summary or {})},
                mparts,
                list(prev.delete_manifests) + [dm],
                dmeta,
                manifest_bounds=mbounds,
            )
            try:
                return self._commit(meta, snap, parent)
            except ConcurrentCommitError as e:
                last = e
                # drop BOTH of the attempt's manifests, not just the
                # delete one — litter otherwise waits for orphan GC
                for attempt_m in [dm] + manifests[len(prev.manifests):]:
                    with contextlib.suppress(OSError):
                        os.remove(os.path.join(self.meta_dir, attempt_m))
        raise last

    def _snapshot_seqs(self, meta: dict | None = None) -> dict[int, int]:
        """snapshot_id -> sequence for EVERY commit ever made (the
        permanent ``snapshot_seqs`` record, which survives snapshot
        expiry), merged with the live snapshot list for tables created
        before the record existed. Equality-delete scoping and
        partition-spec attribution both resolve through this — an
        expired-but-recorded snapshot keeps its files correctly
        classified; a truly unknown id (pre-record legacy) falls back
        to 0 = oldest, which is conservative for both uses."""
        meta = meta or self.load_metadata()
        out = {int(k): int(v) for k, v in meta.get("snapshot_seqs", {}).items()}
        for s in self.snapshots_list(meta):
            out[s.snapshot_id] = s.sequence
        return out

    def equality_deletes_info(
        self, snapshot: Snapshot | None = None
    ) -> list[tuple[list[str], list[str], int, int]]:
        """Per equality-delete manifest: (delete file rel paths,
        key cols, apply sequence, key row count)."""
        snap = snapshot if snapshot is not None else self.current_snapshot()
        if snap is None:
            return []
        out = []
        for m, cols, seq in snap.equality_delete_manifests():
            entries = self.read_manifest_entries(m)
            if entries:
                out.append(([e["file_path"] for e in entries], cols, seq,
                            sum(e["record_count"] for e in entries)))
        return out

    # ---------------- expiration / GC ----------------

    def expire_snapshots(
        self, keep_last: int = 2, delete_orphans: bool = True,
        older_than_ms: int | None = None,
        spark: SparkSession | None = None,
    ) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and GC data/
        manifest files no retained snapshot references. Reachability is
        a set computation over manifests — driven by DataFrame-shaped
        metadata (here the same entries the `files` table exposes).

        With ``spark``, the live/dead file classification runs as a
        manifest-parquet scan + anti-join (Iceberg's expireSnapshots
        "determine unreachable files with a metadata-table job" shape):
        the driver sees only manifest NAMES (O(snapshots), from the
        metadata JSON) and a bounded iterator of paths-to-delete —
        never a full entry list. This is the same never-collect
        contract the data ops obey (``files`` docstring), extended to
        GC; at 10^12-image scale the entry list is millions of rows.
        Without ``spark`` the original driver-side set computation runs
        (small tables, CLI contexts without a session).

        ``older_than_ms`` is Iceberg's expireSnapshots(olderThan,
        retainLast) age axis: snapshots at or after the cutoff are
        retained regardless of count, and ``keep_last`` remains the
        floor — only snapshots BOTH older than the cutoff AND beyond
        the newest ``keep_last`` expire.

        Ordering follows Iceberg: COMMIT the metadata that drops the
        expired snapshots first, THEN delete files unreachable from the
        committed version. A crash or ConcurrentCommitError before the
        commit leaves the table untouched; a crash after it leaves only
        harmless orphan files (re-running the GC pass cleans them)."""
        meta = self.load_metadata()
        snaps = sorted(self.snapshots_list(meta), key=lambda s: s.sequence)
        # per-ref retention (set_ref_retention): drop refs whose target
        # aged past max_ref_age_ms FIRST — a dropped ref pins nothing,
        # and ref GC must run even when no snapshot is old enough to
        # expire (otherwise a stale ref outlives its policy until
        # unrelated commits push the table past keep_last)
        now_ms = int(time.time() * 1000)
        rr = dict(meta.get("ref_retention", {}))
        by_id = {s.snapshot_id: s for s in snaps}
        dropped_refs: list[str] = []
        for kind in ("tags", "branches"):
            refs = dict(meta.get(kind, {}))
            for nm in list(refs):
                age = rr.get(nm, {}).get("max_ref_age_ms")
                tgt = by_id.get(refs[nm])
                if age is not None and tgt and now_ms - tgt.timestamp_ms > age:
                    del refs[nm]
                    rr.pop(nm, None)
                    dropped_refs.append(nm)
            meta[kind] = refs
        meta["ref_retention"] = rr
        if len(snaps) <= keep_last and not dropped_refs:
            return {"expired": 0, "deleted_files": 0, "deleted_manifests": 0,
                    "dropped_refs": []}
        retained = snaps[-keep_last:]
        if older_than_ms is not None:
            kept = {s.snapshot_id for s in retained}
            retained += [s for s in snaps
                         if s.timestamp_ms >= older_than_ms
                         and s.snapshot_id not in kept]
        cur = self.current_snapshot(meta)
        if cur and cur.snapshot_id not in {s.snapshot_id for s in retained}:
            retained.append(cur)
        # branch ancestor retention: keep the newest N ancestors and
        # every ancestor younger than the cutoff, per surviving ref
        kept_ids = {s.snapshot_id for s in retained}
        heads = dict(meta.get("branches", {}))
        if meta.get("current_snapshot_id") is not None:
            heads["main"] = meta["current_snapshot_id"]
        for nm, head in heads.items():
            cfg = rr.get(nm)
            if not cfg:
                continue
            keep_n = cfg.get("min_snapshots_to_keep", 1)
            keep_age = cfg.get("max_snapshot_age_ms")
            sid: int | None = head
            i = 0
            while sid is not None and sid in by_id:
                s = by_id[sid]
                if not (i < keep_n or (keep_age is not None
                                       and now_ms - s.timestamp_ms <= keep_age)):
                    break
                if sid not in kept_ids:
                    retained.append(s)
                    kept_ids.add(sid)
                i += 1
                sid = s.parent_id
        # tagged snapshots and branch heads are pinned: expiry never
        # drops a (surviving) ref target — Iceberg retains per-ref
        # history; pinning the head is the minimal sound form
        tagged = set(self.tags(meta).values()) | set(self.branches(meta).values())
        kept_ids = {s.snapshot_id for s in retained}
        retained += [s for s in snaps
                     if s.snapshot_id in tagged and s.snapshot_id not in kept_ids]
        expired = [s for s in snaps if s.snapshot_id not in {r.snapshot_id for r in retained}]
        if not expired and not dropped_refs:
            # nothing to drop — don't burn an expiry commit on a no-op
            return {"expired": 0, "deleted_files": 0, "deleted_manifests": 0,
                    "dropped_refs": []}

        # reachability computed while the expired manifests still exist;
        # delete manifests and the position-delete files they list are
        # table files like any other (Iceberg expires them the same way)
        live_manifests = {m for s in retained for m in s.manifests}
        live_manifests |= {m for s in retained for m in s.delete_manifests}
        dead_manifests = (
            {m for s in expired for m in s.manifests}
            | {m for s in expired for m in s.delete_manifests}
        ) - live_manifests
        dead_df = None
        if spark is not None:
            # distributed reachability: dead = (paths in expired-only
            # manifests) ANTI-JOIN (paths in any retained manifest).
            # Planned BEFORE the commit while every manifest still
            # exists; re-evaluated lazily for the delete walk below
            # (manifest files are removed only after the data files).
            dead_df = self._manifest_paths_df(spark, dead_manifests).join(
                self._manifest_paths_df(spark, live_manifests),
                "file_path", "left_anti",
            ).persist()  # one execution serves the count AND the walk
            n_dead = dead_df.count()
            dead_files: set[str] = set()  # unused on this path
        else:
            live_files: set[str] = set()
            for m in live_manifests:
                live_files |= {e["file_path"] for e in self.read_manifest_entries(m)}
            dead_files = set()
            for m in dead_manifests:
                dead_files |= {e["file_path"] for e in self.read_manifest_entries(m)}
            dead_files -= live_files
            n_dead = len(dead_files)

        # 1) commit: expired snapshots become unreachable atomically
        parent = meta["current_snapshot_id"]
        snap_id, seq = self._next_ids(meta)
        meta["snapshots"] = [
            s.to_json() for s in snaps if s.snapshot_id in {r.snapshot_id for r in retained}
        ]
        exp = Snapshot(
            snap_id, parent, seq, int(time.time() * 1000), "expire-snapshots",
            cur.manifests if cur else [],
            # files-to-gc is the PLANNED set (known pre-commit); actual
            # deletions happen after the commit and are returned, not
            # recorded in the immutable snapshot history
            {"expired-snapshots": len(expired), "files-to-gc": n_dead,
             "gc-enabled": bool(delete_orphans),
             **({"dropped-refs": sorted(dropped_refs)} if dropped_refs else {})},
            dict(cur.manifest_parts) if cur else {},
            list(cur.delete_manifests) if cur else [],
            dict(cur.delete_manifest_meta) if cur else {},
            manifest_bounds=dict(cur.manifest_bounds) if cur else {},
        )
        # statistics / partition-statistics files are snapshot-
        # addressed: entries for expired snapshots are unreachable via
        # any time-travel read, so prune the registry (and GC the
        # files below) — otherwise a stats-per-commit table leaks one
        # metadata entry + one file per snapshot forever
        retained_ids = {r.snapshot_id for r in retained}
        dead_stats: list[str] = []
        for key in ("statistics", "partition_statistics"):
            reg = dict(meta.get(key, {}))
            for sid_str in list(reg):
                if int(sid_str) not in retained_ids:
                    dead_stats.append(reg.pop(sid_str))
            if reg:
                meta[key] = reg
            else:
                meta.pop(key, None)
        committed = self._commit(meta, exp, parent)

        # 2) GC: delete files no committed snapshot can reach
        n_files = 0
        if delete_orphans:
            for name in dead_stats:
                fp = os.path.join(self.meta_dir, name)
                if os.path.exists(fp):
                    os.remove(fp)
            dead_iter = (
                (r["file_path"] for r in dead_df.toLocalIterator())
                if dead_df is not None else iter(dead_files)
            )
            for rel in dead_iter:
                fp = os.path.join(self._local_root, rel)
                if os.path.exists(fp):
                    os.remove(fp)
                    n_files += 1
            for m in dead_manifests:
                mp = os.path.join(self.meta_dir, m)
                if os.path.exists(mp):
                    os.remove(mp)
            # prune now-empty snap/delete dirs
            for pat in ("snap-*", "deletes-*"):
                for d in globmod.glob(os.path.join(self.data_dir, pat)):
                    if not any(files for _, _, files in os.walk(d)):
                        shutil.rmtree(d, ignore_errors=True)
        if dead_df is not None:
            dead_df.unpersist()

        return {
            "expired": len(expired),
            "deleted_files": n_files,
            "deleted_manifests": len(dead_manifests),
            "dropped_refs": sorted(dropped_refs),
            "snapshot": committed.snapshot_id,
        }

    def add_files(self, spark: SparkSession, source: str | list[str],
                  summary: dict | None = None) -> "Snapshot":
        """Zero-copy import of existing parquet files (Iceberg's
        ``add_files`` migration): the files are HARD-LINKED into the
        table's data dir (copy only across filesystems), footer stats
        become manifest entries, and one append snapshot commits them.
        No data is read or rewritten — onboarding 100 TB of existing
        parquet costs O(files) metadata, not O(bytes).

        Validation is read-path driven: every table column must be
        readable from the files' merged schema — same type, a legal
        widening (the reader promotes int32->bigint etc. under the
        explicit read schema), or absent-but-nullable (reads NULL /
        initial default). Extra physical columns are allowed: scans
        read through the declared schema and never see them.

        Partitioned tables: each file must map to ONE partition —
        decided from footer min/max of the source column through the
        same Catalyst transform the writer uses (monotone transforms
        accept a range whose endpoints agree; bucket[] requires a
        single-valued file). A file that straddles partitions must be
        rewritten instead (``write_data_files``)."""
        paths = sorted(globmod.glob(source)) if isinstance(source, str) else list(source)
        if not paths:
            raise ValueError(f"add_files: no files match {source!r}")
        root = os.path.realpath(self._local_root)
        for p in paths:
            if os.path.realpath(p).startswith(root + os.sep):
                raise ValueError(
                    f"add_files: {p} is already inside the table location")

        meta = self.load_metadata()
        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        # mergeSchema reads every footer: a heterogeneous file set must
        # be validated against its WIDEST member, not whichever single
        # footer Spark happens to infer from (one incompatible file
        # would otherwise commit and break every later scan)
        try:
            src_schema = spark.read.option(
                "mergeSchema", "true").parquet(*paths).schema
        except Exception as e:  # CANNOT_MERGE_SCHEMAS -> a clear refusal
            raise ValueError(
                f"add_files: the files' schemas are mutually "
                f"incompatible and cannot import together: {e}") from e
        smap = {f.name: f.dataType for f in src_schema.fields}
        for f in schema.fields:
            have = smap.get(f.name)
            if have is None:
                # initial-defaults are sequence-scoped and these files
                # get the NEW commit's sequence, so a default can never
                # cover an imported file — nullability is the only out
                if not f.nullable:
                    raise ValueError(
                        f"add_files: files lack non-nullable column {f.name!r}")
                continue
            if have == f.dataType:
                continue
            promotable = f.dataType.simpleString() in self._WIDENINGS.get(
                have.simpleString(), set())
            if not promotable:
                raise ValueError(
                    f"add_files: column {f.name!r} is {have.simpleString()} "
                    f"in the files but {f.dataType.simpleString()} in the "
                    "table (only reader-promotable narrowings import)")

        pcol = meta["partition_col"]
        pids: dict[str, str] = {}
        if pcol:
            transform = self.partition_transform(meta)
            kind = parse_transform(transform)[0]
            endpoints: list = []
            spans: list[tuple[str, object, object]] = []
            for p in paths:
                md = pq.ParquetFile(p).metadata
                lo = hi = None
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        if col.path_in_schema != pcol:
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            raise ValueError(
                                f"add_files: {p} has no {pcol!r} stats; "
                                "cannot place it in a partition")
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                if lo is None:
                    raise ValueError(f"add_files: {p} lacks column {pcol!r}")
                if kind == "bucket" and lo != hi:
                    raise ValueError(
                        f"add_files: {p} spans {pcol!r} values {lo}..{hi} "
                        "under a bucket[] transform; rewrite it instead")
                spans.append((p, lo, hi))
                endpoints += [lo, hi]
            vals = self.partition_values_of(spark, endpoints, meta)
            vmap = dict(zip(endpoints, vals))
            for p, lo, hi in spans:
                if vmap[lo] != vmap[hi]:
                    raise ValueError(
                        f"add_files: {p} straddles partitions "
                        f"{vmap[lo]!r} and {vmap[hi]!r}; rewrite it instead")
                pids[p] = vmap[lo]

        out_dir = os.path.join(self.data_dir, f"snap-import-{uuid.uuid4().hex[:12]}")
        for i, p in enumerate(paths):
            d = (os.path.join(out_dir, f"{_PART_DIR}={pids[p]}")
                 if pcol else out_dir)
            os.makedirs(d, exist_ok=True)
            # index prefix: Hive-partitioned sources reuse basenames
            # across dirs (part-00000-X in every a=.. dir) — a collision
            # here would silently drop a file. Forced .parquet suffix:
            # _collect_entries globs *.parquet, so an extensionless
            # import (Hive 000000_0) would link but commit zero entries.
            base = os.path.basename(p)
            if not base.endswith(".parquet"):
                base += ".parquet"
            dst = os.path.join(d, f"{i:05d}-{base}")
            try:
                os.link(p, dst)
            except OSError:
                shutil.copy2(p, dst)  # cross-device: fall back to copy
        entries = self._collect_entries(out_dir, meta)
        return self.commit_append(
            entries,
            summary={"op": "add-files", "source-files": len(paths),
                     **(summary or {})})

    def remove_orphan_files(self, older_than_s: float = 3 * 86400.0,
                            spark: SparkSession | None = None,
                            dry_run: bool = False) -> dict:
        """Delete files in the table directory that NO snapshot
        references — Iceberg's remove_orphan_files. Orphans come from
        crashed writers (write_data_files outputs whose commit never
        happened) and failed optimistic-commit attempts (unreferenced
        manifests).

        ``older_than_s`` is the in-flight grace period and must exceed
        the longest possible WRITE-TO-COMMIT gap, not just the write
        duration: a slow writer's landed-but-uncommitted files look
        exactly like orphans until its commit. Default mirrors
        Iceberg's 3 days; tests pass small values on quiesced tables.

        Reachability = every file_path in every manifest of EVERY
        retained snapshot, plus every referenced manifest. Tolerates
        concurrent GC/expire deleting files between the listing and the
        stat/remove (TOCTOU -> skip).

        With ``spark``, BOTH sides of the reachability check are
        distributed (Iceberg's remove_orphan_files actual-files job):
        the table-directory listing is a ``binaryFile`` scan (path +
        mtime only — content is pruned away, no bytes read) and the
        live set is a manifest-parquet scan; orphans = listing
        ANTI-JOIN live, age-filtered executor-side. The join key is
        the path tail ``snap-dir/filename`` — both components carry
        writer UUIDs (write_data_files / Spark part files), so the
        tail is globally unique and immune to the URI-vs-local and
        percent-encoding representational differences between the two
        sides. The driver materializes only the orphan list (bounded
        iterator), never the live set.

        ``dry_run=True`` reports what WOULD be deleted (counts + a
        bounded path sample) without unlinking anything — Iceberg's
        remove_orphan_files dry-run contract; at 100 TB you audit the
        candidate list before ever deleting blind. The same grace
        re-stat runs, so the report matches what a real run at the
        same instant would remove."""
        live_manifests: set[str] = set()
        for s in self.snapshots_list():
            live_manifests |= set(s.manifests)
            live_manifests |= set(s.delete_manifests)

        now = time.time()
        deleted_data = deleted_manifests = 0
        sample: list[str] = []
        if spark is not None:
            tail = lambda c: F.substring_index(c, "/", -2)  # noqa: E731
            listing = (
                spark.read.format("binaryFile")
                .option("pathGlobFilter", "*.parquet")
                .option("recursiveFileLookup", "true")
                .load(self.data_dir)
                .select(F.col("path"),
                        F.col("modificationTime").cast("double").alias("mtime"))
            )
            orphans = (
                listing
                .filter(F.lit(now) - F.col("mtime") >= F.lit(float(older_than_s)))
                .join(self._manifest_paths_df(spark, live_manifests)
                      .select(tail(F.col("file_path")).alias("live_tail")),
                      tail(F.col("path")) == F.col("live_tail"), "left_anti")
            )
            from .paths import relativize_reported

            for r in orphans.toLocalIterator():
                # path is a Spark-reported file URI (single-slash
                # file:/..., possibly percent-encoded): relativize it
                # the same way MERGE resolves input_file_name, then
                # re-root under the decoded local root
                rel = relativize_reported(r["path"], self.location)
                local = os.path.join(self._local_root, rel)
                with contextlib.suppress(FileNotFoundError):
                    # re-stat before removing: the file may have been
                    # GC'd concurrently, or touched since the listing
                    if now - os.path.getmtime(local) < older_than_s:
                        continue
                    if dry_run:
                        if len(sample) < 100:
                            sample.append(rel)
                    else:
                        os.remove(local)
                    deleted_data += 1
        else:
            live_files: set[str] = set()
            for m in live_manifests:
                live_files |= {e["file_path"]
                               for e in self.read_manifest_entries(m)}
            for fp in globmod.glob(
                    os.path.join(self.data_dir, "**", "*.parquet"),
                    recursive=True):
                rel = os.path.relpath(fp, self._local_root)
                if rel in live_files:
                    continue
                with contextlib.suppress(FileNotFoundError):
                    if now - os.path.getmtime(fp) < older_than_s:
                        continue  # possibly an in-flight write
                    if dry_run:
                        if len(sample) < 100:
                            sample.append(rel)
                    else:
                        os.remove(fp)
                    deleted_data += 1
        for fp in globmod.glob(os.path.join(self.manifest_dir, "manifest-*.parquet")):
            rel = os.path.join("manifests", os.path.basename(fp))
            if rel in live_manifests:
                continue
            with contextlib.suppress(FileNotFoundError):
                if now - os.path.getmtime(fp) < older_than_s:
                    continue
                if dry_run:
                    if len(sample) < 100:
                        sample.append(rel)
                else:
                    os.remove(fp)
                deleted_manifests += 1
        if dry_run:
            return {"orphan_data_files": deleted_data,
                    "orphan_manifests": deleted_manifests,
                    "dry_run": True, "sample": sample}
        for pat in ("snap-*", "deletes-*"):
            for d in globmod.glob(os.path.join(self.data_dir, pat)):
                with contextlib.suppress(FileNotFoundError):
                    # same grace for directories: a concurrent writer's
                    # output dir exists before its first file lands
                    if now - os.path.getmtime(d) < older_than_s:
                        continue
                    if not any(files for _, _, files in os.walk(d)):
                        shutil.rmtree(d, ignore_errors=True)
        return {"deleted_data_files": deleted_data,
                "deleted_manifests": deleted_manifests}

    def clone_to(self, spark: SparkSession, dst_location: str,
                 snapshot_id: int | None = None) -> "LakehouseTable":
        """Zero-copy clone (Delta ``SHALLOW CLONE`` semantics made
        durable with hard links; Iceberg snapshot-export parity): the
        chosen snapshot's live data files are HARD-LINKED into the
        destination at their table-relative paths, their manifest
        entries — stats, blooms, ``first_row_id`` lineage — are carried
        into ONE consolidated manifest written distributed (same
        scratch-write + driver-rename as rewrite_manifests), and the
        destination starts life with a single ``clone`` snapshot.
        Cost: O(files) metadata + O(files) link syscalls, zero data
        bytes moved; the clones then evolve fully independently (a
        rewrite in either table unlinks, never mutates, shared blobs).

        Guards: pending delete files must be folded first
        (``rewrite_position_deletes``) — a clone that silently dropped
        MOR deletes would resurrect rows; mixed partition-spec tables
        need ``migrate_partitions`` first (the copied partition ids
        must share one value domain). ``next_row_id`` is carried so
        row-lineage ids never collide with future destination writes.
        """
        meta = self.load_metadata()
        snaps = {s.snapshot_id: s for s in self.snapshots_list(meta)}
        snap = (snaps.get(snapshot_id) if snapshot_id is not None
                else self.current_snapshot(meta))
        if snapshot_id is not None and snap is None:
            raise ValueError(f"unknown snapshot {snapshot_id}")
        if snap is None:
            raise ValueError("cannot clone an empty table")
        if snap.delete_manifests:
            raise ValueError(
                "clone requires folded deletes: run "
                "rewrite_position_deletes first (pending MOR/DV deletes "
                "would be silently dropped)")
        if self._current_spec_snapshot_ids(meta) is not None:
            raise ValueError(
                "clone of a mixed partition-spec table: run "
                "compaction.migrate_partitions first")
        dst = LakehouseTable.create(
            dst_location,
            T.StructType.fromJson(json.loads(meta["schema_json"])),
            partition_col=meta.get("partition_col"),
            properties=self.properties(meta),
            partition_transform=(None if meta.get("partition_col") is None
                                 else self.partition_transform(meta)),
        )
        from .paths import to_local

        files_df = self.files(spark, snap.snapshot_id)
        # hard links, streamed in bounded batches (toLocalIterator
        # holds one partition of paths, never the full file list)
        dst_root = to_local(dst.location)
        n_linked = 0
        for row in files_df.select("file_path").toLocalIterator():
            rel = row["file_path"]
            s = os.path.join(self._local_root, rel)
            d = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)  # cross-device fallback
            n_linked += 1
        dmeta = dst.load_metadata()
        snap_id, seq = dst._next_ids(dmeta)
        parts = sorted(
            r["partition_id"]
            for r in files_df.select("partition_id").distinct().collect()
        )
        name = f"manifest-{snap_id}-{uuid.uuid4().hex[:8]}.parquet"
        scratch = os.path.join(dst.manifest_dir,
                               f".clone-{uuid.uuid4().hex[:8]}")
        (
            files_df
            # entries re-attributed to the clone snapshot: the source's
            # snapshot ids don't exist in the destination's history
            .withColumn("added_snapshot_id", F.lit(snap_id))
            .repartition(1)
            .sortWithinPartitions("partition_id", "file_path")
            .write.mode("overwrite").parquet(scratch)
        )
        part_files = [f for f in os.listdir(scratch) if f.endswith(".parquet")]
        if len(part_files) != 1:
            raise RuntimeError(f"expected 1 manifest part, got {part_files}")
        os.replace(os.path.join(scratch, part_files[0]),
                   os.path.join(dst.manifest_dir, name))
        shutil.rmtree(scratch, ignore_errors=True)
        manifest_rel = os.path.join("manifests", name)
        new_snap = Snapshot(
            snap_id, None, seq, int(time.time() * 1000), "clone",
            [manifest_rel],
            {"source-location": self.location,
             "source-snapshot-id": str(snap.snapshot_id),
             "files-linked": str(n_linked)},
            {manifest_rel: parts}, [], {},
            manifest_bounds={manifest_rel: self._bounds_from_files_df(files_df)},
        )
        dst._commit(dmeta, new_snap, None,
                    next_row_id=int(meta.get("next_row_id", 0)))
        return dst

    def rewrite_manifests(self, spark: SparkSession) -> Snapshot:
        """Consolidate the current snapshot's manifests into one —
        metadata compaction, keeping planning scans O(1) files.

        Built from the ``files()`` metadata DATAFRAME: the manifest
        scan and the consolidated write run distributed (one Spark
        write into a scratch dir + a driver rename), so the driver
        never materializes the entry list — at 10^12 scale that list
        is millions of rows, and metadata compaction obeys the same
        never-collect rule as the data ops (``all_entries`` stays a
        test-only helper). The only driver-side materialization is the
        partition summary (one row per partition, the manifest-list
        entry every commit already holds)."""
        meta = self.load_metadata()
        parent = meta["current_snapshot_id"]
        cur = self.current_snapshot(meta)
        if cur is None or len(cur.manifests) <= 1:
            return cur  # nothing to consolidate
        snap_id, seq = self._next_ids(meta)
        files_df = self.files(spark)
        parts = sorted(
            r["partition_id"]
            for r in files_df.select("partition_id").distinct().collect()
        )
        name = f"manifest-{snap_id}-{uuid.uuid4().hex[:8]}.parquet"
        scratch = os.path.join(self.manifest_dir, f".rewrite-{uuid.uuid4().hex[:8]}")
        (
            # added_snapshot_id is preserved: it is each file's data
            # lineage (see _write_manifest), not the consolidation's id
            files_df
            # repartition (not coalesce) keeps the manifest SCAN parallel;
            # the single output file is fine — manifests are metadata-sized
            .repartition(1)
            .sortWithinPartitions("partition_id", "file_path")
            .write.mode("overwrite").parquet(scratch)
        )
        part_files = [f for f in os.listdir(scratch) if f.endswith(".parquet")]
        if len(part_files) != 1:
            raise RuntimeError(f"expected 1 manifest part, got {part_files}")
        os.replace(os.path.join(scratch, part_files[0]),
                   os.path.join(self.manifest_dir, name))
        shutil.rmtree(scratch, ignore_errors=True)
        manifest_rel = os.path.join("manifests", name)
        snap = Snapshot(
            snap_id, parent, seq, int(time.time() * 1000), "rewrite-manifests",
            [manifest_rel], {"manifests-merged": len(cur.manifests)},
            {manifest_rel: parts},
            list(cur.delete_manifests),
            dict(cur.delete_manifest_meta),
            manifest_bounds={manifest_rel: self._bounds_from_files_df(files_df)},
        )
        return self._commit(meta, snap, parent)
