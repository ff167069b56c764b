"""ANALYZE TABLE — per-column table statistics (Iceberg's
compute_table_stats / Puffin statistics files, re-expressed as one
Spark aggregation + a small JSON stats file).

The reference leans on DuckDB's implicit ANALYZE for its join
planning; here the stats are explicit and snapshot-addressed: one
distributed pass computes row count, per-column null counts and
approximate NDV (HyperLogLog++ via ``approx_count_distinct`` — the
same sketch family Iceberg serializes as theta sketches), written to
``metadata/stats-<snapshot>.json`` and registered in the table
metadata so a cost-based planner (or a human) can read them without
touching data. Binary columns are skipped (NDV of blobs is
meaningless and hashing them costs a full payload read).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tableformat import LakehouseTable
from ..tableformat.table import _atomic_write


def analyze_table(
    table: LakehouseTable,
    spark: SparkSession,
    columns: list[str] | None = None,
    rsd: float = 0.02,
) -> dict:
    """Compute and persist statistics for the CURRENT snapshot.
    Returns the stats dict. ``rsd`` is the NDV sketch's relative
    standard deviation (HLL++ precision/size tradeoff). One scan, one
    aggregation — at 100 TB this is a column-pruned pass over the
    non-binary columns only."""
    t0 = time.time()
    snap = table.current_snapshot()
    if snap is None:
        raise ValueError("cannot analyze an empty table")
    schema = table.schema()
    cols = columns or [
        f.name for f in schema.fields
        if not isinstance(f.dataType, T.BinaryType)
    ]
    bad = [c for c in cols if c not in {f.name for f in schema.fields}]
    if bad:
        raise ValueError(f"unknown columns: {bad}")
    df = table.scan(spark, columns=cols)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"__ndv_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}")
        )
    row = df.agg(*aggs).collect()[0]
    stats = {
        "snapshot_id": snap.snapshot_id,
        "computed_at_ms": int(time.time() * 1000),
        "row_count": int(row["__rows"]),
        "rsd": rsd,
        "columns": {
            c: {"ndv": int(row[f"__ndv_{c}"]),
                "null_count": int(row[f"__nn_{c}"])}
            for c in cols
        },
        "wall_ms": int((time.time() - t0) * 1000),
    }
    name = f"stats-{snap.snapshot_id}.json"
    _atomic_write(os.path.join(table.meta_dir, name), json.dumps(stats, indent=1))
    # register in table metadata (CAS metadata commit, like tags)
    from ..tableformat.table import ConcurrentCommitError

    last = None
    for _ in range(4):
        meta = table.load_metadata()
        st = dict(meta.get("statistics", {}))
        st[str(snap.snapshot_id)] = name
        meta["statistics"] = st
        try:
            table._commit_metadata(meta)
            return stats
        except ConcurrentCommitError as e:
            last = e
    raise last


def read_statistics(table: LakehouseTable,
                    snapshot_id: int | None = None) -> dict | None:
    """Stats for a snapshot (default: the newest analyzed snapshot at
    or before the current one), or None if never analyzed."""
    meta = table.load_metadata()
    st = meta.get("statistics", {})
    if not st:
        return None
    if snapshot_id is not None:
        name = st.get(str(snapshot_id))
        if name is None:
            return None
    else:
        seqs = {s.snapshot_id: s.sequence for s in table.snapshots_list(meta)}
        cur_seq = seqs.get(meta["current_snapshot_id"], float("inf"))
        candidates = [
            int(sid) for sid in st
            if seqs.get(int(sid), float("inf")) <= cur_seq
        ]
        if not candidates:
            return None
        name = st[str(max(candidates, key=lambda s: seqs.get(s, -1)))]
    with open(os.path.join(table.meta_dir, name)) as f:
        return json.load(f)


def compute_partition_stats(table: LakehouseTable,
                            spark: SparkSession) -> dict:
    """Partition statistics file (Iceberg's partition stats spec /
    ``compute_partition_stats`` procedure): the ``partitions_df``
    aggregate for the CURRENT snapshot — file/row/byte counts and
    MOR-aware live counts per partition — persisted as one parquet
    under ``metadata/`` and registered snapshot-addressed in the table
    metadata. A monitoring dashboard or planner asking "how big is
    each partition" on a 10^12-row table then reads one tiny parquet
    instead of re-aggregating millions of manifest entries; the file
    is immutable per snapshot, so exact-match reads are always
    consistent. One row per partition = metadata-scale, safe to
    collect."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    snap = table.current_snapshot()
    if snap is None:
        raise ValueError("empty table has no partitions to profile")
    pan = table.partitions_df(spark, use_cached=False).toPandas()
    name = f"partition-stats-{snap.snapshot_id}.parquet"
    pq.write_table(pa.Table.from_pandas(pan, preserve_index=False),
                   os.path.join(table.meta_dir, name))
    from ..tableformat.table import ConcurrentCommitError

    last = None
    for _ in range(4):
        meta = table.load_metadata()
        st = dict(meta.get("partition_statistics", {}))
        st[str(snap.snapshot_id)] = name
        meta["partition_statistics"] = st
        try:
            table._commit_metadata(meta)
            return {"snapshot": snap.snapshot_id, "file": name,
                    "partitions": int(len(pan)),
                    "wall_ms": int((time.time() - t0) * 1000)}
        except ConcurrentCommitError as e:
            last = e
    raise last


def scan_report(
    table: LakehouseTable,
    spark: SparkSession,
    predicate: str | None = None,
    int_ranges: dict | None = None,
    point_eq: dict | None = None,
    partition_values=None,
    snapshot_id: int | None = None,
) -> dict:
    """Pre-flight pruning report: how much of the table a scan with
    these predicates would actually touch, BEFORE reading any data.

    At 10^12 rows the difference between a plan that touches 0.1% of
    files and one that touches 40% is the whole job; this is the
    observability half of the pruning machinery (partition values ->
    min/max + string stats -> blooms / hidden-partition transforms),
    staged so a user sees which layer does the work. Every stage is a
    metadata-only aggregation over the manifest DataFrame — three
    scalar rows reach the driver, never a file list.

    ``predicate`` (a SQL string) compiles through the same
    ``derive_hints`` the DML front-end uses; explicit ``int_ranges`` /
    ``point_eq`` / ``partition_values`` merge on top.
    """
    if predicate:
        from ..sql import derive_hints  # lazy: avoid module cycle

        ir, pe = derive_hints(table, predicate)
        int_ranges = {**ir, **(int_ranges or {})}
        point_eq = {**pe, **(point_eq or {})}

    def agg(df):
        r = df.agg(
            F.count("*").alias("files"),
            F.coalesce(F.sum("file_size_bytes"), F.lit(0)).alias("bytes"),
            F.coalesce(F.sum("record_count"), F.lit(0)).alias("records"),
        ).collect()[0]
        return {"files": int(r["files"]), "bytes": int(r["bytes"]),
                "records": int(r["records"])}

    snap = table.current_snapshot()
    stages = {
        "total": agg(table.files(spark, snapshot_id)),
        "after_partition": agg(table.plan_files(
            spark, partition_values=partition_values,
            snapshot_id=snapshot_id)),
        "after_stats": agg(table.plan_files(
            spark, partition_values=partition_values,
            int_ranges=int_ranges or None, snapshot_id=snapshot_id)),
        "candidates": agg(table.plan_files(
            spark, partition_values=partition_values,
            int_ranges=int_ranges or None, point_eq=point_eq or None,
            snapshot_id=snapshot_id)),
    }
    tot = stages["total"]
    cand = stages["candidates"]
    # manifest-list stage: how many manifests the candidate plan even
    # opens (manifest_parts / manifest_bounds summaries, no I/O)
    plan_snap = (table.snapshot_by_id(snapshot_id)
                 if snapshot_id is not None else snap)
    manifests = {"total": 0, "read": 0, "skipped": 0}
    if plan_snap is not None:
        subset, skipped = table._prune_manifests(
            plan_snap, table.load_metadata(),
            partition_values=partition_values,
            int_ranges=int_ranges or None)
        manifests = {"total": len(plan_snap.manifests),
                     "read": len(subset), "skipped": skipped}
    return {
        "snapshot_id": snapshot_id if snapshot_id is not None
        else (snap.snapshot_id if snap else None),
        "manifests": manifests,
        **stages,
        "candidate_fraction_files":
            round(cand["files"] / max(tot["files"], 1), 4),
        "candidate_fraction_bytes":
            round(cand["bytes"] / max(tot["bytes"], 1), 4),
        "hints": {
            "int_ranges": {k: list(v) for k, v in (int_ranges or {}).items()},
            "point_eq": dict(point_eq or {}),
            "partition_values":
                sorted(str(v) for v in partition_values)
                if partition_values is not None else None,
        },
    }
