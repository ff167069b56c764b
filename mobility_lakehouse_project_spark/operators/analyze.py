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
