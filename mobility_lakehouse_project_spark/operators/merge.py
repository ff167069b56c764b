"""MERGE INTO — copy-on-write upsert keyed on image_id.

Reproduces the reference's MERGE semantics
(`MERGE INTO tgt USING src ON key WHEN MATCHED THEN UPDATE SET ...
WHEN NOT MATCHED THEN INSERT BY NAME`, dags/Bronze_Ingest_Dag.py:124-130,
141-152, 178-184) without any table-format runtime: plain Spark SQL has
no MERGE, so the engine implements it as a file-level copy-on-write:

 1. **Find touched files** — scan only (key, _file) of the target
    (column pruning keeps `bytes` out of this join entirely) and
    semi-join against the source keys; collect the distinct file list
    (metadata-sized). Untouched files are never read again.
 2. **Rewrite** — full-outer-join touched rows with the source on the
    key: source wins when present (UPDATE / INSERT), target row
    otherwise. Source rows whose key exists nowhere in the target are
    INSERTs and land in the same write.
 3. **Commit** — replace-files snapshot (touched files out, rewritten
    files in), atomic, parent-validated.

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
from pyspark.sql.window import Window

from ..lineage import LineageLog
from ..tableformat import LakehouseTable


def merge_into(
    table: LakehouseTable,
    spark: SparkSession,
    source: DataFrame,
    key: str = "image_id",
    target_file_size: int = 64 * 1024 * 1024,
    op_id: str | None = None,
) -> dict:
    """WHEN MATCHED UPDATE (all columns) / WHEN NOT MATCHED INSERT."""
    t0 = time.time()
    meta = table.load_metadata()
    pcol = meta["partition_col"]
    data_cols = [f.name for f in table.schema().fields]

    # dedupe source deterministically on key (last-writer-wins is
    # ill-defined for a batch; pick max over a stable tiebreaker)
    src = source.select(*data_cols)
    w_cols = [c for c in data_cols if c != key]
    src = (
        src.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    *[F.col(c).desc_nulls_last() for c in w_cols if c != "bytes"]
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 1. touched files: key+filename scan (bytes column pruned away)
    cur = table.current_snapshot()
    if cur is None or not cur.manifests:
        snap = table.append(src)
        return {"files_rewritten": 0, "files_written": snap.summary["added-files"],
                "rows_out": snap.summary["added-records"],
                "wall_ms": int((time.time() - t0) * 1000),
                "snapshot": snap.snapshot_id}
    target_keys = table.scan(spark, columns=None).select(
        F.col(key), F.input_file_name().alias("_file")
    )
    touched_files = {
        r["_file"]
        for r in target_keys.join(src.select(key), key, "left_semi")
        .select("_file").distinct().collect()
    }
    # normalize URIs from input_file_name to table-relative paths
    touched_rel = set()
    for f in touched_files:
        i = f.find(table.location)
        touched_rel.add(f[i + len(table.location) + 1 :] if i >= 0 else f)
    # stats for the touched set come from the manifest DataFrame —
    # bounded by the touched-file count, never the whole table
    if touched_rel:
        tdf = spark.createDataFrame([(p,) for p in sorted(touched_rel)], "file_path string")
        touched_entries = [
            r.asDict()
            for r in table.files(spark)
            .join(F.broadcast(tdf), "file_path", "left_semi")
            .select("file_path", "partition_id", "file_size_bytes", "record_count")
            .collect()
        ]
    else:
        touched_entries = []

    # 2. rewrite: full outer join touched-rows x source
    if touched_entries:
        tgt = table.scan_matched_files(touched_entries, spark).alias("t")
    else:
        tgt = spark.createDataFrame([], table.schema()).alias("t")
    s = src.alias("s")
    joined = tgt.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    src_present = F.col(f"s.{key}").isNotNull()
    out = joined.select(
        *[
            F.when(src_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in data_cols
        ]
    )

    total_bytes = sum(e["file_size_bytes"] for e in touched_entries) or 1
    n_out = max(1, round(total_bytes / target_file_size))
    n_parts = len({e["partition_id"] for e in touched_entries}) or 1
    new_entries = table.write_data_files(
        out, n_files=max(n_out, 1), sort_cols=[key], n_partitions_hint=n_parts
    )
    snap = table.commit_replace(
        {e["file_path"] for e in touched_entries},
        new_entries,
        operation="overwrite",
        summary={"op": "merge", "key": key},
    )
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
