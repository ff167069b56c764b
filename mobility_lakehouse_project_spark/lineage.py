"""Per-partition lineage checkpointing for resumable maintenance.

The reference achieves resumability by orchestration: Airflow
`catchup=True` daily runs with per-day DELETE+INSERT idempotency
(dags/Silver_Transform_Dag.py:188-207) and the monthly chunk loop of the
gold build (dags/Gold_Chunked_Dag.py:70-88). The Spark-native analog is
a lineage table: each maintenance operator processes partition *chunks*,
and after each chunk's commit writes one checkpoint record

    (op_id, chunk_key, partition_ids, files_in, files_out,
     rows, bytes, wall_ms, snapshot_id)

via atomic tmp+rename. On restart the operator skips chunks whose record
exists — per-partition exactly-once without recompaction (north_rule).
The log is itself queryable as a Spark DataFrame (`lineage_df`).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "op_id string, chunk_key string, partition_ids array<string>, "
    "files_in int, files_out int, rows long, bytes long, wall_ms long, "
    "snapshot_id long, ts_ms long"
)


class LineageLog:
    def __init__(self, table_location: str):
        from .tableformat.paths import to_local

        self.root = os.path.join(to_local(table_location), "_lineage")

    def _op_dir(self, op_id: str) -> str:
        return os.path.join(self.root, op_id)

    def completed_chunks(self, op_id: str) -> set[str]:
        d = self._op_dir(op_id)
        if not os.path.isdir(d):
            return set()
        return {f[:-5] for f in os.listdir(d) if f.endswith(".json")}

    def record(
        self,
        op_id: str,
        chunk_key: str,
        partition_ids: list[str],
        files_in: int,
        files_out: int,
        rows: int,
        nbytes: int,
        wall_ms: int,
        snapshot_id: int,
    ) -> None:
        d = self._op_dir(op_id)
        os.makedirs(d, exist_ok=True)
        rec = {
            "op_id": op_id,
            "chunk_key": chunk_key,
            "partition_ids": partition_ids,
            "files_in": files_in,
            "files_out": files_out,
            "rows": rows,
            "bytes": nbytes,
            "wall_ms": wall_ms,
            "snapshot_id": snapshot_id,
            "ts_ms": int(time.time() * 1000),
        }
        tmp = os.path.join(d, f".{chunk_key}.{uuid.uuid4().hex[:6]}.tmp")
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(d, f"{chunk_key}.json"))

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        pattern = os.path.join(self.root, "*", "*.json")
        import glob

        if not glob.glob(pattern):
            return spark.createDataFrame([], LINEAGE_SCHEMA)
        return spark.read.schema(LINEAGE_SCHEMA).json(pattern)
