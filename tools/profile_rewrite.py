"""One instrumented rewrite run at a given core count — phase timing
for the scaling investigation. Usage:
    python tools/profile_rewrite.py <cores> [rows]
Builds the deterministic table on tmpfs, runs the storage-optimizing
rewrite (zorder + recompress), prints phase breakdown JSON."""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from mobility_lakehouse_project_spark import synth  # noqa: E402


@F.pandas_udf(T.LongType())
def _warm(s: pd.Series) -> pd.Series:
    return s
from mobility_lakehouse_project_spark.operators import clustering  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

CORES = int(sys.argv[1])
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
RUN = f"/dev/shm/profile_rewrite_{CORES}"


def main() -> None:
    shutil.rmtree(RUN, ignore_errors=True)
    build = get_spark("profile-build", cores=16,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-profile-tmp"})
    half = ROWS // 2
    d1 = synth.images_df(build, half, dims=(16, 32, 64, 128), partitions=64)
    d2 = synth.images_df(build, ROWS - half, dims=(16, 32, 64, 128),
                         partitions=64, id_offset=half)
    t = LakehouseTable.create(RUN, d1.schema, partition_col="bucket")
    t.append(d1, n_files=128)
    t.append(d2, n_files=128)
    build.stop()

    spark = get_spark(f"profile-{CORES}", cores=CORES,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-profile-tmp"})
    spark.range(0, CORES * 4, numPartitions=CORES * 2).select(_warm("id")).count()
    t = LakehouseTable(RUN)
    data_bytes = t.size_stats(spark)["bytes"]
    target = max(16 * 1024 * 1024, data_bytes // 64)
    t0 = time.time()
    zm = clustering.cluster(t, spark, curve="zorder", target_file_size=target,
                            n_chunks=1, recompress_level=9)
    total = time.time() - t0
    print("PROFILE " + json.dumps({
        "cores": CORES, "total": round(total, 2),
        "mb": round(data_bytes / 1e6, 1),
        "mb_s": round(data_bytes / 1e6 / total, 2),
        "phases_ms": zm["phases_ms"],
        "files_in": zm["files_in"], "files_out": zm["files_out"],
    }))
    spark.stop()
    shutil.rmtree(RUN, ignore_errors=True)


if __name__ == "__main__":
    main()
