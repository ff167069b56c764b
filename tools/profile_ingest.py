"""Isolate the bench ingest phase (guide §1.4): time (a) the synth
mapInPandas alone via the noop sink, (b) synth -> append with the
standard hash-distribution shuffle (what bench.py pays), and (c)
synth -> write with NO repartition (natural partitioning), so the
shuffle's share of ingest is directly visible. Usage:

    python tools/profile_ingest.py [rows] [cores]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIMS = (16, 32, 64, 128)


def main() -> None:
    work = tempfile.mkdtemp(prefix="prof_ingest_", dir="/dev/shm")
    spark = get_spark("prof-ingest", cores=CORES,
                      extra_conf={"spark.local.dir": os.path.join(work, "sl")})
    n_files = max(64, CORES * 8)
    props = {"write.parquet.compression-codec": "uncompressed",
             "write.parquet.dictionary-enabled": "false"}

    # warm-up (codegen/JIT + python workers)
    synth.images_df(spark, 2_000, dims=DIMS, partitions=CORES).write.format(
        "noop").mode("overwrite").save()

    # (a) synth alone — noop sink computes every column, discards
    spark.sparkContext.setJobDescription("ingest-profile: synth only (noop)")
    t0 = time.time()
    synth.images_df(spark, ROWS, dims=DIMS, partitions=CORES * 2).write.format(
        "noop").mode("overwrite").save()
    t_synth = time.time() - t0
    print(f"[synth-noop]          {t_synth:7.2f}s")

    # (b) the bench path: create + 2 half appends (hash shuffle + write)
    spark.sparkContext.setJobDescription("ingest-profile: bench append path")
    tdir = os.path.join(work, "t_bench")
    t0 = time.time()
    half = ROWS // 2
    d1 = synth.images_df(spark, half, dims=DIMS, partitions=CORES * 2)
    d2 = synth.images_df(spark, ROWS - half, dims=DIMS, partitions=CORES * 2,
                         id_offset=half)
    table = LakehouseTable.create(tdir, d1.schema, partition_col="bucket",
                                  properties=props)
    table.append(d1, n_files=n_files // 2)
    ph1 = dict(table.last_write_phases)
    table.append(d2, n_files=n_files // 2)
    ph2 = dict(table.last_write_phases)
    t_append = time.time() - t0
    print(f"[bench append x2]     {t_append:7.2f}s  write_phases1={ph1} "
          f"write_phases2={ph2}")

    # (c) append with NO repartition (n_files=None): write on natural
    # partitioning — isolates what the hash-distribution shuffle costs
    spark.sparkContext.setJobDescription("ingest-profile: natural append")
    tdir2 = os.path.join(work, "t_nat")
    t0 = time.time()
    d = synth.images_df(spark, ROWS, dims=DIMS, partitions=CORES * 2)
    table2 = LakehouseTable.create(tdir2, d.schema, partition_col="bucket",
                                   properties=props)
    table2.append(d, n_files=None)
    t_nat = time.time() - t0
    st = table2.size_stats(spark)
    print(f"[natural append]      {t_nat:7.2f}s  files={st['files']} "
          f"mb={st['bytes']/1e6:.0f}")
    print(f"shuffle+slotting share of bench path ~= "
          f"{t_append - t_nat:7.2f}s (vs natural, same bytes)")
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
