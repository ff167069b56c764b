"""Microbench the parquet write path for blob rows (guide §1):
where does write time go — partitioned writer, page checksums, page
size, or row conversion? Writes the same ~1.3 GB synth frame under
different writer configs. Usage: python tools/profile_parquet_write.py
[rows] [cores]
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

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    work = tempfile.mkdtemp(prefix="prof_pw_", dir="/dev/shm")
    spark = get_spark("prof-parquet-write", cores=CORES,
                      extra_conf={"spark.local.dir": os.path.join(work, "sl")})
    df = synth.images_df(spark, ROWS, dims=(16, 32, 64, 128),
                         partitions=CORES * 2)
    # materialize the synth once so write timings exclude synthesis:
    # localCheckpoint pins the computed rows in block storage
    df = df.localCheckpoint()
    spark.sparkContext.setJobDescription("write microbench")

    def w(label, writer_builder, **sql_conf):
        prev = {}
        for k, v in sql_conf.items():
            prev[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        out = os.path.join(work, label.replace(" ", "_"))
        t0 = time.time()
        writer_builder(out)
        dt = time.time() - t0
        nb = sum(os.path.getsize(os.path.join(r, f))
                 for r, _, fs in os.walk(out) for f in fs)
        print(f"[{label:34s}] {dt:6.2f}s  {nb/1e6/dt:7.0f} MB/s", flush=True)
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        shutil.rmtree(out, ignore_errors=True)

    base = lambda out: (df.write.mode("overwrite")
                        .option("compression", "uncompressed")
                        .option("parquet.enable.dictionary", "false")
                        .parquet(out))
    part = lambda out: (df.write.mode("overwrite")
                        .option("compression", "uncompressed")
                        .option("parquet.enable.dictionary", "false")
                        .partitionBy("bucket").parquet(out))
    zstd = lambda out: (df.write.mode("overwrite")
                        .option("compression", "zstd")
                        .option("parquet.enable.dictionary", "false")
                        .parquet(out))
    w("flat uncompressed", base)
    w("flat uncompressed (repeat)", base)
    w("flat zstd", zstd)
    w("flat unc, no page checksum", base,
      **{"spark.hadoop.parquet.page.write-checksum.enabled": "false"})
    w("flat unc, 8M pages", base,
      **{"spark.hadoop.parquet.page.size": str(8 << 20),
         "spark.hadoop.parquet.block.size": str(256 << 20)})
    w("flat unc, no checksum + 8M pages", base,
      **{"spark.hadoop.parquet.page.write-checksum.enabled": "false",
         "spark.hadoop.parquet.page.size": str(8 << 20),
         "spark.hadoop.parquet.block.size": str(256 << 20)})
    w("partitionBy(bucket) unc", part)
    w("partitionBy unc, no cksum+8M", part,
      **{"spark.hadoop.parquet.page.write-checksum.enabled": "false",
         "spark.hadoop.parquet.page.size": str(8 << 20),
         "spark.hadoop.parquet.block.size": str(256 << 20)})
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
