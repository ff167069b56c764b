"""Microbench the blob scan + shuffle path (guide §1.4/§2.3):
(a) parquet read throughput of uncompressed blob files (noop sink),
(b) the same with a full round-robin shuffle in between, under
    lz4 / zstd / no shuffle compression.
Usage: python tools/profile_scan_shuffle.py [rows] [cores]
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
    work = tempfile.mkdtemp(prefix="prof_ss_", dir="/dev/shm")
    out = os.path.join(work, "blobs")

    def run_leg(label, shuffle_conf, with_shuffle):
        # fresh session per leg: shuffle codec configs are static
        spark = get_spark("prof-scan-shuffle", cores=CORES, extra_conf={
            "spark.local.dir": os.path.join(work, "sl_" + label.replace(" ", "")),
            **shuffle_conf})
        if not os.path.isdir(out):
            (synth.images_df(spark, ROWS, dims=(16, 32, 64, 128),
                             partitions=CORES * 2)
             .write.option("compression", "uncompressed")
             .option("parquet.enable.dictionary", "false").parquet(out))
        df = spark.read.parquet(out)
        df.write.format("noop").mode("overwrite").save()  # warm page cache
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_scan = time.time() - t0
        t0 = time.time()
        if with_shuffle:
            df.repartition(CORES * 4).write.format("noop").mode("overwrite").save()
        t_shuf = time.time() - t0
        nb = sum(os.path.getsize(os.path.join(r, f))
                 for r, _, fs in os.walk(out) for f in fs)
        print(f"[{label:26s}] scan {t_scan:5.2f}s ({nb/1e6/t_scan:6.0f} MB/s)"
              + (f"  scan+shuffle {t_shuf:5.2f}s ({nb/1e6/t_shuf:6.0f} MB/s)"
                 if with_shuffle else ""), flush=True)
        spark.stop()

    run_leg("scan only", {}, False)
    run_leg("shuffle lz4 (default)", {}, True)
    run_leg("shuffle zstd", {"spark.io.compression.codec": "zstd"}, True)
    run_leg("shuffle uncompressed",
            {"spark.shuffle.compress": "false",
             "spark.shuffle.spill.compress": "false"}, True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
