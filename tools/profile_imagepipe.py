"""Per-stage wall-clock profile of the bench's imagepipe phase.

Builds the same maintained table bench.py uses (synth + append, no
maintenance — file layout does not change the pipeline's plan shape),
then runs run_image_pipeline with the _stage/_sig boundary timed, so
each stage's build+write cost is separated. Usage:

    python tools/profile_imagepipe.py [rows] [cores]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.plans import datapipe, imagepipe  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402
from mobility_lakehouse_project_spark.tableformat.catalog import Catalog  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32

def main() -> None:
    work = tempfile.mkdtemp(prefix="prof_pipe_", dir="/dev/shm")
    spark = get_spark("prof-imagepipe", cores=CORES,
                      extra_conf={"spark.local.dir": os.path.join(work, "sl")})
    t0 = time.time()
    d1 = synth.images_df(spark, ROWS, dims=(16, 32, 64, 128), partitions=CORES * 2)
    table = LakehouseTable.create(
        os.path.join(work, "t"), d1.schema, partition_col="bucket",
        properties={"write.parquet.compression-codec": "uncompressed",
                    "write.parquet.dictionary-enabled": "false"})
    table.append(d1, n_files=max(64, CORES * 8))
    print(f"[build] {time.time()-t0:.2f}s")

    timings: dict[str, float] = {}
    orig_stage = datapipe._stage

    def timed_stage(spark_, catalog, name, src_sig, build, **kw):
        t = time.time()
        r = orig_stage(spark_, catalog, name, src_sig, build, **kw)
        timings[name] = time.time() - t
        print(f"[stage] {name}: {timings[name]:.2f}s rows={r[1].get('rows')}")
        return r

    datapipe._stage = timed_stage
    imagepipe._stage = timed_stage

    eval_set = synth.images_df(
        spark, max(64, ROWS // 100), dims=(16, 32, 64, 128),
        partitions=max(4, CORES // 4), id_offset=3 * ROWS).select("phash")
    pipe_base = os.environ.get("SPARK_GRAFT_PIPE_DIR")
    if pipe_base:
        pipe_base = tempfile.mkdtemp(prefix="prof_pipe_wh_", dir=pipe_base)
    cat = Catalog(pipe_base or os.path.join(work, "pipe_wh"))
    t0 = time.time()
    # time the bronze CTAS separately (not under _stage)
    tb = time.time()
    images = table.scan(spark)
    if not cat.table_exists("imagepipe.bronze"):
        pass
    res = imagepipe.run_image_pipeline(spark, cat, images=images, benchmark=eval_set)
    total = time.time() - t0
    print(f"[total imagepipe] {total:.2f}s  (stages sum "
          f"{sum(timings.values()):.2f}s; bronze-CTAS+index = remainder)")
    print({k: v.get("rows") for k, v in res.items() if isinstance(v, dict)})
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    if pipe_base:
        shutil.rmtree(pipe_base, ignore_errors=True)

if __name__ == "__main__":
    main()
