"""Copy-on-write vs merge-on-read MERGE at bench scale. Usage:
    python tools/bench_mor_merge.py [rows] [upd_frac] [ins_frac]
Builds the deterministic image table twice on tmpfs, applies the SAME
small upsert source with mode='cow' and mode='mor', and times the
merge plus a post-merge full scan (MOR's read-side tax) and the
delete fold. The claim under test: on a blob table a small upsert's
CoW cost is O(touched files) while MOR's is O(source), so the gap
widens as the table grows and the source shrinks — the shape of the
north rule's image_id-keyed MERGE at 10^12 images."""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.operators import delete, merge  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
UPD = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
INS = float(sys.argv[3]) if len(sys.argv) > 3 else 0.002
BASE = "/dev/shm/mor-merge-bench"


def build(spark, loc):
    shutil.rmtree(loc, ignore_errors=True)
    df = synth.images_df(spark, ROWS, dims=(16, 32, 64, 128), partitions=32)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    # many smallish files = the post-compaction steady state whose
    # rewrite amplification CoW pays
    t.append(df, n_files=64)
    return t


def source(spark):
    n_upd = max(1, int(ROWS * UPD))
    n_ins = max(1, int(ROWS * INS))
    upd = synth.images_df(spark, n_upd, seed=50, dims=(16, 32, 64, 128))
    ins = synth.images_df(spark, n_ins, seed=51, dims=(16, 32, 64, 128),
                          id_offset=10 * ROWS)
    return upd.unionByName(ins).withColumn("caption", F.lit("v2")), n_upd, n_ins


def main() -> None:
    spark = get_spark("mor-merge-bench", cores=8,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-mmb-tmp"})
    src, n_upd, n_ins = source(spark)
    src = src.persist()
    src.count()
    out: dict = {"rows": ROWS, "upd_rows": n_upd, "ins_rows": n_ins}
    for mode in ("cow", "mor"):
        t = build(spark, f"{BASE}-{mode}")
        stats = t.size_stats(spark)
        out.setdefault("table_mb", round(stats["bytes"] / 1e6, 1))
        t0 = time.time()
        res = merge.merge_into(t, spark, src, key="image_id", mode=mode)
        out[f"{mode}_merge_s"] = round(time.time() - t0, 2)
        out[f"{mode}_files_rewritten"] = res["files_rewritten"]
        out[f"{mode}_files_written"] = res["files_written"]
        t0 = time.time()
        n = t.scan(spark).filter("caption = 'v2'").count()
        out[f"{mode}_scan_s"] = round(time.time() - t0, 2)
        assert n == n_upd + n_ins, (mode, n)
        if mode == "mor":
            t0 = time.time()
            delete.rewrite_position_deletes(t, spark)
            out["mor_fold_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            assert t.scan(spark).filter("caption = 'v2'").count() == n
            out["mor_scan_after_fold_s"] = round(time.time() - t0, 2)
    out["speedup_merge"] = round(out["cow_merge_s"] / out["mor_merge_s"], 2)
    print(json.dumps(out))
    for mode in ("cow", "mor"):
        shutil.rmtree(f"{BASE}-{mode}", ignore_errors=True)
    shutil.rmtree("/dev/shm/spark-mmb-tmp", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
