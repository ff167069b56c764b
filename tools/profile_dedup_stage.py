"""Sub-step timing of the imagepipe dedup stage (guide §1.4: noop-sink
isolation). Builds a clean-equivalent table, then times each piece of
build_dedup separately. Usage: python tools/profile_dedup_stage.py [rows]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.operators.dedup import (  # noqa: E402
    connected_components, hamming_pairs,
)
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"[{label:28s}] {time.time()-t0:7.2f}s", flush=True)
    return r


def main() -> None:
    work = tempfile.mkdtemp(prefix="prof_dedup_", dir="/dev/shm")
    spark = get_spark("prof-dedup", cores=CORES,
                      extra_conf={"spark.local.dir": os.path.join(work, "sl")})
    d0 = synth.images_df(spark, ROWS, dims=(16, 32, 64, 128), partitions=CORES * 2)
    table = LakehouseTable.create(
        os.path.join(work, "t"), d0.schema, partition_col="bucket",
        properties={"write.parquet.compression-codec": "uncompressed",
                    "write.parquet.dictionary-enabled": "false"})
    table.append(d0, n_files=256)
    d = table.scan(spark)

    ids = d.select(
        "image_id", "phash", F.md5("bytes").alias("fp"),
        F.md5("caption").alias("cap_fp")).persist()
    t("ids: md5 pass + persist", lambda: ids.count())
    keep = ids.groupBy("fp").agg(F.min("image_id").alias("__keep"))
    exact_losers = (
        ids.join(keep, "fp")
        .filter(F.col("image_id") != F.col("__keep"))
        .select("image_id"))
    exact_losers = exact_losers.persist()
    t("exact losers", lambda: exact_losers.count())
    surv = ids.join(F.broadcast(exact_losers), "image_id", "left_anti")
    sigs = surv.select("phash").distinct().persist()
    t("distinct sigs", lambda: sigs.count())
    pairs = hamming_pairs(
        sigs.select(F.col("phash").alias("id"), F.col("phash").alias("sig")),
        max_hamming=3)
    pairs = pairs.persist()
    t("hamming band pairs", lambda: pairs.count())
    labels = t("connected components",
               lambda: connected_components(pairs, src="ida", dst="idb"))
    t("labels materialize", lambda: labels.count())
    canon = sigs.join(labels, sigs["phash"] == labels["id"], "left").select(
        "phash", F.coalesce("component", "phash").alias("__comp"))
    members = surv.select("image_id", "phash").join(canon, "phash")
    winners = members.groupBy("__comp").agg(F.min("image_id").alias("image_id"))
    drop = exact_losers.unionByName(
        members.join(winners.select("image_id"), "image_id", "left_anti")
        .select("image_id")).persist()
    t("drop set (winners+losers)", lambda: drop.count())
    out = d.join(F.broadcast(drop), "image_id", "left_anti")
    t("survivor write (noop)",
      lambda: out.write.format("noop").mode("overwrite").save())
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
