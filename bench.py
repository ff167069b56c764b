"""Benchmark harness — the engine's headline workload.

Phases (all timed, one JSON line to stdout):
  1. ingest   — synthesize the deterministic image+caption table
                (FIXTURES.md F1, sized by sf) into many small files
  2. compact  — bin-pack compaction to target file size
  3. zorder   — Z-order clustering rewrite over (phash, w, h)
  4. merge    — MERGE INTO with 10% source (update+insert mix)
  5. expire   — snapshot expiration + orphan GC (keep_last=1)
  6. imagepipe — LLM-corpus prep chain over the maintained table:
                clean (structural+decode gates) → dedup (exact bytes +
                phash-hamming components) → decontaminate (eval-set
                phash proximity) → train/valid/test hash splits
  7. queries  — headline analytic queries on $SPARK_GRAFT_SF_DIR

The north-rule metric is compaction + Z-order throughput (MB/s,
files/s); the JSON also carries per-phase seconds so the driver can
track every component. Scaling-efficiency evidence (same job at
local[8] vs local[32]) is produced by tools/run_scaling.py into
BENCH/BASELINE.md.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all), SPARK_GRAFT_BENCH_ROWS (override).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.operators import (  # noqa: E402
    clustering,
    compaction,
    merge,
)
from mobility_lakehouse_project_spark.plans.relational import QUERIES  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

BENCH_DIMS = (16, 32, 64, 128)
ROWS_PER_SF = 1_500_000  # sf0.1 -> 150k rows (~1.3 GB decoded payload)
HEADLINE_QUERIES = [
    "a1_groupby_sums",
    "gold_od_matrix_top",
    "gold_gravity_model",
    "gold_hourly_patterns",
    "w_sessionize",
    "ann_cosine_topk",
    "txt_stats",
    "j_asof_last_click",
]


def _noise_probe(spark, cores: int) -> float:
    """Fixed-size CPU-bound calibration job (~1 s on idle 32 cores):
    xxhash64 over 40M longs, all in whole-stage codegen. Run three
    times across the bench (before compact / after zorder / after
    merge); a wide spread means a co-tenant noise window hit THIS run —
    the documented failure mode of this host (identical rewrites have
    measured 2x apart minutes apart), letting a reader distinguish a
    noise-band swing from a real regression in single-run numbers."""
    from pyspark.sql import functions as F

    t0 = time.time()
    # bit_xor, not sum: ANSI mode makes a 40M-term long sum overflow
    spark.range(0, 40_000_000, numPartitions=cores).select(
        F.bit_xor(F.xxhash64("id"))
    ).collect()
    return round(time.time() - t0, 3)


def _host_probe(n: int = 30) -> float:
    """Median of a calibrated single-core numpy kernel (the same kernel
    as tools/gated_pairs.py's HostProbe). Calibration on THIS VM's
    healthy host state: ~0.027-0.028 s; 0.033+ means the HOST (SMT
    siblings / frequency / memory bandwidth taken by another VM) is
    degraded — invisible to guest loadavg/steal, and observed to slow
    identical runs up to 2x. Lets a reader judge whether this
    snapshot's absolute numbers are from a healthy or degraded host."""
    import numpy as np

    a = np.arange(400_000, dtype=np.float64)
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(60):
            s += float((a * a).sum())
        xs.append(time.perf_counter() - t0)
    xs.sort()
    return round(xs[len(xs) // 2], 4)


def run(sf_dir: str, cores: int, work_dir: str, rows: int | None = None) -> dict:
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_rows = rows or int(ROWS_PER_SF * sf)
    n_ingest_files = max(64, cores * 8)

    local_dir = os.path.join(work_dir, "spark-local")
    spark = get_spark("bench", cores=cores,
                      extra_conf={"spark.local.dir": local_dir})
    timings: dict[str, float] = {}
    table_dir = os.path.join(work_dir, "images_table")
    shutil.rmtree(table_dir, ignore_errors=True)

    # 1. ingest (many small files — the fragmented state compaction fixes)
    t0 = time.time()
    half = n_rows // 2
    d1 = synth.images_df(spark, half, dims=BENCH_DIMS, partitions=cores * 2)
    d2 = synth.images_df(spark, n_rows - half, dims=BENCH_DIMS, partitions=cores * 2, id_offset=half)
    # image blobs are already compressed (jpeg/png bytes): parquet-level
    # zstd costs 2.2x slower writes+reads for +0.7% size on this payload
    # (measured, tableformat/table.py::create docstring)
    table = LakehouseTable.create(
        table_dir, d1.schema, partition_col="bucket",
        properties={"write.parquet.compression-codec": "uncompressed",
                    # blobs never dictionary-hit: ~5-7% faster writes
                    # for +0.23% size (measured, table.py::create)
                    "write.parquet.dictionary-enabled": "false"},
    )
    table.append(d1, n_files=n_ingest_files // 2)
    table.append(d2, n_files=n_ingest_files // 2)
    timings["ingest"] = time.time() - t0
    st = table.size_stats(spark)  # files() aggregation, not a driver collect
    data_bytes = st["bytes"]
    files_before = st["files"]

    _noise_probe(spark, cores)  # discarded: codegen/JIT warm-up
    probes = [_noise_probe(spark, cores)]

    # 2. bin-pack compaction
    target = max(16 * 1024 * 1024, data_bytes // (cores * 2))
    t0 = time.time()
    cm = compaction.compact(table, spark, target_file_size=target, n_chunks=2,
                            sort_col="phash", key_col="image_id")
    timings["compact"] = time.time() - t0

    # 3. Z-order clustering
    t0 = time.time()
    zm = clustering.cluster(table, spark, curve="zorder", target_file_size=target, n_chunks=2)
    timings["zorder"] = time.time() - t0
    probes.append(_noise_probe(spark, cores))

    # 4. MERGE INTO (10% of table size, 10% of that updates)
    t0 = time.time()
    src = synth.merge_source_df(spark, n_rows, n_rows // 10, dims=BENCH_DIMS)
    mm = merge.merge_into(table, spark, src, target_file_size=target)
    timings["merge"] = time.time() - t0
    probes.append(_noise_probe(spark, cores))

    # 5. snapshot expiration + orphan GC — the north rule's remaining
    # maintenance action, and what bounds the run's storage footprint:
    # at sf1 (1.5M rows, ~13 GB payload) the superseded
    # ingest/compact/zorder generations would otherwise hold 3x the
    # table's bytes on the work volume
    t0 = time.time()
    em = table.expire_snapshots(keep_last=1, spark=spark)
    table.remove_orphan_files(0.0, spark=spark)
    timings["expire"] = time.time() - t0

    # 6. corpus-prep pipeline (clean -> dedup -> decontaminate -> split)
    # over the maintained table — the LLM-training-data surface the
    # maintenance phases exist to serve. Eval set = a disjoint synth
    # slice (same generator, offset ids) so phash-proximity
    # decontamination has real hits. SPARK_GRAFT_PIPE_DIR relocates the
    # pipe warehouse (its 5 stage tables are the run's largest
    # footprint; at sf1 they outgrow tmpfs alongside the bench table
    # and belong on the disk volume).
    from mobility_lakehouse_project_spark.plans.imagepipe import (
        run_image_pipeline,
    )
    from mobility_lakehouse_project_spark.tableformat.catalog import Catalog

    t0 = time.time()
    pipe_dir = os.environ.get("SPARK_GRAFT_PIPE_DIR")
    if pipe_dir:
        pipe_dir = tempfile.mkdtemp(prefix="pipe_wh_", dir=pipe_dir)
    pipe_cat = Catalog(pipe_dir or os.path.join(work_dir, "pipe_wh"))
    eval_set = synth.images_df(
        spark, max(64, n_rows // 100), dims=BENCH_DIMS,
        partitions=max(4, cores // 4), id_offset=3 * n_rows,
    ).select("phash")
    try:
        pipe = run_image_pipeline(
            spark, pipe_cat, images=table.scan(spark), benchmark=eval_set,
        )
    finally:
        if pipe_dir:  # env-relocated: outside work_dir's cleanup
            shutil.rmtree(pipe_dir, ignore_errors=True)
    timings["imagepipe"] = time.time() - t0
    pipe_rows_in = pipe["bronze"]["rows"]
    pipe_rows_out = sum(pipe[s]["rows"] for s in ("train", "valid", "test"))
    probes.append(_noise_probe(spark, cores))

    # 7. headline analytic queries on the TPC-H-shaped testdata
    qt: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        qt[name] = round(time.time() - t0, 3)

    maint_secs = timings["compact"] + timings["zorder"]
    maint_bytes = cm["bytes"] + zm["bytes"]
    maint_files = cm["files_in"] + zm["files_in"]
    result = {
        "metric": "image-table maintenance (compact+zorder) + headline queries",
        "value": round(sum(timings.values()) + sum(qt.values()), 3),
        "unit": "sec",
        "sf": sf,
        "cores": cores,
        "rows": n_rows,
        "table_mb": round(data_bytes / 1e6, 1),
        "files_before": files_before,
        "files_after_compact": cm["files_out"],
        "expire_deleted_files": em.get("deleted_files"),
        "phases_sec": {k: round(v, 3) for k, v in timings.items()},
        "maintenance_throughput_mb_s": round(maint_bytes / 1e6 / max(maint_secs, 1e-9), 2),
        "maintenance_files_s": round(maint_files / max(maint_secs, 1e-9), 2),
        "merge_rows_s": round(mm["rows_out"] / max(timings["merge"], 1e-9), 1),
        "imagepipe_rows_in": pipe_rows_in,
        "imagepipe_rows_out": pipe_rows_out,
        "imagepipe_rows_s": round(
            pipe_rows_in / max(timings["imagepipe"], 1e-9), 1),
        # host-noise evidence: identical fixed-size probes through the
        # run; spread >> 1 flags a co-tenant window inside THIS run
        "noise_probe_sec": probes,
        "noise_spread": round(max(probes) / max(min(probes), 1e-9), 2),
        # single-core HOST-state calibration (healthy ~0.027-0.028 s):
        # guest counters cannot see host-level contention; this can
        "host_probe_sec": _host_probe(),
        "queries": qt,
    }
    spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "0")) or None
    # tmpfs-backed work dir when available: one shared virtio disk is
    # the single non-scaling resource on this box; a cluster's
    # executor-local NVMe is better modeled by memory-backed storage
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench_", dir=base)
    try:
        result = run(sf_dir, cores, work, rows)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
