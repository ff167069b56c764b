"""Per-stage profile of a pinned rewrite leg via the Spark event log.

Runs ONE taskset-pinned leg of the scaling job (same build + measure
path as tools/run_scaling.py) with spark.eventLog enabled, then prints
per-stage wall / sum-of-task-time / max-task and the driver-side gaps
between jobs — the decomposition that separates the three scaling
terms: parallel task work (scales with N), stragglers (last-wave tail),
and constant driver time (Amdahl's serial share, what the 4N level
pays in full).

Round-4 findings captured with this tool (150k rows, clean host):
  * map stage (blob scan + zlib recompress + token assign): 51 tasks,
    94% parallel efficiency at local[8], max task 5.3 s vs 2.8 s mean
    (file-size skew straggler);
  * reduce stage (sort + parquet write): 131 tasks, 75% at local[8];
  * ~4.8 s of inter-job driver gaps (py4j plan construction, Catalyst
    analysis of the 63-term z-order expression, quantile collect) —
    the constant term that dominates the efficiency gap at small rows;
  * footer-stats pass: ~120 ms (NOT a bottleneck — the r3 docstring's
    8% figure predates the thread-pooled reader).

Usage: python tools/stage_profile.py [cores] [rows]
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

EVDIR = "/dev/shm/spark-events"


def run_leg(cores: int, rows: int) -> dict:
    import importlib.util

    sys.argv = ["run_scaling.py", str(rows)]
    spec = importlib.util.spec_from_file_location("rs", "tools/run_scaling.py")
    rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rs)
    # reuse run_level but with event logging injected via env-var conf
    os.makedirs(EVDIR, exist_ok=True)
    os.environ["SPARK_GRAFT_EXTRA_JSON"] = json.dumps({
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
    })
    try:
        return rs.run_level(cores)
    finally:
        os.environ.pop("SPARK_GRAFT_EXTRA_JSON", None)


def parse_latest() -> None:
    d = sorted(glob.glob(f"{EVDIR}/*"), key=os.path.getmtime)[-1]
    src = sorted(glob.glob(d + "/events_*")) if os.path.isdir(d) else [d]
    raw = subprocess.run(
        ["zstd", "-d", "-c", *src], capture_output=True
    ).stdout.decode() if src[0].endswith(".zstd") else open(src[0]).read()
    stages: dict[int, dict] = {}
    tasks: dict[int, list[float]] = {}
    jobs = []
    for line in raw.splitlines():
        try:
            e = json.loads(line)
        except ValueError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = dict(
                name=si["Stage Name"].split("\n")[0][:60],
                tasks=si["Number of Tasks"],
                sub=si.get("Submission Time", 0), comp=si.get("Completion Time", 0))
        elif ev == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            tasks.setdefault(e["Stage ID"], []).append(
                m.get("Executor Run Time", 0) / 1000.0)
        elif ev == "SparkListenerJobStart":
            jobs.append(("start", e["Job ID"], e["Submission Time"]))
        elif ev == "SparkListenerJobEnd":
            jobs.append(("end", e["Job ID"], e["Completion Time"]))
    for sid in sorted(stages):
        s = stages[sid]
        tt = tasks.get(sid, [])
        print(f"stage {sid:3d} tasks={s['tasks']:4d} "
              f"wall={(s['comp'] - s['sub']) / 1000.0:7.2f}s "
              f"sumTask={sum(tt):7.1f}s maxTask={max(tt or [0]):5.1f}s  {s['name']}")
    prev_end = None
    gap_total = 0.0
    for kind, jid, ts in sorted(jobs, key=lambda x: x[2]):
        if kind == "start" and prev_end is not None and ts - prev_end > 100:
            g = (ts - prev_end) / 1000.0
            gap_total += g
            print(f"  GAP {g:.2f}s before job {jid}")
        if kind == "end":
            prev_end = ts
    print(f"total inter-job driver gap: {gap_total:.2f}s")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    for f in glob.glob(f"{EVDIR}/*"):
        subprocess.run(["rm", "-rf", f])
    r = run_leg(cores, rows)
    print("LEG", json.dumps(r))
    parse_latest()


if __name__ == "__main__":
    main()
