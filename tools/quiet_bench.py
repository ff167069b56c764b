"""Run bench.py once inside a measured host lull and record the JSON
to BENCH/bench_quiet_r4.json — single-run throughput evidence with the
same idle-window gate as tools/gated_pairs.py (co-tenant busy cores
measured directly over an idle window; 1-min loadavg is contaminated
by our own just-finished work). Usage: python tools/quiet_bench.py
[out_path] [max_wait_s]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HZ = os.sysconf("SC_CLK_TCK")
NCPU = os.cpu_count() or 32


def busy_cores(sec: float = 8.0) -> float:
    def snap():
        out = {}
        for line in open("/proc/stat"):
            p = line.split()
            if p and p[0].startswith("cpu") and p[0][3:].isdigit():
                v = [int(x) for x in p[1:]]
                out[int(p[0][3:])] = v[0] + v[1] + v[2] + v[5] + v[6]
        return out

    c0, t0 = snap(), time.time()
    time.sleep(sec)
    c1 = snap()
    wall = max(time.time() - t0, 1e-6)
    return sum(c1[i] - c0[i] for i in c1) / HZ / wall


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/bench_quiet_r4.json"
    max_wait = float(sys.argv[2]) if len(sys.argv) > 2 else 7200.0
    t0 = time.time()
    while time.time() - t0 < max_wait:
        ext = busy_cores()
        if ext < 0.7:
            print(f"lull (ext={ext:.2f}); running bench", flush=True)
            break
        print(f"waiting: busy cores {ext:.2f}", flush=True)
        time.sleep(20)
    else:
        print("no lull found; running anyway (marked contended)", flush=True)
    pre_ext = busy_cores(4.0)
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, timeout=1800)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.strip().startswith("{")), None)
    if not line:
        print("bench produced no JSON", r.stdout[-500:], r.stderr[-500:])
        sys.exit(1)
    rec = json.loads(line)
    rec["pre_gate_busy_cores"] = round(pre_ext, 3)
    rec["post_busy_cores"] = round(busy_cores(4.0), 3)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("value", "phases_sec", "maintenance_throughput_mb_s",
                       "noise_spread", "host_probe_sec",
                       "pre_gate_busy_cores")}), flush=True)


if __name__ == "__main__":
    main()
