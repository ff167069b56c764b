"""Calibrate `maintenance.min-delete-ratio` — the MOR fold trigger.

Question under test (VERDICT r4 nit #2): at what per-file pending-
delete ratio is folding position deletes into the data
(`rewrite_position_deletes`, a full blob rewrite of every touched
file) worth it, versus leaving ONE consolidated deletion vector per
file and paying the merge-on-read anti-join tax on every scan?

Method, noise-hardened for this host (identical runs measure 2x apart
minutes apart — BENCH/BASELINE.md): per ratio k, build TWO identical
deterministic image tables (FIXTURES.md F1, same seed), DV-delete the
same uniform hash slice (~k of every file's rows) from both and
consolidate to one vector per file; fold ONE of them
(`rewrite_position_deletes`, timed); then measure the scan tax by
INTERLEAVING scans of the pending table and the folded table
(A/B, B/A alternating) so host drift hits both states equally, and
take medians:

  * light scan — two narrow columns (the analytic shape)
  * blob scan  — sum(length(bytes)) (the imagepipe/training-export
                 shape, dominated by payload IO)

tax = median(pending) - median(folded) per scan; break_even_scans =
fold_s / tax is the number of full-table reads between maintenance
windows above which folding wins for files at that ratio. The curve
goes into BENCH/BASELINE.md and the chosen default into
plans/maintenance.py (maintenance.min-delete-ratio).

Usage: python tools/calibrate_fold.py [rows] [reps]
Output: one JSON line per ratio + a summary line.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.operators import delete  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
RATIOS = [0.002, 0.01, 0.02, 0.05, 0.10, 0.25]
BASE = "/dev/shm/fold-calib"


def _host_probe(n: int = 15) -> float:
    """Same calibrated single-core kernel as bench.py/_host_probe
    (healthy host ~0.027-0.028 s) — annotates each ratio's record so a
    reader can tell a degraded-host measurement from a healthy one."""
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


def _build(spark, loc: str, ratio: float) -> LakehouseTable:
    shutil.rmtree(loc, ignore_errors=True)
    df = synth.images_df(spark, ROWS, dims=(16, 32, 64, 128), partitions=32)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    t.append(df, n_files=64)
    # uniform hash slice -> every file loses ~ratio of its rows, the
    # steady-state shape of id-keyed GDPR erasure traffic
    delete.delete_where(
        t, spark, f"pmod(abs(xxhash64(image_id)), 10000) < "
                  f"{int(ratio * 10000)}", mode="dv")
    delete.compact_deletion_vectors(t, spark)
    return t


def _scan_light(spark, t) -> None:
    t.scan(spark).agg(F.sum("w"), F.sum(F.length("caption"))).collect()


def _scan_blob(spark, t) -> None:
    t.scan(spark).agg(F.sum(F.length("bytes"))).collect()


def main() -> None:
    spark = get_spark(
        "fold-calib", cores=8,
        extra_conf={"spark.local.dir": f"{BASE}-tmp",
                    "spark.ui.showConsoleProgress": "false"})
    results = []
    for ratio in RATIOS:
        pend = _build(spark, f"{BASE}-pend", ratio)
        fold = _build(spark, f"{BASE}-fold", ratio)
        st = pend.size_stats(spark)
        n_del = pend.position_deletes_df(spark)[1]

        probe0 = _host_probe()
        t0 = time.time()
        fm = delete.rewrite_position_deletes(fold, spark,
                                             target_file_size=1 << 26)
        fold_s = round(time.time() - t0, 2)

        # warm both paths once (JIT/codegen), then interleave
        for t in (pend, fold):
            _scan_light(spark, t)
            _scan_blob(spark, t)
        times: dict[str, list[float]] = {k: [] for k in
                                         ("pl", "fl", "pb", "fb")}
        for rep in range(REPS):
            order = [("pl", _scan_light, pend), ("fl", _scan_light, fold),
                     ("pb", _scan_blob, pend), ("fb", _scan_blob, fold)]
            if rep % 2:  # alternate A/B order so drift cancels
                order = [order[1], order[0], order[3], order[2]]
            for key, fn, t in order:
                t0 = time.time()
                fn(spark, t)
                times[key].append(time.time() - t0)
        med = {k: statistics.median(v) for k, v in times.items()}
        tax_light = round(med["pl"] - med["fl"], 3)
        tax_blob = round(med["pb"] - med["fb"], 3)
        rec = {
            "ratio": ratio, "rows": ROWS,
            "table_mb": round(st["bytes"] / 1e6, 1), "files": st["files"],
            "deleted_rows": n_del, "fold_s": fold_s,
            "files_rewritten": fm["files_rewritten"],
            "scan_pending_light_s": round(med["pl"], 3),
            "scan_folded_light_s": round(med["fl"], 3),
            "scan_pending_blob_s": round(med["pb"], 3),
            "scan_folded_blob_s": round(med["fb"], 3),
            "tax_light_s": tax_light, "tax_blob_s": tax_blob,
            "break_even_scans_light": (
                round(fold_s / tax_light, 1) if tax_light > 0 else None),
            "break_even_scans_blob": (
                round(fold_s / tax_blob, 1) if tax_blob > 0 else None),
            "host_probe_sec": [probe0, _host_probe()],
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        for loc in (f"{BASE}-pend", f"{BASE}-fold"):
            shutil.rmtree(loc, ignore_errors=True)
    print(json.dumps({"summary": results}), flush=True)
    shutil.rmtree(f"{BASE}-tmp", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
