"""Z-order vs Hilbert pruning evidence (VERDICT r1 item 7).

Builds the deterministic image table twice, clusters one copy with each
curve over (phash, w, h), then measures manifest-stats pruning for the
same set of range predicates: pruned_fraction per curve per predicate.
Appends a markdown table to BENCH/BASELINE.md (run AFTER
tools/run_scaling.py, which rewrites that file).

Usage: python tools/run_pruning.py [rows]
"""

from __future__ import annotations

import json
import shutil
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.operators import clustering  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
BASE = "/dev/shm/pruning_eval"

# range predicates over the clustered columns: narrow/medium phash
# bands, and combined phash+w windows (the multi-dim case Hilbert's
# better locality should win)
PREDICATES = [
    ("phash [1/16 band]", {"phash": (-(2**63), -(2**63) + 2**59)}),
    ("phash [1/64 band]", {"phash": (2**60, 2**60 + 2**57)}),
    ("phash 1/16 + w<=32", {"phash": (-(2**63), -(2**63) + 2**59), "w": (None, 32)}),
    ("w=16 (alone)", {"w": (16, 16)}),
    ("h>=64 (alone)", {"h": (64, None)}),
]


def prune_fraction(table: LakehouseTable, spark, int_ranges: dict) -> tuple[int, int]:
    total = table.files(spark).count()
    kept = table.plan_files(spark, int_ranges=int_ranges).count()
    return total, kept


def measure(spark, curve: str, file_divisor: int):
    """Cluster a fresh copy with ``curve``; target sized so the table
    ends up with ~``file_divisor`` files. Returns (results, scanned,
    correctness) for all PREDICATES."""
    loc = f"{BASE}_{curve}_{file_divisor}"
    shutil.rmtree(loc, ignore_errors=True)
    df = synth.images_df(spark, ROWS, dims=(16, 32, 64, 128), partitions=32)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    t.append(df, n_files=64)
    total_bytes = sum(
        r["file_size_bytes"]
        for r in t.files(spark).select("file_size_bytes").collect()
    )
    clustering.cluster(t, spark, curve=curve,
                       target_file_size=max(total_bytes // file_divisor, 64 * 1024),
                       n_chunks=1)
    results, scanned = {}, {}
    for name, rng in PREDICATES:
        total, kept = prune_fraction(t, spark, rng)
        results[name] = round(1.0 - kept / total, 3)
        scanned[name] = f"{kept}/{total}"
    lo, hi = -(2**63), -(2**63) + 2**59
    full = t.scan(spark).filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    pruned = (
        t.scan(spark, int_ranges={"phash": (lo, hi)})
        .filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    )
    shutil.rmtree(loc, ignore_errors=True)
    return results, scanned, (full, pruned, full == pruned)


def main() -> None:
    spark = get_spark("pruning-eval", cores=16,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-pruning-tmp"})
    # two file densities: ~48 files (the r2-comparable coarse layout,
    # ~3 files/partition) and ~512 files (~16/partition — the regime a
    # 100 TB partition actually lives in, where the curve prefix is
    # deep enough to reach every interleaved dim)
    results: dict[str, dict[str, float]] = {}
    scanned: dict[str, dict[str, str]] = {}
    correctness = {}
    for curve in ("zorder", "hilbert"):
        for div, tag in ((48, "coarse"), (512, "dense")):
            r, sc, corr = measure(spark, curve, div)
            for name in r:
                results.setdefault(name, {})[f"{curve}-{tag}"] = r[name]
                scanned.setdefault(name, {})[f"{curve}-{tag}"] = sc[name]
            correctness[f"{curve}-{tag}"] = corr

    cols = ["zorder-coarse", "zorder-dense", "hilbert-coarse", "hilbert-dense"]
    lines = [
        "",
        "## Clustering pruning evidence: Z-order vs Hilbert (range-normalized dims)",
        "",
        f"Same {ROWS}-row image table clustered with each curve over",
        "(phash, w, h) with RANGE-SCALED dims; pruned_fraction = share of",
        "data files a manifest-stats scan skips (higher is better).",
        "coarse = ~3 files/partition (r2-comparable layout); dense = ~16",
        "files/partition (the file density a 100 TB partition actually",
        "has — the curve prefix reaches every interleaved dim).",
        "",
        "| predicate | " + " | ".join(f"{c} pruned (files)" for c in cols) + " |",
        "|---|" + "---|" * len(cols),
    ]
    for name, _ in PREDICATES:
        r, s = results[name], scanned[name]
        lines.append(
            "| " + name + " | "
            + " | ".join(f"{r[c]:.3f} ({s[c]})" for c in cols) + " |"
        )
    lines += [
        "",
        f"Pruned-scan correctness (rows via pruned scan == full-scan filter): "
        f"{json.dumps({k: v[2] for k, v in correctness.items()})}",
        "",
    ]
    md = "\n".join(lines)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(md)
    print(md)
    spark.stop()
    shutil.rmtree("/dev/shm/spark-pruning-tmp", ignore_errors=True)


if __name__ == "__main__":
    main()
