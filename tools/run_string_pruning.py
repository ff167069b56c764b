"""String-dim clustering pruning evidence: cluster by the image_id
STRING column (order-preserving 7-byte prefix image after common-
prefix stripping, functions/sfc.py) and measure manifest str-stats
pruning for id-range scans before/after. Appends a markdown section to
BENCH/BASELINE.md between STRPRUNE markers (idempotent).

Usage: python tools/run_string_pruning.py [rows]
"""

from __future__ import annotations

import shutil
import sys

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark import synth  # noqa: E402
from mobility_lakehouse_project_spark.operators import clustering  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402
from mobility_lakehouse_project_spark.tableformat import LakehouseTable  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
BASE = "/dev/shm/str_pruning_eval"
MD = "BENCH/BASELINE.md"
BEGIN, END = "<!-- STRPRUNE-BEGIN -->", "<!-- STRPRUNE-END -->"


def frac(spark, t, rng):
    tot = t.files(spark).count()
    kept = t.plan_files(spark, int_ranges={"image_id": rng}).count()
    return kept / max(tot, 1), tot


def main() -> None:
    spark = get_spark("str-pruning", cores=16)
    shutil.rmtree(BASE, ignore_errors=True)
    df = synth.images_df(spark, ROWS, partitions=32)
    t = LakehouseTable.create(f"{BASE}/t", df.schema, partition_col="bucket")
    t.append(df, n_files=128)
    pct1 = (f"img{0:012d}", f"img{ROWS // 100:012d}")
    pct10 = (f"img{ROWS // 2:012d}", f"img{ROWS // 2 + ROWS // 10:012d}")
    rows = []
    pre1, nf0 = frac(spark, t, pct1)
    pre10, _ = frac(spark, t, pct10)
    m = clustering.cluster(t, spark, curve="zorder", cols=("image_id",),
                           target_file_size=max(
                               64 * 1024,
                               t.size_stats(spark)["bytes"] // 128),
                           n_chunks=1)
    post1, nf1 = frac(spark, t, pct1)
    post10, _ = frac(spark, t, pct10)
    rows.append(("zorder(image_id)", nf0, nf1, pre1, post1, pre10, post10))
    m2 = clustering.cluster(t, spark, curve="zorder",
                            cols=("phash", "image_id"),
                            target_file_size=max(
                                64 * 1024,
                                t.size_stats(spark)["bytes"] // 128),
                            n_chunks=1)
    mix1, nf2 = frac(spark, t, pct1)
    mix10, _ = frac(spark, t, pct10)
    rows.append(("zorder(phash, image_id)", nf1, nf2, post1, mix1,
                 post10, mix10))
    section = f"""{BEGIN}
## String-dim clustering pruning (image_id via prefix image)

{ROWS} rows, hash-scattered ingest ({nf0} files), then clustered by the
STRING image_id column (order-preserving 7-byte UTF-8 prefix image
after common-prefix stripping — `sfc.str_prefix_expr`; bounds from
manifest str stats). `kept fraction` = files a str-stats-pruned plan
scans for an id-range predicate (1% and 10% of the id domain) —
the MERGE-key locality / point-lookup shape at 10^12 ids.

| layout | files | 1% id range kept (was) | 10% id range kept (was) |
|---|---|---|---|
| {rows[0][0]} | {rows[0][2]} | {rows[0][4]:.3f} ({rows[0][3]:.3f}) | {rows[0][6]:.3f} ({rows[0][5]:.3f}) |
| {rows[1][0]} | {rows[1][2]} | {rows[1][4]:.3f} ({rows[1][3]:.3f}) | {rows[1][6]:.3f} ({rows[1][5]:.3f}) |

Single-dim image_id clustering makes id scans near-minimal; the mixed
zorder(phash, image_id) layout trades some id selectivity for phash
pruning, as expected from interleaving. files_in/out: {m['files_in']}->
{m['files_out']} then {m2['files_in']}->{m2['files_out']}.
{END}"""
    with open(MD) as f:
        doc = f.read()
    if BEGIN in doc:
        doc = doc[:doc.index(BEGIN)] + section + doc[doc.index(END) + len(END):]
    else:
        doc = doc.rstrip() + "\n\n" + section + "\n"
    with open(MD, "w") as f:
        f.write(doc)
    print(section)
    shutil.rmtree(BASE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
