"""Cross-PROCESS chaos: three independent committers — a MERGE
upserter, a row-level DELETEr, and a compact/zorder maintainer — race
one table from separate JVMs/SparkSessions (the
test_tableformat.py::test_multiprocess_cas_exactly_one_winner barrier
pattern, extended from a single CAS race to full operation loops).
In-process chaos (tests/test_chaos_maintenance.py) shares one
metadata cache and one Python lock domain; production concurrency is
separate drivers on separate machines, which only the on-disk CAS
protocol serializes. The committers touch DISJOINT key ranges, so the
sequential model's final state is unique regardless of interleaving:
base rows, minus the deleter's range, with the merger's range at its
last batch's values — any lost update, doubled apply, or maintenance
corruption diverges the content check.

Reference analog: the DAGs serialize ingest/maintenance as Airflow
tasks (/root/reference/dags/); this engine's commit protocol replaces
that scheduler-level mutual exclusion, and this test is the
cross-process evidence.
"""

import os
import subprocess
import sys
import time

from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

BASE_ROWS = 240
# synth ids are 'img%012d' strings: zero padding makes lexicographic
# order == numeric order, so string ranges select the territories
MERGE_KEYS = [f"img{i:012d}" for i in range(0, 40)]
DELETE_KEYS = [f"img{i:012d}" for i in range(100, 140)]
BATCHES = 4

_RACER = r'''
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from mobility_lakehouse_project_spark.session import get_spark
from mobility_lakehouse_project_spark.operators import (
    clustering, compaction, delete, merge,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import (
    ConcurrentCommitError,
)

loc, role = sys.argv[1], sys.argv[2]
spark = get_spark(f"chaos-{role}", cores=3)
t = LakehouseTable(loc)
base = t.scan(spark).limit(1).collect()  # warm the session before the gun
open(os.path.join(loc, f"ready-{role}"), "w").close()
while not os.path.exists(os.path.join(loc, "go")):
    time.sleep(0.01)

commits = conflicts = 0
BATCHES = 4


def retrying(fn, attempts=30):
    global commits, conflicts
    for _ in range(attempts):
        try:
            fn()
            commits += 1
            return
        except ConcurrentCommitError:
            conflicts += 1
            time.sleep(0.05)
    raise RuntimeError(f"{role}: gave up after {attempts} conflicts")


if role == "merger":
    for b in range(BATCHES):
        rows = t.scan(spark).filter(
            F.col("image_id") < "img000000000040").collect()
        src = spark.createDataFrame(
            [(r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"],
              f"merged-{b}", r["phash"], r["bucket"]) for r in rows],
            t.schema())
        retrying(lambda s=src: merge.merge_into(
            t, spark, s, key="image_id",
            when_not_matched=None, mode="mor"))
elif role == "deleter":
    for b in range(BATCHES):
        lo = f"img{100 + 10 * b:012d}"
        hi = f"img{100 + 10 * (b + 1):012d}"
        retrying(lambda lo=lo, hi=hi: delete.delete_where(
            t, spark,
            (F.col("image_id") >= lo) & (F.col("image_id") < hi),
            mode="mor" if b % 2 == 0 else "cow",
            int_ranges={"image_id": (lo, hi)}))
else:  # maintainer
    deadline = time.time() + 90
    flip = 0
    while time.time() < deadline and not os.path.exists(
            os.path.join(loc, "stop")):
        try:
            if flip % 2 == 0:
                compaction.compact(t, spark, target_file_size=4 << 20)
            else:
                clustering.cluster(t, spark, curve="zorder")
            commits += 1
        except ConcurrentCommitError:
            conflicts += 1
        flip += 1

print(f"{role} DONE commits={commits} conflicts={conflicts}", flush=True)
spark.stop()
'''


def test_three_process_merge_delete_compact(spark, tmp_table_dir):
    df0 = synth.images_df(spark, BASE_ROWS)
    t = LakehouseTable.create(tmp_table_dir, df0.schema)
    t.append(df0, n_files=8)

    roles = ("merger", "deleter", "maintainer")
    procs = {
        role: subprocess.Popen(
            [sys.executable, "-c", _RACER, tmp_table_dir, role],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        for role in roles
    }
    deadline = time.time() + 180
    while time.time() < deadline and not all(
            os.path.exists(os.path.join(tmp_table_dir, f"ready-{r}"))
            for r in roles):
        time.sleep(0.05)
    open(os.path.join(tmp_table_dir, "go"), "w").close()
    outs = {}
    for role in ("merger", "deleter"):
        outs[role] = procs[role].communicate(timeout=600)[0]
        assert procs[role].returncode == 0, (role, outs[role])
    open(os.path.join(tmp_table_dir, "stop"), "w").close()
    outs["maintainer"] = procs["maintainer"].communicate(timeout=600)[0]
    assert procs["maintainer"].returncode == 0, outs["maintainer"]
    for role in roles:
        assert f"{role} DONE" in outs[role], outs[role]

    # ---- sequential-model final state, order-independent ------------
    t2 = LakehouseTable(tmp_table_dir)
    got = t2.scan(spark)
    assert got.count() == BASE_ROWS - len(DELETE_KEYS)
    assert got.filter(F.col("image_id").isin(DELETE_KEYS)).count() == 0
    merged = got.filter(F.col("image_id").isin(MERGE_KEYS))
    assert merged.count() == len(MERGE_KEYS)
    caps = {r["caption"] for r in merged.select("caption").collect()}
    assert caps == {f"merged-{BATCHES - 1}"}, caps
    # untouched territory is byte-identical to the original
    rest = got.filter(~F.col("image_id").isin(MERGE_KEYS + DELETE_KEYS))
    want = df0.filter(~F.col("image_id").isin(MERGE_KEYS + DELETE_KEYS))
    diff = (rest.select("image_id", F.md5("bytes").alias("h"), "caption")
            .exceptAll(want.select("image_id", F.md5("bytes").alias("h"),
                                   "caption")))
    assert diff.count() == 0
    # id-level conservation: no duplicates from a doubled MERGE apply
    assert got.select("image_id").distinct().count() == got.count()

    # ---- serialized history: one linear snapshot chain --------------
    snaps = sorted(t2.snapshots_list(), key=lambda s: s.sequence)
    seqs = [s.sequence for s in snaps]
    assert seqs == sorted(set(seqs)), "sequence collision"
    by_id = {s.snapshot_id: s for s in snaps}
    cur = t2.current_snapshot()
    chain = 0
    while cur is not None:
        chain += 1
        cur = by_id.get(cur.parent_id)
    assert chain == len(snaps), (chain, len(snaps))
    ops = {s.operation for s in snaps}
    assert "append" in ops and "delete" in ops
