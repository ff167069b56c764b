"""Maintenance under live traffic — the steady state of a 10^12-image
deployment: writers keep appending while compaction and clustering
rewrite the same table. Snapshot isolation + commit composition must
guarantee ZERO lost and ZERO duplicated rows, with every maintenance
conflict surfacing as a retryable ConcurrentCommitError, never as
silent data change.

Reference analog: the DAG runs maintenance and ingest as serialized
tasks (/root/reference/dags/) — this engine's commit protocol removes
that serialization requirement, and this test is the evidence.
"""

import threading

from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, clustering
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import (
    ConcurrentCommitError,
)

WRITERS = 3
BATCHES = 4
ROWS = 60


def test_appends_race_compaction_and_clustering(spark, tmp_table_dir):
    df0 = synth.images_df(spark, ROWS)
    t = LakehouseTable.create(tmp_table_dir, df0.schema)
    t.append(df0, n_files=6)
    errors: list[Exception] = []
    done = threading.Event()

    def writer(wid: int) -> None:
        try:
            for b in range(BATCHES):
                off = 10_000 * (wid + 1) + ROWS * b
                t.append(synth.images_df(spark, ROWS, id_offset=off),
                         n_files=3)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def maintainer() -> None:
        # keep rewriting until the writers stop; conflicts REPLAN
        # (re-run derives a fresh plan) — they must never corrupt
        try:
            flip = 0
            while not done.is_set():
                try:
                    if flip % 2 == 0:
                        compaction.compact(
                            t, spark, target_file_size=4 << 20)
                    else:
                        clustering.cluster(t, spark, curve="zorder")
                except ConcurrentCommitError:
                    continue  # a writer won; replan next round
                flip += 1
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(WRITERS)]
    mt = threading.Thread(target=maintainer)
    for th in threads:
        th.start()
    mt.start()
    for th in threads:
        th.join()
    done.set()
    mt.join()
    assert not errors, errors

    expected = ROWS * (1 + WRITERS * BATCHES)
    got = t.scan(spark)
    assert got.count() == expected
    # zero duplicates, zero losses — id-level conservation
    assert got.select("image_id").distinct().count() == expected
    # captions byte-identical to a from-scratch union of every batch
    want = df0
    for wid in range(WRITERS):
        for b in range(BATCHES):
            off = 10_000 * (wid + 1) + ROWS * b
            want = want.unionByName(
                synth.images_df(spark, ROWS, id_offset=off))
    diff = (got.select("image_id", F.md5("bytes").alias("h"), "caption")
            .exceptAll(want.select("image_id",
                                   F.md5("bytes").alias("h"), "caption")))
    assert diff.count() == 0
    # history shows both traffic and maintenance landed
    ops = {s.operation for s in t.snapshots_list()}
    assert "append" in ops and "replace" in ops
