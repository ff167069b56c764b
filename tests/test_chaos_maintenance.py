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


def test_deletes_race_compaction_and_clustering(spark, tmp_table_dir):
    """Steady state WITH erasure traffic: GDPR deletes land while
    maintenance rewrites the same files. The resurrection guard makes
    the racing side surface and replan; the invariant is that every
    erased key stays GONE (no delete is ever silently lost under a
    rewrite) and every surviving row is byte-identical."""
    from mobility_lakehouse_project_spark.operators import delete as del_op

    df0 = synth.images_df(spark, ROWS)
    t = LakehouseTable.create(tmp_table_dir, df0.schema)
    t.append(df0, n_files=6)
    victims = [f"img{i:012d}" for i in range(0, 12)]
    errors: list[Exception] = []
    done = threading.Event()

    def writer() -> None:
        try:
            for b in range(BATCHES):
                t.append(synth.images_df(spark, ROWS,
                                         id_offset=10_000 + ROWS * b),
                         n_files=3)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def deleter() -> None:
        try:
            for i, vid in enumerate(victims):
                mode = "mor" if i % 2 == 0 else "cow"
                for _ in range(30):  # replan until committed
                    try:
                        del_op.delete_where(
                            t, spark, f"image_id = '{vid}'", mode=mode)
                        break
                    except ConcurrentCommitError:
                        continue
                else:
                    raise RuntimeError(f"delete of {vid} never landed")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def maintainer() -> None:
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
                    continue  # erasure or append won; replan
                flip += 1
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer),
               threading.Thread(target=deleter)]
    mt = threading.Thread(target=maintainer)
    for th in threads:
        th.start()
    mt.start()
    for th in threads:
        th.join()
    done.set()
    mt.join()
    assert not errors, errors

    got = t.scan(spark)
    expected = ROWS * (1 + BATCHES) - len(victims)
    assert got.count() == expected
    assert got.select("image_id").distinct().count() == expected
    # no resurrection: every erased key is gone through every rewrite
    assert got.filter(got.image_id.isin(victims)).count() == 0
    # survivors byte-identical to the sequential model
    want = df0
    for b in range(BATCHES):
        want = want.unionByName(
            synth.images_df(spark, ROWS, id_offset=10_000 + ROWS * b))
    want = want.filter(~want.image_id.isin(victims))
    diff = (got.select("image_id", F.md5("bytes").alias("h"), "caption")
            .exceptAll(want.select("image_id",
                                   F.md5("bytes").alias("h"), "caption")))
    assert diff.count() == 0
