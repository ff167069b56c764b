"""Merge-on-read position deletes (Iceberg v2 delete-file model).

The reference lakehouse rewrites whole partitions for row removal
(dags/Silver_Transform_Dag.py:188-207); this engine adds Iceberg-v2
merge-on-read: DELETE writes tiny (file, row-position) delete files —
no blob rewrite — every scan anti-joins them away, and
rewrite_position_deletes folds them back into the data. On a
10^12-image table, erasing single image_ids must not rewrite 500 MB
blob files; that is the scale case these tests pin down at small N.
"""

import os

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, delete, merge
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import (
    ConcurrentCommitError,
)

N = 1200


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=12)
    return t


def _file_set(t, spark):
    return {r["file_path"] for r in t.files(spark).select("file_path").collect()}


def test_mor_delete_removes_rows_without_rewriting_data(spark, table):
    t = table
    pre_snap = t.current_snapshot().snapshot_id
    pre_files = _file_set(t, spark)
    expect = t.scan(spark).filter("w = 16").count()
    assert expect > 0

    res = delete.delete_where(t, spark, "w = 16", mode="mor")

    assert res["rows_deleted"] == expect
    assert res["delete_files_written"] >= 1
    # the data files are untouched — that is the whole point of MOR
    assert _file_set(t, spark) == pre_files
    snap = t.current_snapshot()
    assert snap.operation == "delete" and len(snap.delete_manifests) == 1
    assert snap.summary["deleted-records"] == expect
    # scans apply the deletes
    assert t.scan(spark).filter("w = 16").count() == 0
    assert t.scan(spark).count() == N - expect
    # column-pruned and partition-pruned scans apply them too
    assert t.scan(spark, columns=["image_id", "w"]).count() == N - expect
    one_bucket = t.scan(spark, partition_values={0})
    assert one_bucket.filter("w = 16").count() == 0
    # time travel to the pre-delete snapshot shows every row
    assert t.scan(spark, snapshot_id=pre_snap).count() == N


def test_mor_delete_null_predicate_keeps_rows(spark, tmp_table_dir):
    df = synth.images_df(spark, 200, partitions=2).withColumn(
        "w", F.when(F.col("phash") % 3 == 0, F.lit(None)).otherwise(F.col("w"))
    )
    t = LakehouseTable.create(tmp_table_dir + "-null", df.schema,
                              partition_col="bucket")
    t.append(df, n_files=4)
    n_null = t.scan(spark).filter("w IS NULL").count()
    n_hit = t.scan(spark).filter("w = 16").count()
    assert n_null > 0
    res = delete.delete_where(t, spark, "w = 16", mode="mor")
    assert res["rows_deleted"] == n_hit
    # NULL-predicate rows survive (ANSI DELETE removes TRUE only)
    assert t.scan(spark).filter("w IS NULL").count() == n_null
    assert t.scan(spark).count() == 200 - n_hit


def test_mor_deletes_stack_and_rerun_is_idempotent(spark, table):
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    n32 = t.scan(spark).filter("w = 32").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")
    delete.delete_where(t, spark, "w = 32", mode="mor")
    assert len(t.current_snapshot().delete_manifests) == 2
    assert t.scan(spark).count() == N - n16 - n32
    # re-running the same delete matches nothing (prior deletes are
    # applied to the planning scan itself) => no new snapshot
    n_snaps = len(t.snapshots_list())
    res = delete.delete_where(t, spark, "w = 16", mode="mor")
    assert res["rows_deleted"] == 0
    assert len(t.snapshots_list()) == n_snaps


def test_cow_ops_after_mor_delete_do_not_resurrect(spark, table):
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")

    # compaction reads through the MOR scan: deleted rows stay dead
    compaction.compact(t, spark, target_file_size=1 << 20)
    assert t.scan(spark).filter("w = 16").count() == 0
    assert t.scan(spark).count() == N - n16

    # a copy-on-write DELETE on another predicate composes correctly
    n8 = t.scan(spark).filter("w = 8").count()
    res = delete.delete_where(t, spark, "w = 8", mode="cow")
    assert res["rows_deleted"] == n8
    assert t.scan(spark).count() == N - n16 - n8
    assert t.scan(spark).filter("w = 16").count() == 0


def test_merge_respects_pending_mor_deletes(spark, table):
    t = table
    delete.delete_where(t, spark, "w = 16", mode="mor")
    survivors = {
        r["image_id"] for r in t.scan(spark, columns=["image_id"]).collect()
    }
    # source updates one surviving row and inserts one new row
    some_id = sorted(survivors)[0]
    src = synth.images_df(spark, N + 50, partitions=2).filter(
        F.col("image_id").isin([some_id, f"img{N + 7:012d}"])
        | (F.col("image_id") == some_id)
    ).withColumn("caption", F.lit("updated-caption"))
    res = merge.merge_into(t, spark, src, key="image_id")
    assert res["snapshot"] is not None
    # deleted rows were NOT resurrected by the merge rewrite
    assert t.scan(spark).filter("w = 16").count() == 0
    got = {r["image_id"]: r["caption"]
           for r in t.scan(spark, columns=["image_id", "caption"])
           .filter(F.col("image_id").isin([some_id, f"img{N + 7:012d}"]))
           .collect()}
    assert got[some_id] == "updated-caption"
    assert got[f"img{N + 7:012d}"] == "updated-caption"


def test_rewrite_position_deletes_folds_and_clears(spark, table):
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")
    pre_rows = t.scan(spark).count()
    pre_files = _file_set(t, spark)
    delete_rel = [
        e["file_path"]
        for m in t.current_snapshot().delete_manifests
        for e in t.read_manifest_entries(m)
    ]
    assert delete_rel

    res = delete.rewrite_position_deletes(t, spark, target_file_size=1 << 20)

    assert res["cleared"] is True
    assert res["files_rewritten"] >= 1
    assert not t.current_snapshot().delete_manifests
    # scan output identical before/after the fold
    assert t.scan(spark).count() == pre_rows == N - n16
    assert t.scan(spark).filter("w = 16").count() == 0
    # only delete-referenced files were rewritten; record counts match
    post_files = _file_set(t, spark)
    assert len(pre_files - post_files) == res["files_rewritten"]
    # snapshot expiry GCs the now-unreachable position-delete files
    t.expire_snapshots(keep_last=1)
    for rel in delete_rel:
        assert not os.path.exists(os.path.join(t._local_root, rel))


def test_mor_scan_correct_without_broadcast(spark, table, monkeypatch):
    """The delete anti-join must stay correct when the delete set is
    too big to broadcast (shuffle join path): _file/_pos are computed
    on the scan stage, so a post-shuffle evaluation bug would show up
    as wrong survivors here."""
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")
    monkeypatch.setattr(LakehouseTable, "MOR_BROADCAST_ROWS", 0)
    with_shuffle = t.scan(spark).count()
    assert with_shuffle == N - n16
    assert t.scan(spark).filter("w = 16").count() == 0


def test_mor_delete_at_percent_encoded_location(spark, tmp_path):
    loc = "file://" + str(tmp_path / "dir with space" / "tbl").replace(
        " ", "%20"
    )
    df = synth.images_df(spark, 300, partitions=2)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    n16 = t.scan(spark).filter("w = 16").count()
    res = delete.delete_where(t, spark, "w = 16", mode="mor")
    assert res["rows_deleted"] == n16 > 0
    assert t.scan(spark).filter("w = 16").count() == 0
    res2 = delete.rewrite_position_deletes(t, spark, target_file_size=1 << 20)
    assert res2["cleared"] is True
    assert t.scan(spark).count() == 300 - n16


def test_mor_delete_conflict_forces_replan(spark, table):
    """With rebasing disabled (rebase_retries=0), a commit landing
    between MOR planning and the delete commit must surface — row
    positions are content-addressed against the plan snapshot, so
    blind composition would corrupt. (The default validated rebase
    absorbs a plain append — positions stay valid; see
    test_rebase_rowlevel.py.)"""
    t = table
    racer = synth.images_df(spark, 10, seed=77, id_offset=50_000)
    orig = t.commit_delete_files
    fired = {"done": False}

    def racing(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            t.append(racer, n_files=1)
        return orig(*a, **k)

    t.commit_delete_files = racing
    with pytest.raises(ConcurrentCommitError):
        delete.delete_where(t, spark, "w = 16", mode="mor",
                            rebase_retries=0)
    t.commit_delete_files = orig
    # fail-safe: no delete manifest landed, table intact
    assert not t.current_snapshot().delete_manifests
    assert t.scan(spark).count() == N + 10


def test_targeted_fold_min_delete_ratio(spark, table):
    """Iceberg's delete-file-threshold idiom: fold only files whose
    pending-delete fraction makes the rewrite worth its write
    amplification; sub-threshold files keep riding the scan-time
    anti-join until a later full fold."""
    t = table
    # heavy deletes confined to one partition (~25% of its rows), plus
    # a single-row delete in ANOTHER partition (ratio ~1/record_count)
    n16 = t.scan(spark).filter("w = 16 AND bucket = 0").count()
    assert n16 > 0
    one = (t.scan(spark).filter("w = 64 AND bucket = 1").select("image_id")
           .limit(1).collect()[0]["image_id"])
    delete.delete_where(t, spark, "w = 16 AND bucket = 0", mode="mor")
    delete.delete_where(t, spark, f"image_id = '{one}'", mode="mor")
    pre_rows = t.scan(spark).count()
    assert pre_rows == N - n16 - 1
    pre_files = _file_set(t, spark)

    res = delete.rewrite_position_deletes(
        t, spark, target_file_size=1 << 20, min_delete_ratio=0.10)

    # partial: manifests kept, the single-row file was NOT rewritten
    assert res["cleared"] is False
    assert res["files_below_ratio"] >= 1
    assert res["files_rewritten"] >= 1
    assert t.current_snapshot().delete_manifests
    # scans stay exact across the partial fold
    assert t.scan(spark).count() == pre_rows
    assert t.scan(spark).filter("w = 16 AND bucket = 0").count() == 0
    assert t.scan(spark).filter(F.col("image_id") == one).count() == 0
    # fewer files rewritten than a full fold would have touched
    assert len(pre_files - _file_set(t, spark)) == res["files_rewritten"]

    # a later full fold picks up the remainder and clears
    res2 = delete.rewrite_position_deletes(t, spark, target_file_size=1 << 20)
    assert res2["cleared"] is True
    assert not t.current_snapshot().delete_manifests
    assert t.scan(spark).count() == pre_rows
    assert t.scan(spark).filter(F.col("image_id") == one).count() == 0
