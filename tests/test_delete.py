"""Row-level DELETE: stats-pruned copy-on-write (operators/delete.py)."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import clustering, delete
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 2400


@pytest.fixture()
def clustered_table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=24)
    clustering.cluster(t, spark, curve="zorder", target_file_size=64 * 1024,
                       n_chunks=1)
    return t


def test_delete_phash_band_prunes_and_is_exact(spark, clustered_table):
    t = clustered_table
    pre_snap = t.current_snapshot().snapshot_id
    lo, hi = -(2**62), 2**61  # wide band, plenty of matches
    expect_deleted = t.scan(spark).filter(
        (F.col("phash") >= lo) & (F.col("phash") <= hi)
    ).count()
    assert expect_deleted > 0
    pre_files = {
        r["file_path"] for r in t.files(spark).select("file_path").collect()
    }
    res = delete.delete_where(
        t, spark, f"phash >= {lo} AND phash <= {hi}",
        int_ranges={"phash": (lo, hi)},
    )
    assert res["rows_deleted"] == expect_deleted
    # clustering makes the candidate set a strict subset of the table
    assert 0 < res["candidate_files"] < res["total_files"]
    # deleted rows are gone; everything else survives
    assert t.scan(spark).count() == N - expect_deleted
    assert t.scan(spark).filter(
        (F.col("phash") >= lo) & (F.col("phash") <= hi)
    ).count() == 0
    # untouched files are carried over by reference (no rewrite churn)
    post_files = {
        r["file_path"] for r in t.files(spark).select("file_path").collect()
    }
    untouched = pre_files & post_files
    assert len(untouched) == res["total_files"] - res["files_rewritten"]
    # snapshot isolation: the pre-delete snapshot still has every row
    assert t.scan(spark, snapshot_id=pre_snap).count() == N


def test_delete_no_match_is_noop(spark, clustered_table):
    t = clustered_table
    n_snaps = len(t.snapshots_list())
    res = delete.delete_where(t, spark, "w = 9999")
    assert res["rows_deleted"] == 0 and res["files_rewritten"] == 0
    assert len(t.snapshots_list()) == n_snaps  # no empty commit
    assert t.scan(spark).count() == N


def test_delete_conflict_forces_replan(spark, clustered_table):
    """With rebasing disabled (rebase_retries=0), a commit landing
    between DELETE planning and its commit must surface
    (expected_parent pinning), not silently compose. (The default
    validated rebase absorbs a plain append — tests in
    test_rebase_rowlevel.py.)"""
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
    )

    t = clustered_table
    racer = synth.images_df(spark, 10, seed=77, id_offset=50_000)
    orig = t.commit_replace
    fired = {"done": False}

    def racing(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            t.append(racer, n_files=1)
        return orig(*a, **k)

    t.commit_replace = racing
    try:
        with pytest.raises(ConcurrentCommitError):
            delete.delete_where(t, spark, "w = 16", rebase_retries=0)
        res = delete.delete_where(t, spark, "w = 16")  # replan succeeds
    finally:
        del t.commit_replace
    assert res["rows_deleted"] > 0
    assert t.scan(spark).filter(F.col("w") == 16).count() == 0


def test_update_where_applies_assignments(spark, clustered_table):
    t = clustered_table
    pre_snap = t.current_snapshot().snapshot_id
    n_match = t.scan(spark).filter(F.col("w") == 16).count()
    assert n_match > 0
    res = delete.update_where(
        t, spark, "w = 16",
        {"caption": "concat(caption, ' [small]')", "fmt": F.lit("png")},
        int_ranges={"w": (16, 16)},
    )
    assert res["rows_updated"] == n_match
    assert 0 < res["candidate_files"] < res["total_files"]
    post = t.scan(spark)
    assert post.count() == N  # row count conserved
    assert post.filter(F.col("caption").endswith(" [small]")).count() == n_match
    assert post.filter((F.col("w") == 16) & (F.col("fmt") != "png")).count() == 0
    # non-matching rows untouched
    assert post.filter(
        (F.col("w") != 16) & F.col("caption").endswith(" [small]")
    ).count() == 0
    # snapshot isolation
    assert t.scan(spark, snapshot_id=pre_snap).filter(
        F.col("caption").endswith(" [small]")
    ).count() == 0
    with pytest.raises(ValueError):
        delete.update_where(t, spark, "w = 16", {"nope": "1"})


def test_delete_null_predicate_keeps_null_rows(spark, tmp_table_dir):
    """SQL three-valued logic: DELETE removes only predicate-TRUE rows —
    rows where the predicate evaluates to NULL are KEPT (ANSI/Iceberg
    semantics), and rows_deleted agrees with rows actually removed.
    UPDATE likewise assigns only on TRUE."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("v", T.LongType(), True),
        T.StructField("bucket", T.IntegerType()),
    ])
    rows = [(f"id-{i}", (None if i % 3 == 0 else i), i % 2) for i in range(60)]
    df = spark.createDataFrame(rows, schema)
    t = LakehouseTable.create(tmp_table_dir, schema, partition_col="bucket")
    t.append(df, n_files=4)
    n_null = sum(1 for r in rows if r[1] is None)
    n_true = sum(1 for r in rows if r[1] is not None and r[1] > 30)
    res = delete.delete_where(t, spark, "v > 30")
    assert res["rows_deleted"] == n_true
    post = t.scan(spark)
    assert post.count() == 60 - n_true  # NULL-predicate rows survived
    assert post.filter(F.col("v").isNull()).count() == n_null
    n_true2 = sum(1 for r in rows if r[1] is not None and 0 < r[1] <= 10)
    res2 = delete.update_where(t, spark, "v <= 10", {"v": "v + 1000"})
    assert res2["rows_updated"] == n_true2
    post2 = t.scan(spark)
    assert post2.filter(F.col("v").isNull()).count() == n_null  # untouched
    assert post2.filter(F.col("v") >= 1000).count() == n_true2


def test_delete_where_true_chunked_bounded_collects(spark, tmp_table_dir, monkeypatch):
    """A non-selective DELETE walks partition chunks: every driver-side
    path materialization is bounded by ``chunk_files``, one pinned
    commit lands per chunk, and all_entries is never touched — the
    bounded-collect contract compaction already obeys (VERDICT r3)."""
    df = synth.images_df(spark, 400, partitions=8)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=32)
    n_parts = t.files(spark).select("partition_id").distinct().count()
    assert n_parts >= 4

    def forbid(self, *a, **k):
        raise AssertionError("delete planning materialized the full manifest")

    monkeypatch.setattr(LakehouseTable, "all_entries", forbid)
    orig = delete._plan_touched_chunk
    seen = []

    def spy(table, spark_, cond, int_ranges, part_ids, **kw):
        entries, n = orig(table, spark_, cond, int_ranges, part_ids, **kw)
        seen.append(len(entries))
        return entries, n

    monkeypatch.setattr(delete, "_plan_touched_chunk", spy)
    res = delete.delete_where(t, spark, "true", chunk_files=8)
    assert res["rows_deleted"] == 400
    assert res["chunks"] >= 4
    assert len(seen) == res["chunks"] and all(n <= 8 for n in seen)
    assert t.scan(spark).count() == 0
    ops = [s.operation for s in t.snapshots_list()]
    assert ops.count("delete") == res["chunks"]


def test_delete_everything_then_append(spark, tmp_table_dir):
    """Full-table DELETE: every file removed, zero new entries, the
    table reads empty, and life continues (append works)."""
    from mobility_lakehouse_project_spark.operators import delete as dops

    df = synth.images_df(spark, 150, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    res = dops.delete_where(t, spark, "phash IS NOT NULL OR phash IS NULL")
    assert res["rows_deleted"] == 150
    assert t.scan(spark).count() == 0
    assert t.files(spark).count() == 0
    t.append(synth.images_df(spark, 30, seed=3, partitions=1), n_files=1)
    assert t.scan(spark).count() == 30


def test_full_file_delete_drops_without_rewrite(spark, tmp_table_dir):
    """File-granularity DELETE: files whose every row matches are
    dropped metadata-only (never read); only boundary files rewrite."""
    df = spark.createDataFrame(
        [(i, i % 4, f"t{i}") for i in range(400)], "id long, grp int, tag string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="grp")
    t.append(df, n_files=8)  # partition-dir layout: files never span grps
    pre = {r["file_path"] for r in t.files(spark).select("file_path").collect()}
    # grp = 2 matches whole files (partition-aligned): all drops, no rewrite
    res = delete.delete_where(t, spark, "grp = 2")
    assert res["files_dropped"] > 0
    assert res["files_rewritten"] == 0 and res["files_written"] == 0
    assert res["rows_deleted"] == 100
    assert t.scan(spark).filter("grp = 2").count() == 0
    assert t.scan(spark).count() == 300
    # untouched files survive byte-identical (same paths)
    post = {r["file_path"] for r in t.files(spark).select("file_path").collect()}
    assert post < pre
    # boundary case: id < 150 straddles files -> mixed drop + rewrite
    res2 = delete.delete_where(t, spark, "id < 150")
    assert res2["rows_deleted"] == 113  # 150 minus the 37 already-gone grp-2 ids
    assert res2["files_rewritten"] > 0
    assert t.scan(spark).count() == 300 - 113


def test_drop_partitions_metadata_only(spark, tmp_table_dir):
    """DROP PARTITION removes a partition's files without reading or
    writing any data; other partitions are untouched."""
    df = spark.createDataFrame(
        [(i, i % 3, f"t{i}") for i in range(300)], "id long, grp int, tag string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="grp")
    t.append(df, n_files=6)
    pre = {r["file_path"]: r["partition_id"]
           for r in t.files(spark).select("file_path", "partition_id").collect()}
    res = delete.drop_partitions(t, spark, [1])
    assert res["rows_dropped"] == 100 and res["files_dropped"] > 0
    assert t.scan(spark).count() == 200
    assert t.scan(spark).filter("grp = 1").count() == 0
    post = {r["file_path"] for r in t.files(spark).select("file_path").collect()}
    assert post == {p for p, pid in pre.items() if pid != "1"}
    # time travel still sees the dropped partition
    snaps = sorted(t.snapshots_list(), key=lambda s: s.sequence)
    assert t.scan(spark, snapshot_id=snaps[0].snapshot_id).count() == 300
    # unpartitioned table refuses
    with pytest.raises(ValueError, match="unpartitioned"):
        d2 = spark.createDataFrame([(1,)], "id long")
        t2 = LakehouseTable.create(str(tmp_table_dir) + "_u", d2.schema,
                                   partition_col=None)
        delete.drop_partitions(t2, spark, ["x"])


def test_drop_partitions_live_rows_and_unmatched(spark, tmp_table_dir):
    """rows_dropped counts LIVE rows (pending MOR deletes excluded) and
    a typo'd partition value is surfaced, not a silent no-op."""
    df = spark.createDataFrame(
        [(i, i % 3, f"t{i}") for i in range(300)], "id long, grp int, tag string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="grp")
    t.append(df, n_files=6)
    # MOR-delete 3 rows of grp 1 (ids 1, 4, 7) — physically still there
    delete.delete_where(t, spark, "id < 10 AND grp = 1", mode="mor")
    res = delete.drop_partitions(t, spark, [1, 99])
    assert res["rows_dropped"] == 97  # live rows, not physical 100
    assert res["partitions_dropped"] == ["1"]
    assert res["unmatched_values"] == ["99"]
    assert t.scan(spark).count() == 200
    # empty-table shape check for CoW delete metrics
    r2 = delete.delete_where(t, spark, "id < 0")
    assert r2["files_dropped"] == 0 and r2["files_rewritten"] == 0
