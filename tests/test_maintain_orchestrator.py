"""One-call maintenance orchestrator (plans/maintenance.py)."""

from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import delete, merge
from mobility_lakehouse_project_spark.plans.maintenance import run_maintenance
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 600


def test_full_maintenance_pass(spark, tmp_table_dir):
    """A table with every kind of debt — fragmentation, pending MOR
    deletes from a delete AND a MOR merge, a half-migrated partition
    evolution, snapshot churn — comes out clean in one call with the
    logical contents intact."""
    df = synth.images_df(spark, N, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    for i in range(3):  # fragmented ingest
        t.append(synth.images_df(spark, N // 3, seed=40 + i,
                                 id_offset=i * (N // 3)), n_files=8)
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")
    src = synth.images_df(spark, 30, seed=45).withColumn(
        "caption", F.lit("v2"))
    merge.merge_into(t, spark, src, key="image_id", mode="mor")
    t.evolve_partition("fmt")
    t.append(synth.images_df(spark, 40, seed=46, id_offset=50_000), n_files=2)

    expect = t.scan(spark).count()
    expect_v2 = t.scan(spark).filter("caption = 'v2'").count()
    # later appends + the merge re-introduce w=16 rows; only the
    # pre-delete generation must stay dead
    expect_w16 = t.scan(spark).filter("w = 16").count()
    files_before = t.files(spark).count()

    report = run_maintenance(
        t, spark, target_file_size=1 << 20, cluster_curve="zorder",
        keep_snapshots=2, orphan_grace_s=0.0, analyze=True,
        fold_min_delete_ratio=0.0,  # full physical clean is the point
    )

    assert report["fold_deletes"]["cleared"] is True
    assert report["migrate_partitions"]["files_migrated"] > 0
    assert "cluster" in report and "expire_snapshots" in report
    assert report["analyze"]["row_count"] == expect
    # logical contents preserved through every step
    assert t.scan(spark).count() == expect
    assert t.scan(spark).filter("caption = 'v2'").count() == expect_v2
    assert t.scan(spark).filter("w = 16").count() == expect_w16 < n16
    # physically clean: no pending deletes, single spec, fewer files
    snap = t.current_snapshot()
    assert not snap.delete_manifests
    assert t._current_spec_snapshot_ids(t.load_metadata()) is None or \
        t.files(spark).filter(
            ~F.col("added_snapshot_id").isin(
                t._current_spec_snapshot_ids(t.load_metadata()))
        ).count() == 0
    assert t.files(spark).count() < files_before
    assert len(t.snapshots_list()) <= 4  # keep_last + pinned current


def test_targeted_fold_remainder_consolidates_to_one_vector(spark, tmp_path):
    """A min-delete-ratio fold that skips below-threshold files must
    leave ONE consolidated deletion vector applied, not the stacked
    per-commit delete manifests."""
    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.operators import delete
    from mobility_lakehouse_project_spark.plans.maintenance import (
        run_maintenance,
    )
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    df = synth.images_df(spark, 600, partitions=2)
    t = LakehouseTable.create(str(tmp_path / "t"), df.schema,
                              partition_col="bucket")
    t.append(df, n_files=8)
    expect = t.scan(spark).filter(
        "w = 16 OR w = 32 OR h = 64").count()
    # three tiny deletes: each touches a small fraction of every file
    delete.delete_where(t, spark, "w = 16", mode="mor")
    delete.delete_where(t, spark, "w = 32", mode="dv")
    delete.delete_where(t, spark, "h = 64", mode="mor")
    assert len(t.current_snapshot().delete_manifests) == 3
    rep = run_maintenance(t, spark, fold_min_delete_ratio=0.9,
                          keep_snapshots=50)
    assert rep["fold_deletes"]["cleared"] is False
    assert "compact_deletion_vectors" in rep
    snap = t.current_snapshot()
    assert len(snap.position_delete_manifests()) == 0
    assert len(snap.dv_manifests()) == 1
    assert t.scan(spark).count() == 600 - expect


def test_default_fold_ratio_is_calibrated(spark, tmp_path):
    """The orchestrator's default fold trigger is the calibrated 0.05
    (tools/calibrate_fold.py / BENCH/BASELINE.md): a sub-threshold
    erasure (~0.8% of every file) stays pending instead of triggering
    a full blob rewrite, while the
    ``maintenance.min-delete-ratio`` table property (here 0.0) still
    overrides to the full physical clean."""
    df = synth.images_df(spark, 600, partitions=2)
    t = LakehouseTable.create(str(tmp_path / "t"), df.schema,
                              partition_col="bucket")
    t.append(df, n_files=8)
    n_all = t.scan(spark).count()
    # a uniform ~0.8% hash slice: below the 5% trigger in every file
    delete.delete_where(
        t, spark, "pmod(abs(xxhash64(image_id)), 1000) < 8", mode="mor")
    n_del = n_all - t.scan(spark).count()
    assert 0 < n_del < 0.05 * n_all

    # tiny target keeps bin-pack a no-op: compaction's rewrite scan
    # would otherwise apply the pending deletes for size reasons and
    # mask the fold decision under test
    rep = run_maintenance(t, spark, keep_snapshots=50,
                          target_file_size=1 << 10)
    assert rep["fold_deletes"]["cleared"] is False
    assert rep["fold_deletes"]["files_rewritten"] == 0
    snap = t.current_snapshot()
    assert len(snap.delete_manifests) >= 1  # still applied
    assert t.scan(spark).count() == n_all - n_del

    # property override: this table opts into the full clean
    t.update_properties({"maintenance.min-delete-ratio": "0.0"})
    rep2 = run_maintenance(t, spark, keep_snapshots=50,
                           target_file_size=1 << 10)
    assert rep2["fold_deletes"]["cleared"] is True
    assert rep2["fold_deletes"]["files_rewritten"] > 0
    assert not t.current_snapshot().delete_manifests
    assert t.scan(spark).count() == n_all - n_del
