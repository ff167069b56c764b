"""Incremental (minor/major) clustering gates.

At 10^12-image scale a maintenance pass cannot re-shuffle the whole
table; ``cluster_incremental`` must re-sort ONLY the post-baseline
ingest (minor runs), escalate mostly-rewritten partitions to a full
per-partition re-cluster (major), and never disturb already-clustered
files. Mirrors the reference's incremental-maintenance idiom
(dags/Silver_Transform_Dag.py re-processes only the new day's slice,
not the history)."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import clustering
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 1800


@pytest.fixture()
def clustered_table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=16)
    clustering.cluster(t, spark, curve="zorder", target_file_size=200 * 1024,
                       n_chunks=2)
    return t


def _paths(t, spark):
    return {r["file_path"] for r in
            t.files(spark).select("file_path").collect()}


def test_never_clustered_falls_back_to_full(spark, tmp_table_dir):
    df = synth.images_df(spark, 600, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=8)
    n_files = t.files(spark).count()
    res = clustering.cluster_incremental(t, spark, target_file_size=1 << 20)
    assert res["mode"] == "full"
    assert res["files_in"] == n_files


def test_noop_when_nothing_new(spark, clustered_table):
    res = clustering.cluster_incremental(clustered_table, spark)
    assert res["mode"] == "noop"
    assert res["files_in"] == 0


def test_minor_rewrites_only_new_files(spark, clustered_table):
    t = clustered_table
    base_paths = _paths(t, spark)
    # small delta into every partition: well under merge_threshold
    delta = synth.images_df(spark, 120, id_offset=N, partitions=4)
    t.append(delta, n_files=8)
    new_paths = _paths(t, spark) - base_paths
    new_parts = {r["partition_id"] for r in
                 t.files(spark)
                 .filter(F.col("file_path").isin(list(new_paths)))
                 .select("partition_id").distinct().collect()}
    res = clustering.cluster_incremental(
        t, spark, target_file_size=200 * 1024, merge_threshold=0.5)
    assert res["mode"] == "incremental"
    assert res["major_partitions"] == []
    assert set(res["minor_partitions"]) == new_parts
    # exactly the delta files were read/rewritten
    assert res["minor"]["files_in"] == len(new_paths)
    # the pre-existing clustered layout is untouched
    assert base_paths <= _paths(t, spark)
    # rows conserved, content intact
    assert t.scan(spark).count() == N + 120
    assert (t.scan(spark).filter(F.col("image_id") == f"img{N:012d}").count()
            == 1)


def test_major_when_delta_dominates_partition(spark, clustered_table):
    t = clustered_table
    base_paths = _paths(t, spark)
    per_part = {r["partition_id"]: r["cnt"] for r in
                t.files(spark).groupBy("partition_id")
                .agg(F.count("*").alias("cnt")).collect()}
    # big skewed delta: bucket of each row = 0 -> partition "0" gets
    # ~all new bytes and must escalate to a major re-cluster
    delta = (synth.images_df(spark, N // 2, id_offset=N, partitions=4)
             .withColumn("bucket", F.lit(0)))
    t.append(delta, n_files=6)
    n_delta = t.files(spark).count() - sum(per_part.values())
    res = clustering.cluster_incremental(
        t, spark, target_file_size=200 * 1024, merge_threshold=0.4)
    assert res["mode"] == "incremental"
    assert res["major_partitions"] == ["0"]
    # the major pass rewrote partition 0 WHOLESALE (old + new files)
    assert res["major"]["files_in"] == per_part["0"] + n_delta
    # other partitions' clustered files survive untouched
    kept = _paths(t, spark) & base_paths
    kept_parts = {r["partition_id"] for r in
                  t.files(spark)
                  .filter(F.col("file_path").isin(list(kept)))
                  .select("partition_id").distinct().collect()}
    assert "0" not in kept_parts
    assert (set(per_part) - {"0"}) <= kept_parts
    assert t.scan(spark).count() == N + N // 2


def test_minor_then_major_baseline_accumulates(spark, clustered_table):
    """Minor commits must NOT reset the baseline: a second incremental
    run measures newness against the last FULL cluster, so files a
    minor run sorted are still merge candidates for the next major."""
    t = clustered_table
    n0 = t.files(spark).count()
    t.append(synth.images_df(spark, 90, id_offset=N, partitions=4), n_files=4)
    d1 = t.files(spark).count() - n0
    r1 = clustering.cluster_incremental(
        t, spark, target_file_size=200 * 1024, merge_threshold=0.9)
    assert r1["mode"] == "incremental" and r1["minor"]["files_in"] == d1
    minor_out = r1["minor"]["files_out"]
    n1 = t.files(spark).count()
    t.append(synth.images_df(spark, 90, id_offset=N + 90, partitions=4),
             n_files=4)
    d2 = t.files(spark).count() - n1
    r2 = clustering.cluster_incremental(
        t, spark, target_file_size=200 * 1024, merge_threshold=0.9)
    # second minor run re-sorts BOTH deltas (the first minor output is
    # still post-baseline), folding the runs together
    assert r2["mode"] == "incremental"
    assert r2["minor"]["files_in"] == minor_out + d2
    assert t.scan(spark).count() == N + 180


def test_repeat_run_without_ingest_is_noop(spark, clustered_table):
    """A minor run's own output must not make the next run busy: at
    zero ingest, maintenance converges instead of re-sorting its own
    minor files forever."""
    t = clustered_table
    t.append(synth.images_df(spark, 60, id_offset=N, partitions=4),
             n_files=4)
    r1 = clustering.cluster_incremental(
        t, spark, target_file_size=200 * 1024, merge_threshold=0.9)
    assert r1["mode"] == "incremental" and r1["minor"]["files_in"] > 0
    r2 = clustering.cluster_incremental(
        t, spark, target_file_size=200 * 1024, merge_threshold=0.9)
    assert r2["mode"] == "noop" and r2["files_in"] == 0


def test_incremental_pruning_stays_effective(spark, tmp_table_dir):
    """After a minor run the table has two sorted runs per partition;
    range pruning on the clustered column must stay within the bounded
    dilution of the (small) overlapping run, not collapse."""
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=16)
    clustering.cluster(t, spark, curve="zorder", cols=("phash",),
                       target_file_size=32 * 1024, n_chunks=2)
    lo, hi = -(2 ** 61), -(2 ** 60)
    before = clustering.pruning_ratio(t, spark, "phash", lo, hi)
    assert before["pruned_fraction"] > 0.5
    t.append(synth.images_df(spark, 180, id_offset=N, partitions=4),
             n_files=8)
    clustering.cluster_incremental(
        t, spark, cols=("phash",), target_file_size=32 * 1024,
        merge_threshold=0.5)
    after = clustering.pruning_ratio(t, spark, "phash", lo, hi)
    # one extra (unpruned-width) run file per partition dilutes the
    # ratio by at most ~#partitions/#files; it must not collapse
    assert after["pruned_fraction"] >= before["pruned_fraction"] - 0.25
    assert after["pruned_fraction"] > 0.4


def test_maintenance_incremental_mode(spark, clustered_table):
    from mobility_lakehouse_project_spark.plans.maintenance import (
        run_maintenance,
    )

    t = clustered_table
    t.append(synth.images_df(spark, 60, id_offset=N, partitions=4), n_files=4)
    rep = run_maintenance(
        t, spark, target_file_size=1 << 20, cluster_curve="zorder",
        cluster_mode="incremental", keep_snapshots=3, orphan_grace_s=0.0)
    assert rep["cluster"]["mode"] in ("incremental", "noop")
    assert t.scan(spark).count() == N + 60
