"""Partition spec evolution: change the partition column for future
writes without touching existing data (Iceberg partition evolution).
Old-spec files stop being partition-value-pruned (their partition ids
live in a different value domain) but stay stats-pruned; scans with
partition_values re-filter row-level so results are exact;
partition-KEYED ops refuse the mixed-spec table until
compaction.migrate_partitions rewrites old-spec files under the
current spec (Iceberg's rewrite_data_files migration path)."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 500


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=6)
    return t


def test_evolve_scan_stays_exact_and_prunes_new_spec(spark, table):
    t = table
    t.evolve_partition("fmt")
    assert t._partition_col() == "fmt"
    assert len(t.partition_specs()) == 2
    new = synth.images_df(spark, 100, seed=80, id_offset=10_000)
    t.append(new, n_files=3)
    assert t.scan(spark).count() == N + 100

    # exact partition_values scan across BOTH specs (row-level filter)
    expect_png = t.scan(spark).filter("fmt = 'png'").count()
    got = t.scan(spark, partition_values={"png"})
    assert got.count() == expect_png
    assert got.filter("fmt != 'png'").count() == 0

    # planning keeps every old-spec file but prunes new-spec files:
    # fewer planned files than total
    total = t.files(spark).count()
    planned = t.plan_files(spark, partition_values={"png"}).count()
    assert planned < total


def test_overwrite_partitions_refused_until_migrated(spark, table):
    t = table
    t.evolve_partition("fmt")
    day = synth.images_df(spark, 50, seed=81, id_offset=20_000)
    with pytest.raises(ValueError, match="evolved table"):
        t.overwrite_partitions(day, n_files=2)
    # partition-keyed rewrites refuse mixed-spec tables too: their
    # output-slot assignment would mis-map old-spec files
    with pytest.raises(ValueError, match="older partition spec"):
        compaction.compact(t, spark, target_file_size=1 << 20)

    # explicit migration rewrites every old-spec file under the
    # current spec...
    res = compaction.migrate_partitions(t, spark, target_file_size=1 << 20)
    assert res["files_migrated"] > 0
    cur_ids = t._current_spec_snapshot_ids(t.load_metadata())
    assert t.files(spark).filter(
        ~F.col("added_snapshot_id").isin(cur_ids)).count() == 0
    pre = t.scan(spark).count()
    assert pre == N
    # idempotent re-run is a no-op
    assert compaction.migrate_partitions(t, spark)["files_migrated"] == 0
    # ...after which partition-level overwrite is well-defined again
    snap = t.overwrite_partitions(day, n_files=2)
    assert snap is not None
    # partitions present in `day` were replaced wholesale by its rows
    day_fmts = {r["fmt"] for r in day.select("fmt").distinct().collect()}
    for fmt in day_fmts:
        assert t.scan(spark).filter(
            (F.col("fmt") == fmt) & ~F.col("image_id").startswith("img0000000200")
        ).count() == 0


def test_evolution_partition_dirs_follow_current_spec(spark, table):
    t = table
    t.evolve_partition("fmt")
    t.append(synth.images_df(spark, 60, seed=82, id_offset=30_000), n_files=2)
    # new files' partition ids are fmt values; old files' are bucket ints
    cur_ids = t._current_spec_snapshot_ids(t.load_metadata())
    parts_new = {
        r["partition_id"]
        for r in t.files(spark)
        .filter(F.col("added_snapshot_id").isin(cur_ids))
        .select("partition_id").distinct().collect()
    }
    assert parts_new <= {"jpeg", "png", "raw"}
    parts_old = {
        r["partition_id"]
        for r in t.files(spark)
        .filter(~F.col("added_snapshot_id").isin(cur_ids))
        .select("partition_id").distinct().collect()
    }
    assert all(p.isdigit() for p in parts_old)


def test_evolve_errors_and_rename_interplay(spark, table):
    t = table
    with pytest.raises(ValueError, match="unknown partition column"):
        t.evolve_partition("nope")
    with pytest.raises(ValueError, match="binary"):
        t.evolve_partition("bytes")
    t.evolve_partition("fmt")
    # renaming the partition column tracks through spec history
    t.rename_column("fmt", "format")
    assert t._partition_col() == "format"
    assert t.partition_specs()[-1]["col"] == "format"
    t.append(
        synth.images_df(spark, 20, seed=83, id_offset=40_000)
        .withColumnRenamed("fmt", "format"),
        n_files=1,
    )
    assert t.scan(spark).count() == N + 20
    # evolving back to the original column is a plain next spec
    t.evolve_partition("bucket")
    assert len(t.partition_specs()) == 3
