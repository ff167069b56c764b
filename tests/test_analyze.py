"""ANALYZE TABLE statistics (operators/analyze.py)."""

import pytest

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import analyze, delete
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 400


def test_analyze_ndv_nulls_and_retrieval(spark, tmp_table_dir):
    from pyspark.sql import functions as F

    df = synth.images_df(spark, N, partitions=2).withColumn(
        "caption", F.when(F.col("phash") % 4 == 0, None)
        .otherwise(F.col("caption"))
    )
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    n_null = t.scan(spark).filter("caption IS NULL").count()

    stats = analyze.analyze_table(t, spark)
    assert stats["row_count"] == N
    assert "bytes" not in stats["columns"]  # binary skipped
    assert stats["columns"]["caption"]["null_count"] == n_null
    # image_id is unique: HLL estimate within ~3x rsd of exact
    ndv = stats["columns"]["image_id"]["ndv"]
    assert abs(ndv - N) / N < 0.06
    # w has 4 distinct values — small-cardinality NDV is exact
    assert stats["columns"]["w"]["ndv"] == 4

    # retrieval: exact snapshot and newest-applicable
    got = analyze.read_statistics(t, stats["snapshot_id"])
    assert got == stats
    assert analyze.read_statistics(t)["snapshot_id"] == stats["snapshot_id"]

    # stats respect MOR deletes at analyze time
    delete.delete_where(t, spark, "w = 16", mode="mor")
    stats2 = analyze.analyze_table(t, spark)
    assert stats2["row_count"] == t.scan(spark).count() < N
    # newest-applicable now resolves to the re-analyzed snapshot
    assert analyze.read_statistics(t)["snapshot_id"] == stats2["snapshot_id"]


def test_analyze_errors(spark, tmp_table_dir):
    df = synth.images_df(spark, 10, partitions=1)
    t = LakehouseTable.create(tmp_table_dir + "-e", df.schema,
                              partition_col="bucket")
    with pytest.raises(ValueError, match="empty table"):
        analyze.analyze_table(t, spark)
    t.append(df, n_files=1)
    with pytest.raises(ValueError, match="unknown columns"):
        analyze.analyze_table(t, spark, columns=["nope"])
    assert analyze.read_statistics(t) is None


# ------------- partition statistics files (Iceberg partition stats) -------------


def test_compute_partition_stats_caches_exact_snapshot(spark, tmp_path):
    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.operators import delete
    from mobility_lakehouse_project_spark.operators.analyze import (
        compute_partition_stats,
    )
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    df = synth.images_df(spark, 400, partitions=3)
    t = LakehouseTable.create(str(tmp_path / "ps"), df.schema,
                              partition_col="bucket")
    t.append(df, n_files=6)
    # MOR deletes make live_record_count differ from record_count —
    # the stats file must capture the MOR-aware rollup
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="dv")
    live = t.partitions_df(spark, use_cached=False).collect()

    n_parts = len({r["partition_id"] for r in live})
    out = compute_partition_stats(t, spark)
    assert out["partitions"] == n_parts
    # the cached read returns the identical rollup
    cached = t.partitions_df(spark).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["partition_id"], r["file_count"], r["record_count"],
         r["position_delete_count"], r["live_record_count"]) for r in rows)
    assert key(cached) == key(live)
    assert sum(r["record_count"] - r["live_record_count"]
               for r in cached) == n16
    # a NEW snapshot invalidates the exact-match cache: the live path
    # must run (and see the appended rows)
    t.append(synth.images_df(spark, 40, seed=9, id_offset=5000), n_files=1)
    fresh = t.partitions_df(spark).collect()
    assert sum(r["record_count"] for r in fresh) == 440
    # the old snapshot's stats stay addressable
    old_rows = t.partitions_df(
        spark, snapshot_id=out["snapshot"]).collect()
    assert key(old_rows) == key(live)


def test_partition_stats_via_sql_call_and_show(spark, tmp_path):
    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.sql import execute_sql
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    df = synth.images_df(spark, 200, partitions=2)
    t = LakehouseTable.create(str(tmp_path / "ps2"), df.schema,
                              partition_col="bucket")
    t.append(df, n_files=4)
    out = execute_sql(spark, "CALL compute_partition_stats('t')",
                      tables={"t": t})
    assert out["partitions"] >= 2
    rows = execute_sql(spark, "SHOW PARTITIONS t", tables={"t": t}).collect()
    assert sum(r["record_count"] for r in rows) == 200


def test_expiry_prunes_snapshot_addressed_stats(spark, tmp_path):
    """Statistics and partition-statistics registries are snapshot-
    addressed; expiring the snapshot must prune the registry entry and
    GC the stats file (a stats-per-commit table would otherwise leak
    one metadata entry + one file per snapshot forever)."""
    import os

    df = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(str(tmp_path / "gc"), df.schema,
                              partition_col="bucket")
    t.append(df, n_files=2)
    s1 = analyze.analyze_table(t, spark)
    p1 = analyze.compute_partition_stats(t, spark)
    t.append(synth.images_df(spark, 30, seed=5, id_offset=9000), n_files=1)
    s2 = analyze.analyze_table(t, spark)
    p2 = analyze.compute_partition_stats(t, spark)

    old_files = [f"stats-{s1['snapshot_id']}.json", p1["file"]]
    for f in old_files:
        assert os.path.exists(os.path.join(t.meta_dir, f))
    out = t.expire_snapshots(keep_last=1)
    assert out["expired"] >= 1
    meta = t.load_metadata()
    assert list(meta.get("statistics", {})) == [str(s2["snapshot_id"])]
    assert list(meta.get("partition_statistics", {})) == [str(p2["snapshot"])]
    for f in old_files:
        assert not os.path.exists(os.path.join(t.meta_dir, f))
    # the surviving snapshot's stats files remain readable
    assert analyze.read_statistics(t)["snapshot_id"] == s2["snapshot_id"]
    assert t.partitions_df(spark).count() >= 1
