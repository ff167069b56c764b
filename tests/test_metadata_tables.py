"""Inspection (metadata) tables: partitions / history / refs +
register_metadata.

The reference exposes table state to its dashboards by querying DuckDB
catalog/information tables (dags/Queries_dag.py); Iceberg exposes it as
`table$partitions` / `table$history` / `table$refs`. These tests pin
the Spark-native equivalents: every inspection table is computed from
manifests only (no data read), and `partitions_df` is a single
distributed aggregation — at 10^12-image scale it must roll up
millions of manifest rows without a driver materialization.
"""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import delete
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 600


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=8)
    return t


def test_partitions_df_rolls_up_files(spark, table):
    t = table
    parts = {r["partition_id"]: r for r in t.partitions_df(spark).collect()}
    files = t.files(spark).groupBy("partition_id").agg(
        F.count("*").alias("fc"), F.sum("record_count").alias("rc"),
        F.sum("file_size_bytes").alias("sz"),
    ).collect()
    n_buckets = t.files(spark).select("partition_id").distinct().count()
    assert len(parts) == n_buckets
    for r in files:
        p = parts[r["partition_id"]]
        assert p["file_count"] == r["fc"]
        assert p["record_count"] == r["rc"]
        assert p["total_size_bytes"] == r["sz"]
        assert p["position_delete_count"] == 0
        assert p["live_record_count"] == r["rc"]
    assert sum(p["record_count"] for p in parts.values()) == N


def test_partitions_df_attributes_mor_deletes(spark, table):
    t = table
    res = delete.delete_where(t, spark, "w = 16", mode="mor")
    assert res["rows_deleted"] > 0
    parts = t.partitions_df(spark).collect()
    assert sum(p["position_delete_count"] for p in parts) == res["rows_deleted"]
    # live counts equal what a MOR scan actually sees, per partition
    seen = {
        r["bucket"]: r["n"]
        for r in t.scan(spark).groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    for p in parts:
        assert p["live_record_count"] == seen.get(int(p["partition_id"]), 0)
    # time travel: the pre-delete snapshot still reports zero deletes
    first = t.snapshots_list()[0].snapshot_id
    pre = t.partitions_df(spark, snapshot_id=first).collect()
    assert all(p["position_delete_count"] == 0 for p in pre)


def test_history_df_marks_rollback_strands(spark, table):
    t = table
    df2 = synth.images_df(spark, 50, partitions=2, seed=7)
    t.append(df2, n_files=2)
    stranded = t.current_snapshot().snapshot_id
    first = t.snapshots_list()[0].snapshot_id
    t.rollback_to(first)
    hist = {r["snapshot_id"]: r for r in t.history_df(spark).collect()}
    # rollback commits a new head whose parent is `first`
    assert hist[first]["is_current_ancestor"] is True
    assert hist[stranded]["is_current_ancestor"] is False
    cur = t.current_snapshot().snapshot_id
    assert hist[cur]["is_current_ancestor"] is True
    assert hist[stranded]["operation"] == "append"


def test_refs_df_lists_main_branches_tags(spark, table):
    t = table
    head = t.current_snapshot().snapshot_id
    t.create_tag("v1")
    t.create_branch("audit")
    refs = {(r["name"], r["type"]): r["snapshot_id"]
            for r in t.refs_df(spark).collect()}
    assert refs[("main", "branch")] == head
    assert refs[("v1", "tag")] == head
    assert refs[("audit", "branch")] == head


def test_register_metadata_sql_surface(spark, table):
    t = table
    t.create_tag("published")
    t.register_metadata(spark, "img")
    n_parts = spark.sql(
        "SELECT count(*) AS c FROM img_partitions"
    ).collect()[0]["c"]
    assert n_parts == t.files(spark).select("partition_id").distinct().count()
    total = spark.sql(
        "SELECT sum(record_count) AS r FROM img_files"
    ).collect()[0]["r"]
    assert total == N
    assert spark.sql(
        "SELECT count(*) AS c FROM img_refs WHERE type = 'tag'"
    ).collect()[0]["c"] == 1
    assert spark.sql(
        "SELECT count(*) AS c FROM img_history WHERE is_current_ancestor"
    ).collect()[0]["c"] >= 1
    assert spark.sql(
        "SELECT count(*) AS c FROM img_snapshots"
    ).collect()[0]["c"] == len(t.snapshots_list())
    assert spark.sql(
        "SELECT count(*) AS c FROM img_manifests"
    ).collect()[0]["c"] >= 1


def test_stats_df_exposes_persisted_analyze(spark, table):
    """`<t>_stats` inspection view: ANALYZE's persisted NDV/null-count
    statistics queryable via SQL like every other metadata table —
    empty (stable schema) before analysis, one row per analyzed
    (snapshot, column) after."""
    from mobility_lakehouse_project_spark.operators.analyze import analyze_table
    from mobility_lakehouse_project_spark.sql import execute_sql

    t = table
    assert t.stats_df(spark).count() == 0
    st = analyze_table(t, spark, columns=["image_id", "w"])
    rows = {r["column"]: r for r in t.stats_df(spark).collect()}
    assert set(rows) == {"image_id", "w"}
    assert rows["image_id"]["row_count"] == st["row_count"]
    assert rows["image_id"]["ndv"] == st["columns"]["image_id"]["ndv"]
    # SQL surface: the _stats suffix registers on demand
    df = execute_sql(
        spark,
        "SELECT column, ndv FROM t_stats WHERE snapshot_id = :sid "
        "ORDER BY column",
        tables={"t": t}, args={"sid": st["snapshot_id"]},
    )
    got = {r["column"]: r["ndv"] for r in df.collect()}
    assert got == {c: st["columns"][c]["ndv"] for c in ("image_id", "w")}
