"""Metadata-only aggregates (Iceberg aggregate-pushdown analog).

``LakehouseTable.stats_aggregate`` answers COUNT(*)/MIN/MAX from
manifest stats alone — O(files) metadata, zero data reads — and the
SQL layer routes bare ``SELECT count(*)/min/max FROM <table>`` reads
through it.  Reference analog: the dashboard rollups the reference
runs as full-table DuckDB scans (/root/reference/src/sql/gold.sql).

Every test asserts the invariant that matters: fast-path answer ==
the real data-scan answer, and the fast path NEVER changes semantics
(anything metadata can't answer exactly falls back to the scan).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators.delete import delete_where
from mobility_lakehouse_project_spark.sql import execute_sql
from mobility_lakehouse_project_spark.tableformat import Catalog, LakehouseTable


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _table(spark, tmp_table_dir, rows=600, files=6):
    df = synth.images_df(spark, rows)
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=files)
    return t


def test_stats_aggregate_matches_scan(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    out = t.stats_aggregate(spark, ["phash", "w", "caption"])
    real = t.scan(spark).agg(
        F.count("*"), F.min("phash"), F.max("phash"),
        F.min("w"), F.max("w"), F.min("caption"), F.max("caption"),
    ).collect()[0]
    assert out["row_count"] == real[0]
    assert out["mins"]["phash"] == real[1]
    assert out["maxs"]["phash"] == real[2]
    assert out["mins"]["w"] == real[3]
    assert out["maxs"]["w"] == real[4]
    assert out["mins"]["caption"] == real[5]
    assert out["maxs"]["caption"] == real[6]


def test_stats_aggregate_empty_table(spark, tmp_table_dir):
    df = synth.images_df(spark, 10)
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    out = t.stats_aggregate(spark, ["phash"])
    assert out == {"row_count": 0, "mins": {"phash": None},
                   "maxs": {"phash": None}}


def test_stats_aggregate_refuses_inexact(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    # non-stat column type -> None
    assert t.stats_aggregate(spark, ["bytes"]) is None
    # unknown column -> hard error, not a silent fallback
    with pytest.raises(ValueError, match="no column"):
        t.stats_aggregate(spark, ["nope"])
    # live delete files make record_count/bounds overstatements -> None
    lo = t.scan(spark).agg(F.min("phash")).collect()[0][0]
    delete_where(t, spark, f"phash = {lo}", mode="mor")
    assert t.stats_aggregate(spark, []) is None
    assert t.stats_aggregate(spark, ["phash"]) is None


def test_stats_aggregate_null_only_file_falls_back(spark, tmp_table_dir):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=1)
    t.append(spark.createDataFrame([(3, None), (4, None)],
                                   "id long, s string"), n_files=1)
    # the all-NULL file has no stats entry for s: indistinguishable
    # from poisoned stats, so min/max on s must fall back...
    assert t.stats_aggregate(spark, ["s"]) is None
    # ...while count and covered columns still answer
    out = t.stats_aggregate(spark, ["id"])
    assert out["row_count"] == 4
    assert (out["mins"]["id"], out["maxs"]["id"]) == (1, 4)


def test_sql_fast_path_no_data_scan(spark, cat, monkeypatch):
    cat.create_table_as("silver.images", synth.images_df(spark, 500),
                        n_files=5)
    t = cat.load_table("silver.images")
    expect = t.scan(spark).agg(
        F.count("*").alias("n"), F.min("phash").alias("lo"),
        F.max("phash").alias("hi")).collect()[0]
    # the fast path must never open a data scan: poison scan()
    monkeypatch.setattr(
        LakehouseTable, "scan",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("data scan")))
    got = execute_sql(
        spark,
        "SELECT count(*) AS n, min(phash) AS lo, max(phash) AS hi "
        "FROM silver_images", catalog=cat).collect()[0]
    assert tuple(got) == tuple(expect)


def test_sql_fast_path_default_names_match_spark(spark, cat):
    cat.create_table_as("silver.images", synth.images_df(spark, 200),
                        n_files=2)
    fast = execute_sql(spark, "SELECT count(*), min(w), max(caption) "
                       "FROM silver_images", catalog=cat)
    # same statement forced down the generic read path (WHERE true
    # defeats the shape match) must produce identical names AND values
    slow = execute_sql(spark, "SELECT count(*), min(w), max(caption) "
                       "FROM silver_images WHERE true", catalog=cat)
    assert fast.columns == slow.columns
    assert fast.collect() == slow.collect()
    assert [f.dataType for f in fast.schema.fields] == \
           [f.dataType for f in slow.schema.fields]


def test_sql_fast_path_falls_back_after_mor_delete(spark, cat):
    cat.create_table_as("silver.images", synth.images_df(spark, 300),
                        n_files=3)
    t = cat.load_table("silver.images")
    lo = t.scan(spark).agg(F.min("phash")).collect()[0][0]
    delete_where(t, spark, f"phash = {lo}", mode="mor")
    got = execute_sql(spark, "SELECT count(*) AS n, min(phash) AS lo "
                      "FROM silver_images", catalog=cat).collect()[0]
    real = t.scan(spark).agg(F.count("*"), F.min("phash")).collect()[0]
    assert tuple(got) == tuple(real)
    assert got["lo"] != lo  # the deleted row's value is truly gone


def test_sql_fast_path_tables_dict_and_date(spark, tmp_table_dir):
    df = spark.createDataFrame(
        [(i, datetime.date(2024, 1, 1 + i % 28)) for i in range(100)],
        "id long, dt date")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=3)
    got = execute_sql(
        spark, "SELECT count(*) AS n, min(dt) AS d0, max(dt) AS d1 FROM ev",
        tables={"ev": t}).collect()[0]
    assert (got["n"], got["d0"], got["d1"]) == (
        100, datetime.date(2024, 1, 1), datetime.date(2024, 1, 28))
    assert got["d0"].__class__ is datetime.date


def test_partition_scoped_fast_path(spark, cat, monkeypatch):
    df = synth.images_df(spark, 400)
    cat.create_table_as("silver.images", df, n_files=4,
                        partition_col="fmt")
    t = cat.load_table("silver.images")
    expect = (df.filter(F.col("fmt") == "png")
              .agg(F.count("*").alias("n"), F.min("phash").alias("lo"))
              .collect()[0])
    direct = t.stats_aggregate(spark, ["phash"],
                               partition_eq=("fmt", "png"))
    assert direct["row_count"] == expect["n"]
    assert direct["mins"]["phash"] == expect["lo"]
    monkeypatch.setattr(
        LakehouseTable, "scan",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("data scan")))
    got = execute_sql(
        spark, "SELECT count(*) AS n, min(phash) AS lo FROM silver_images "
        "WHERE fmt = 'png'", catalog=cat).collect()[0]
    assert tuple(got) == tuple(expect)


def test_partition_scoped_guards(spark, cat):
    df = synth.images_df(spark, 200)
    cat.create_table_as("silver.images", df, n_files=2,
                        partition_col="fmt")
    t = cat.load_table("silver.images")
    # non-partition column / NULL / unpartitioned -> None, and the SQL
    # layer answers through the generic scan instead
    assert t.stats_aggregate(spark, [], partition_eq=("w", 16)) is None
    assert t.stats_aggregate(spark, [], partition_eq=("fmt", None)) is None
    got = execute_sql(spark, "SELECT count(*) AS n FROM silver_images "
                      "WHERE w = 16", catalog=cat).collect()[0]
    want = df.filter("w = 16").count()
    assert got["n"] == want
    # hidden-partitioning transform: value-domain mismatch -> fallback
    cat.create_table_as("silver.byw", df, n_files=2, partition_col="w",
                        partition_transform="bucket[4]")
    tb = cat.load_table("silver.byw")
    assert tb.stats_aggregate(spark, [], partition_eq=("w", 16)) is None
    got = execute_sql(spark, "SELECT count(*) AS n FROM silver_byw "
                      "WHERE w = 16", catalog=cat).collect()[0]
    assert got["n"] == want


def test_sql_fast_path_shape_guards(spark, cat):
    cat.create_table_as("silver.images", synth.images_df(spark, 100),
                        n_files=1)
    # GROUP BY / WHERE / expressions / joins keep the generic path
    out = execute_sql(spark, "SELECT fmt, count(*) AS n FROM silver_images "
                      "GROUP BY fmt", catalog=cat)
    assert out.count() >= 1
    out = execute_sql(spark, "SELECT count(*) + 1 AS n FROM silver_images",
                      catalog=cat).collect()[0]
    assert out["n"] == 101
