"""Iceberg-v3-style initial column defaults and type widening — both
metadata-only commits resolved at scan time (the reference's DuckLake
tables get ALTER ADD COLUMN ... DEFAULT / type promotion the same way,
src/ingest_bronze.py:86-99)."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def defaults_table(spark, tmp_table_dir):
    v1 = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "id long, a string"
    )
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=2)
    t.add_columns({"tier": "string"}, defaults={"tier": "bronze"})
    return t


def test_initial_default_old_files_new_files(spark, defaults_table):
    """Rows from pre-column files read the default; a post-column file
    carries the physical column, so an explicit NULL stays NULL."""
    t = defaults_table
    v2 = spark.createDataFrame(
        [(100, "x", "gold"), (101, "y", None)], "id long, a string, tier string"
    )
    t.append(v2, n_files=1)
    rows = {r["id"]: r["tier"] for r in t.scan(spark).collect()}
    assert rows[3] == "bronze"      # old file -> initial default
    assert rows[100] == "gold"      # new file -> stored value
    assert rows[101] is None        # new file -> explicit NULL survives

def test_default_survives_rename_and_dies_with_drop(spark, defaults_table):
    t = defaults_table
    t.rename_column("tier", "grade")
    rows = {r["id"]: r["grade"] for r in t.scan(spark).collect()}
    assert rows[0] == "bronze"
    t.drop_column("grade")
    meta = t.load_metadata()
    assert meta.get("column_defaults", {}) == {}


def test_default_materialized_by_rewrite(spark, defaults_table):
    """Compaction reads through scan_files (defaults applied), so the
    rewritten files physically hold the value — correct even though
    their sequence is now newer than added_seq."""
    from mobility_lakehouse_project_spark.operators import compaction

    t = defaults_table
    compaction.compact(t, spark, target_file_size=1 << 20,
                       sort_col="id", key_col="id", n_chunks=1)
    rows = {r["id"]: r["tier"] for r in t.scan(spark).collect()}
    assert all(v == "bronze" for v in rows.values())


def test_default_validation(spark, defaults_table):
    with pytest.raises(ValueError, match="without adding it"):
        defaults_table.add_columns({"b": "int"}, defaults={"c": 1})
    with pytest.raises(ValueError, match="scalar"):
        defaults_table.add_columns({"b": "int"}, defaults={"b": [1]})


def test_widen_int_to_bigint_reads_old_files(spark, tmp_table_dir):
    v1 = spark.createDataFrame([(i, i * 10) for i in range(10)],
                               "id long, v int")
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=2)
    t.widen_column("v", "bigint")
    assert t.schema()["v"].dataType.simpleString() == "bigint"
    big = 5_000_000_000
    t.append(spark.createDataFrame([(100, big)], "id long, v bigint"),
             n_files=1)
    rows = {r["id"]: r["v"] for r in t.scan(spark).collect()}
    assert rows[3] == 30 and rows[100] == big
    # min/max skipping still sound across narrow+wide files
    got = t.scan(spark, int_ranges={"v": (big, big)}).collect()
    assert [r["id"] for r in got] == [100]


def test_widen_refusals(spark, tmp_table_dir):
    v1 = spark.createDataFrame([(1, 2)], "id long, v int")
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=1)
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("v", "string")
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("id", "int")      # narrowing
    with pytest.raises(ValueError, match="no column"):
        t.widen_column("zz", "bigint")


def test_widen_refused_on_bucket_partition_source(spark, tmp_table_dir):
    v1 = spark.createDataFrame([(i, i) for i in range(8)], "id long, v int")
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col="v",
                              partition_transform="bucket[4]")
    t.append(v1)
    with pytest.raises(ValueError, match="bucket"):
        t.widen_column("v", "bigint")


def test_widen_decimal_precision(spark, tmp_table_dir):
    v1 = spark.createDataFrame([(1,)], "id long").withColumn(
        "d", F.lit("1.25").cast("decimal(5,2)"))
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=1)
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("d", "decimal(5,3)")  # scale change refused
    t.widen_column("d", "decimal(12,2)")
    [r] = t.scan(spark).collect()
    assert str(r["d"]) == "1.25"


def test_widened_column_bloom_skipped_but_lookup_correct(spark, tmp_table_dir):
    """Old blooms hashed the narrow type — after widening they are
    invalidated (probe would false-negative); point lookups fall back
    to min/max and stay correct."""
    v1 = spark.createDataFrame([(i, i * 7) for i in range(64)],
                               "id long, v int")
    t = LakehouseTable.create(
        tmp_table_dir, v1.schema, partition_col=None,
        properties={"write.metadata.bloom-columns": "v"})
    t.append(v1, n_files=4)
    t.widen_column("v", "bigint")
    assert "v" in t.load_metadata()["bloom_invalid_cols"]
    # min/max file skipping still prunes; the residual row predicate is
    # the caller's (point_eq narrows the FILE set only)
    assert t.plan_files(spark, point_eq={"v": 21}).count() < 4
    got = (t.scan(spark, point_eq={"v": [21]})
           .filter(F.col("v") == 21).collect())
    assert [r["id"] for r in got] == [3]


def test_defaults_compose_with_mor_delete(spark, defaults_table):
    """Default resolution and the MOR anti-join share the scan path:
    deleting rows must not disturb the defaulted column on survivors."""
    from mobility_lakehouse_project_spark.operators import delete

    t = defaults_table
    delete.delete_where(t, spark, F.col("id") < 3, mode="mor")
    rows = {r["id"]: r["tier"] for r in t.scan(spark).collect()}
    assert set(rows) == set(range(3, 10))
    assert all(v == "bronze" for v in rows.values())


def test_merge_after_widen(spark, tmp_table_dir):
    from mobility_lakehouse_project_spark.operators import merge

    v1 = spark.createDataFrame([(i, i) for i in range(20)], "id long, v int")
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=2)
    t.widen_column("v", "bigint")
    big = 7_000_000_000
    src = spark.createDataFrame([(5, big), (100, big + 1)],
                                "id long, v bigint")
    merge.merge_into(t, spark, src, key="id", target_file_size=1 << 20)
    rows = {r["id"]: r["v"] for r in t.scan(spark).collect()}
    assert rows[5] == big and rows[100] == big + 1 and rows[6] == 6
    assert len(rows) == 21


def test_cluster_on_widened_column(spark, tmp_table_dir):
    """Range-normalized curve keys over a widened column: old narrow
    files and new wide files cluster together; stats pruning works on
    the combined value domain."""
    from mobility_lakehouse_project_spark.operators import clustering

    v1 = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 31)) for i in range(2000)],
        "id long, v int")
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=4)
    t.widen_column("v", "bigint")
    t.append(spark.createDataFrame(
        [(10_000 + i, (1 << 33) + i) for i in range(500)],
        "id long, v bigint"), n_files=2)
    clustering.cluster(t, spark, cols=("v",), target_file_size=1 << 12,
                       n_chunks=1)
    hi = 1 << 33
    kept = t.plan_files(spark, int_ranges={"v": (hi, hi + 10_000)}).count()
    total = t.plan_files(spark).count()
    assert 0 < kept < total
    got = (t.scan(spark, int_ranges={"v": (hi, hi + 10)})
           .filter((F.col("v") >= hi) & (F.col("v") <= hi + 10)).count())
    assert got == 11
