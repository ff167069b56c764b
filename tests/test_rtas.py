"""CREATE OR REPLACE TABLE AS (RTAS) and LakehouseTable.overwrite.

Reference analog: every gold table is rebuilt per DAG run with
CREATE OR REPLACE (/root/reference/src/sql/gold.sql) — here the
rebuild is ONE metadata-only replace commit with snapshot history
(time travel to the pre-replace content) preserved.
"""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators.delete import delete_where
from mobility_lakehouse_project_spark.sql import LakehouseSqlError, execute_sql
from mobility_lakehouse_project_spark.tableformat import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def test_overwrite_replaces_and_keeps_history(spark, cat):
    df = synth.images_df(spark, 120)
    cat.create_table_as("g.t", df, n_files=3)
    t = cat.load_table("g.t")
    pre = t.current_snapshot().snapshot_id
    new = synth.images_df(spark, 40, id_offset=1000)
    snap = t.overwrite(new, n_files=2)
    assert snap.operation == "replace" and snap.parent_id == pre
    assert t.scan(spark).count() == 40
    # pre-replace content stays time-travelable
    assert t.scan(spark, snapshot_id=pre).count() == 120
    # pending MOR deletes die with the replaced content: the new
    # snapshot carries no delete manifests and sees every new row
    delete_where(t, spark, "w = 16", mode="mor")
    t.overwrite(new)
    assert not t.current_snapshot().delete_manifests
    assert t.scan(spark).count() == 40


def test_rtas_sql_roundtrip(spark, cat):
    df = synth.images_df(spark, 100)
    cat.create_table_as("g.docs", df.select("image_id", "w", "fmt"),
                        n_files=2)
    out = execute_sql(
        spark,
        "CREATE OR REPLACE TABLE g.docs AS "
        "SELECT image_id, w, fmt FROM g_docs WHERE w = 16",
        catalog=cat)
    assert out["operation"] == "replace_table"
    t = cat.load_table("g.docs")
    got = t.scan(spark).count()
    assert got == out["rows"] == df.filter("w = 16").count()
    assert len(t.snapshots_list()) == 2  # history, not drop+create
    # absent table: OR REPLACE behaves as plain CTAS
    out = execute_sql(
        spark, "CREATE OR REPLACE TABLE g.fresh AS "
        "SELECT image_id FROM g_docs", catalog=cat)
    assert out["operation"] == "create_table"
    assert cat.load_table("g.fresh").scan(spark).count() == got


def test_rtas_guards(spark, cat):
    df = synth.images_df(spark, 50)
    cat.create_table_as("g.t", df.select("image_id", "w"), n_files=1)
    with pytest.raises(LakehouseSqlError, match="mutually exclusive"):
        execute_sql(spark, "CREATE OR REPLACE TABLE IF NOT EXISTS g.t AS "
                    "SELECT image_id, w FROM g_t", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="DROP TABLE first"):
        execute_sql(spark, "CREATE OR REPLACE TABLE g.t "
                    "(image_id string, w int)", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="conform"):
        execute_sql(spark, "CREATE OR REPLACE TABLE g.t AS "
                    "SELECT image_id FROM g_t", catalog=cat)
    # content untouched by the failed replaces
    assert cat.load_table("g.t").scan(spark).count() == 50


def test_show_create_table_round_trips(spark, cat, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("phash", T.LongType()),
    ])
    cat.create_table("b.img", schema, partition_col="w",
                     partition_transform="bucket[8]",
                     properties={"write.metadata.bloom-columns": "image_id"})
    stmt = execute_sql(spark, "SHOW CREATE TABLE b.img",
                       catalog=cat).collect()[0]["createtab_stmt"]
    assert "PARTITIONED BY (w)" in stmt and "bucket[8]" in stmt
    # the emitted DDL reproduces the table in a fresh catalog
    cat2 = Catalog(str(tmp_path / "wh2"))
    execute_sql(spark, stmt, catalog=cat2)
    t2 = cat2.load_table("b.img")
    assert t2.schema() == schema
    assert t2.load_metadata()["partition_col"] == "w"
    assert t2.partition_transform() == "bucket[8]"
    assert t2.properties()["write.metadata.bloom-columns"] == "image_id"
