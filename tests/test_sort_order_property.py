"""`write.sort-order` table property: declare the clustering layout
once on the table; cluster()/cluster_incremental()/run_maintenance()
adopt it when no explicit columns are given (Iceberg's table sort
order — the reference re-states its ORDER BY in every DAG,
dags/Silver_Transform_Dag.py; a declared order keeps every
maintenance pass consistent)."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators import clustering
from mobility_lakehouse_project_spark.plans.maintenance import run_maintenance
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import SORT_ORDER_PROP


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = spark.createDataFrame(
        [(i, (i * 2654435761) % 4096, 16 + i % 112, 16 + (i * 7) % 112)
         for i in range(4000)],
        "image_id long, phash long, w long, h long",
    )
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=8)
    return t


def test_parse_and_validation(table):
    table.update_properties({SORT_ORDER_PROP: "hilbert(phash, w)"})
    assert table.sort_order() == ("hilbert", ("phash", "w"))
    table.update_properties({SORT_ORDER_PROP: "sort(phash)"})
    assert table.sort_order() == ("zorder", ("phash",))  # degenerate
    for bad in ["zorder()", "morton(a,b)", "sort(a,b)", "zorder(nope)"]:
        table.update_properties({SORT_ORDER_PROP: bad})
        with pytest.raises(ValueError):
            table.sort_order()
    table.update_properties({SORT_ORDER_PROP: None})
    assert table.sort_order() is None


def test_cluster_adopts_declared_order(spark, table):
    table.update_properties({SORT_ORDER_PROP: "hilbert(phash,w)"})
    clustering.cluster(table, spark, target_file_size=1 << 20, n_chunks=1)
    sm = table.current_snapshot().summary
    assert sm["op"] == "cluster-hilbert"
    assert sm["cluster_cols"] == "phash,w"


def test_explicit_cols_override_property(spark, table):
    table.update_properties({SORT_ORDER_PROP: "hilbert(phash,w)"})
    clustering.cluster(table, spark, curve="zorder", cols=("phash",),
                       target_file_size=1 << 20, n_chunks=1)
    sm = table.current_snapshot().summary
    assert sm["op"] == "cluster-zorder"
    assert sm["cluster_cols"] == "phash"


def test_maintenance_restores_declared_layout(spark, table):
    table.update_properties({SORT_ORDER_PROP: "zorder(phash,w,h)"})
    rep = run_maintenance(table, spark, target_file_size=1 << 20,
                          keep_snapshots=5)
    assert rep["cluster"]["files_out"] > 0
    ops = [s.summary.get("op") for s in table.snapshots_list()]
    assert "cluster-zorder" in ops


def test_maintenance_curve_table_requires_property(spark, table):
    with pytest.raises(ValueError, match="write.sort-order"):
        run_maintenance(table, spark, cluster_curve="table")


def test_maintenance_without_property_skips_cluster(spark, table):
    rep = run_maintenance(table, spark, target_file_size=1 << 20,
                          keep_snapshots=2)
    assert "cluster" not in rep


def test_rename_rewrites_property_drop_clears_it(spark, table):
    table.update_properties({SORT_ORDER_PROP: "zorder(phash,w,h)"})
    table.rename_column("w", "width")
    assert table.sort_order() == ("zorder", ("phash", "width", "h"))
    table.add_columns({"extra": "long"})
    table.update_properties({SORT_ORDER_PROP: "sort(extra)"})
    table.drop_column("extra")
    assert table.sort_order() is None
