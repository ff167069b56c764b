"""OPTIMIZE ... WHERE: partition-scoped maintenance from SQL (the
Delta idiom). The predicate compiles through derive_hints to manifest
pruning; only partitions holding candidate files are rewritten — at
10^12 rows an OPTIMIZE after a one-partition ingest must not touch the
other 99.9% of the table."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.sql import LakehouseSqlError, execute_sql
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, 800, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=16)
    t.append(synth.images_df(spark, 400, id_offset=800, partitions=4),
             n_files=16)
    return t


def test_optimize_where_scopes_to_matching_partitions(spark, table):
    files_before = {
        r["partition_id"]: r["cnt"]
        for r in table.files(spark).groupBy("partition_id")
        .agg(F.count("*").alias("cnt")).collect()
    }
    out = execute_sql(
        spark, "OPTIMIZE t WHERE bucket = 3 "
               "OPTIONS(target_file_size = 1073741824)",
        tables={"t": table})
    assert out["operation"] == "optimize_compact"
    assert out["partitions"] == ["3"]
    files_after = {
        r["partition_id"]: r["cnt"]
        for r in table.files(spark).groupBy("partition_id")
        .agg(F.count("*").alias("cnt")).collect()
    }
    # partition 3 compacted to fewer files; every other partition's
    # file set untouched
    assert files_after["3"] < files_before["3"]
    for p, n in files_before.items():
        if p != "3":
            assert files_after[p] == n


def test_optimize_where_zorder_scopes(spark, table):
    out = execute_sql(
        spark, "OPTIMIZE t ZORDER BY (phash, w) WHERE bucket = 2 "
               "OPTIONS(n_chunks = 1)",
        tables={"t": table})
    assert out["operation"] == "optimize_cluster"
    assert out["partitions"] == ["2"]
    assert out["files_in"] > 0


def test_optimize_where_no_match_is_noop(spark, table):
    nsnaps = len(table.snapshots_list())
    out = execute_sql(spark, "OPTIMIZE t WHERE bucket = 99",
                      tables={"t": table})
    assert out["operation"] == "optimize_noop"
    assert len(table.snapshots_list()) == nsnaps


def test_optimize_where_underivable_predicate_rejected(spark, table):
    with pytest.raises(LakehouseSqlError, match="no derivable"):
        execute_sql(spark, "OPTIMIZE t WHERE length(caption) > 3",
                    tables={"t": table})
