"""scan_report: staged pre-flight pruning observability — what
fraction of the table (files / bytes / records) a predicate's scan
would touch, per pruning layer, computed metadata-only."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import clustering
from mobility_lakehouse_project_spark.operators.analyze import scan_report
from mobility_lakehouse_project_spark.sql import execute_sql
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, 2000, partitions=8)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=16)
    clustering.cluster(t, spark, curve="zorder", cols=("phash", "w", "h"),
                       target_file_size=24 * 1024, n_chunks=1)
    return t


def test_stages_are_monotone_and_exact(spark, table):
    rep = scan_report(table, spark, predicate="w = 16 AND bucket = 3",
                      partition_values={"3"})
    tot, cand = rep["total"], rep["candidates"]
    assert tot["files"] >= rep["after_partition"]["files"] >= \
        rep["after_stats"]["files"] >= cand["files"]
    assert rep["after_partition"]["files"] < tot["files"]  # 1 of 16 buckets
    assert 0 < rep["candidate_fraction_files"] < 1
    assert rep["candidate_fraction_bytes"] <= 1
    # the candidate set really covers the matching rows
    n = (table.scan(spark, int_ranges={"w": (16, 16)},
                    partition_values={"3"})
         .filter((F.col("w") == 16) & (F.col("bucket") == 3)).count())
    exact = table.scan(spark).filter(
        (F.col("w") == 16) & (F.col("bucket") == 3)).count()
    assert n == exact > 0


def test_predicate_only_form_derives_hints(spark, table):
    rep = scan_report(table, spark, predicate="phash BETWEEN 0 AND 100")
    assert rep["hints"]["int_ranges"].get("phash") == [0, 100]
    assert rep["after_stats"]["files"] <= rep["total"]["files"]
    assert rep["snapshot_id"] == table.current_snapshot().snapshot_id


def test_call_scan_report_sql(spark, table):
    out = execute_sql(
        spark, "CALL scan_report('t', predicate => 'w = 16')",
        tables={"t": table})
    assert out["operation"] == "call:scan_report"
    assert out["total"]["files"] > 0
    assert out["candidates"]["files"] <= out["total"]["files"]
