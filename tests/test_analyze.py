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
