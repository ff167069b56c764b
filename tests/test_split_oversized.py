"""split_oversized: the other half of Iceberg's rewriteDataFiles
contract — files larger than max-file-size are rewritten back to
target-sized files (a skewed writer's 20 GB file is otherwise the
unit of every CoW rewrite and stats range forever)."""

from pyspark.sql import functions as F

import pytest

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators.compaction import split_oversized
from mobility_lakehouse_project_spark.plans.maintenance import run_maintenance
from mobility_lakehouse_project_spark.sql import execute_sql
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def skewed(spark, tmp_table_dir):
    # one file per partition, each far above the tiny target
    df = synth.images_df(spark, 1200, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    return t


def _sizes(spark, t):
    return [int(r["file_size_bytes"]) for r in t.files(spark).collect()]


def test_split_rewrites_only_oversized(spark, skewed):
    t = skewed
    target = 24 * 1024
    mx = 3 * target
    big_before = [s for s in _sizes(spark, t) if s > mx]
    assert big_before, "fixture must contain oversized files"
    chk = t.scan(spark).agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(image_id, caption))").alias("h")).collect()[0]
    m = split_oversized(t, spark, target_file_size=target,
                        max_file_size=mx)
    assert m["files_in"] == len(big_before)
    assert m["files_out"] > m["files_in"]
    after = _sizes(spark, t)
    # no file remains above the max threshold (sizes are approximate
    # post-rewrite; allow compression variance against 2x target)
    assert max(after) <= mx
    chk2 = t.scan(spark).agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(image_id, caption))").alias("h")).collect()[0]
    assert (chk["n"], chk["h"]) == (chk2["n"], chk2["h"])
    # idempotent: nothing left to split
    m2 = split_oversized(t, spark, target_file_size=target,
                         max_file_size=mx)
    assert m2["files_in"] == 0


def test_split_validates_thresholds(spark, skewed):
    with pytest.raises(ValueError, match="must exceed"):
        split_oversized(skewed, spark, target_file_size=1 << 20,
                        max_file_size=1 << 20)


def test_call_split_oversized_sql(spark, skewed):
    out = execute_sql(
        spark,
        "CALL split_oversized('t', target_file_size => 24576)",
        tables={"t": skewed})
    assert out["operation"] == "call:split_oversized"
    assert out["files_out"] > out["files_in"] > 0


def test_maintenance_policy_split(spark, skewed):
    t = skewed
    # ~0.023 MB target, 0.05 MB max — policy-driven split in the sweep
    t.update_properties({"maintenance.target-file-size-mb": "0.023",
                         "maintenance.max-file-size-mb": "0.05"})
    rep = run_maintenance(t, spark, fold_deletes=False)
    assert "split_oversized" in rep
    assert rep["split_oversized"]["files_out"] > 0
