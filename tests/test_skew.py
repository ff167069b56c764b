"""Skew handling: hot phash values (FIXTURES.md F1 plants ~5% of rows
on 3 hot phashes -> hot buckets) must not produce hot-spot output
files or straggler groups — the deterministic salting of
distribute.partitioned_group_expr and the byte-proportional n_out of
plan_compaction are the mechanisms under test."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.distribute import (
    murmur3_long,
    partitioned_group_expr,
    slot_tokens,
)


def test_hot_buckets_split_across_groups(spark, tmp_table_dir):
    df = synth.images_df(spark, 4000, partitions=8)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=48)
    # verify the synthetic skew exists: hot buckets carry >5% more rows
    by_bucket = {r["bucket"]: r["count"] for r in df.groupBy("bucket").count().collect()}
    assert max(by_bucket.values()) > 1.2 * (sum(by_bucket.values()) / len(by_bucket))

    m = compaction.compact(t, spark, target_file_size=256 * 1024, n_chunks=1)
    sizes = [e["file_size_bytes"] for e in t.all_entries()]
    # no output file more than 3x the median -> hot partitions were
    # salted across groups instead of hot-spotting one file
    assert max(sizes) < 3 * float(np.median(sizes))
    assert t.scan(spark).count() == 4000


def test_partitioned_group_expr_balances(spark):
    expr, total, offsets = partitioned_group_expr(
        "bucket", "image_id", {"0": 3, "1": 1}
    )
    assert total == 4 and offsets == {"0": 0, "1": 3}
    df = synth.images_df(spark, 600, partitions=4).filter(F.col("bucket").isin(0, 1))
    got = df.select(expr.alias("g"), "bucket").groupBy("bucket", "g").count().collect()
    g0 = sorted(r["g"] for r in got if r["bucket"] == 0)
    g1 = sorted(r["g"] for r in got if r["bucket"] == 1)
    assert set(g0) <= {0, 1, 2} and set(g1) == {3}


def test_slot_tokens_distinct_slots():
    for n in (1, 7, 64, 257):
        toks = slot_tokens(None, n)
        slots = murmur3_long(np.array(toks, dtype=np.int64)) % n
        assert sorted(slots.tolist()) == list(range(n))
