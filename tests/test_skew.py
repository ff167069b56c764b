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


def test_exact_slot_repartition_fails_fast_on_null_group(spark):
    """A null group token must raise (left join + assert_true), never
    silently drop the row — dropped rows in a rewrite = data loss."""
    from mobility_lakehouse_project_spark.tableformat.distribute import (
        exact_slot_repartition,
    )

    df = spark.range(10).select(
        F.when(F.col("id") < 9, F.col("id") % 2).alias("g"), "id"
    )  # id=9 -> g NULL
    shaped = exact_slot_repartition(spark, df, F.col("g"), 2)
    with pytest.raises(Exception):
        shaped.count()


def test_skewed_source_merge_no_hotspot_files(spark, tmp_table_dir):
    """MERGE with a source whose rows pile onto ONE hot partition: the
    salted-hash write distribution must spread the hot partition's
    rewrite across several output files (docstring contract of
    operators/merge.py)."""
    from mobility_lakehouse_project_spark.operators import merge

    # whole base table piled on ONE partition value — the extreme of the
    # hot-phash-bucket skew in FIXTURES.md F1
    base = synth.images_df(spark, 3000, partitions=8).withColumn("bucket", F.lit(3))
    t = LakehouseTable.create(tmp_table_dir, base.schema, partition_col="bucket")
    t.append(base, n_files=16)

    # source updates 600 existing rows of the hot partition
    src = synth.images_df(spark, 600, seed=43, partitions=4).withColumn(
        "bucket", F.lit(3)
    )
    m = merge.merge_into(t, spark, src, target_file_size=128 * 1024)
    assert m["files_written"] >= 3  # hot partition split across tasks
    sizes = sorted(
        e["file_size_bytes"] for e in t.all_entries() if e["partition_id"] == "3"
    )
    assert len(sizes) >= 3
    # no single hot-spot file dominating the partition
    assert sizes[-1] < 0.7 * sum(sizes)
    assert t.scan(spark).count() == 3000
