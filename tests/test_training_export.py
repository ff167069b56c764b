"""Training-export operators: deterministic shard packing, aspect
bucket batch assembly, and the physical shard writer.

The load-bearing equivalences:
  * two-phase distributed prefix sum == the naive single-window global
    form (which Spark plans as a single-partition Exchange — the form
    the operator exists to avoid);
  * assignments are pure functions of (id, seed): independent of input
    partitioning and stable across re-runs;
  * the physical writer produces exactly one sorted file per shard and
    resumes by skipping completed shards.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators.training_export import (
    KEY_COL,
    aspect_bucket,
    assign_shards,
    pack_batches,
    shuffle_key,
    write_shards,
)

pytestmark = pytest.mark.usefixtures("spark")


def _corpus(spark, n=400, parts=7):
    """Deterministic (id, weight) corpus with skewed weights."""
    return (
        spark.range(n).repartition(parts)
        .select(
            F.concat(F.lit("doc"), F.lpad(F.col("id").cast("string"), 6, "0")
                     ).alias("doc_id"),
            (F.pmod(F.col("id") * 2654435761, F.lit(9000)) + 100
             ).alias("nbytes"),
        )
    )


def test_assign_shards_matches_global_window(spark):
    df = _corpus(spark)
    got = assign_shards(df, "doc_id", "nbytes", target_bytes=50_000, seed=7)
    # naive single-window oracle (fine at test scale)
    naive = (
        df.withColumn(KEY_COL, shuffle_key("doc_id", 7))
        .withColumn(
            "_cum",
            F.coalesce(
                F.sum("nbytes").over(
                    Window.orderBy(KEY_COL, "doc_id")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("shard_id", F.expr("_cum div 50000"))
        .select("doc_id", "shard_id")
    )
    g = {r["doc_id"]: r["shard_id"] for r in got.select("doc_id", "shard_id").collect()}
    n = {r["doc_id"]: r["shard_id"] for r in naive.collect()}
    assert g == n
    # dense 0..n-1 shards, nondecreasing in key order
    sids = sorted(set(g.values()))
    assert sids == list(range(len(sids)))
    ordered = got.select(KEY_COL, "shard_id").orderBy(KEY_COL).collect()
    for a, b in zip(ordered, ordered[1:]):
        assert a["shard_id"] <= b["shard_id"]


def test_assign_shards_partitioning_invariant(spark):
    df = _corpus(spark)
    a = assign_shards(df, "doc_id", "nbytes", 30_000, seed=3)
    b = assign_shards(df.repartition(31, "nbytes"), "doc_id", "nbytes",
                      30_000, seed=3)
    assert {(r["doc_id"], r["shard_id"]) for r in a.select("doc_id", "shard_id").collect()} \
        == {(r["doc_id"], r["shard_id"]) for r in b.select("doc_id", "shard_id").collect()}


def test_assign_shards_no_single_partition_exchange_over_data(spark):
    """The data-row stages must never plan Exchange SinglePartition;
    only the 16^k-row metadata offsets relation may."""
    df = _corpus(spark)
    plan = assign_shards(df, "doc_id", "nbytes", 50_000)._jdf \
        .queryExecution().executedPlan().toString()
    # the single-partition exchange exists only over the tiny
    # per-prefix-bucket aggregate (16^k rows by construction): its
    # child must be the Aggregate keyed on _prefix_bucket
    for frag in plan.split("Exchange SinglePartition")[1:]:
        child = frag.split("\n", 2)[-1][:400]
        assert "keys=[_prefix_bucket" in child, (
            "SinglePartition exchange over a non-metadata relation:\n" + plan
        )


def test_shard_byte_bounds(spark):
    """Every shard except possibly the last spans a target boundary:
    its bytes + the first item of the next shard exceed target."""
    df = _corpus(spark)
    target = 40_000
    got = assign_shards(df, "doc_id", "nbytes", target, seed=1)
    per = (got.groupBy("shard_id").agg(F.sum("nbytes").alias("b"))
           .orderBy("shard_id").collect())
    # greedy cumsum: every non-final shard's bytes land within
    # (target - max_item, target + max_item)
    max_item = df.agg(F.max("nbytes")).collect()[0][0]
    for r in per[:-1]:
        assert target - max_item < r["b"] < target + max_item
    assert sum(r["b"] for r in per) == df.agg(F.sum("nbytes")).collect()[0][0]
    assert got.count() == df.count()


def test_pack_batches_matches_global_window_and_drops_partial(spark):
    imgs = (
        spark.range(500).repartition(9)
        .select(
            F.concat(F.lit("img"), F.col("id").cast("string")).alias("image_id"),
            (64 + F.pmod(F.col("id") * 7, F.lit(8)) * 32).alias("w"),
            (64 + F.pmod(F.col("id") * 13, F.lit(8)) * 32).alias("h"),
        )
        .withColumn("bucket", aspect_bucket("w", "h"))
    )
    bs = 16
    got = pack_batches(imgs, "image_id", "bucket", bs, seed=5)
    naive = (
        imgs.withColumn(KEY_COL, shuffle_key("image_id", 5, tag="batch"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy(KEY_COL, "image_id")) - 1,
        )
        .withColumn("batch_id", F.expr(f"_rn div {bs}"))
        .withColumn("slot_in_batch", F.pmod("_rn", F.lit(bs)))
    )
    tot = naive.groupBy("bucket").agg(F.count("*").alias("n"))
    naive_full = naive.join(tot, "bucket").filter(
        F.col("_rn") < F.expr(f"(n div {bs}) * {bs}"))
    g = {(r["image_id"], r["bucket"], r["batch_id"], r["slot_in_batch"])
         for r in got.select("image_id", "bucket", "batch_id",
                             "slot_in_batch").collect()}
    n = {(r["image_id"], r["bucket"], r["batch_id"], r["slot_in_batch"])
         for r in naive_full.select("image_id", "bucket", "batch_id",
                                    "slot_in_batch").collect()}
    assert g == n and g
    # every surviving batch is exactly full with slots 0..bs-1
    per = got.groupBy("bucket", "batch_id").agg(
        F.count("*").alias("n"), F.min("slot_in_batch").alias("lo"),
        F.max("slot_in_batch").alias("hi")).collect()
    assert all(r["n"] == bs and r["lo"] == 0 and r["hi"] == bs - 1 for r in per)
    # dropped = per-bucket remainder
    kept = got.count()
    totals = {r["bucket"]: r["n"] for r in tot.collect()}
    assert kept == sum((t // bs) * bs for t in totals.values())


def test_aspect_bucket_snap_exact(spark):
    rows = spark.createDataFrame(
        [(64, 128), (96, 128), (128, 128), (128, 96), (256, 128),
         (64, 288), (288, 64), (100, 100), (140, 100)],
        "w int, h int",
    ).withColumn("b", aspect_bucket("w", "h")).collect()
    got = {(r["w"], r["h"]): r["b"] for r in rows}
    assert got == {
        (64, 128): "1:2", (96, 128): "3:4", (128, 128): "1:1",
        (128, 96): "4:3", (256, 128): "2:1", (64, 288): "1:2",
        (288, 64): "2:1", (100, 100): "1:1",
        # 1.4^2 = 1.96 < 8/3 -> nearest is 4:3
        (140, 100): "4:3",
    }


def test_write_shards_one_sorted_file_per_shard_and_resume(spark, tmp_path):
    df = _corpus(spark, n=300)
    out = str(tmp_path / "shards")
    res = write_shards(spark, df, "doc_id", "nbytes", out,
                       target_bytes=60_000, seed=9)
    assert res["written"] == res["n_shards"] > 1 and res["skipped"] == 0
    # one data file per shard dir, rows sorted by shuffle key
    for name in sorted(os.listdir(out)):
        if not name.startswith("shard_id="):
            continue
        files = [f for f in os.listdir(os.path.join(out, name))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (name, files)
        keys = [r[KEY_COL] for r in spark.read.parquet(
            os.path.join(out, name, files[0])).select(KEY_COL).collect()]
        assert keys == sorted(keys)
    # round trip: union of shards == corpus
    back = spark.read.parquet(out)
    assert back.count() == 300
    assert {r["doc_id"] for r in back.select("doc_id").collect()} \
        == {r["doc_id"] for r in df.select("doc_id").collect()}
    # manifest agrees with the files
    man = spark.read.parquet(os.path.join(out, "_manifest"))
    per = {r["shard_id"]: r["n_samples"] for r in man.collect()}
    on_disk = {r["shard_id"]: r["n"] for r in
               back.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
    assert per == on_disk
    # resume: delete one shard's _DONE marker + data, re-run -> only it rewrites
    victim = sorted(per)[0]
    vdir = os.path.join(out, f"shard_id={victim}")
    for f in os.listdir(vdir):
        os.remove(os.path.join(vdir, f))
    res2 = write_shards(spark, df, "doc_id", "nbytes", out,
                        target_bytes=60_000, seed=9)
    assert res2["written"] == 1 and res2["skipped"] == res["n_shards"] - 1
    assert spark.read.parquet(out).count() == 300
