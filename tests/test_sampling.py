"""Weighted corpus mixing: determinism, exact epoch arithmetic,
partitioning independence."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators.sampling import (
    FRAC_GRID, mix_weighted, weight_plan)


def docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), F.lit(4))).cast("string").alias("dom"),
        (F.col("id") * 3 + 7).alias("n_chars"),
    )


def test_weight_plan_quantizes_exactly():
    rows, default = weight_plan({"a": 2.5, "b": 0.25, "c": 3.0}, 1.0)
    assert rows == [("a", 2, FRAC_GRID // 2), ("b", 0, FRAC_GRID // 4),
                    ("c", 3, 0)]
    assert default == (1, 0)
    with pytest.raises(ValueError, match="negative"):
        weight_plan({"a": -0.1})


def test_mix_epoch_counts_and_copy_idx(spark):
    d = docs(spark)
    out = mix_weighted(spark, d, "dom", {"0": 2.0, "1": 0.0, "2": 0.5},
                       "doc_id", seed=5).cache()
    per = {r["dom"]: r for r in
           out.groupBy("dom").agg(
               F.count("*").alias("rows"),
               F.countDistinct("doc_id").alias("docs"),
               F.max("copy_idx").alias("mx")).collect()}
    n_dom = 100  # 400 rows, 4 uniform domains
    # integer weight 2.0: every doc exactly twice, copy_idx in {0,1}
    assert per["0"]["docs"] == n_dom and per["0"]["rows"] == 2 * n_dom
    assert per["0"]["mx"] == 1
    # weight 0: the stratum is dropped entirely
    assert "1" not in per
    # fractional 0.5: a hash-selected subset, single copies
    assert 0 < per["2"]["docs"] == per["2"]["rows"] < n_dom
    assert per["2"]["mx"] == 0
    # unlisted stratum: default weight 1.0 — identity
    assert per["3"]["docs"] == per["3"]["rows"] == n_dom
    out.unpersist()


def test_mix_is_partitioning_invariant(spark):
    d = docs(spark)
    w = {"0": 1.75, "1": 0.3, "2": 2.0, "3": 0.9}
    a = mix_weighted(spark, d.repartition(1), "dom", w, "doc_id", seed=9)
    b = mix_weighted(spark, d.repartition(17, "n_chars"), "dom", w,
                     "doc_id", seed=9)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mix_membership_stable_under_growth(spark):
    w = {"0": 0.5, "1": 2.5}
    small = mix_weighted(spark, docs(spark, 200), "dom", w, "doc_id", seed=3)
    big = mix_weighted(spark, docs(spark, 400), "dom", w, "doc_id", seed=3)
    # every (doc_id, copy_idx) of the small corpus survives growth
    assert small.exceptAll(
        big.filter(F.col("doc_id") < 200)).count() == 0
    assert big.filter(F.col("doc_id") < 200).exceptAll(small).count() == 0


def test_mix_plan_has_no_shuffle_and_broadcasts(spark):
    d = docs(spark)
    out = mix_weighted(spark, d, "dom", {"0": 1.5}, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
