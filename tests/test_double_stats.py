"""Double/float column stats in manifests (order-preserving int64
encoding) and NaN-safe range pruning.

parquet footers silently EXCLUDE NaN from double min/max (verified in
the fixture below), while Spark orders NaN ABOVE every value — so the
lower-bound prune test (`max < lo` skips the file) could drop NaN rows
that DO satisfy `col > lo`. The engine therefore prunes doubles on the
upper bound only (both sides for point ranges), and poisons files whose
footer min/max is itself NaN.  Every test pins the invariant: pruning
NEVER changes query results, only the file count read.
"""

import math

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.sql import derive_hints, execute_sql
from mobility_lakehouse_project_spark.tableformat import Catalog, LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import double_order_key


def test_double_order_key_monotone():
    vals = sorted([0.0, -0.0, 1.5, -1.5, float("inf"), float("-inf"),
                   1e-300, -1e-300, 1e308, -1e308, 3.7, -123.456]
                  + [(-1) ** i * (1.1 ** i) for i in range(200)])
    keys = [double_order_key(v) for v in vals]
    assert all(a <= b for a, b in zip(keys, keys[1:]))
    assert all(k.bit_length() < 64 for k in keys)


def _score_table(spark, tmp_path, with_nan=False):
    """4 files with disjoint score ranges [0,10) [10,20) [20,30) [30,40);
    optionally a NaN row hidden inside the FIRST range's file."""
    rows = [(i, float(i)) for i in range(40)]
    if with_nan:
        rows.append((999, float("nan")))
    df = spark.createDataFrame(rows, "id long, score double")
    t = LakehouseTable.create(str(tmp_path / "tbl"), df.schema)
    for base in range(0, 40, 10):
        part = df.filter(
            ((F.col("score") >= base) & (F.col("score") < base + 10))
            | (F.lit(base == 0) & F.isnan("score")))
        t.append(part, n_files=1)
    return t


def test_upper_bound_prunes_lower_does_not(spark, tmp_path):
    t = _score_table(spark, tmp_path)
    total = t.plan_files(spark).count()
    assert total == 4
    # upper bound: NaN-safe, prunes high files
    assert t.plan_files(spark, int_ranges={"score": (None, 5.0)}).count() == 1
    # lower bound alone: NaN-unsafe test disabled -> nothing pruned
    assert t.plan_files(spark, int_ranges={"score": (35.0, None)}).count() == 4
    # point range: both sides safe
    assert t.plan_files(spark, int_ranges={"score": (25.0, 25.0)}).count() == 1
    # results through scan(int_ranges=) stay exact
    got = t.scan(spark, int_ranges={"score": (None, 5.0)}) \
        .filter("score <= 5.0").count()
    assert got == 6


def test_nan_rows_survive_pruned_scans(spark, tmp_path):
    t = _score_table(spark, tmp_path, with_nan=True)
    # Spark orders NaN above everything: score > 100 matches ONLY NaN.
    # The hinted scan must not lose it (its file's footer stats are
    # finite — parquet excluded the NaN — so only the disabled lower
    # test could have skipped it).
    got = (t.scan(spark, int_ranges={"score": (100.0, None)})
           .filter("score > 100.0").collect())
    assert [r["id"] for r in got] == [999]
    # DELETE with the same shape erases the NaN row and nothing else
    cat = Catalog(str(tmp_path / "wh"))
    df = t.scan(spark)
    cat.create_table("g.s", df.schema)
    g = cat.load_table("g.s")
    g.append(df, n_files=4)
    out = execute_sql(spark, "DELETE FROM g.s WHERE score > 100.0",
                      catalog=cat)
    assert out["rows_deleted"] == 1
    assert g.scan(spark).count() == 40
    assert g.scan(spark).filter(F.isnan("score")).count() == 0


def test_all_nan_file_is_poisoned_not_pruned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("nan"))], "id long, score double")
    t = LakehouseTable.create(str(tmp_path / "tbl"), df.schema)
    t.append(df, n_files=1)
    e = t.all_entries()[0]
    assert "score" not in (e["int_mins"] or {})  # poisoned, id still there
    assert "id" in e["int_mins"]
    # stats-less -> kept under any range; rows still reachable
    assert t.plan_files(spark, int_ranges={"score": (None, 0.0)}).count() == 1


def test_float32_and_derive_hints(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i) / 4) for i in range(20)], "id long, score float")
    t = LakehouseTable.create(str(tmp_path / "tbl"), df.schema)
    t.append(df.filter("score < 2.5"), n_files=1)
    t.append(df.filter("score >= 2.5"), n_files=1)
    ranges, eq = derive_hints(t, "score < 1.25 AND score >= 0.5")
    assert ranges == {"score": (0.5, 1.25)} and eq == {}
    ranges, _ = derive_hints(t, "score BETWEEN 1 AND 2")
    assert ranges == {"score": (1.0, 2.0)}
    # pruning via the hint path: upper bound skips the high file
    assert t.plan_files(spark, int_ranges={"score": (None, 1.25)}).count() == 1
    got = (t.scan(spark, int_ranges={"score": (None, 1.25)})
           .filter("score < 1.25").count())
    assert got == 5


def test_data_source_double_pushdown(spark, tmp_path):
    from mobility_lakehouse_project_spark.sources.lakehouse_source import (
        register_lakehouse_source)

    t = _score_table(spark, tmp_path, with_nan=True)
    register_lakehouse_source(spark)
    df = (spark.read.format("lakehouse").load(t.location)
          .filter("score > 15.0"))
    # NaN sorts above everything: 24 finite rows (16..39) + the NaN row
    assert df.count() == 25
    low = (spark.read.format("lakehouse").load(t.location)
           .filter("score < 5.0"))
    assert low.count() == 5
