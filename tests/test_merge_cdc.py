"""One-commit CDC apply: merge_into(source_delete_condition=...).

The op-coded feed shape (I/U/D) every CDC pipeline produces — Delta's
``WHEN MATCHED AND <cond> THEN DELETE`` with a source-side condition.
Reference analog: the day-rerun MERGE
(/root/reference/dags/Bronze_Ingest_Dag.py:124-130) never handles
deletes; this closes that gap in ONE atomic snapshot per batch.
"""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators.merge import merge_into
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def _base(spark, tmp_path, rows=100):
    df = spark.createDataFrame(
        [(i, f"cap{i}", 10 * i) for i in range(rows)],
        "image_id long, caption string, w long")
    t = LakehouseTable.create(str(tmp_path / "tbl"), df.schema)
    t.append(df, n_files=4)
    return t, df


def _cdc_batch(spark):
    # op-coded feed: update 5, delete 7, insert 200, tombstone for a
    # key the target never saw (205 -> must be a no-op)
    return spark.createDataFrame(
        [(5, "cap5-v2", 555, "U"),
         (7, None, None, "D"),
         (200, "cap200", 2000, "I"),
         (205, None, None, "D")],
        "image_id long, caption string, w long, op string")


EXPECT = {  # image_id -> (caption, w) after the apply on _base(100)
    **{i: (f"cap{i}", 10 * i) for i in range(100) if i != 7},
    5: ("cap5-v2", 555),
    200: ("cap200", 2000),
}


def _check(spark, t):
    got = {r["image_id"]: (r["caption"], r["w"])
           for r in t.scan(spark).collect()}
    assert got == EXPECT


@pytest.mark.parametrize("mode", ["cow", "mor", "dv"])
def test_cdc_apply_one_commit(spark, tmp_path, mode):
    t, _ = _base(spark, tmp_path)
    pre = len(t.snapshots_list())
    out = merge_into(t, spark, _cdc_batch(spark), key="image_id",
                     mode=mode, source_delete_condition="op = 'D'")
    assert out["snapshot"] is not None
    assert len(t.snapshots_list()) == pre + 1  # ONE atomic commit
    _check(spark, t)
    # the commit records the delete-command count
    assert t.current_snapshot().summary.get("rows_delete_commands") == 2


def test_cdc_apply_condition_sees_non_schema_columns(spark, tmp_path):
    t, _ = _base(spark, tmp_path, rows=10)
    src = spark.createDataFrame(
        [(1, "x", 1, "remove-please"), (2, "two-v2", 22, "keep")],
        "image_id long, caption string, w long, note string")
    merge_into(t, spark, src, key="image_id", mode="mor",
               source_delete_condition="note LIKE 'remove%'")
    got = {r["image_id"]: r["caption"] for r in t.scan(spark).collect()}
    assert 1 not in got and got[2] == "two-v2" and len(got) == 9


def test_cdc_apply_guards_and_bootstrap(spark, tmp_path):
    t, _ = _base(spark, tmp_path, rows=5)
    with pytest.raises(ValueError, match="when_matched='update'"):
        merge_into(t, spark, _cdc_batch(spark), key="image_id",
                   when_matched="delete",
                   source_delete_condition="op = 'D'")
    # empty table + delete-only batch = clean no-op
    empty = LakehouseTable.create(
        str(tmp_path / "empty"),
        spark.createDataFrame([], "image_id long, caption string, w long")
        .schema)
    src = spark.createDataFrame([(9, None, None, "D")],
                                "image_id long, caption string, w long, "
                                "op string")
    out = merge_into(empty, spark, src, key="image_id",
                     source_delete_condition="op = 'D'")
    assert out["rows_out"] == 0
    assert empty.scan(spark).count() == 0


def test_cdc_apply_sql_merge(spark, tmp_path):
    from mobility_lakehouse_project_spark.sql import (
        LakehouseSqlError, execute_sql)

    t, _ = _base(spark, tmp_path)
    _cdc_batch(spark).createOrReplaceTempView("cdc_feed")
    out = execute_sql(
        spark,
        "MERGE INTO tbl t USING (SELECT * FROM cdc_feed) s "
        "ON t.image_id = s.image_id "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * OPTIONS(mode='mor')",
        tables={"tbl": t})
    assert out["operation"] == "merge"
    _check(spark, t)
    with pytest.raises(LakehouseSqlError, match="UPDATE SET"):
        execute_sql(
            spark,
            "MERGE INTO tbl t USING (SELECT * FROM cdc_feed) s "
            "ON t.image_id = s.image_id "
            "WHEN MATCHED AND s.op = 'D' THEN DELETE",
            tables={"tbl": t})
    with pytest.raises(LakehouseSqlError, match="references the target"):
        execute_sql(
            spark,
            "MERGE INTO tbl t USING (SELECT * FROM cdc_feed) s "
            "ON t.image_id = s.image_id "
            "WHEN MATCHED AND t.w > 5 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET *",
            tables={"tbl": t})


def test_cdc_apply_delete_only_batch(spark, tmp_path):
    t, _ = _base(spark, tmp_path, rows=20)
    src = spark.createDataFrame(
        [(3, None, None, "D"), (4, None, None, "D")],
        "image_id long, caption string, w long, op string")
    merge_into(t, spark, src, key="image_id", mode="dv",
               source_delete_condition="op = 'D'")
    ids = {r["image_id"] for r in t.scan(spark).select("image_id").collect()}
    assert ids == set(range(20)) - {3, 4}
