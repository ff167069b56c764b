"""CHECK constraints (Delta `delta.constraints.*` idiom, re-expressed
as `constraints.<name>` table properties): declared once, validated
against existing data at ADD time, then enforced in the SAME Spark
pass as every data write — a Catalyst filter whose error branch fires
only on a violating row, so there is no second scan at any scale.
Pure-carry rewrites (compaction / clustering) skip the guard: their
rows were checked when first written."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, merge
from mobility_lakehouse_project_spark.operators.delete import update_where
from mobility_lakehouse_project_spark.sql import LakehouseSqlError, execute_sql
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, 300, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    return t


def _bad_rows(spark, t):
    return spark.createDataFrame(
        [("bad-1", b"\x00", -5, 8, "raw", "cap", 7, 1)], t.schema()
    )


def test_add_constraint_validates_and_blocks_violating_append(spark, table):
    table.add_constraint("w_pos", "w > 0", spark)
    assert table.constraints() == {"w_pos": "w > 0"}
    before = table.current_snapshot().snapshot_id
    n_before = table.scan(spark).count()
    with pytest.raises(Exception, match="CHECK constraint w_pos"):
        table.append(_bad_rows(spark, table), n_files=1)
    # the failed write never committed
    assert table.current_snapshot().snapshot_id == before
    assert table.scan(spark).count() == n_before
    # a conforming append still passes
    table.append(synth.images_df(spark, 50, id_offset=300), n_files=1)
    assert table.scan(spark).count() == n_before + 50


def test_null_predicate_passes_ansi_check_semantics(spark, table):
    # nullif(caption, caption) IS NULL for every row -> the CHECK
    # expression evaluates to NULL -> row passes (ANSI CHECK)
    table.add_constraint("nullish", "nullif(caption, caption) = 'x'", spark)
    table.append(synth.images_df(spark, 20, id_offset=300), n_files=1)
    assert table.scan(spark).count() == 320


def test_add_constraint_rejects_existing_violations(spark, table):
    with pytest.raises(ValueError, match="existing rows violate"):
        table.add_constraint("w_huge", "w > 100000", spark)
    assert table.constraints() == {}


def test_add_constraint_rejects_unanalyzable_expression(spark, table):
    with pytest.raises(ValueError, match="does not analyze"):
        table.add_constraint("ghost", "no_such_column > 0", spark)
    with pytest.raises(ValueError, match="bad constraint name"):
        table.add_constraint("bad name", "w > 0", spark)


def test_duplicate_and_drop_constraint(spark, table):
    table.add_constraint("w_pos", "w > 0", spark)
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint("w_pos", "w > 1", spark)
    table.drop_constraint("w_pos")
    assert table.constraints() == {}
    with pytest.raises(ValueError, match="no constraint"):
        table.drop_constraint("w_pos")
    # dropped constraint no longer gates writes
    table.append(_bad_rows(spark, table), n_files=1)
    assert table.scan(spark).filter(F.col("w") < 0).count() == 1


def test_update_and_merge_respect_constraints(spark, table):
    table.add_constraint("w_pos", "w > 0", spark)
    with pytest.raises(Exception, match="CHECK constraint w_pos"):
        update_where(table, spark, "bucket = 1", {"w": F.lit(-9)})
    # MERGE whose inserts violate fails too (source rows become writes)
    with pytest.raises(Exception, match="CHECK constraint w_pos"):
        merge.merge_into(table, spark, _bad_rows(spark, table))
    assert table.scan(spark).filter(F.col("w") <= 0).count() == 0


def test_compaction_skips_guard_and_preserves_rows(spark, table):
    table.add_constraint("w_pos", "w > 0", spark)
    n = table.scan(spark).count()
    m = compaction.compact(table, spark, target_file_size=1 << 30)
    assert m["files_out"] <= m["files_in"]
    assert table.scan(spark).count() == n


def test_sql_add_and_drop_constraint(spark, table):
    r = execute_sql(spark, "ALTER TABLE t ADD CONSTRAINT fmt_known "
                           "CHECK (fmt IN ('jpeg', 'png', 'raw'))",
                    tables={"t": table})
    assert r["operation"] == "add_constraint"
    assert "fmt_known" in table.constraints()
    with pytest.raises(LakehouseSqlError, match="already exists"):
        execute_sql(spark, "ALTER TABLE t ADD CONSTRAINT fmt_known "
                           "CHECK (fmt = 'raw')", tables={"t": table})
    r = execute_sql(spark, "ALTER TABLE t DROP CONSTRAINT fmt_known",
                    tables={"t": table})
    assert r["operation"] == "drop_constraint"
    assert table.constraints() == {}
