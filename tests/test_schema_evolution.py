"""Schema evolution: add_columns / rename_column as metadata-only
commits; old files read through the new schema (nulls for added
columns, coalesced historical names for renames) — the Iceberg
behavior the reference gets from DuckLake for its inferred-schema
demographics tables (src/ingest_bronze.py:86-99)."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators import merge
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def evolved_table(spark, tmp_table_dir):
    v1 = spark.createDataFrame(
        [(i, f"name{i}") for i in range(20)], "id long, a string"
    )
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=2)
    t.add_columns({"score": "double"})
    t.rename_column("a", "label")
    v2 = spark.createDataFrame(
        [(i, f"label{i}", float(i)) for i in range(20, 30)],
        "id long, label string, score double",
    )
    t.append(v2, n_files=2)
    return t


def test_evolved_scan_unifies_old_and_new_files(spark, evolved_table):
    t = evolved_table
    assert [f.name for f in t.schema().fields] == ["id", "label", "score"]
    rows = {r["id"]: (r["label"], r["score"]) for r in t.scan(spark).collect()}
    assert len(rows) == 30
    assert rows[3] == ("name3", None)        # old file: renamed + null added col
    assert rows[25] == ("label25", 25.0)     # new file: native columns


def test_evolution_survives_maintenance_rewrite(spark, evolved_table):
    """A compaction rewrite after evolution materializes the unified
    schema; the data is unchanged."""
    from mobility_lakehouse_project_spark.operators import compaction

    t = evolved_table
    before = {r["id"]: (r["label"], r["score"]) for r in t.scan(spark).collect()}
    m = compaction.compact(t, spark, target_file_size=1 << 20,
                           sort_col="id", key_col="id", n_chunks=1)
    assert m["files_in"] > 0
    after = {r["id"]: (r["label"], r["score"]) for r in t.scan(spark).collect()}
    assert after == before


def test_merge_after_evolution(spark, evolved_table):
    t = evolved_table
    src = spark.createDataFrame(
        [(3, "updated3", 99.0), (100, "new100", 1.0)],
        "id long, label string, score double",
    )
    merge.merge_into(t, spark, src, key="id", target_file_size=1 << 20)
    rows = {r["id"]: (r["label"], r["score"]) for r in t.scan(spark).collect()}
    assert rows[3] == ("updated3", 99.0)
    assert rows[100] == ("new100", 1.0)
    assert len(rows) == 31


def test_chained_rename_and_conflicts(spark, evolved_table):
    t = evolved_table
    t.rename_column("label", "title")  # chained: title <- label <- a
    rows = {r["id"]: r["title"] for r in t.scan(spark).collect()}
    assert rows[3] == "name3" and rows[25] == "label25"
    with pytest.raises(ValueError):
        t.add_columns({"a": "string"})  # prior physical name is reserved
    with pytest.raises(ValueError):
        t.rename_column("missing", "x")
    with pytest.raises(ValueError):
        t.rename_column("title", "id")


def test_stats_pruning_conservative_on_renamed_column(spark, tmp_table_dir):
    """Old files carry stats under the old physical name; a pruned scan
    on the renamed column must KEEP them (no false pruning)."""
    v1 = spark.createDataFrame([(i, i * 10) for i in range(100)], "id long, v long")
    t = LakehouseTable.create(tmp_table_dir, v1.schema, partition_col=None)
    t.append(v1, n_files=2)
    t.rename_column("v", "value")
    pruned = t.scan(spark, int_ranges={"value": (0, 50)})
    assert pruned.filter(F.col("value") <= 50).count() == 6


def test_rename_to_retired_physical_name_rejected(spark, evolved_table):
    """Renaming a column to a name old data files still carry would
    duplicate fields in the physical read schema — must be rejected."""
    t = evolved_table
    with pytest.raises(ValueError):
        t.rename_column("id", "a")  # 'a' is label's retired physical name
    # table still scans fine
    assert t.scan(spark).count() == 30


def test_drop_column(spark, tmp_table_dir):
    """Drop is metadata-only: scans stop selecting the column, writes
    through the new schema work, re-adding the retired name is refused
    (old files still carry the physical bytes), and the partition
    column cannot be dropped."""
    from mobility_lakehouse_project_spark import synth

    df = synth.images_df(spark, 80, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=1)
    t.drop_column("fmt")
    got = t.scan(spark)
    assert "fmt" not in got.columns
    assert got.count() == 80
    # appends through the new schema
    t.append(synth.images_df(spark, 20, id_offset=80, partitions=1).drop("fmt"),
             n_files=1)
    assert t.scan(spark).count() == 100
    import pytest as _pt

    with _pt.raises(ValueError):
        t.add_columns({"fmt": "string"})  # retired name: stale resurrection
    with _pt.raises(ValueError):
        t.rename_column("caption", "fmt")
    with _pt.raises(ValueError):
        t.drop_column("bucket")  # partition column
    with _pt.raises(ValueError):
        t.drop_column("nope")
