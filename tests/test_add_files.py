"""add_files: zero-copy import of existing parquet into a table
(Iceberg's add_files migration). Files are hard-linked, footer stats
become manifest entries, nothing is read or rewritten."""

import os

import pytest

from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def _write_parquet(spark, tmp_path, name, data, ddl, n_files=1):
    out = str(tmp_path / name)
    spark.createDataFrame(data, ddl).coalesce(n_files).write.parquet(out)
    return sorted(
        os.path.join(r, f) for r, _, fs in os.walk(out)
        for f in fs if f.endswith(".parquet"))


def test_add_files_unpartitioned_links_and_scans(spark, tmp_path, tmp_table_dir):
    files = _write_parquet(
        spark, tmp_path, "ext",
        [(i, f"c{i}") for i in range(100)], "id long, caption string", 2)
    t = LakehouseTable.create(
        tmp_table_dir,
        spark.createDataFrame([], "id long, caption string").schema,
        partition_col=None)
    snap = t.add_files(spark, str(tmp_path / "ext" / "*.parquet"))
    assert snap.summary["op"] == "add-files"
    assert snap.summary["source-files"] == len(files)
    assert t.scan(spark).count() == 100
    # zero-copy: imported files are hard links to the originals
    assert all(os.stat(p).st_nlink >= 2 for p in files)
    # footer stats landed in the manifest (min/max over id)
    e = t.files(spark).collect()[0]
    stats = dict(e["int_mins"])
    assert "id" in stats


def test_add_files_partitioned_places_and_refuses_straddlers(
        spark, tmp_path, tmp_table_dir):
    t = LakehouseTable.create(
        tmp_table_dir,
        spark.createDataFrame([], "id long, bucket int").schema,
        partition_col="bucket")
    one = _write_parquet(spark, tmp_path, "b7",
                         [(i, 7) for i in range(10)], "id long, bucket int")
    t.add_files(spark, one)
    assert {r["partition_id"] for r in t.files(spark).collect()} == {"7"}
    assert t.scan(spark, partition_values=["7"]).count() == 10
    # a file spanning two partition values must be rewritten, not linked
    bad = _write_parquet(spark, tmp_path, "b89",
                         [(1, 8), (2, 9)], "id long, bucket int")
    with pytest.raises(ValueError, match="straddles"):
        t.add_files(spark, bad)
    assert t.scan(spark).count() == 10  # refused import left no trace


def test_add_files_schema_checks(spark, tmp_path, tmp_table_dir):
    t = LakehouseTable.create(
        tmp_table_dir,
        spark.createDataFrame([], "id long, caption string, score bigint").schema,
        partition_col=None)
    # missing nullable column -> reads NULL; narrower physical int ->
    # reader-promoted to bigint; extra physical column -> invisible
    ok = _write_parquet(spark, tmp_path, "ok",
                        [(1, 5, "x")], "id long, score int, junk string")
    t.add_files(spark, ok)
    row = t.scan(spark).collect()[0]
    assert row["caption"] is None and row["score"] == 5
    assert "junk" not in t.scan(spark).columns
    # WIDER physical type than declared is refused (would truncate)
    wide = _write_parquet(spark, tmp_path, "wide",
                          [(2, "c", 1.5)], "id long, caption string, score double")
    with pytest.raises(ValueError, match="score"):
        t.add_files(spark, wide)
    # importing a file already inside the table is refused
    inside = t.files(spark).collect()[0]["file_path"]
    with pytest.raises(ValueError, match="inside the table"):
        t.add_files(spark, [os.path.join(tmp_table_dir, inside)])


def test_add_files_then_maintenance(spark, tmp_path, tmp_table_dir):
    """Imported files behave like native ones: compaction rewrites
    them into the table's own layout and the linked originals survive."""
    from mobility_lakehouse_project_spark.operators import compaction

    files = _write_parquet(
        spark, tmp_path, "ext",
        [(i, i % 4) for i in range(200)], "id long, bucket int", 8)
    t = LakehouseTable.create(
        tmp_table_dir,
        spark.createDataFrame([], "id long, bucket int").schema,
        partition_col=None)
    t.add_files(spark, files)
    m = compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=1)
    assert m["files_in"] == 8
    assert t.scan(spark).count() == 200
    assert all(os.path.exists(p) for p in files)  # originals untouched


def test_add_files_basename_collisions_and_extensions(spark, tmp_path, tmp_table_dir):
    """Files with identical basenames (Hive-partitioned sources reuse
    part-00000-X across dirs) must both import; extensionless parquet
    (Hive 000000_0) must still land in the manifest."""
    import shutil

    a = _write_parquet(spark, tmp_path, "d1", [(1,)], "id long")[0]
    b_dir = tmp_path / "d2"
    os.makedirs(b_dir)
    b = str(b_dir / os.path.basename(a))  # SAME basename, different rows
    spark.createDataFrame([(2,)], "id long").coalesce(1).write.parquet(str(tmp_path / "tmp2"))
    src2 = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path / "tmp2")
            for f in fs if f.endswith(".parquet")][0]
    shutil.copy2(src2, b)
    noext = str(tmp_path / "000000_0")  # extensionless parquet
    shutil.copy2(src2, noext)
    t = LakehouseTable.create(
        tmp_table_dir, spark.createDataFrame([], "id long").schema,
        partition_col=None)
    snap = t.add_files(spark, [a, b, noext])
    assert snap.summary["added-files"] == 3
    assert sorted(r["id"] for r in t.scan(spark).collect()) == [1, 2, 2]


def test_add_files_heterogeneous_schemas_refused(spark, tmp_path, tmp_table_dir):
    """Validation must see the MERGED schema: one incompatible file in
    a mixed set is refused up front, not committed to fail at scan."""
    ok = _write_parquet(spark, tmp_path, "i32", [(1, 5)], "id long, score int")
    bad = _write_parquet(spark, tmp_path, "f64", [(2, 1.5)], "id long, score double")
    t = LakehouseTable.create(
        tmp_table_dir,
        spark.createDataFrame([], "id long, score bigint").schema,
        partition_col=None)
    with pytest.raises(ValueError, match="score"):
        t.add_files(spark, ok + bad)
    t.add_files(spark, ok)  # the promotable file alone is fine
    assert t.scan(spark).collect()[0]["score"] == 5
