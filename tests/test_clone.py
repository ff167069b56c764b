"""Zero-copy clone: live files hard-linked, manifest entries (stats,
blooms, row-lineage ranges) carried into one consolidated manifest,
destination starts with a single `clone` snapshot and evolves
independently."""

import os

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators.delete import delete_where
from mobility_lakehouse_project_spark.sql import execute_sql
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.catalog import Catalog
from mobility_lakehouse_project_spark.tableformat.paths import to_local


def _chk(spark, t):
    return t.scan(spark).agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(image_id, caption, fmt))").alias("h"),
    ).collect()[0]


@pytest.fixture()
def src(spark, tmp_path):
    df = synth.images_df(spark, 600, partitions=4)
    t = LakehouseTable.create(str(tmp_path / "src"), df.schema,
                              partition_col="bucket")
    t.append(df, n_files=6)
    t.append(synth.images_df(spark, 200, id_offset=600, partitions=2),
             n_files=2)
    return t


def test_clone_matches_source_and_links(spark, src, tmp_path):
    dst = src.clone_to(spark, str(tmp_path / "dst"))
    a, b = _chk(spark, src), _chk(spark, dst)
    assert (a["n"], a["h"]) == (b["n"], b["h"])
    assert src.files(spark).count() == dst.files(spark).count()
    # physically shared: a sample data file has 2 hard links
    rel = dst.files(spark).select("file_path").first()["file_path"]
    assert os.stat(os.path.join(to_local(dst.location), rel)).st_nlink == 2
    # stats carried: a pruned plan works without any dst write
    tot = dst.files(spark).count()
    kept = dst.plan_files(spark, partition_values={"1"}).count()
    assert 0 < kept < tot
    s = dst.current_snapshot()
    assert s.operation == "clone"
    assert s.summary["source-snapshot-id"] == str(
        src.current_snapshot().snapshot_id)


def test_clone_is_independent(spark, src, tmp_path):
    dst = src.clone_to(spark, str(tmp_path / "dst"))
    before = _chk(spark, src)
    delete_where(dst, spark, "bucket = 1")
    after = _chk(spark, src)
    assert (before["n"], before["h"]) == (after["n"], after["h"])
    assert dst.scan(spark).filter(F.col("bucket") == 1).count() == 0
    # row lineage carried and future ids don't collide
    ids_src = {r["_row_id"] for r in
               src.scan(spark, with_row_id=True)
               .filter(F.col("bucket") == 2).select("_row_id").collect()}
    ids_dst = {r["_row_id"] for r in
               dst.scan(spark, with_row_id=True)
               .filter(F.col("bucket") == 2).select("_row_id").collect()}
    assert ids_src == ids_dst
    dst.append(synth.images_df(spark, 50, id_offset=800), n_files=1)
    all_ids = [r["_row_id"] for r in
               dst.scan(spark, with_row_id=True).select("_row_id").collect()]
    assert len(all_ids) == len(set(all_ids))


def test_clone_time_travel_and_guards(spark, src, tmp_path):
    first = src.snapshots_list()[0]
    old = src.clone_to(spark, str(tmp_path / "old"), snapshot_id=first.snapshot_id)
    assert old.scan(spark).count() == 600
    with pytest.raises(ValueError, match="unknown snapshot"):
        src.clone_to(spark, str(tmp_path / "x"), snapshot_id=123)
    delete_where(src, spark, "w = 16", mode="mor")
    with pytest.raises(ValueError, match="folded deletes"):
        src.clone_to(spark, str(tmp_path / "y"))


def test_catalog_clone_and_sql(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    df = synth.images_df(spark, 300, partitions=2)
    t = cat.create_table("ns.src", df.schema, partition_col="bucket")
    t.append(df, n_files=2)
    out = execute_sql(spark, "CALL clone('ns.src', dst => 'ns.copy')",
                      catalog=cat)
    assert out["operation"] == "call:clone"
    dst = cat.load_table("ns.copy")
    assert dst.scan(spark).count() == 300
    with pytest.raises(ValueError, match="already exists"):
        cat.clone_table(spark, "ns.src", "ns.copy")
