"""Per-file bloom filters in manifests: point-lookup file skipping.

Iceberg stores bloom filters (Parquet footer / Puffin blobs) so a
point predicate on a high-cardinality UNSORTED column can skip files
that min/max stats can never prune (every file spans the full value
range). The reference engine scans whole partitions for id lookups
(dags/Queries_dag.py); at 10^12 images an `image_id = X` must touch
~1 file. These tests pin the engine's manifest-level analog:
`write.metadata.bloom-columns` builds per-file blooms at write time
(O(files x words) shuffle, not O(rows)); `plan_files(point_eq=)`
probes them with a pure-Catalyst filter over the manifest scan.
"""

import os

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, delete
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import (
    BLOOM_COLS_PROP,
    _bloom_m,
)

N = 2400


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.update_properties({BLOOM_COLS_PROP: "image_id,phash"})
    t.append(df, n_files=24)
    return t


def test_blooms_written_and_sized(spark, table):
    ents = table.files(spark).select("record_count", "blooms").collect()
    assert len(ents) > 10
    for e in ents:
        assert set(e["blooms"].keys()) == {"image_id", "phash"}
        words = len(e["blooms"]["image_id"])
        assert words * 64 == _bloom_m(e["record_count"])


def test_point_lookup_no_false_negatives_and_prunes(spark, table):
    t = table
    total = t.files(spark).count()
    ids = [r["image_id"]
           for r in t.scan(spark).select("image_id").limit(20).collect()]
    kept_total = 0
    for v in ids:
        kept = t.plan_files(spark, point_eq={"image_id": v}).count()
        kept_total += kept
        assert kept >= 1
        # the row is always found through the pruned scan
        assert (
            t.scan(spark, point_eq={"image_id": v})
            .filter(F.col("image_id") == v).count() == 1
        )
    # ~1 file + ~1% fp per lookup; allow generous slack vs `total` files
    assert kept_total <= 2 * len(ids), (
        f"bloom barely pruned: {kept_total} files kept for {len(ids)} "
        f"lookups over {total} files"
    )


def test_absent_key_inside_range_prunes_to_near_zero(spark, table):
    t = table
    # a key lexicographically INSIDE the per-file [min,max] id range, so
    # min/max stats cannot prune it — only the bloom can
    some = t.scan(spark).select("image_id").limit(1).collect()[0]["image_id"]
    ghost = some[:-1] + ("a" if some[-1] != "a" else "b")
    assert t.scan(spark).filter(F.col("image_id") == ghost).count() == 0
    kept = t.plan_files(spark, point_eq={"image_id": ghost}).count()
    total = t.files(spark).count()
    assert kept <= max(1, total // 10)


def test_int_column_point_lookup(spark, table):
    t = table
    ph = t.scan(spark).select("phash").limit(1).collect()[0]["phash"]
    kept = t.plan_files(spark, point_eq={"phash": int(ph)}).count()
    total = t.files(spark).count()
    assert kept < total
    found = (
        t.scan(spark, point_eq={"phash": int(ph)})
        .filter(F.col("phash") == ph).count()
    )
    assert found == t.scan(spark).filter(F.col("phash") == ph).count()


def test_bloomless_table_is_unpruned_but_correct(spark, tmp_table_dir):
    df = synth.images_df(spark, 300, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "nb"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=4)
    v = t.scan(spark).select("image_id").limit(1).collect()[0]["image_id"]
    # blooms column is an empty map -> every file kept by the bloom
    # probe (stats may still prune); the row is found either way
    assert (
        t.scan(spark, point_eq={"image_id": v})
        .filter(F.col("image_id") == v).count() == 1
    )


def test_blooms_recomputed_through_compaction(spark, table):
    t = table
    compaction.compact(t, spark)
    ents = t.files(spark).select("record_count", "blooms").collect()
    for e in ents:
        assert "image_id" in e["blooms"]
        assert len(e["blooms"]["image_id"]) * 64 == _bloom_m(e["record_count"])
    v = t.scan(spark).select("image_id").limit(1).collect()[0]["image_id"]
    assert (
        t.scan(spark, point_eq={"image_id": v})
        .filter(F.col("image_id") == v).count() == 1
    )


def test_point_lookup_after_mor_delete(spark, table):
    t = table
    v = t.scan(spark).select("image_id").limit(1).collect()[0]["image_id"]
    delete.delete_where(t, spark, f"image_id = '{v}'", mode="mor")
    assert (
        t.scan(spark, point_eq={"image_id": v})
        .filter(F.col("image_id") == v).count() == 0
    )
    # other keys still resolve through the pruned scan
    other = (
        t.scan(spark).select("image_id").limit(1).collect()[0]["image_id"]
    )
    assert (
        t.scan(spark, point_eq={"image_id": other})
        .filter(F.col("image_id") == other).count() == 1
    )


def test_in_list_point_lookup(spark, table):
    t = table
    total = t.files(spark).count()
    ids = [r["image_id"]
           for r in t.scan(spark).select("image_id").limit(5).collect()]
    kept = t.plan_files(spark, point_eq={"image_id": ids}).count()
    assert kept < total
    found = (
        t.scan(spark, point_eq={"image_id": ids})
        .filter(F.col("image_id").isin(ids)).count()
    )
    assert found == len(ids)
    # empty IN-list matches nothing
    assert t.plan_files(spark, point_eq={"image_id": []}).count() == 0


def test_point_eq_prunes_delete_planning(spark, table):
    t = table
    total = t.files(spark).count()
    v = t.scan(spark).select("image_id").limit(1).collect()[0]["image_id"]
    res = delete.delete_where(
        t, spark, f"image_id = '{v}'", mode="mor",
        point_eq={"image_id": v},
    )
    assert res["rows_deleted"] == 1
    # the GDPR single-key erase probes ~1 file, not every candidate
    assert res["candidate_files"] <= max(2, total // 10)
    assert t.scan(spark).filter(F.col("image_id") == v).count() == 0
    # CoW path with an IN-list
    ids = [r["image_id"]
           for r in t.scan(spark).select("image_id").limit(3).collect()]
    res2 = delete.delete_where(
        t, spark, F.col("image_id").isin(ids), point_eq={"image_id": ids},
    )
    assert res2["rows_deleted"] == 3
    assert res2["candidate_files"] < total
    assert t.scan(spark).filter(F.col("image_id").isin(ids)).count() == 0


def test_unknown_bloom_column_raises_at_write(spark, tmp_table_dir):
    df = synth.images_df(spark, 100, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "bad"), df.schema, partition_col="bucket"
    )
    t.update_properties({BLOOM_COLS_PROP: "no_such_col"})
    with pytest.raises(ValueError, match="no_such_col"):
        t.append(df, n_files=2)
