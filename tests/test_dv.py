"""Deletion vectors (Iceberg v3 DV model; tableformat/dv.py).

DVs pack a data file's deleted row positions into ONE compressed blob
and supersede on write (each new DV merges the file's pending
deletes), so repeated small deletes on a 10^12-image table cost
O(touched files) blobs per commit and exactly one applied vector per
file at scan time — no stacking of delete files. The reference has no
row-level delete representation (its removal is partition-wise
delete+insert, dags/Silver_Transform_Dag.py:188-207); these tests pin
the DV semantics: exactness vs the predicate, supersede cardinality,
interop with v2 position deletes, fold, changelog delta attribution,
and the SQL front-end path.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import delete
from mobility_lakehouse_project_spark.sql import execute_sql
from mobility_lakehouse_project_spark.streaming.changelog import changelog_df
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.dv import (
    cardinality,
    pack_positions,
    unpack_positions,
)

N = 1200


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=12)
    return t


def _file_set(t, spark):
    return {r["file_path"] for r in t.files(spark).select("file_path").collect()}


# ---------------- codec ----------------


def test_dv_codec_roundtrip():
    cases = [
        [],
        [0],
        [7],
        list(range(1000)),                      # dense run
        [0, 1, 2, 10_000_000_000, 10_000_000_001],  # sparse + >32-bit
        [5, 3, 3, 1, 5],                        # unsorted + duplicates
    ]
    for pos in cases:
        blob = pack_positions(pos)
        out = unpack_positions(blob)
        assert out.tolist() == sorted(set(pos))
        assert cardinality(blob) == len(set(pos))
        assert out.dtype == np.int64


def test_dv_codec_rejects_garbage_and_negatives():
    with pytest.raises(ValueError, match="magic"):
        unpack_positions(b"nope" + b"\x00" * 10)
    with pytest.raises(ValueError, match="negative"):
        pack_positions([-1, 3])


def test_dv_dense_run_compresses_well():
    # 100k consecutive positions: delta+deflate must be far below the
    # 800 kB raw int64 form — the representation the 10^12 scale
    # argument rests on
    blob = pack_positions(range(100_000))
    assert len(blob) < 5_000


# ---------------- delete semantics ----------------


def test_dv_delete_removes_rows_without_rewriting_data(spark, table):
    t = table
    pre_snap = t.current_snapshot().snapshot_id
    pre_files = _file_set(t, spark)
    expect = t.scan(spark).filter("w = 16").count()
    assert expect > 0

    res = delete.delete_where(t, spark, "w = 16", mode="dv")

    assert res["rows_deleted"] == expect
    assert _file_set(t, spark) == pre_files
    snap = t.current_snapshot()
    assert len(snap.dv_manifests()) == 1
    _m, _seq, npos = snap.dv_manifests()[0]
    assert npos == expect
    assert t.scan(spark).filter("w = 16").count() == 0
    assert t.scan(spark).count() == N - expect
    assert t.scan(spark, columns=["image_id", "w"]).count() == N - expect
    assert t.scan(spark, snapshot_id=pre_snap).count() == N


def test_dv_delete_null_predicate_keeps_rows(spark, tmp_table_dir):
    df = synth.images_df(spark, 200, partitions=2).withColumn(
        "w", F.when(F.col("phash") % 3 == 0, F.lit(None)).otherwise(F.col("w"))
    )
    t = LakehouseTable.create(tmp_table_dir + "-null", df.schema,
                              partition_col="bucket")
    t.append(df, n_files=4)
    n_null = t.scan(spark).filter("w IS NULL").count()
    n_hit = t.scan(spark).filter("w = 16").count()
    assert n_null > 0
    res = delete.delete_where(t, spark, "w = 16", mode="dv")
    assert res["rows_deleted"] == n_hit
    assert t.scan(spark).filter("w IS NULL").count() == n_null
    assert t.scan(spark).count() == 200 - n_hit


def test_dv_supersede_applies_exactly_one_vector_per_file(spark, table):
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    n32 = t.scan(spark).filter("w = 32").count()
    delete.delete_where(t, spark, "w = 16", mode="dv")
    delete.delete_where(t, spark, "w = 32", mode="dv")
    snap = t.current_snapshot()
    assert len(snap.dv_manifests()) == 2
    # scan correctness
    assert t.scan(spark).count() == N - n16 - n32
    # newest-wins: the applied pending set has NO duplicate pairs even
    # though both commits' vectors reference overlapping files — the
    # second DV superseded the first (superset), it did not stack
    ddf, n_upper = t.position_deletes_df(spark)
    assert ddf.count() == n16 + n32
    assert ddf.distinct().count() == n16 + n32
    # the manifest-stats count is an upper bound (superseded included)
    assert n_upper >= n16 + n32
    # the newest manifest alone carries the full pending set
    newest = max(snap.dv_manifests(), key=lambda x: x[1])
    # files touched by both deletes appear once per manifest, merged
    assert newest[2] >= n16  # includes merged w=16 positions of shared files


def test_dv_merges_prior_position_deletes(spark, table):
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    n32 = t.scan(spark).filter("w = 32").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")
    delete.delete_where(t, spark, "w = 32", mode="dv")
    assert t.scan(spark).count() == N - n16 - n32
    assert t.scan(spark).filter("w IN (16, 32)").count() == 0
    # the union (position entries + DV superset) stays exact through
    # the anti-join even though pairs overlap across representations
    survivors = {r["image_id"] for r in
                 t.scan(spark, columns=["image_id", "w"])
                 .filter("w NOT IN (16, 32)").collect()}
    assert len(survivors) == N - n16 - n32
    # counting consumers must dedup the overlap: the DV superseded the
    # v2 position rows of its files, but their manifests still list —
    # live_record_count would otherwise double-subtract those pairs
    pdf = t.partitions_df(spark).agg(
        F.sum("live_record_count").alias("live"),
        F.sum("position_delete_count").alias("dels")).collect()[0]
    assert pdf["live"] == N - n16 - n32
    assert pdf["dels"] == n16 + n32


def test_dv_matches_cow_delete_results(spark, tmp_table_dir):
    df = synth.images_df(spark, 400, partitions=2)
    a = LakehouseTable.create(tmp_table_dir + "-cow", df.schema,
                              partition_col="bucket")
    a.append(df, n_files=6)
    b = LakehouseTable.create(tmp_table_dir + "-dv", df.schema,
                              partition_col="bucket")
    b.append(df, n_files=6)
    delete.delete_where(a, spark, "h >= 64", mode="cow")
    delete.delete_where(b, spark, "h >= 64", mode="dv")
    rows_a = sorted(r["image_id"] for r in
                    a.scan(spark, columns=["image_id"]).collect())
    rows_b = sorted(r["image_id"] for r in
                    b.scan(spark, columns=["image_id"]).collect())
    assert rows_a == rows_b


def test_dv_full_file_delete_still_drops_metadata_only(spark, table):
    t = table
    # bucket-partition predicate matches whole files in that partition
    n = t.scan(spark).filter("bucket = 1").count()
    pre_files = _file_set(t, spark)
    res = delete.delete_where(t, spark, "bucket = 1", mode="dv",
                              int_ranges={"bucket": (1, 1)})
    assert res["rows_deleted"] == n
    assert res["files_dropped"] >= 1
    # fully-matched files were dropped without DV entries
    assert res["delete_files_written"] == 0
    assert _file_set(t, spark) < pre_files
    assert t.scan(spark).count() == N - n


def test_dv_fold_rewrites_and_clears(spark, table):
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="dv")
    res = delete.rewrite_position_deletes(t, spark)
    assert res["cleared"] is True
    snap = t.current_snapshot()
    assert not snap.delete_manifests
    assert t.scan(spark).count() == N - n16
    assert t.scan(spark).filter("w = 16").count() == 0


def test_dv_changelog_attributes_each_commit_delta(spark, table):
    t = table
    s0 = t.current_snapshot().snapshot_id
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="dv")
    s1 = t.current_snapshot().snapshot_id
    n32 = t.scan(spark).filter("w = 32").count()
    delete.delete_where(t, spark, "w = 32", mode="dv")
    ch = changelog_df(t, spark, from_snapshot_id=s0)
    per = {r["_snapshot_id"]: r["n"] for r in
           ch.filter("_change_type = 'delete'")
           .groupBy("_snapshot_id").agg(F.count("*").alias("n")).collect()}
    # the second commit's DV is a superset of the first; the changelog
    # must emit only its DELTA (the w=32 rows), not re-emit w=16
    assert sum(per.values()) == n16 + n32
    assert per.get(s1) == n16
    deleted_w = {r["w"] for r in ch.filter("_change_type = 'delete'")
                 .select("w").distinct().collect()}
    assert deleted_w == {16, 32}


def test_dv_via_sql_frontend(spark, table):
    t = table
    n = t.scan(spark).filter("h >= 64").count()
    out = execute_sql(
        spark, "DELETE FROM t WHERE h >= 64 OPTIONS(mode='dv')",
        tables={"t": t},
    )
    assert out["rows_deleted"] == n
    assert len(t.current_snapshot().dv_manifests()) >= 1
    assert t.scan(spark).filter("h >= 64").count() == 0


# ---------------- DV-form upserts (UPDATE / MERGE mode='dv') ----------------


def test_dv_update_matches_cow_semantics(spark, tmp_table_dir):
    from mobility_lakehouse_project_spark.operators.delete import update_where

    df = synth.images_df(spark, 400, partitions=2)
    a = LakehouseTable.create(tmp_table_dir + "-ucow", df.schema,
                              partition_col="bucket")
    a.append(df, n_files=6)
    b = LakehouseTable.create(tmp_table_dir + "-udv", df.schema,
                              partition_col="bucket")
    b.append(df, n_files=6)
    ra = update_where(a, spark, "w = 16", {"caption": "'seen'"}, mode="cow")
    rb = update_where(b, spark, "w = 16", {"caption": "'seen'"}, mode="dv")
    assert ra["rows_updated"] == rb["rows_updated"] > 0
    assert len(b.current_snapshot().dv_manifests()) == 1
    rows_a = sorted((r["image_id"], r["caption"]) for r in
                    a.scan(spark, columns=["image_id", "caption"]).collect())
    rows_b = sorted((r["image_id"], r["caption"]) for r in
                    b.scan(spark, columns=["image_id", "caption"]).collect())
    assert rows_a == rows_b


def test_dv_merge_upsert_and_repeat_keeps_single_vector(spark, tmp_table_dir):
    from mobility_lakehouse_project_spark.operators.merge import merge_into

    df = synth.images_df(spark, 400, partitions=2)
    t = LakehouseTable.create(tmp_table_dir + "-mdv", df.schema,
                              partition_col="bucket")
    t.append(df, n_files=6)
    # upsert 1: replace 60 rows, insert 20 new
    up1 = synth.images_df(spark, 80, seed=3, id_offset=340)
    r1 = merge_into(t, spark, up1, "image_id", mode="dv")
    assert r1["rows_deleted_positions"] == 60
    assert t.scan(spark).count() == 420
    assert len(t.current_snapshot().dv_manifests()) == 1
    # upsert 2 overlaps upsert 1's rows AND original rows
    up2 = synth.images_df(spark, 80, seed=4, id_offset=300)
    merge_into(t, spark, up2, "image_id", mode="dv")
    assert t.scan(spark).count() == 420
    # exactly one row version per key survives
    dup = (t.scan(spark).groupBy("image_id").count()
           .filter("count > 1").count())
    assert dup == 0
    # pending delete set has no duplicate pairs (newest vector per file)
    ddf, _ = t.position_deletes_df(spark)
    assert ddf.count() == ddf.distinct().count()
    # the upserted captions are the latest versions
    want = {r["image_id"]: r["caption"] for r in up2.collect()}
    got = {r["image_id"]: r["caption"] for r in
           t.scan(spark).filter(F.col("image_id").isin(list(want))).collect()}
    assert got == want


def test_dv_merge_by_source_delete_full_sync(spark, tmp_table_dir):
    from mobility_lakehouse_project_spark.operators.merge import merge_into

    df = synth.images_df(spark, 300, partitions=2)
    t = LakehouseTable.create(tmp_table_dir + "-msync", df.schema,
                              partition_col="bucket")
    t.append(df, n_files=4)
    src = synth.images_df(spark, 150, seed=6, id_offset=100)
    merge_into(t, spark, src, "image_id", mode="dv",
               when_not_matched_by_source="delete")
    # full sync: target key set == source key set
    got = sorted(r["image_id"] for r in
                 t.scan(spark, columns=["image_id"]).collect())
    want = sorted(r["image_id"] for r in src.select("image_id").collect())
    assert got == want


# ---------------- delete-metadata compaction ----------------


def test_compact_deletion_vectors_consolidates_without_data_rewrite(
        spark, table):
    t = table
    # predicates overlap (an h=64 row may also have w=16/32): the
    # pending-position union is the OR-count, not the sum
    n_del = t.scan(spark).filter("w IN (16, 32) OR h = 64").count()
    # stack heterogeneous delete state: position rows + two vectors
    delete.delete_where(t, spark, "w = 16", mode="mor")
    delete.delete_where(t, spark, "w = 32", mode="dv")
    delete.delete_where(t, spark, "h = 64", mode="dv")
    pre_files = _file_set(t, spark)
    snap = t.current_snapshot()
    assert len(snap.delete_manifests) == 3
    expect = N - n_del

    res = delete.compact_deletion_vectors(t, spark)

    assert res["delete_manifests_before"] == 3
    assert res["delete_manifests_after"] == 1
    assert res["positions"] == n_del
    snap = t.current_snapshot()
    assert snap.operation == "rewrite-deletes"
    assert len(snap.delete_manifests) == 1
    assert len(snap.dv_manifests()) == 1
    # NO data file was touched
    assert _file_set(t, spark) == pre_files
    assert t.scan(spark).count() == expect
    ddf, _ = t.position_deletes_df(spark)
    assert ddf.count() == n_del
    # idempotent: a second compaction keeps one manifest, same rows
    delete.compact_deletion_vectors(t, spark)
    assert len(t.current_snapshot().delete_manifests) == 1
    assert t.scan(spark).count() == expect


def test_compact_deletion_vectors_drops_dead_refs_keeps_equality(
        spark, table):
    from mobility_lakehouse_project_spark.streaming.changelog import (
        changelog_df,
    )

    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="dv")
    # an equality delete must survive compaction untouched
    keys = spark.createDataFrame([("img-nonexistent",)], "image_id string")
    t.commit_equality_deletes(
        t.write_equality_delete_files(keys, ["image_id"]), ["image_id"])
    # drop a whole partition: its DV entries now reference dead files
    n_b0 = t.scan(spark).filter("bucket = 0").count()
    delete.drop_partitions(t, spark, [0])
    s0 = t.current_snapshot().snapshot_id
    res = delete.compact_deletion_vectors(t, spark)
    assert res["positions"] < n16  # dead-file refs dropped
    snap = t.current_snapshot()
    assert len(snap.equality_delete_manifests()) == 1
    assert t.scan(spark).count() == N - n16 - n_b0
    # the compaction is changelog-invisible (no logical change)
    ch = changelog_df(t, spark, from_snapshot_id=s0)
    assert ch.count() == 0


def test_compact_deletion_vectors_via_sql_call(spark, table):
    t = table
    delete.delete_where(t, spark, "w = 16", mode="mor")
    out = execute_sql(
        spark, "CALL compact_deletion_vectors('t')", tables={"t": t})
    assert out["delete_manifests_after"] == 1
    assert len(t.current_snapshot().dv_manifests()) == 1
