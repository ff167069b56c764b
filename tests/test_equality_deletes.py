"""Equality deletes (Iceberg v2's second delete flavor) + the blind
streaming upsert they enable.

A position delete names (file, row) — it requires reading the table.
An equality delete names KEY VALUES and scopes by commit sequence:
it erases every EARLIER version of the key, so a writer can upsert
without ever scanning the target (Flink/Iceberg CDC-writer shape) —
the per-batch cost is O(batch), independent of table size."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, delete
from mobility_lakehouse_project_spark.streaming import incremental
from mobility_lakehouse_project_spark.streaming.changelog import changelog_df
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 600


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=6)
    return t


def _eq_delete(t, spark, ids):
    keys = spark.createDataFrame([(i,) for i in ids], "image_id string")
    entries = t.write_equality_delete_files(keys, ["image_id"])
    return t.commit_equality_deletes(entries, ["image_id"])


def test_eq_delete_erases_earlier_versions_only(spark, table):
    t = table
    pre_snap = t.current_snapshot().snapshot_id
    victims = [f"img{i:012d}" for i in range(10)]
    _eq_delete(t, spark, victims)
    assert t.scan(spark).count() == N - 10
    assert t.scan(spark).filter(
        F.col("image_id").isin(victims)).count() == 0
    # time travel: pre-delete snapshot still has every row
    assert t.scan(spark, snapshot_id=pre_snap).count() == N

    # SEQUENCE SCOPING: re-inserting a deleted key AFTER the delete
    # survives — the delete applies only to earlier-sequenced files
    reinsert = synth.images_df(spark, 3, seed=70).withColumn(
        "caption", F.lit("reborn"))
    t.append(reinsert, n_files=1)
    assert t.scan(spark).filter("caption = 'reborn'").count() == 3
    assert t.scan(spark).count() == N - 10 + 3
    # the old versions stay dead
    assert t.scan(spark).filter(
        F.col("image_id").isin(victims) & (F.col("caption") != "reborn")
    ).count() == 0


def test_eq_delete_scan_survives_compaction_and_folds(spark, table):
    t = table
    victims = [f"img{i:012d}" for i in range(20, 35)]
    _eq_delete(t, spark, victims)
    expect = N - 15
    # compaction rewrites through the MOR scan: deleted rows dropped
    # from the output; survivors move to HIGHER-sequenced files the
    # delete no longer applies to — count must be stable throughout
    compaction.compact(t, spark, target_file_size=1 << 20)
    assert t.scan(spark).count() == expect
    assert t.scan(spark).filter(F.col("image_id").isin(victims)).count() == 0

    res = delete.rewrite_position_deletes(t, spark, target_file_size=1 << 20)
    assert res["cleared"] is True
    assert not t.current_snapshot().delete_manifests
    assert t.scan(spark).count() == expect


def test_fold_mixed_position_and_equality(spark, table):
    t = table
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")
    victims = [f"img{i:012d}" for i in range(40, 48)
               ]
    pre = t.scan(spark).count()
    _eq_delete(t, spark, victims)
    still = t.scan(spark).count()  # victims not already w=16-deleted
    res = delete.rewrite_position_deletes(t, spark, target_file_size=1 << 20)
    assert res["cleared"] is True
    assert res["eq_delete_keys_pending"] == 8
    assert not t.current_snapshot().delete_manifests
    assert t.scan(spark).count() == still < pre <= N - n16


def test_blind_stream_upsert_exactly_once(spark, tmp_table_dir):
    df = synth.images_df(spark, 1, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    sink = incremental.stream_upsert_eq_sink(t, key="image_id",
                                             n_files=1, stream_id="s1")
    b0 = synth.images_df(spark, 100, partitions=1)
    sink(b0, 0)  # bootstrap append (empty table)
    assert t.scan(spark).count() == 100
    # batch 1: update 30 existing + insert 10 new — WITHOUT reading t
    b1 = (synth.images_df(spark, 30, seed=71)
          .unionByName(synth.images_df(spark, 10, seed=72, id_offset=5_000))
          .withColumn("caption", F.lit("v2")))
    sink(b1, 1)
    assert t.scan(spark).count() == 110
    assert t.scan(spark).filter("caption = 'v2'").count() == 40
    assert t.scan(spark).select("image_id").distinct().count() == 110
    # replayed batch id is skipped (exactly-once)
    n_snaps = len(t.snapshots_list())
    sink(b1.withColumn("caption", F.lit("v3")), 1)
    assert len(t.snapshots_list()) == n_snaps
    assert t.scan(spark).filter("caption = 'v3'").count() == 0
    # batch 2 updates the same keys again: latest version wins
    sink(b1.withColumn("caption", F.lit("v4")), 2)
    assert t.scan(spark).count() == 110
    assert t.scan(spark).filter("caption = 'v4'").count() == 40
    assert t.scan(spark).filter("caption = 'v2'").count() == 0


def test_changelog_covers_eq_upserts(spark, table):
    t = table
    s0 = t.current_snapshot().snapshot_id
    sink = incremental.stream_upsert_eq_sink(t, key="image_id",
                                             n_files=1, stream_id="c1")
    b = (synth.images_df(spark, 15, seed=73)
         .unionByName(synth.images_df(spark, 5, seed=74, id_offset=7_000))
         .withColumn("caption", F.lit("v2")))
    sink(b, 0)
    ch = changelog_df(t, spark, from_snapshot_id=s0)
    dels = {(r["image_id"], r["caption"])
            for r in ch.filter("_change_type = 'delete'")
            .select("image_id", "caption").collect()}
    ins = {(r["image_id"], r["caption"])
           for r in ch.filter("_change_type = 'insert'")
           .select("image_id", "caption").collect()}
    assert len(dels) == 15 and all(c != "v2" for _, c in dels)
    assert len(ins) == 20 and all(c == "v2" for _, c in ins)
    base = {(r["image_id"], r["caption"])
            for r in t.scan(spark, snapshot_id=s0)
            .select("image_id", "caption").collect()}
    final = {(r["image_id"], r["caption"])
             for r in t.scan(spark).select("image_id", "caption").collect()}
    assert (base - dels) | ins == final


def test_eq_delete_unknown_column_rejected(spark, table):
    keys = spark.createDataFrame([("x",)], "nope string")
    with pytest.raises(ValueError, match="unknown equality-delete"):
        table.commit_equality_deletes([], ["nope"])


def test_eq_scoping_survives_unrelated_rewrites(spark, table):
    """Survivor manifest entries must KEEP their original
    added_snapshot_id through commit_replace / rewrite_manifests — a
    re-stamp would bump their sequence past the equality delete's and
    resurrect the deleted keys (the file-lineage bug the maintenance
    orchestrator exposed)."""
    t = table
    victims = [f"img{i:012d}" for i in range(5)]
    _eq_delete(t, spark, victims)
    expect = N - 5
    assert t.scan(spark).count() == expect
    # an unrelated CoW delete rewrites manifests holding survivors
    n8 = t.scan(spark).filter("w = 8").count()
    delete.delete_where(t, spark, "w = 8", mode="cow")
    assert t.scan(spark).count() == expect - n8
    assert t.scan(spark).filter(F.col("image_id").isin(victims)).count() == 0
    # manifest consolidation preserves lineage too
    t.rewrite_manifests(spark)
    assert t.scan(spark).filter(F.col("image_id").isin(victims)).count() == 0
    assert t.scan(spark).count() == expect - n8


def test_eq_delete_on_renamed_key_column(spark, table):
    """Equality deletes name CURRENT columns; rows written before a
    rename carry the key under its old physical name — deletes must
    apply through the schema-evolution coalesce, not before it."""
    t = table
    t.rename_column("image_id", "img_id")
    victims = [f"img{i:012d}" for i in range(7)]
    keys = spark.createDataFrame([(i,) for i in victims], "img_id string")
    t.commit_equality_deletes(
        t.write_equality_delete_files(keys, ["img_id"]), ["img_id"])
    assert t.scan(spark).count() == N - 7
    assert t.scan(spark).filter(F.col("img_id").isin(victims)).count() == 0
