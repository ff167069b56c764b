"""Streaming CDC source (`format("lakehouse_cdc")`): the changelog as
a Structured Streaming feed — inserts from append/upsert commits,
deletes from merge-on-read position-delete files, maintenance rewrites
silent, content rewrites refused (or skipped) exactly like
`changelog_df`. Planning is manifest-diff only; the (file,pos)
fetches run executor-side per delete file."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, delete, merge
from mobility_lakehouse_project_spark.streaming.table_source import (
    LakehouseCDCDataSource,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakehouseCDCDataSource)


def _run(spark, location, ckpt, out_dir, onchange=None):
    r = spark.readStream.format("lakehouse_cdc").option("location", location)
    if onchange:
        r = r.option("onchange", onchange)
    q = (
        r.load()
        .select("image_id", "w", "_change_type", "_snapshot_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return spark.read.parquet(out_dir)
    except Exception:
        return None


def test_cdc_stream_inserts_and_mor_deletes(spark, tmp_table_dir):
    df = synth.images_df(spark, 300, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=4)
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "out")

    sink = _run(spark, t.location, ckpt, out)
    assert sink.count() == 300
    assert sink.filter("_change_type = 'insert'").count() == 300

    # MOR delete streams the DELETED ROWS THEMSELVES
    doomed = {r["image_id"] for r in
              t.scan(spark).filter("w = 16").select("image_id").collect()}
    delete.delete_where(t, spark, "w = 16", mode="mor")
    sink = _run(spark, t.location, ckpt, out)
    dels = sink.filter("_change_type = 'delete'")
    assert dels.count() == len(doomed)
    assert {r["image_id"] for r in dels.select("image_id").collect()} == doomed
    assert dels.filter("w <> 16").count() == 0

    # maintenance folds/compaction are CDC-silent
    delete.rewrite_position_deletes(t, spark, target_file_size=1 << 20)
    compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=1)
    before = sink.count()
    sink = _run(spark, t.location, ckpt, out)
    assert sink.count() == before


def test_cdc_stream_mor_upsert_emits_both_sides(spark, tmp_table_dir):
    df = synth.images_df(spark, 200, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=2)
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "out")
    _run(spark, t.location, ckpt, out)

    src = synth.merge_source_df(spark, 200, 40, overlap=0.5)
    n_upd = src.join(t.scan(spark), "image_id", "left_semi").count()
    assert n_upd > 0
    merge.merge_into(t, spark, src, key="image_id", mode="mor")

    sink = _run(spark, t.location, ckpt, out)
    head = sink.agg(F.max("_snapshot_id")).collect()[0][0]
    batch = sink.filter(F.col("_snapshot_id") == head)
    # old versions of matched keys stream as deletes, every source row
    # (update + brand-new) streams as an insert
    assert batch.filter("_change_type = 'delete'").count() == n_upd
    assert batch.filter("_change_type = 'insert'").count() == 40


def test_cdc_stream_refuses_then_skips_cow(spark, tmp_table_dir):
    df = synth.images_df(spark, 150, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=2)
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "out")
    _run(spark, t.location, ckpt, out)

    delete.delete_where(t, spark, "w = 16")  # CoW content rewrite
    with pytest.raises(StreamingQueryException) as ei:
        _run(spark, t.location, ckpt, out)
    assert "cannot stream row-level" in str(ei.value)
    n_after = t.scan(spark).count()
    t.append(synth.images_df(spark, 30, id_offset=5000, partitions=2),
             n_files=1)
    # the failed run's uncommitted batch (frozen before the append)
    # replays first under skip and emits nothing new ...
    sink = _run(spark, t.location, ckpt, out, onchange="skip")
    assert sink.filter("_change_type = 'insert'").count() == 150
    # ... the next batch then picks up the post-failure append
    sink = _run(spark, t.location, ckpt, out, onchange="skip")
    assert sink.filter("_change_type = 'insert'").count() == 150 + 30
    assert t.scan(spark).count() == n_after + 30


def test_cdc_stream_dv_deletes_emit_exact_delta(spark, tmp_table_dir):
    """Deletion-vector commits stream ONLY the rows deleted by that
    commit: a DV is the touched file's full pending superset, so the
    executor subtracts the parent's pending set per file (positions
    already streamed as deletes by earlier commits never re-emit)."""
    df = synth.images_df(spark, 300, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=4)
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "out")
    _run(spark, t.location, ckpt, out)

    doomed1 = {r["image_id"] for r in
               t.scan(spark).filter("w = 16").select("image_id").collect()}
    delete.delete_where(t, spark, "w = 16", mode="dv")
    snap1 = t.current_snapshot().snapshot_id
    sink = _run(spark, t.location, ckpt, out)
    d1 = sink.filter((F.col("_change_type") == "delete")
                     & (F.col("_snapshot_id") == snap1))
    assert d1.count() == len(doomed1)
    assert {r["image_id"] for r in d1.select("image_id").collect()} == doomed1

    # second DV over overlapping files MERGES the prior pending set
    # into a superset vector; the stream must emit only the delta
    doomed2 = {r["image_id"] for r in
               t.scan(spark).filter("h >= 64").select("image_id").collect()}
    assert doomed2 and not (doomed1 & doomed2)
    delete.delete_where(t, spark, "h >= 64", mode="dv")
    snap2 = t.current_snapshot().snapshot_id
    sink = _run(spark, t.location, ckpt, out)
    d2 = sink.filter((F.col("_change_type") == "delete")
                     & (F.col("_snapshot_id") == snap2))
    assert d2.count() == len(doomed2)
    assert {r["image_id"] for r in d2.select("image_id").collect()} == doomed2


def test_cdc_stream_full_file_removal_emits_live_rows(spark, tmp_table_dir):
    """A full-file MOR delete drops files metadata-only (no delete
    files written); the CDC stream must still emit each removed file's
    LIVE parent rows — all positions minus the pending deletes of
    earlier MOR commits — as _change_type='delete'."""
    df = synth.images_df(spark, 240, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=4)
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "out")
    _run(spark, t.location, ckpt, out)

    # partial MOR delete first, so the files removed later carry a
    # pending set the stream must NOT re-emit
    delete.delete_where(t, spark, "bucket = 0 AND w = 16", mode="mor")
    _run(spark, t.location, ckpt, out)

    live0 = {r["image_id"] for r in
             t.scan(spark).filter("bucket = 0").select("image_id").collect()}
    assert live0
    res = delete.delete_where(t, spark, "bucket = 0", mode="mor")
    assert res["files_dropped"] > 0  # the metadata-only path was taken
    snap = t.current_snapshot().snapshot_id
    sink = _run(spark, t.location, ckpt, out)
    d = sink.filter((F.col("_change_type") == "delete")
                    & (F.col("_snapshot_id") == snap))
    assert d.count() == len(live0)
    assert {r["image_id"] for r in d.select("image_id").collect()} == live0


def test_cdc_stream_removal_with_parent_eq_deletes_refuses(spark, tmp_table_dir):
    """Removed-file attribution depends on the parent's LIVE set; with
    pending equality deletes that set is key-scoped, which the
    executor-side reader cannot resolve — refuse loudly (or skip)."""
    df = synth.images_df(spark, 160, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=2)
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "out")
    _run(spark, t.location, ckpt, out)

    keys = t.scan(spark).filter("w = 16").select("image_id").limit(5)
    t.commit_equality_deletes(
        t.write_equality_delete_files(keys, ["image_id"]), ["image_id"])
    _run(spark, t.location, ckpt, out, onchange="skip")  # drain past eq

    delete.delete_where(t, spark, "bucket = 1", mode="mor")
    with pytest.raises(StreamingQueryException) as ei:
        _run(spark, t.location, ckpt, out)
    assert "equality" in str(ei.value)
    sink = _run(spark, t.location, ckpt, out, onchange="skip")
    assert sink.filter(F.col("_change_type") == "delete").count() == 0
