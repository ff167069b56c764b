"""Structured Streaming source over a lakehouse table
(`format("lakehouse_stream")`): incremental append-snapshot
consumption with checkpointed offsets — the Iceberg streaming-read
contract (append snapshots stream; row-level change snapshots fail
unless explicitly skipped). The reference's consumers re-poll whole
day partitions (dags/Queries_dag.py); this source turns the table
into a push-style feed with exactly-once offset tracking.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryException

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import delete
from mobility_lakehouse_project_spark.streaming.table_source import (
    LakehouseStreamDataSource,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakehouseStreamDataSource)


def _run(spark, location, ckpt, out_dir, onchange=None, start=None):
    """One availableNow pass into a parquet sink (memory sinks cannot
    recover from a checkpoint); returns TOTAL rows in the sink — the
    caller differences successive runs for per-batch counts."""
    r = spark.readStream.format("lakehouse_stream").option("location", location)
    if onchange:
        r = r.option("onchange", onchange)
    if start:
        r = r.option("start", start)
    q = (
        r.load()
        .select("image_id", "bucket")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return spark.read.parquet(out_dir).count()
    except Exception:
        return 0  # no batch ever produced -> no inferable sink schema


def test_incremental_append_consumption(spark, tmp_table_dir):
    df = synth.images_df(spark, 300, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=4)
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "out")
    assert _run(spark, t.location, ckpt, out) == 300
    # second run through the SAME checkpoint: only the new commit's rows
    t.append(
        synth.images_df(spark, 120, partitions=2, seed=9, id_offset=1000),
        n_files=2,
    )
    assert _run(spark, t.location, ckpt, out) == 420
    # nothing new -> empty batch
    assert _run(spark, t.location, ckpt, out) == 420


def test_start_latest_skips_existing(spark, tmp_table_dir):
    df = synth.images_df(spark, 200, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t2"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=2)
    ckpt = os.path.join(tmp_table_dir, "ckpt2")
    out = os.path.join(tmp_table_dir, "out2")
    assert _run(spark, t.location, ckpt, out, start="latest") == 0
    t.append(
        synth.images_df(spark, 60, partitions=2, seed=3, id_offset=500),
        n_files=1,
    )
    assert _run(spark, t.location, ckpt, out, start="latest") == 60


def test_row_level_change_errors_unless_skipped(spark, tmp_table_dir):
    df = synth.images_df(spark, 200, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t3"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=2)
    deleted = delete.delete_where(t, spark, "w = 16", mode="mor")["rows_deleted"]
    assert deleted > 0
    with pytest.raises(StreamingQueryException, match="APPEND snapshots only"):
        _run(spark, t.location, os.path.join(tmp_table_dir, "ck3"),
             os.path.join(tmp_table_dir, "out3"))
    # skip mode passes over the delete snapshot; appended rows still
    # stream (NOTE: rows deleted later are already emitted — documented
    # inserts-only semantics, same as Iceberg's streaming read)
    out4 = os.path.join(tmp_table_dir, "out4")
    n = _run(
        spark, t.location, os.path.join(tmp_table_dir, "ck4"), out4,
        onchange="skip",
    )
    assert n == 200
    # compaction is a no-op for the stream, not an error
    from mobility_lakehouse_project_spark.operators import compaction

    compaction.compact(t, spark)
    assert _run(
        spark, t.location, os.path.join(tmp_table_dir, "ck4"), out4,
        onchange="skip",
    ) == 200


def test_streams_renamed_and_added_columns(spark, tmp_table_dir):
    df = synth.images_df(spark, 100, partitions=2)
    t = LakehouseTable.create(
        os.path.join(tmp_table_dir, "t4"), df.schema, partition_col="bucket"
    )
    t.append(df, n_files=1)
    t.rename_column("caption", "title")
    t.add_columns({"lang": "string"})
    new = (
        synth.images_df(spark, 40, partitions=1, seed=5, id_offset=900)
        .withColumnRenamed("caption", "title")
        .withColumn("lang", F.lit("en"))
    )
    t.append(new, n_files=1)
    q = (
        spark.readStream.format("lakehouse_stream")
        .option("location", t.location)
        .load()
        .writeStream.format("memory")
        .queryName("src_r")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_table_dir, "ck5"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql(
        "select count(*) as n, count(title) as titles, count(lang) as langs "
        "from src_r"
    ).collect()[0]
    # old files stream through the rename (physical 'caption' surfaces
    # as 'title') and show NULL for the added column
    assert out["n"] == 140 and out["titles"] == 140 and out["langs"] == 40


def test_max_files_per_trigger_throttles_batches(spark, tmp_table_dir, tmp_path):
    """Admission control: 5 append snapshots x 2 files drain in
    multiple micro-batches of <= 4 files each (snapshot-aligned)
    within ONE continuously-running query (the reader instance owns
    the cursor; availableNow restarts re-create it and are documented
    as unthrottled for their first batch)."""
    import time

    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "image_id long, bucket long")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    for k in range(5):
        t.append(df.withColumn("image_id", F.col("image_id") + k * 100),
                 n_files=2)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (
        spark.readStream.format("lakehouse_stream")
        .option("location", tmp_table_dir)
        .option("max-files-per-trigger", "4")
        .load()
        .select("image_id", "bucket")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        total = 0
        while time.time() < deadline and total < 500:
            time.sleep(2)
            try:
                total = spark.read.parquet(out).count()
            except Exception:
                total = 0
    finally:
        q.stop()
    assert total == 500
    offsets = [f for f in os.listdir(os.path.join(ckpt, "offsets"))
               if not f.startswith(".")]
    # 10 files / 4-file budget -> at least 3 planned batches
    assert len(offsets) >= 3
