"""Multimodal plumbing + structured-streaming ingest tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.functions import imagecodec as ic
from mobility_lakehouse_project_spark.operators import multimodal
from mobility_lakehouse_project_spark.streaming import incremental
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def test_extract_features_matches_local_decode(spark):
    imgs = synth.images_df(spark, 80, partitions=2)
    feats = {r["image_id"]: r for r in multimodal.extract_features(imgs).collect()}
    for r in imgs.collect()[:10]:
        px = ic.decode(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        f = feats[r["image_id"]]
        assert abs(f["mean_r"] - px[..., 0].mean()) < 1e-6
        assert f["ahash"] == ic.average_hash(px)


def test_resize_preserves_rows_and_dims(spark):
    imgs = synth.images_df(spark, 60, partitions=2)
    out = multimodal.resize_images(imgs, 8, 8, out_fmt="png")
    rows = out.collect()
    assert len(rows) == 60
    assert all(r["w"] == 8 and r["h"] == 8 and r["fmt"] == "png" for r in rows)
    r = rows[0]
    px = ic.decode(bytes(r["bytes"]), 8, 8, "png")
    assert px.shape == (8, 8, 3)


def test_video_stub_raises(spark):
    vids = spark.createDataFrame(
        [("v1", bytearray(b"xx"))], "video_id string, bytes binary"
    )
    with pytest.raises(Exception) as ei:
        multimodal.sample_video_frames(vids).collect()
    # the NotImplementedError surfaces as a PythonException from the worker
    assert type(ei.value).__name__ in ("PythonException", "NotImplementedError")


def test_streaming_ingest_exactly_once(spark, tmp_path):
    """File-source stream -> foreachBatch commit per micro-batch; a
    second run over the same checkpoint adds nothing (exactly-once),
    and a replayed batch id is skipped by the idempotent sink."""
    src_dir = str(tmp_path / "src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.limit(400).repartition(4).write.parquet(src_dir)
    n_src = 400

    tdir = str(tmp_path / "etable")
    table = LakehouseTable.create(tdir, events.schema, partition_col=None)
    ckpt = str(tmp_path / "ckpt")
    incremental.run_file_stream_into_table(spark, src_dir, events.schema, table, ckpt)
    got = table.scan(spark).count()
    assert got == n_src
    ops = [s.operation for s in table.snapshots_list()]
    assert all(o == "append" for o in ops)
    # restart over the same checkpoint: no new data -> no new snapshots
    n_snaps = len(table.snapshots_list())
    incremental.run_file_stream_into_table(spark, src_dir, events.schema, table, ckpt)
    assert table.scan(spark).count() == n_src
    assert len(table.snapshots_list()) == n_snaps
    # manual replay of an already-committed batch id (same stream) is a
    # no-op — replay detection is namespaced per stream id
    import hashlib

    sid = hashlib.sha256(ckpt.encode()).hexdigest()[:12]
    sink = incremental.stream_append_sink(table, stream_id=sid)
    sink(events.limit(10), 0)
    assert table.scan(spark).count() == n_src
    # a DIFFERENT stream writing batch 0 to the same table is NOT masked
    # (a global batch-id max would silently drop its data)
    other = incremental.stream_append_sink(table, stream_id="other-stream")
    other(events.limit(10), 0)
    assert table.scan(spark).count() == n_src + 10


def test_windowed_stream_agg_matches_batch(spark, tmp_path):
    """Watermarked tumbling windows over a bounded file stream equal
    the same aggregation computed in batch."""
    src_dir = str(tmp_path / "wsrc")
    # testdata timestamps are NTZ; watermarks need TIMESTAMP (ltz)
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(1000)
    )
    events.write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    agg = incremental.windowed_event_counts(stream, watermark="1 minute", window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("winagg")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in spark.sql("select * from winagg").collect()
    }
    batch = (
        spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    expect = {
        (r["win"]["start"], r["event_type"]): (r["n"], round(r["tv"], 4)) for r in batch
    }
    assert got == expect


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted by
    the stream equal the batch-computed sessions (each user's final,
    possibly-open session excluded — the stream keeps it in state)."""
    from pyspark.sql.window import Window

    from mobility_lakehouse_project_spark.streaming import stateful

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                "value")
        .filter(F.col("user_id") < 40)
    )
    # time-ordered files -> in-order arrival across micro-batches
    src = str(tmp_path / "sess_src")
    ordered = events.orderBy("ts").coalesce(1)
    rows = ordered.collect()
    third = max(1, len(rows) // 3)
    for i in range(3):
        chunk = rows[i * third: (i + 1) * third if i < 2 else len(rows)]
        if chunk:
            spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)

    gap_min = 120.0
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.sessionize_stream(stream, gap_minutes=gap_min)
        .writeStream.outputMode("append")
        .format("memory").queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["total_value"], 4))
        for r in spark.sql("SELECT * FROM sessions").collect()
    }

    # batch twin: gap-split sessions, drop each user's LAST session
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull()
             | (F.col("ts").cast("long") - F.col("prev").cast("long")
                > gap_min * 60)).cast("int"),
        )
        .withColumn("sid", F.sum("new_sess").over(w))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("sid"))
    closed = sess.join(last_sid, ["user_id", "sid"], "left_anti")
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         round(r["total_value"], 4))
        for r in closed.collect()
    }
    assert len(got) > 0
    assert got == expect


def test_legacy_stream_snapshots_match_any_stream_id(spark, tmp_table_dir):
    """ADVICE r2: snapshots committed before batch ids were namespaced
    carry a streaming-batch-id but NO streaming-id. They must count
    toward EVERY stream's max — else an upgraded table restarts under a
    derived stream id, sees max batch -1, and re-commits checkpoint-
    replayed batches (duplicate rows)."""
    df = synth.images_df(spark, 40, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    # legacy commit: batch-id, no streaming-id
    t.commit_append(t.write_data_files(df, n_files=1),
                    summary={"streaming-batch-id": 3})
    assert incremental.last_committed_batch(t, "deadbeef1234") == 3
    assert incremental.last_committed_batch(t, "default") == 3
    # namespaced commits still scope to their own stream
    t.commit_append(
        t.write_data_files(synth.images_df(spark, 10, id_offset=40), n_files=1),
        summary={"streaming-batch-id": 7, "streaming-id": "other-stream"},
    )
    assert incremental.last_committed_batch(t, "deadbeef1234") == 3
    assert incremental.last_committed_batch(t, "other-stream") == 7


def test_stream_merge_sink_exactly_once_upsert(spark, tmp_path):
    """CDC-style streaming MERGE: each micro-batch upserts (updates
    matched keys, inserts new ones); replayed batch ids are no-ops;
    distinct streams are not masked."""
    base = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(str(tmp_path / "mtable"), base.schema,
                              partition_col="bucket")
    t.append(base, n_files=2)
    sink = incremental.stream_merge_sink(t, stream_id="s1")
    # batch 0: 20 updates (new captions) + 10 inserts
    b0 = synth.images_df(spark, 30, seed=9, id_offset=100).withColumn(
        "caption", F.lit("v2")
    )
    sink(b0, 0)
    assert t.scan(spark).count() == 130
    assert t.scan(spark).filter(F.col("caption") == "v2").count() == 30
    # replay of batch 0 (checkpoint recovery): no-op
    sink(b0.withColumn("caption", F.lit("v3")), 0)
    assert t.scan(spark).filter(F.col("caption") == "v3").count() == 0
    # batch 1 continues the stream
    b1 = synth.images_df(spark, 5, seed=4, id_offset=130).withColumn(
        "caption", F.lit("v4")
    )
    sink(b1, 1)
    assert t.scan(spark).count() == 135
    # a different stream's batch 0 is NOT masked by s1's batch 0
    other = incremental.stream_merge_sink(t, stream_id="s2")
    other(synth.images_df(spark, 3, seed=2, id_offset=200), 0)
    assert t.scan(spark).count() == 138
    # no duplicate keys after all merges
    dups = (
        t.scan(spark).groupBy("image_id").count()
        .filter(F.col("count") > 1).count()
    )
    assert dups == 0


def test_stream_merge_sink_dv_mode_no_blob_rewrite(spark, tmp_path):
    """Streaming MERGE with mode='dv': every micro-batch upserts via
    deletion vectors — data files are never rewritten, repeated
    batches keep exactly one applied vector per touched file, and
    exactly-once replay protection still holds."""
    base = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(str(tmp_path / "dvtable"), base.schema,
                              partition_col="bucket")
    t.append(base, n_files=2)
    base_files = {r["file_path"] for r in
                  t.files(spark).select("file_path").collect()
                  }
    sink = incremental.stream_merge_sink(t, stream_id="s1", mode="dv")
    for bid in range(3):  # overlapping upserts across 3 micro-batches
        b = synth.images_df(spark, 30, seed=bid, id_offset=90 + 10 * bid
                            ).withColumn("caption", F.lit(f"v{bid}"))
        sink(b, bid)
    # replay of the last batch is a no-op
    sink(synth.images_df(spark, 30, seed=7, id_offset=110)
         .withColumn("caption", F.lit("ghost")), 2)
    assert t.scan(spark).filter(F.col("caption") == "ghost").count() == 0
    # the ORIGINAL data files were never rewritten (still present)
    now_files = {r["file_path"] for r in
                 t.files(spark).select("file_path").collect()}
    assert base_files <= now_files
    # no duplicate keys; latest version wins per key
    dups = (t.scan(spark).groupBy("image_id").count()
            .filter(F.col("count") > 1).count())
    assert dups == 0
    # base ids 0-119; batches cover 90-139 -> 20 net-new keys
    assert t.scan(spark).count() == 140
    # pending delete pairs are unique (one newest vector per file)
    ddf, _ = t.position_deletes_df(spark)
    assert ddf.count() == ddf.distinct().count()


def test_stateful_asof_enrich_stream_matches_batch(spark, tmp_path):
    """Streaming as-of enrichment == the batch asof_join when each
    key's events arrive in timestamp order across micro-batches
    (time-ordered files, one per trigger), including state carry
    across batch boundaries and NULL payloads before the first click."""
    from mobility_lakehouse_project_spark.operators.temporal import asof_join
    from mobility_lakehouse_project_spark.streaming import stateful

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                "event_type", "event_id", "value")
        .filter(F.col("user_id") < 40)
        .filter(F.col("event_type").isin("purchase", "click"))
    )
    src = str(tmp_path / "asof_src")
    rows = events.orderBy("ts", "event_id").collect()
    third = max(1, len(rows) // 3)
    for i in range(3):
        chunk = rows[i * third: (i + 1) * third if i < 2 else len(rows)]
        if chunk:
            spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful.asof_enrich_stream(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("asof_out")
        .option("checkpointLocation", str(tmp_path / "asof_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: (r["right_ts"],
                        None if r["right_value"] is None
                        else round(r["right_value"], 6))
        for r in spark.sql("SELECT * FROM asof_out").collect()
    }

    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("s"))
        .select("user_id", "ts", F.col("s.value").alias("rv"))
    )
    want = {
        r["event_id"]: (r["ts_r"],
                        None if r["rv_r"] is None else round(r["rv_r"], 6))
        for r in asof_join(purchases, clicks, on=["user_id"],
                           payload=["rv"], suffix="_r").collect()
    }
    assert len(got) == purchases.count()
    assert got == want
    # the no-match shape: at least one purchase precedes any click
    assert any(v[0] is None for v in want.values())
