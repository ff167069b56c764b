"""Watermarked stream-stream interval join: parity with the batch
time-band join over the same micro-batched files, and the state-bound
contract (both-sided time bounds so Structured Streaming can evict)."""

from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.streaming.incremental import stream_interval_join

SF = "/root/testdata/sf0.001"


def _sources(spark, tmp_path):
    # watermarks require TIMESTAMP (the testdata ts is TIMESTAMP_NTZ)
    e = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pdir, cdir = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.repartition(4).write.parquet(pdir)
    clicks.repartition(4).write.parquet(cdir)
    return purchases, clicks, pdir, cdir


def test_stream_interval_join_matches_batch(spark, tmp_path):
    purchases, clicks, pdir, cdir = _sources(spark, tmp_path)
    schema_p = purchases.schema
    schema_c = clicks.schema

    sp = (
        spark.readStream.schema(schema_p)
        .option("maxFilesPerTrigger", 2).parquet(pdir)
    )
    sc = (
        spark.readStream.schema(schema_c)
        .option("maxFilesPerTrigger", 2).parquet(cdir)
    )
    joined = stream_interval_join(
        sp, sc, on="user_id", watermark="30 minutes", band_sec=1800
    )
    q = (
        joined.writeStream.format("memory").queryName("sj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM sj_out").collect()
    }

    c2 = clicks.select(
        F.col("event_id").alias("r_event_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
    )
    batch = purchases.join(
        c2,
        (purchases["user_id"] == c2["r_user_id"])
        & (c2["r_ts"] >= purchases["ts"] - F.expr("INTERVAL 1800 SECONDS"))
        & (c2["r_ts"] <= purchases["ts"]),
        "inner",
    )
    want = {(r["event_id"], r["r_event_id"]) for r in batch.collect()}
    assert want, "fixture must produce at least one in-band pair"
    assert got == want


def test_stream_interval_join_plan_has_watermarks(spark, tmp_path):
    """Both sides must carry event-time watermarks — without them the
    join buffers unbounded state and Spark (correctly) refuses append
    mode; assert the analyzed plan carries two EventTimeWatermark
    nodes and the stream starts in append mode."""
    _, _, pdir, cdir = _sources(spark, tmp_path)
    e = spark.read.parquet(f"{SF}/events.parquet").limit(0)
    schema = e.select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).schema
    sp = spark.readStream.schema(schema).parquet(pdir)
    sc = spark.readStream.schema(schema).parquet(cdir)
    joined = stream_interval_join(sp, sc, on="user_id")
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
    q = (
        joined.writeStream.format("memory").queryName("sj_probe")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination(120)
