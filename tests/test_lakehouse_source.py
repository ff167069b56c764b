"""The `lakehouse` Python Data Source (Spark 4 pyspark.sql.datasource):
batch reads with Catalyst filter pushdown into manifest/stats pruning,
and micro-batch incremental streaming over the commit log."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.sources.lakehouse_source import (
    LakehouseBatchReader,
    LakehouseDataSource,
    _ranges_from_filters,
    register_lakehouse_source,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, 150, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    return t


def test_batch_read_matches_scan(spark, table):
    register_lakehouse_source(spark)
    via_source = spark.read.format("lakehouse").load(table.location)
    via_scan = table.scan(spark)
    assert via_source.count() == via_scan.count() == 150
    assert via_source.schema == via_scan.schema
    a = via_source.agg(F.sum(F.pmod("phash", F.lit(10 ** 9))),
                       F.sum(F.length("bytes"))).first()
    b = via_scan.agg(F.sum(F.pmod("phash", F.lit(10 ** 9))),
                     F.sum(F.length("bytes"))).first()
    assert a == b


def test_batch_filter_results_exact(spark, table):
    register_lakehouse_source(spark)
    mid = table.scan(spark).approxQuantile("phash", [0.5], 0.01)[0]
    pred = f"phash <= {int(mid)} and fmt = 'png'"
    got = (spark.read.format("lakehouse").load(table.location)
           .filter(pred).count())
    want = table.scan(spark).filter(pred).count()
    assert got == want


def test_pushed_filters_prune_files(spark, tmp_table_dir):
    """Two phash-disjoint appends; a pushed range must drop the other
    append's files from the planned partitions."""
    df = synth.images_df(spark, 200, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    mid = df.approxQuantile("phash", [0.5], 0.01)[0]
    t.append(df.filter(df.phash <= mid), n_files=2)
    t.append(df.filter(df.phash > mid), n_files=2)

    schema = t.scan(spark).schema
    reader = LakehouseBatchReader(schema, {"location": t.location,
                                           "split_bytes": "1"})
    all_files = sum(len(p.paths) for p in reader.partitions())
    reader.pushFilters([GreaterThanOrEqual(("phash",), int(mid) + 1)])
    pruned_files = sum(len(p.paths) for p in reader.partitions())
    assert 0 < pruned_files < all_files


def test_ranges_from_filters_translation(spark, table):
    schema = table.scan(spark).schema
    r = _ranges_from_filters(
        [GreaterThanOrEqual(("phash",), 10), LessThanOrEqual(("phash",), 99),
         LessThanOrEqual(("fmt",), "png"),
         GreaterThanOrEqual(("caption",), "m")],
        schema)
    assert r["phash"] == (10, 99)
    assert r["fmt"] == (None, "png")
    assert r["caption"] == ("m", None)


def test_mor_pending_deletes_refused(spark, table):
    from mobility_lakehouse_project_spark.operators import delete as delete_op

    one = table.scan(spark).select("image_id").first()[0]
    delete_op.delete_where(table, spark, F.col("image_id") == one, mode="mor")
    register_lakehouse_source(spark)
    with pytest.raises(Exception, match="merge-on-read"):
        spark.read.format("lakehouse").load(table.location).count()


def test_stream_incremental_exactly_once(spark, tmp_table_dir, tmp_path):
    df1 = synth.images_df(spark, 60, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df1.schema, partition_col="bucket")
    t.append(df1, n_files=2)
    t.append(synth.images_df(spark, 40, partitions=2, id_offset=1000),
             n_files=2)
    register_lakehouse_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_batch():
        q = (spark.readStream.format("lakehouse")
             .option("location", t.location)
             .option("starting_sequence", "0")
             .load()
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_batch()
    assert spark.read.parquet(out).count() == 100
    # a third append streams INCREMENTALLY from the checkpoint
    t.append(synth.images_df(spark, 25, partitions=2, id_offset=5000),
             n_files=1)
    run_batch()
    got = spark.read.parquet(out)
    assert got.count() == 125  # no re-read of earlier commits
    assert got.select("image_id").distinct().count() == 125


def test_stream_fails_on_content_change_unless_skipped(
        spark, tmp_table_dir, tmp_path):
    from mobility_lakehouse_project_spark.operators import delete as delete_op

    df = synth.images_df(spark, 50, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=2)
    delete_op.delete_where(
        t, spark, F.col("image_id").isin(
            [r[0] for r in t.scan(spark).select("image_id").limit(3).collect()]
        ))
    t.append(synth.images_df(spark, 20, partitions=2, id_offset=9000),
             n_files=1)
    register_lakehouse_source(spark)

    def run(skip, ckpt, out):
        reader = (spark.readStream.format("lakehouse")
                  .option("location", t.location)
                  .option("starting_sequence", "0"))
        if skip:
            reader = reader.option("skip_change_snapshots", "true")
        q = (reader.load().writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    with pytest.raises(Exception, match="content-changing|StreamingQuery"):
        run(False, str(tmp_path / "c1"), str(tmp_path / "o1"))
    run(True, str(tmp_path / "c2"), str(tmp_path / "o2"))
    # appends stream; the delete's rewrite commit is passed over
    assert spark.read.parquet(str(tmp_path / "o2")).count() == 70


def test_schema_and_empty_table(spark, tmp_table_dir):
    df = synth.images_df(spark, 10, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    register_lakehouse_source(spark)
    src = spark.read.format("lakehouse").load(t.location)
    assert src.schema == df.schema
    assert src.count() == 0


def test_batch_write_appends_atomically(spark, tmp_table_dir):
    df = synth.images_df(spark, 80, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    register_lakehouse_source(spark)
    (df.write.format("lakehouse").mode("append")
       .option("location", t.location).save())
    assert t.scan(spark).count() == 80
    snap = t.current_snapshot()
    assert snap.operation == "append"
    assert snap.summary.get("writer") == "datasource"
    # entries carry partition ids + stats: partition pruning works on
    # datasource-written files
    one_bucket = t.scan(spark).select("bucket").first()[0]
    planned = t.plan_files(spark, partition_values={str(one_bucket)})
    assert 0 < planned.count() < t.files(spark).count()
    # second append composes
    (synth.images_df(spark, 20, partitions=2, id_offset=7000)
     .write.format("lakehouse").mode("append")
     .option("location", t.location).save())
    assert t.scan(spark).count() == 100
    assert t.scan(spark).select("image_id").distinct().count() == 100


def test_batch_write_refuses_overwrite_and_transforms(spark, tmp_table_dir):
    df = synth.images_df(spark, 10, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    register_lakehouse_source(spark)
    with pytest.raises(Exception, match="append"):
        (df.write.format("lakehouse").mode("overwrite")
           .option("location", t.location).save())
    t2 = LakehouseTable.create(
        tmp_table_dir + "_b", df.schema, partition_col="phash",
        partition_transform="bucket[8]")
    with pytest.raises(Exception, match="identity"):
        (df.write.format("lakehouse").mode("append")
           .option("location", t2.location).save())


def test_stream_sink_exactly_once(spark, tmp_table_dir, tmp_path):
    """lakehouse -> lakehouse micro-batch pipe: stream source reads the
    upstream commit log, stream sink appends atomically; a re-run with
    no new upstream commits adds nothing (epoch dedup)."""
    df = synth.images_df(spark, 60, partitions=2)
    src = LakehouseTable.create(tmp_table_dir, df.schema,
                                partition_col="bucket")
    src.append(df, n_files=2)
    dst = LakehouseTable.create(tmp_table_dir + "_sink", df.schema,
                                partition_col="bucket")
    register_lakehouse_source(spark)
    ckpt = str(tmp_path / "ckpt")

    def pump():
        q = (spark.readStream.format("lakehouse")
             .option("location", src.location)
             .option("starting_sequence", "0").load()
             .writeStream.format("lakehouse")
             .option("location", dst.location)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    pump()
    assert dst.scan(spark).count() == 60
    pump()  # no new upstream data -> no change, no duplicates
    assert dst.scan(spark).count() == 60
    src.append(synth.images_df(spark, 15, partitions=1, id_offset=4000),
               n_files=1)
    pump()
    assert dst.scan(spark).count() == 75
    assert dst.scan(spark).select("image_id").distinct().count() == 75


def test_batch_read_time_travel_options(spark, tmp_table_dir):
    df = synth.images_df(spark, 30, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    s1 = t.append(df, n_files=1)
    t.create_tag("v1")
    t.append(synth.images_df(spark, 20, partitions=1, id_offset=3000),
             n_files=1)
    register_lakehouse_source(spark)
    assert (spark.read.format("lakehouse")
            .load(t.location).count() == 50)
    assert (spark.read.format("lakehouse")
            .option("location", t.location)
            .option("snapshot_id", str(s1.snapshot_id)).load().count() == 30)
    assert (spark.read.format("lakehouse")
            .option("location", t.location)
            .option("ref", "v1").load().count() == 30)
    with pytest.raises(Exception, match="no tag or branch"):
        (spark.read.format("lakehouse")
         .option("location", t.location)
         .option("ref", "nope").load().count())


def test_stream_model_random_append_maintenance(spark, tmp_table_dir, tmp_path):
    """Model-based differential check: under a random interleaving of
    appends and maintenance (compaction = a replace commit, manifest
    rewrite, snapshot expiry), a stream with skip_change_snapshots=true
    must deliver exactly every appended row exactly once — maintenance
    commits between appends may be skipped but must never duplicate or
    drop streamed data."""
    import random

    from mobility_lakehouse_project_spark.operators import compaction

    rng = random.Random(7)
    df0 = synth.images_df(spark, 30, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df0.schema,
                              partition_col="bucket")
    expected_ids = set()
    offset = 0

    def do_append():
        nonlocal offset
        n = rng.randint(5, 25)
        d = synth.images_df(spark, n, partitions=1, id_offset=offset)
        expected_ids.update(r[0] for r in d.select("image_id").collect())
        t.append(d, n_files=rng.randint(1, 2))
        offset += 10_000

    do_append()
    for _ in range(8):
        op = rng.choice(["append", "append", "compact", "rewrite", "expire"])
        if op == "append":
            do_append()
        elif op == "compact":
            compaction.compact(t, spark, target_file_size=1 << 30, n_chunks=1)
        elif op == "rewrite":
            t.rewrite_manifests(spark)
        else:
            t.expire_snapshots(keep_last=50)  # keep history streamable

    register_lakehouse_source(spark)
    out = str(tmp_path / "out")
    q = (spark.readStream.format("lakehouse")
         .option("location", t.location)
         .option("starting_sequence", "0")
         .option("skip_change_snapshots", "true").load()
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.read.parquet(out).select("image_id").collect()
    got_ids = [r[0] for r in got]
    assert len(got_ids) == len(set(got_ids))  # exactly once
    assert set(got_ids) == expected_ids       # exactly every appended row


def test_batch_write_string_partition_column(spark, tmp_table_dir):
    """Datasource writer with a STRING identity partition column: the
    recorded partition ids must live in the same value domain the
    native planner uses (partition_values pruning agrees)."""
    import pyspark.sql.types as T

    rows = [("a", "en", 3), ("b", "en", 4), ("c", "de", 5), ("d", "fr", 6)]
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n", T.LongType()),
    ])
    df = spark.createDataFrame(rows, schema)
    t = LakehouseTable.create(tmp_table_dir, schema, partition_col="lang")
    register_lakehouse_source(spark)
    (df.write.format("lakehouse").mode("append")
       .option("location", t.location).save())
    assert t.scan(spark).count() == 4
    planned = t.plan_files(spark, partition_values={"en"})
    assert planned.count() >= 1
    assert planned.agg({"record_count": "sum"}).first()[0] == 2
    assert (t.scan(spark, partition_values={"en"})
            .filter("lang = 'en'").count() == 2)


def test_catalog_addressing(spark, tmp_path):
    from mobility_lakehouse_project_spark.tableformat import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    df = synth.images_df(spark, 25, partitions=1)
    cat.create_table("bronze.imgs", df.schema,
                     partition_col="bucket").append(df, n_files=1)
    register_lakehouse_source(spark)
    got = (spark.read.format("lakehouse")
           .option("warehouse", str(tmp_path / "wh"))
           .option("table", "bronze.imgs").load())
    assert got.count() == 25
    with pytest.raises(Exception, match="location"):
        spark.read.format("lakehouse").load()


def test_stream_rate_limit_bounded_batches(spark, tmp_table_dir, tmp_path):
    """max_sequences_per_batch caps each micro-batch to N commits
    (Iceberg streaming-max-files-per-micro-batch analog): a 4-commit
    backlog drains in >= 2 batches at cap 2 with nothing lost or
    duplicated, and a restart continues from the checkpoint."""
    df = synth.images_df(spark, 20, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    for i in range(4):
        t.append(synth.images_df(spark, 20, partitions=1, id_offset=i * 100),
                 n_files=1)
    register_lakehouse_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_batch():
        q = (spark.readStream.format("lakehouse")
             .option("location", t.location)
             .option("starting_sequence", "0")
             .option("max_sequences_per_batch", "2")
             .load()
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # each availableNow run captures a capped target; loop to drain
    for _ in range(4):
        run_batch()
        if spark.read.parquet(out).count() == 80:
            break
    got = spark.read.parquet(out)
    assert got.count() == 80
    assert got.select("image_id").distinct().count() == 80
    # per-batch commit boundaries: no batch may span >2 commit sequences
    import json as _json
    import os as _os

    odir = _os.path.join(ckpt, "offsets")
    seqs = []
    for f in sorted(_os.listdir(odir)):
        if f.startswith("."):
            continue  # .crc sidecars are binary
        with open(_os.path.join(odir, f), errors="ignore") as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{") and "sequence" in line:
                    seqs.append(_json.loads(line)["sequence"])
    assert seqs, "offset log must record sequences"
    steps = [b - a for a, b in zip(seqs, seqs[1:]) if b > a]
    assert steps and max(steps) <= 2, f"batch spanned too many commits: {seqs}"
    # restart after more data: continues incrementally under the cap
    t.append(synth.images_df(spark, 20, partitions=1, id_offset=900),
             n_files=1)
    for _ in range(3):
        run_batch()
        if spark.read.parquet(out).count() == 100:
            break
    assert spark.read.parquet(out).count() == 100


def test_stream_rate_limit_validation(spark, tmp_table_dir):
    df = synth.images_df(spark, 5, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=1)
    register_lakehouse_source(spark)
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_sequences_per_batch"):
        (spark.readStream.format("lakehouse")
         .option("location", t.location)
         .option("max_sequences_per_batch", "0")
         .load().writeStream.format("noop").start().awaitTermination(60))
