"""Materialized views: create + incremental (affected-group) refresh.

Reference analog: the gold tables rebuilt from scratch per DAG run
(/root/reference/dags/Queries_dag.py, src/sql/gold.sql CREATE OR
REPLACE) — here the same content is maintained with change-proportional
refresh, and every test asserts the invariant that matters: after ANY
refresh mode, MV content == a from-scratch recompute of the definition.
"""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.tableformat import Catalog
from mobility_lakehouse_project_spark.operators.matview import (
    NotMaterializedView,
    create_materialized_view,
    materialized_view_sql,
    refresh_materialized_view,
)
from mobility_lakehouse_project_spark.operators.delete import delete_where, update_where


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _src_df(spark, lo=0, hi=120, fmt_mod=4):
    return spark.createDataFrame(
        [(i, (i * 37) % 256, f"f{i % fmt_mod}", 16 * (1 + i % 3), f"cap{i}")
         for i in range(lo, hi)],
        "image_id long, phash long, fmt string, w int, caption string",
    )


def _expected(spark, src_scan):
    return (src_scan.groupBy("fmt")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("w").alias("sum_w"),
                 F.countDistinct("phash").alias("nd_phash")))


def _assert_matches(spark, cat, view="gold.by_fmt", source="silver.images"):
    k = repr
    got = sorted(cat.load_table(view).scan(spark).collect(), key=k)
    exp = sorted(_expected(
        spark, cat.load_table(source).scan(spark)).collect(), key=k)
    assert got == exp


AGGS = {"n": "count(*)", "sum_w": "sum(w)",
        "nd_phash": "count(distinct phash)"}


def _mk(spark, cat):
    cat.create_table_as("silver.images", _src_df(spark), n_files=4)
    return create_materialized_view(
        spark, cat, "gold.by_fmt", "silver.images",
        group_by=["fmt"], aggs=AGGS)


def test_create_matches_full_recompute(spark, cat):
    res = _mk(spark, cat)
    assert res["rows"] == 4
    _assert_matches(spark, cat)
    # the stored definition round-trips to runnable SQL
    sql = materialized_view_sql(cat, "gold.by_fmt")
    assert "GROUP BY fmt" in sql and "count(*) AS n" in sql
    # a plain table is not an MV
    with pytest.raises(NotMaterializedView):
        refresh_materialized_view(spark, cat, "silver.images")


def test_refresh_noop_when_source_unchanged(spark, cat):
    _mk(spark, cat)
    res = refresh_materialized_view(spark, cat, "gold.by_fmt")
    assert res["mode"] == "noop"
    assert res["from_snapshot"] == res["to_snapshot"]


def test_incremental_merge_after_append(spark, cat):
    _mk(spark, cat)
    src = cat.load_table("silver.images")
    # touch only fmt f0 / f1 (i % 4 in {0,1} over 200..230)
    src.append(_src_df(spark, 200, 230, fmt_mod=2)
               .withColumn("fmt", F.concat(F.lit("f"),
                                           (F.col("image_id") % 2))))
    res = refresh_materialized_view(spark, cat, "gold.by_fmt",
                                    mode="incremental")
    assert res["mode"] == "incremental-merge"
    assert res["affected_groups"] == 2
    assert res["vanished_groups"] == 0
    _assert_matches(spark, cat)
    # and the recorded snapshot advanced: next refresh is a noop
    assert refresh_materialized_view(
        spark, cat, "gold.by_fmt")["mode"] == "noop"


def test_incremental_sees_mor_delete_and_vanished_group(spark, cat):
    _mk(spark, cat)
    src = cat.load_table("silver.images")
    # MOR delete keeps the changelog derivable; wipe out ALL of f3
    delete_where(src, spark, "fmt = 'f3'", mode="mor")
    res = refresh_materialized_view(spark, cat, "gold.by_fmt",
                                    mode="incremental")
    assert res["mode"] == "incremental-merge"
    assert res["affected_groups"] == 1
    assert res["vanished_groups"] == 1
    got = {r["fmt"] for r in
           cat.load_table("gold.by_fmt").scan(spark).collect()}
    assert got == {"f0", "f1", "f2"}
    _assert_matches(spark, cat)


def test_full_fallback_on_cow_rewrite(spark, cat):
    _mk(spark, cat)
    src = cat.load_table("silver.images")
    # CoW UPDATE is a content rewrite the changelog cannot attribute
    update_where(src, spark, "image_id < 10", {"w": "w + 1000"})
    res = refresh_materialized_view(spark, cat, "gold.by_fmt")
    assert res["mode"] == "full"
    assert res["reason"]
    _assert_matches(spark, cat)
    with_src_change = cat.load_table("silver.images")
    with_src_change.append(_src_df(spark, 300, 310))
    update_where(with_src_change, spark, "image_id = 300", {"w": "99"})
    with pytest.raises(ValueError, match="incremental refresh unavailable"):
        refresh_materialized_view(spark, cat, "gold.by_fmt",
                                  mode="incremental")


def test_null_group_key_takes_rewrite_path(spark, cat):
    _mk(spark, cat)
    src = cat.load_table("silver.images")
    src.append(_src_df(spark, 400, 410).withColumn(
        "fmt", F.when(F.col("image_id") < 405, F.lit(None))
                .otherwise(F.col("fmt"))))
    res = refresh_materialized_view(spark, cat, "gold.by_fmt",
                                    mode="incremental")
    assert res["mode"] == "incremental-rewrite"
    mv = cat.load_table("gold.by_fmt").scan(spark)
    null_row = mv.filter(F.col("fmt").isNull()).collect()
    assert len(null_row) == 1 and null_row[0]["n"] == 5
    _assert_matches(spark, cat)
    # a second NULL-key append updates (not duplicates) the NULL group
    cat.load_table("silver.images").append(
        _src_df(spark, 410, 412).withColumn("fmt", F.lit(None)))
    res = refresh_materialized_view(spark, cat, "gold.by_fmt",
                                    mode="incremental")
    assert res["mode"] == "incremental-rewrite"
    assert cat.load_table("gold.by_fmt").scan(spark).filter(
        F.col("fmt").isNull()).collect()[0]["n"] == 7
    _assert_matches(spark, cat)


def test_derived_key_where_and_key_range_hint(spark, cat):
    cat.create_table_as("silver.images", _src_df(spark, 0, 120), n_files=4)
    create_materialized_view(
        spark, cat, "gold.by_bucket", "silver.images",
        group_by={"image_id": "image_id", "bucket": "phash % 4"},
        aggs={"n": "count(*)", "max_w": "max(w)"},
        where="w >= 32")
    src = cat.load_table("silver.images")
    src.append(_src_df(spark, 120, 130))
    res = refresh_materialized_view(spark, cat, "gold.by_bucket",
                                    mode="incremental")
    assert res["mode"] == "incremental-merge"
    # plain int key image_id yields a file-skipping range hint bounding
    # the affected keys (120..129); derived `bucket` contributes none
    assert res["key_range_hint"] == {"image_id": (120, 129)}
    got = sorted(cat.load_table("gold.by_bucket").scan(spark).collect())
    exp = sorted(
        src.scan(spark).filter("w >= 32")
        .groupBy(F.col("image_id"), (F.col("phash") % 4).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("w").alias("max_w"))
        .collect())
    assert got == exp


def test_noop_advance_when_changes_cancel(spark, cat):
    _mk(spark, cat)
    src = cat.load_table("silver.images")
    # an empty append: a commit exists but the changelog is empty
    src.append(_src_df(spark, 0, 0))
    res = refresh_materialized_view(spark, cat, "gold.by_fmt",
                                    mode="incremental")
    assert res["mode"] == "noop-advance"
    _assert_matches(spark, cat)


def test_definition_validation(spark, cat):
    cat.create_table_as("silver.images", _src_df(spark), n_files=2)
    with pytest.raises(ValueError, match="duplicate output column"):
        create_materialized_view(
            spark, cat, "gold.bad", "silver.images",
            group_by=["fmt"], aggs={"fmt": "count(*)"})
    with pytest.raises(ValueError, match="shadows source column"):
        create_materialized_view(
            spark, cat, "gold.bad", "silver.images",
            group_by={"w": "w + 1"}, aggs={"n": "count(*)"})
    with pytest.raises(ValueError, match=">= 1 group key"):
        create_materialized_view(
            spark, cat, "gold.bad", "silver.images",
            group_by=[], aggs={"n": "count(*)"})
    with pytest.raises(ValueError, match=">= 1 aggregate"):
        create_materialized_view(
            spark, cat, "gold.bad", "silver.images",
            group_by=["fmt"], aggs={})
    create_materialized_view(
        spark, cat, "gold.ok", "silver.images",
        group_by=["fmt"], aggs={"n": "count(*)"})
    with pytest.raises(ValueError, match="exists"):
        create_materialized_view(
            spark, cat, "gold.ok", "silver.images",
            group_by=["fmt"], aggs={"n": "count(*)"})
    # replace=True recreates
    create_materialized_view(
        spark, cat, "gold.ok", "silver.images",
        group_by=["fmt"], aggs={"n2": "count(*)"}, replace=True)
    assert cat.load_table("gold.ok").scan(spark).columns == ["fmt", "n2"]


def test_streaming_mv_maintenance(spark, cat, tmp_path):
    """File stream -> exactly-once append + per-batch incremental MV
    refresh (streaming/incremental.py::stream_mv_maintenance_sink).
    After the stream drains, the MV equals a from-scratch recompute;
    a checkpoint-replayed restart changes nothing; and a refresh
    skipped by a crash is self-healed by the next batch because the
    refresh covers the full changelog since the MV's recorded
    snapshot."""
    import hashlib

    from mobility_lakehouse_project_spark.streaming import incremental

    seed = _src_df(spark, 0, 40)
    cat.create_table_as("silver.images", seed, n_files=2)
    create_materialized_view(
        spark, cat, "gold.by_fmt", "silver.images",
        group_by=["fmt"], aggs=AGGS)

    src_dir = str(tmp_path / "stream-src")
    _src_df(spark, 40, 120).repartition(4).write.parquet(src_dir)
    ckpt = str(tmp_path / "ckpt")
    sid = hashlib.sha256(ckpt.encode()).hexdigest()[:12]
    sink = incremental.stream_mv_maintenance_sink(
        cat, "silver.images", ["gold.by_fmt"], stream_id=sid)

    def drain():
        q = (spark.readStream.schema(seed.schema)
             .option("maxFilesPerTrigger", 2).parquet(src_dir)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    src = cat.load_table("silver.images")
    assert src.scan(spark).count() == 120
    _assert_matches(spark, cat)
    # every refresh in the drain was change-proportional, never full
    mv_ops = [s.summary.get("op2") or s.summary.get("op")
              for s in cat.load_table("gold.by_fmt").snapshots_list()]
    assert "mv-refresh" in mv_ops
    assert "mv-refresh-full" not in mv_ops

    # restart over the same checkpoint: replayed ids are dropped by the
    # append sink, the refresh is a noop — nothing moves
    n_src_snaps = len(src.snapshots_list())
    n_mv_snaps = len(cat.load_table("gold.by_fmt").snapshots_list())
    drain()
    assert len(cat.load_table("silver.images").snapshots_list()) == n_src_snaps
    assert len(cat.load_table("gold.by_fmt").snapshots_list()) == n_mv_snaps

    # crash between append and refresh: simulate by appending straight
    # to the source (no refresh ran) — the NEXT sink invocation heals
    # the gap because refresh covers the whole changelog range
    cat.load_table("silver.images").append(_src_df(spark, 200, 220))
    sink(_src_df(spark, 300, 310), 10_000)
    assert cat.load_table("silver.images").scan(spark).count() == 150
    _assert_matches(spark, cat)


def test_incremental_survives_source_compaction_and_clustering(spark, cat):
    """Compaction and clustering between refreshes only CARRY rows
    (changelog classifies them as skip), so the refresh after them must
    still be incremental and attribute exactly the appended rows."""
    from mobility_lakehouse_project_spark.operators import clustering, compaction

    _mk(spark, cat)
    src = cat.load_table("silver.images")
    src.append(_src_df(spark, 200, 210))
    compaction.compact(src, spark, target_file_size=64 * 1024 * 1024)
    clustering.cluster(src, spark, curve="zorder",
                       cols=("image_id", "phash"))
    src.append(_src_df(spark, 210, 214))
    res = refresh_materialized_view(spark, cat, "gold.by_fmt",
                                    mode="incremental")
    assert res["mode"] == "incremental-merge"
    _assert_matches(spark, cat)
