"""Hidden partitioning: Iceberg-style partition transforms.

The table partitions by a TRANSFORM of a source column (bucket[N],
truncate[W], year/month/day/hour) — the physical layout key never
appears in the data, and point predicates on the SOURCE column prune
partitions through the transform (the hidden-partitioning contract:
queries never mention the layout). Mirrors the reference's day-keyed
partition overwrites (dags/Silver_Transform_Dag.py:188-207) without a
materialized date column.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators import compaction
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import (
    parse_transform,
    validate_transform,
)
from pyspark.sql import types as T


def _events(spark, n=400, days=5):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.lit(datetime.datetime(2024, 3, 1))
             + F.make_interval(hours=(F.col("id") % (24 * days)).cast("int"))
             ).alias("ts"),
            (F.col("id") % 7).alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("payload"),
        )
    )


class TestParseValidate:
    def test_parse(self):
        assert parse_transform(None) == ("identity", None)
        assert parse_transform("bucket[16]") == ("bucket", 16)
        assert parse_transform("truncate[3]") == ("truncate", 3)
        assert parse_transform("day") == ("day", None)
        for bad in ("bucket[0]", "bucket[]", "weeks", "bucket[-2]"):
            with pytest.raises(ValueError):
                parse_transform(bad)

    def test_validate_types(self, spark):
        schema = _events(spark).schema
        validate_transform("day", "ts", schema)
        validate_transform("bucket[8]", "event_id", schema)
        validate_transform("truncate[2]", "payload", schema)
        with pytest.raises(ValueError):
            validate_transform("day", "payload", schema)
        with pytest.raises(ValueError):
            validate_transform("truncate[2]", "ts", schema)
        date_only = T.StructType([T.StructField("ts", T.DateType())])
        with pytest.raises(ValueError):
            validate_transform("hour", "ts", date_only)


class TestBucketTransform:
    def test_layout_scan_and_hidden_point_prune(self, spark, tmp_table_dir):
        df = _events(spark)
        t = LakehouseTable.create(
            tmp_table_dir, df.schema, partition_col="event_id",
            partition_transform="bucket[8]",
        )
        t.append(df, n_files=16)
        # partition values are bucket ids 0..7, NOT event ids
        parts = {r["partition_id"]
                 for r in t.files(spark).select("partition_id").collect()}
        assert parts <= {str(i) for i in range(8)}
        assert len(parts) > 1
        # full scan returns every row unchanged
        assert t.scan(spark).count() == 400
        # hidden pruning: point predicate on the SOURCE column prunes
        # to the files of ONE bucket before stats/bloom run
        total = t.files(spark).count()
        pruned = t.plan_files(spark, point_eq={"event_id": 123}).count()
        assert 0 < pruned < total
        got = (
            t.scan(spark, point_eq={"event_id": 123})
            .filter(F.col("event_id") == 123).collect()
        )
        assert len(got) == 1 and got[0]["payload"] == "v123"

    def test_point_in_list_prunes_union_of_buckets(self, spark, tmp_table_dir):
        df = _events(spark)
        t = LakehouseTable.create(
            tmp_table_dir, df.schema, partition_col="event_id",
            partition_transform="bucket[8]",
        )
        t.append(df, n_files=16)
        keys = [1, 2, 3]
        rows = (
            t.scan(spark, point_eq={"event_id": keys})
            .filter(F.col("event_id").isin(keys)).count()
        )
        assert rows == 3


class TestDayTransform:
    def test_day_layout_and_partition_overwrite(self, spark, tmp_table_dir):
        df = _events(spark, n=240, days=3)
        t = LakehouseTable.create(
            tmp_table_dir, df.schema, partition_col="ts",
            partition_transform="day",
        )
        t.append(df, n_files=6)
        parts = sorted(
            r["partition_id"]
            for r in t.files(spark).select("partition_id").distinct().collect()
        )
        assert parts == ["2024-03-01", "2024-03-02", "2024-03-03"]
        # idempotent day re-run: overwrite one day with corrected rows
        day2 = df.filter(F.to_date("ts") == "2024-03-02") \
                 .withColumn("payload", F.lit("fixed"))
        for _ in range(2):  # re-running must not duplicate
            t.overwrite_partitions(day2, n_files=2)
        out = t.scan(spark)
        assert out.count() == 240
        assert out.filter(F.col("payload") == "fixed").count() == \
            day2.count()
        # partition_values scan stays in the transformed (day) domain
        assert t.scan(
            spark, partition_values={"2024-03-02"}
        ).count() == day2.count()

    def test_scan_point_eq_on_ts_prunes_to_day(self, spark, tmp_table_dir):
        df = _events(spark, n=240, days=3)
        t = LakehouseTable.create(
            tmp_table_dir, df.schema, partition_col="ts",
            partition_transform="day",
        )
        t.append(df, n_files=9)
        ts = datetime.datetime(2024, 3, 2, 5, 0, 0)
        pruned = t.plan_files(spark, point_eq={"ts": ts})
        days = {r["partition_id"] for r in
                pruned.select("partition_id").distinct().collect()}
        assert days == {"2024-03-02"}


class TestTruncateTransform:
    def test_string_prefix_and_int_floor(self, spark, tmp_table_dir):
        df = _events(spark, n=100)
        t = LakehouseTable.create(
            tmp_table_dir + "/s", df.schema, partition_col="payload",
            partition_transform="truncate[2]",
        )
        t.append(df, n_files=4)
        parts = {r["partition_id"]
                 for r in t.files(spark).select("partition_id").collect()}
        assert all(len(p) <= 2 for p in parts)
        assert t.scan(spark).count() == 100

        neg = spark.range(-25, 25).select(F.col("id").alias("k"))
        t2 = LakehouseTable.create(
            tmp_table_dir + "/i", neg.schema, partition_col="k",
            partition_transform="truncate[10]",
        )
        t2.append(neg, n_files=2)
        parts2 = {int(r["partition_id"])
                  for r in t2.files(spark).select("partition_id").collect()}
        # floor-to-width: negatives floor toward -inf (Iceberg semantics)
        assert parts2 == {-30, -20, -10, 0, 10, 20}
        assert t2.scan(spark).count() == 50


class TestMaintenanceOnTransformedTables:
    def test_compact_bucket_partitioned(self, spark, tmp_table_dir):
        df = _events(spark, n=300)
        t = LakehouseTable.create(
            tmp_table_dir, df.schema, partition_col="event_id",
            partition_transform="bucket[4]",
        )
        for lo in range(0, 300, 100):  # several appends -> several
            t.append(df.filter((F.col("event_id") >= lo)  # files/bucket
                               & (F.col("event_id") < lo + 100)), n_files=8)
        per_part = t.files(spark).groupBy("partition_id").count().collect()
        assert all(r["count"] >= 2 for r in per_part)
        before = t.scan(spark).orderBy("event_id").collect()
        rep = compaction.compact(t, spark, target_file_size=1 << 30,
                                 key_col="event_id", sort_col="event_id")
        assert rep["files_in"] > rep["files_out"]
        after = t.scan(spark).orderBy("event_id").collect()
        assert before == after
        # layout still bucket-partitioned after the rewrite
        parts = {r["partition_id"]
                 for r in t.files(spark).select("partition_id").collect()}
        assert parts <= {str(i) for i in range(4)}


class TestTransformEvolution:
    def test_identity_to_day(self, spark, tmp_table_dir):
        df = _events(spark, n=120, days=2)
        t = LakehouseTable.create(tmp_table_dir, df.schema,
                                  partition_col="k")
        t.append(df.filter(F.col("event_id") < 60), n_files=2)
        t.evolve_partition("ts", transform="day")
        assert t.partition_transform() == "day"
        t.append(df.filter(F.col("event_id") >= 60), n_files=2)
        # partition_values scan re-filters old-spec files ROW-level
        # through the transform, so results stay exact
        got = t.scan(spark, partition_values={"2024-03-01"})
        want = df.filter(F.to_date("ts") == "2024-03-01")
        assert got.count() == want.count()

    def test_transform_requires_column(self, spark, tmp_table_dir):
        df = _events(spark, n=10)
        t = LakehouseTable.create(tmp_table_dir, df.schema,
                                  partition_col="k")
        with pytest.raises(ValueError):
            t.evolve_partition(None, transform="day")
        with pytest.raises(ValueError):
            LakehouseTable.create(tmp_table_dir + "/x", df.schema,
                                  partition_transform="bucket[4]")
