"""Manifest-list pruning (Iceberg manifest-list lower/upper bounds).

plan_files must skip whole manifests whose partition or column-bound
summaries are disjoint from the predicates BEFORE opening them — at
10^12 scale planning cost is O(surviving manifests), not O(all
manifest entries). Skipping is evidence-checked two ways: the planning
DataFrame's inputFiles() (which manifest parquets the scan actually
opens) and result equality against the unpruned path.
"""

import pyspark.sql.types as T
import pytest

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def _entry(i, pid, phash_lo, phash_hi, with_stats=True):
    e = {
        "file_path": f"data/fake/part-{pid}-{i:05d}.parquet",
        "partition_id": str(pid),
        "record_count": 10,
        "file_size_bytes": 1000,
        "added_snapshot_id": -1,
        "int_mins": {"phash": phash_lo} if with_stats else {},
        "int_maxs": {"phash": phash_hi} if with_stats else {},
        "str_mins": {"dt": f"2024-0{pid + 1}-01"} if with_stats else {},
        "str_maxs": {"dt": f"2024-0{pid + 1}-28"} if with_stats else {},
    }
    return e


_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("dt", T.StringType()),
    T.StructField("bucket", T.IntegerType()),
])


def _manifests_opened(df):
    return {p.rsplit("/", 1)[-1] for p in df.inputFiles()}


def test_partition_predicate_skips_disjoint_manifests(spark, tmp_table_dir):
    t = LakehouseTable.create(tmp_table_dir, _SCHEMA, partition_col="bucket")
    # three commits, partition-disjoint -> three manifests
    t.commit_append([_entry(i, 0, 0, 99) for i in range(4)])
    t.commit_append([_entry(i, 1, 100, 199) for i in range(4)])
    t.commit_append([_entry(i, 2, 200, 299) for i in range(4)])
    snap = t.current_snapshot()
    assert len(snap.manifests) == 3

    planned = t.plan_files(spark, partition_values={"1"})
    assert planned.count() == 4
    assert len(_manifests_opened(planned)) == 1

    subset, skipped = t._prune_manifests(
        snap, t.load_metadata(), partition_values={"1"})
    assert skipped == 2 and len(subset) == 1


def test_int_range_skips_by_manifest_bounds(spark, tmp_table_dir):
    t = LakehouseTable.create(tmp_table_dir, _SCHEMA, partition_col="bucket")
    t.commit_append([_entry(i, 0, i * 10, i * 10 + 9) for i in range(4)])
    t.commit_append([_entry(i, 0, 1000 + i * 10, 1000 + i * 10 + 9)
                     for i in range(4)])
    snap = t.current_snapshot()
    assert len(snap.manifests) == 2
    # bounds were recorded at write time
    assert snap.manifest_bounds[snap.manifests[0]]["int"]["phash"] == [0, 39]

    planned = t.plan_files(spark, int_ranges={"phash": (1005, 1015)})
    assert planned.count() == 2
    assert len(_manifests_opened(planned)) == 1
    # results identical to the unpruned row-level path
    unpruned = t.files(spark).filter(
        "int_maxs['phash'] >= 1005 and int_mins['phash'] <= 1015")
    assert planned.count() == unpruned.count()


def test_str_range_skips_by_manifest_bounds(spark, tmp_table_dir):
    t = LakehouseTable.create(tmp_table_dir, _SCHEMA, partition_col="bucket")
    t.commit_append([_entry(i, 0, 0, 9) for i in range(3)])   # dt 2024-01
    t.commit_append([_entry(i, 3, 0, 9) for i in range(3)])   # dt 2024-04
    planned = t.plan_files(
        spark, int_ranges={"dt": ("2024-04-01", "2024-04-30")})
    assert planned.count() == 3
    assert len(_manifests_opened(planned)) == 1


def test_stats_less_file_blocks_column_skipping(spark, tmp_table_dir):
    """One entry without phash stats -> the manifest records no phash
    bound and can never be skipped on phash (conservative)."""
    t = LakehouseTable.create(tmp_table_dir, _SCHEMA, partition_col="bucket")
    t.commit_append([_entry(0, 0, 0, 9), _entry(1, 0, 0, 9, with_stats=False)])
    snap = t.current_snapshot()
    assert "phash" not in snap.manifest_bounds[snap.manifests[0]].get("int", {})
    subset, skipped = t._prune_manifests(
        snap, t.load_metadata(), int_ranges={"phash": (10 ** 9, None)})
    assert skipped == 0 and subset == snap.manifests


def test_rewrite_manifests_recomputes_bounds(spark, tmp_table_dir):
    t = LakehouseTable.create(tmp_table_dir, _SCHEMA, partition_col="bucket")
    t.commit_append([_entry(i, 0, i * 10, i * 10 + 9) for i in range(4)])
    t.commit_append([_entry(i, 1, 500 + i, 500 + i) for i in range(4)])
    snap = t.rewrite_manifests(spark)
    assert len(snap.manifests) == 1
    b = snap.manifest_bounds[snap.manifests[0]]
    assert b["int"]["phash"] == [0, 503]
    assert b["str"]["dt"] == ["2024-01-01", "2024-02-28"]
    # pruning still fires post-consolidation (single manifest: range
    # outside the global bound opens nothing)
    planned = t.plan_files(spark, int_ranges={"phash": (10 ** 6, None)})
    assert planned.count() == 0
    assert len(_manifests_opened(planned)) == 0


def test_real_write_path_records_bounds_and_scan_matches(spark, tmp_table_dir):
    """End to end on real data files: appends record bounds, a pruned
    scan returns exactly the rows of the unpruned scan."""
    df = synth.images_df(spark, 120, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    lo = df.agg({"phash": "min"}).first()[0]
    mid = df.approxQuantile("phash", [0.5], 0.01)[0]
    t.append(df.filter(df.phash <= mid), n_files=2)
    t.append(df.filter(df.phash > mid), n_files=2)
    snap = t.current_snapshot()
    assert all(m in snap.manifest_bounds for m in snap.manifests)

    rng = {"phash": (int(lo), int(mid) - 1)}
    pruned = t.scan(spark, int_ranges=rng).filter(
        f"phash between {int(lo)} and {int(mid) - 1}")
    full = t.scan(spark).filter(
        f"phash between {int(lo)} and {int(mid) - 1}")
    assert pruned.count() == full.count()
    subset, skipped = t._prune_manifests(snap, t.load_metadata(),
                                         int_ranges=rng)
    assert skipped >= 1


def test_manifest_subset_guard(spark, tmp_table_dir):
    t = LakehouseTable.create(tmp_table_dir, _SCHEMA, partition_col="bucket")
    t.commit_append([_entry(0, 0, 0, 9)])
    with pytest.raises(ValueError, match="manifest_subset"):
        t.files(spark, manifest_subset=["manifests/not-there.parquet"])
