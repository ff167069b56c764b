"""Maintenance-operator gates: compaction, clustering, MERGE, resume.

Replays the reference QA ladder (SURVEY.md §5) against every rewrite:
row-count conservation per partition, caption byte-equality, decoded
pixel equality/PSNR, orphan/null/duplicate gates, and the kill/resume
idempotency that mirrors Airflow catchup re-runs."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.lineage import LineageLog
from mobility_lakehouse_project_spark.operators import (
    clustering,
    compaction,
    merge,
    verify,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N_ROWS = 2400


@pytest.fixture()
def fragmented_table(spark, tmp_table_dir):
    """A table with many tiny files (FIXTURES.md F4 shape)."""
    t = None
    for k in range(3):
        df = synth.images_df(spark, N_ROWS // 3, id_offset=k * (N_ROWS // 3), partitions=4)
        if t is None:
            t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
        t.append(df, n_files=24)
    return t


def test_compaction_reduces_files_conserves_rows(spark, fragmented_table):
    t = fragmented_table
    pre_snap = t.current_snapshot().snapshot_id
    pre_files = len(t.all_entries())
    m = compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=2)
    assert m["files_in"] > m["files_out"] > 0
    assert len(t.all_entries()) < pre_files
    rep = verify.verify_maintenance(t, spark, pre_snapshot_id=pre_snap)
    assert rep["ok"]


def test_compaction_resume_skips_completed_chunks(spark, fragmented_table):
    """Kill/resume: pretend a prior run completed chunk 0 and died —
    the resumed run must skip chunk 0's partitions (no recompaction,
    north_rule) and process only the rest."""
    t = fragmented_table
    op_id = "compact-resume-test"
    plan = compaction.plan_compaction(t, spark, target_file_size=1 << 20)
    assert len(plan) >= 2
    chunks = compaction._chunk(plan, 2)
    ck0 = compaction.chunk_key([p["partition_id"] for p in chunks[0]])
    LineageLog(t.location).record(
        op_id, ck0, [p["partition_id"] for p in chunks[0]], 0, 0, 0, 0, 0, 0
    )
    pre_chunk0_files = set(
        compaction.chunk_file_paths(
            t, spark, [p["partition_id"] for p in chunks[0]],
            max_file_size=int((1 << 20) * 0.75),
        )
    )
    m = compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=2, op_id=op_id)
    assert m["chunks_skipped"] == 1
    # chunk 0's files untouched on disk & still referenced
    live = {e["file_path"] for e in t.all_entries()}
    assert pre_chunk0_files <= live
    assert t.scan(spark).count() == N_ROWS


def test_cluster_zorder_improves_pruning(spark, fragmented_table):
    t = fragmented_table
    pre_snap = t.current_snapshot().snapshot_id
    lo, hi = -(2**61), -(2**60)  # narrow phash band
    before = clustering.pruning_ratio(t, spark, "phash", lo, hi)
    m = clustering.cluster(t, spark, curve="zorder", target_file_size=200 * 1024, n_chunks=2)
    assert m["rows"] == N_ROWS
    after = clustering.pruning_ratio(t, spark, "phash", lo, hi)
    assert after["pruned_fraction"] > before["pruned_fraction"]
    rep = verify.verify_maintenance(t, spark, pre_snapshot_id=pre_snap)
    assert rep["ok"]
    # pruned scan returns exactly the same rows as a full-scan filter
    full = t.scan(spark).filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    pruned = (
        t.scan(spark, int_ranges={"phash": (lo, hi)})
        .filter((F.col("phash") >= lo) & (F.col("phash") <= hi))
        .count()
    )
    assert pruned == full


def test_cluster_hilbert_runs(spark, fragmented_table):
    t = fragmented_table
    pre = t.current_snapshot().snapshot_id
    m = clustering.cluster(t, spark, curve="hilbert", target_file_size=300 * 1024, n_chunks=1)
    assert m["rows"] == N_ROWS
    assert verify.verify_maintenance(t, spark, pre_snapshot_id=pre)["ok"]


def test_merge_into_update_insert_semantics(spark, fragmented_table):
    t = fragmented_table
    src = synth.merge_source_df(spark, N_ROWS, 400, overlap=0.25)
    n_src = src.count()
    n_upd = src.join(t.scan(spark), "image_id", "left_semi").count()
    res = merge.merge_into(t, spark, src, target_file_size=1 << 20)
    post = t.scan(spark)
    assert post.count() == N_ROWS + (n_src - n_upd)
    # updated rows carry the source caption (seed+1 content)
    updated = post.alias("p").join(src.alias("s"), "image_id").filter(
        F.col("p.caption") != F.col("s.caption")
    )
    assert updated.count() == 0
    # no duplicate keys anywhere
    assert post.groupBy("image_id").count().filter(F.col("count") > 1).count() == 0


def test_merge_untouched_rows_survive_byte_identical(spark, fragmented_table):
    t = fragmented_table
    pre_snap = t.current_snapshot().snapshot_id
    src = synth.merge_source_df(spark, N_ROWS, 200, overlap=0.5)
    merge.merge_into(t, spark, src)
    pre = t.scan(spark, snapshot_id=pre_snap).alias("a")
    post = t.scan(spark).alias("b")
    untouched = pre.join(src.select("image_id"), "image_id", "left_anti")
    diff = (
        untouched.alias("a")
        .join(post, "image_id")
        .filter(
            (F.col("a.caption") != F.col("b.caption"))
            | (F.col("a.bytes") != F.col("b.bytes"))
        )
        .count()
    )
    assert diff == 0


def test_full_maintenance_pipeline_with_expiry(spark, fragmented_table):
    """compact -> zorder -> merge -> expire: end state consistent, old
    files GC'd, lineage queryable."""
    t = fragmented_table
    compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=1)
    clustering.cluster(t, spark, curve="zorder", target_file_size=1 << 20, n_chunks=1)
    src = synth.merge_source_df(spark, N_ROWS, 100)
    merge.merge_into(t, spark, src)
    n_expected = t.scan(spark).count()
    res = t.expire_snapshots(keep_last=2)
    assert res["deleted_files"] > 0
    assert t.scan(spark).count() == n_expected
    ldf = LineageLog(t.location).lineage_df(spark)
    assert ldf.count() >= 3
    assert {r["op_id"].split("-")[0] for r in ldf.select("op_id").collect()} >= {
        "compact",
        "cluster",
        "merge",
    }


def test_planning_never_materializes_full_manifest(spark, tmp_table_dir, monkeypatch):
    """Inject a 10k-file synthetic manifest: compaction planning, chunk
    path fetch, scan pruning, and pruning_ratio must all run as
    files()-DataFrame operations — the driver-side all_entries
    materialization is forbidden for the whole planning phase, and the
    per-chunk collect is bounded by the chunk's partitions."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
    ])
    t = LakehouseTable.create(tmp_table_dir, schema, partition_col="bucket")
    entries = [
        {
            "file_path": f"data/fake/part-{i:05d}.parquet",
            "partition_id": str(i % 50),
            "record_count": 100,
            "file_size_bytes": 1_000_000,
            "added_snapshot_id": -1,
            "int_mins": {"phash": i * 10},
            "int_maxs": {"phash": i * 10 + 9},
            "str_mins": {},
            "str_maxs": {},
        }
        for i in range(10_000)
    ]
    t.commit_append(entries)

    def forbid(self, *a, **k):
        raise AssertionError("planning materialized the full manifest on the driver")

    monkeypatch.setattr(LakehouseTable, "all_entries", forbid)
    plan = compaction.plan_compaction(t, spark, target_file_size=100 * 1024 * 1024)
    assert len(plan) == 50
    assert all("files" not in p for p in plan)  # no per-partition path lists
    # per-chunk fetch: exactly one partition's 200 paths
    paths = compaction.chunk_file_paths(t, spark, [plan[0]["partition_id"]])
    assert len(paths) == 200
    # stats pruning plans distributed: phash in [0, 99] -> 10 files
    assert t.plan_files(spark, int_ranges={"phash": (0, 99)}).count() == 10
    pr = clustering.pruning_ratio(t, spark, "phash", 0, 99)
    assert pr["scanned_files"] == 10 and pr["total_files"] == 10_000
    # metadata compaction obeys the same rule: consolidating manifests
    # runs off the files() DataFrame (distributed write + driver rename),
    # never all_entries — with stats preserved through the round trip
    t.commit_append([
        {
            "file_path": f"data/fake2/part-{i:05d}.parquet",
            "partition_id": str(i % 50),
            "record_count": 100,
            "file_size_bytes": 1_000_000,
            "added_snapshot_id": -1,
            "int_mins": {"phash": 100_000 + i * 10},
            "int_maxs": {"phash": 100_000 + i * 10 + 9},
            "str_mins": {},
            "str_maxs": {},
        }
        for i in range(100)
    ])
    assert len(t.current_snapshot().manifests) == 2
    snap = t.rewrite_manifests(spark)
    assert len(snap.manifests) == 1
    assert t.files(spark).count() == 10_100
    assert t.plan_files(spark, int_ranges={"phash": (0, 99)}).count() == 10
    assert sorted(snap.manifest_parts[snap.manifests[0]]) == sorted(
        str(i) for i in range(50)
    )


def test_time_travel_across_maintenance_rewrites(spark, fragmented_table):
    """Snapshot isolation through the whole maintenance story: after
    compact + zorder + MERGE, a time-travel scan at the pre-maintenance
    snapshot still returns the ORIGINAL data byte-identically (old
    files are unreferenced by the new snapshots but not deleted until
    expiry)."""
    t = fragmented_table
    s0 = t.current_snapshot().snapshot_id

    def fingerprint(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32("caption")).alias("cap"),
            F.sum(F.crc32("bytes")).alias("blob"),
            F.sum(F.crc32(F.col("phash").cast("string"))).alias("ph"),
        ).collect()[0]

    pre = fingerprint(t.scan(spark))
    compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=2)
    clustering.cluster(t, spark, curve="zorder", target_file_size=1 << 20, n_chunks=1)
    merge.merge_into(t, spark, synth.merge_source_df(spark, N_ROWS, 200, overlap=0.5))
    # current state HAS changed (merge updated captions/bytes)
    cur = fingerprint(t.scan(spark))
    assert (cur["cap"], cur["blob"]) != (pre["cap"], pre["blob"])
    # ...but the pre-maintenance snapshot reads the original data
    tt = fingerprint(t.scan(spark, snapshot_id=s0))
    assert tuple(tt) == tuple(pre)
    # and after expiry, old snapshots are gone by design
    t.expire_snapshots(keep_last=1)
    with pytest.raises(StopIteration):
        t.scan(spark, snapshot_id=s0)


def test_cluster_prunes_secondary_dims(spark, fragmented_table):
    """r2 weak finding: w/h predicates pruned 0.000 of files because the
    key builder clipped instead of range-scaling. After range-scaled
    normalization, SECONDARY dims (w, h) must prune too, and the pruned
    scan must stay exact."""
    t = fragmented_table
    # small target => ~20 files/partition so the curve prefix reaches
    # the secondary dims' bits (with 2 files/partition only the primary
    # dim's top bit can split — not a normalization defect)
    m = clustering.cluster(
        t, spark, curve="zorder", target_file_size=16 * 1024, n_chunks=2
    )
    assert m["rows"] == N_ROWS
    # synth dims are {8,16,32,64}: a w=8 point predicate and an h>=32
    # band must each skip a nonzero fraction of files
    pw = clustering.pruning_ratio(t, spark, "w", 8, 8)
    ph = clustering.pruning_ratio(t, spark, "h", 32, 2**31)
    assert pw["pruned_fraction"] > 0.0
    assert ph["pruned_fraction"] > 0.0
    # phash (primary dim) must still prune as well
    pp = clustering.pruning_ratio(t, spark, "phash", -(2**61), -(2**60))
    assert pp["pruned_fraction"] > 0.0
    # pruned scans return exactly the full-scan-filter answer
    for col, lo, hi in (("w", 8, 8), ("h", 32, 2**31)):
        full = t.scan(spark).filter(
            (F.col(col) >= lo) & (F.col(col) <= hi)
        ).count()
        pruned = (
            t.scan(spark, int_ranges={col: (lo, hi)})
            .filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .count()
        )
        assert pruned == full and full > 0


def test_cluster_single_column_max_phash_pruning(spark, fragmented_table):
    """cluster(cols=("phash",)) = plain sort layout: at COARSE file
    granularity (few files/partition) it must prune a narrow phash band
    at least as well as the 3-dim key does (the single-dim-workload
    recommendation in BENCH/BASELINE.md)."""
    t = fragmented_table
    m = clustering.cluster(
        t, spark, curve="zorder", cols=("phash",),
        target_file_size=150 * 1024, n_chunks=2,
    )
    assert m["rows"] == N_ROWS
    lo, hi = -(2**61), -(2**60)
    p = clustering.pruning_ratio(t, spark, "phash", lo, hi)
    assert p["pruned_fraction"] >= 0.5  # pure sort: tight phash ranges
    full = t.scan(spark).filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    pruned = (
        t.scan(spark, int_ranges={"phash": (lo, hi)})
        .filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    )
    assert pruned == full


def test_only_partitions_scopes_maintenance(spark, fragmented_table):
    """Incremental maintenance: compact/cluster scoped to a partition
    subset touch ONLY those partitions' files."""
    t = fragmented_table
    parts = sorted(
        r["partition_id"]
        for r in t.files(spark).select("partition_id").distinct().collect()
    )
    scope = set(parts[:2])
    before = {
        r["file_path"]: r["partition_id"]
        for r in t.files(spark).select("file_path", "partition_id").collect()
    }
    m = compaction.compact(
        t, spark, target_file_size=1 << 20, n_chunks=1, only_partitions=scope
    )
    assert m["files_in"] > 0
    after = {
        r["file_path"]: r["partition_id"]
        for r in t.files(spark).select("file_path", "partition_id").collect()
    }
    untouched_before = {p for p, pid in before.items() if pid not in scope}
    untouched_after = {p for p, pid in after.items() if pid not in scope}
    assert untouched_before == untouched_after  # out-of-scope files intact
    assert all(pid in scope for p, pid in after.items() if p not in before)
    assert t.scan(spark).count() == N_ROWS
    m2 = clustering.cluster(
        t, spark, curve="zorder", target_file_size=1 << 20, n_chunks=1,
        only_partitions=scope,
    )
    assert m2["rows"] == sum(
        r["record_count"]
        for r in t.files(spark).filter(F.col("partition_id").isin(list(scope)))
        .select("record_count").collect()
    )
    assert t.scan(spark).count() == N_ROWS
