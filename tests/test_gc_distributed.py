"""Distributed GC planning (expire_snapshots / remove_orphan_files).

When handed a SparkSession, snapshot expiry and orphan removal must
plan their live/dead file sets as DataFrame reads + anti-joins over the
manifest parquet files — never materializing every manifest entry on
the driver. This is the same never-collect contract the data ops obey
(`table.py::files` docstring; enforced for compaction planning by
tests/test_maintenance.py::test_planning_never_materializes_full_manifest)
extended to the GC surface, matching the north-star's "snapshot
expiration driven by a DataFrame scan of Iceberg metadata tables".
"""

import os

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import clustering
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def _forbid_driver_manifest_reads(monkeypatch):
    def forbid_all(self, *a, **k):
        raise AssertionError("GC materialized all_entries on the driver")

    def forbid_read(self, *a, **k):
        raise AssertionError(
            "GC read a manifest driver-side (read_manifest_entries)"
        )

    monkeypatch.setattr(LakehouseTable, "all_entries", forbid_all)
    monkeypatch.setattr(LakehouseTable, "read_manifest_entries", forbid_read)


def _disk_parquet(t):
    out = set()
    for root, _dirs, files in os.walk(t.data_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(root, f), t._local_root))
    return out


def test_expire_snapshots_distributed_gc(spark, tmp_table_dir, monkeypatch):
    """keep_last=1 after a full compaction: the pre-compaction files are
    unreachable and must be GC'd with the whole live/dead classification
    running as a Spark anti-join (driver manifest reads forbidden)."""
    df = synth.images_df(spark, 200, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=8)
    clustering.cluster(t, spark, curve="zorder", target_file_size=1 << 30, n_chunks=1)
    pre_rows = t.scan(spark).count()
    pre_disk = _disk_parquet(t)

    _forbid_driver_manifest_reads(monkeypatch)
    out = t.expire_snapshots(keep_last=1, spark=spark)
    monkeypatch.undo()

    assert out["expired"] >= 1
    assert out["deleted_files"] >= 1
    post_disk = _disk_parquet(t)
    assert post_disk < pre_disk  # something was physically GC'd
    # every surviving snapshot still scans byte-correct
    assert t.scan(spark).count() == pre_rows
    live = {e["file_path"] for e in t.all_entries()}
    assert live <= post_disk  # no live file was deleted


def test_expire_distributed_matches_driver_path(spark, tmp_path):
    """The spark-planned GC deletes exactly the same files as the
    original driver-side set computation on an identical table."""
    results = {}
    for mode in ("driver", "spark"):
        loc = str(tmp_path / f"tbl_{mode}")
        df = synth.images_df(spark, 150, partitions=4)
        t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
        t.append(df, n_files=6)
        clustering.cluster(t, spark, curve="zorder", target_file_size=1 << 30, n_chunks=1)
        out = t.expire_snapshots(
            keep_last=1, spark=spark if mode == "spark" else None
        )
        # file NAMES embed writer uuids, so compare shape: counts and
        # how many physical files survive, plus live-set containment
        live = {e["file_path"] for e in t.all_entries()}
        disk = _disk_parquet(t)
        assert live <= disk
        results[mode] = (out["expired"], out["deleted_files"],
                         out["deleted_manifests"], len(disk))
    assert results["driver"] == results["spark"]


def test_remove_orphans_distributed(spark, tmp_table_dir, monkeypatch):
    """Uncommitted writer output (the crashed-writer shape) is removed
    with reachability computed distributed; live files survive."""
    df = synth.images_df(spark, 100, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    orphans = t.write_data_files(
        synth.images_df(spark, 50, partitions=2, id_offset=1000), n_files=2
    )
    pre_rows = t.scan(spark).count()

    _forbid_driver_manifest_reads(monkeypatch)
    out = t.remove_orphan_files(older_than_s=0.0, spark=spark)
    monkeypatch.undo()

    assert out["deleted_data_files"] == len(orphans)
    assert t.scan(spark).count() == pre_rows
    disk = _disk_parquet(t)
    assert not any(e["file_path"] in disk for e in orphans)


def test_remove_orphans_grace_period(spark, tmp_table_dir):
    """A just-written (in-flight) file inside the grace window is NOT
    treated as an orphan by the distributed listing."""
    df = synth.images_df(spark, 80, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    inflight = t.write_data_files(
        synth.images_df(spark, 30, partitions=2, id_offset=2000), n_files=1
    )
    out = t.remove_orphan_files(older_than_s=3600.0, spark=spark)
    assert out["deleted_data_files"] == 0
    disk = _disk_parquet(t)
    assert all(e["file_path"] in disk for e in inflight)


def test_remove_orphans_dry_run(spark, tmp_table_dir):
    """dry_run reports the exact candidate set — counts and sampled
    paths — while deleting NOTHING, in both the distributed and the
    driver reachability modes; a real run then removes exactly what
    the report promised. VACUUM ... DRY RUN is the SQL surface."""
    from mobility_lakehouse_project_spark.sql import execute_sql

    df = synth.images_df(spark, 100, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    orphans = t.write_data_files(
        synth.images_df(spark, 50, partitions=2, id_offset=1000), n_files=2
    )
    disk_before = _disk_parquet(t)

    for mode_spark in (spark, None):
        out = t.remove_orphan_files(older_than_s=0.0, spark=mode_spark,
                                    dry_run=True)
        assert out["dry_run"] is True
        assert out["orphan_data_files"] == len(orphans)
        assert set(out["sample"]) == {e["file_path"] for e in orphans}
        assert _disk_parquet(t) == disk_before  # nothing deleted

    sql_out = execute_sql(spark, "VACUUM t RETAIN 0 HOURS DRY RUN",
                          tables={"t": t})
    assert sql_out["dry_run"] is True
    assert sql_out["orphan_data_files"] == len(orphans)
    assert _disk_parquet(t) == disk_before

    real = t.remove_orphan_files(older_than_s=0.0, spark=spark)
    assert real["deleted_data_files"] == len(orphans)
    assert t.scan(spark).count() == 100
