"""Table-format invariants: snapshot isolation, atomic commit, time
travel, partition overwrite idempotency, manifest pruning.

Mirrors the reference's quality gates (SURVEY.md §5) at the metadata
layer: the DELETE-day+INSERT-day idempotency of
dags/Silver_Transform_Dag.py:188-207 becomes overwrite_partitions; the
DuckLake catalog transaction becomes the version-pointer swap."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.tableformat import (
    ConcurrentCommitError,
    LakehouseTable,
)


@pytest.fixture()
def small_table(spark, tmp_table_dir):
    df = synth.images_df(spark, 800, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=8)
    return t


def test_append_and_scan_counts(spark, small_table):
    assert small_table.scan(spark).count() == 800
    files = small_table.files(spark)
    agg = files.agg(F.sum("record_count").alias("r")).collect()[0]
    assert agg["r"] == 800


def test_scan_matches_direct_parquet_read(spark, small_table):
    """The reference's first gate (scripts/verify_lakehouse.py:82-101):
    engine scan totals == direct file read totals."""
    import os

    direct = spark.read.parquet(
        *[os.path.join(small_table.location, e["file_path"]) for e in small_table.all_entries()]
    )
    a = small_table.scan(spark).groupBy("bucket").count().collect()
    b = direct.groupBy("bucket").count().collect()
    assert sorted((r["bucket"], r["count"]) for r in a) == sorted(
        (r["bucket"], r["count"]) for r in b
    )


def test_snapshot_time_travel(spark, small_table):
    s1 = small_table.current_snapshot().snapshot_id
    small_table.append(synth.images_df(spark, 200, id_offset=800, partitions=2), n_files=2)
    s2 = small_table.current_snapshot().snapshot_id
    assert small_table.scan(spark, snapshot_id=s1).count() == 800
    assert small_table.scan(spark, snapshot_id=s2).count() == 1000
    ops = [s.operation for s in small_table.snapshots_list()]
    assert ops == ["append", "append"]


def test_concurrent_commit_rejected(spark, small_table):
    """Optimistic concurrency: a commit whose parent is stale must fail
    (north_rule: commits 'validated against pre/post snapshot IDs')."""
    stale_meta = small_table.load_metadata()
    small_table.append(synth.images_df(spark, 100, id_offset=800), n_files=1)
    entries = small_table.all_entries()[:1]
    from mobility_lakehouse_project_spark.tableformat.table import Snapshot

    snap = Snapshot(999, stale_meta["current_snapshot_id"], 99, 0, "append", [])
    with pytest.raises(ConcurrentCommitError):
        small_table._commit(stale_meta, snap, stale_meta["current_snapshot_id"])


def test_overwrite_partitions_idempotent(spark, small_table):
    """Re-running a partition load replaces, never duplicates — the
    Spark-native DELETE+INSERT idiom."""
    before = small_table.scan(spark).count()
    one_bucket = synth.images_df(spark, 800, partitions=4).filter(F.col("bucket") == 3)
    n_b3 = one_bucket.count()
    for _ in range(2):  # idempotent under re-run
        small_table.overwrite_partitions(one_bucket, n_files=2)
        assert small_table.scan(spark).count() == before
        assert small_table.scan(spark, partition_values={3}).filter(
            F.col("bucket") == 3
        ).count() == n_b3


def test_manifest_pruning_narrows_file_set(spark, small_table):
    entries = small_table.all_entries()
    lo, hi = 10**17, 2 * 10**17
    pruned = small_table.scan(spark, int_ranges={"phash": (lo, hi)})
    direct_cnt = small_table.scan(spark).filter(
        (F.col("phash") >= lo) & (F.col("phash") <= hi)
    ).count()
    pruned_cnt = pruned.filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    assert pruned_cnt == direct_cnt  # pruning never loses rows


def test_rewrite_manifests_consolidates(spark, small_table):
    small_table.append(synth.images_df(spark, 100, id_offset=800), n_files=2)
    assert len(small_table.current_snapshot().manifests) == 2
    small_table.rewrite_manifests(spark)
    assert len(small_table.current_snapshot().manifests) == 1
    assert small_table.scan(spark).count() == 900
    # the consolidated (Spark-written) manifest must interoperate with
    # the pyarrow manifest path: driver reads, a subsequent pyarrow-
    # written manifest alongside it, stats pruning, and replace commits
    entries = small_table.read_manifest_entries(
        small_table.current_snapshot().manifests[0]
    )
    assert sum(e["record_count"] for e in entries) == 900
    assert all(isinstance(e["int_mins"], dict) and "phash" in e["int_mins"]
               for e in entries)
    small_table.append(synth.images_df(spark, 50, id_offset=900), n_files=1)
    assert len(small_table.current_snapshot().manifests) == 2
    assert small_table.scan(spark).count() == 950
    assert small_table.scan(
        spark, int_ranges={"phash": (0, 2**62)}
    ).count() > 0


def test_expire_snapshots_gc(spark, small_table):
    import os

    small_table.append(synth.images_df(spark, 100, id_offset=800), n_files=2)
    # replace everything so old files become unreferenced
    all_df = small_table.scan(spark)
    entries = small_table.write_data_files(all_df, n_files=4)
    small_table.commit_replace(
        {e["file_path"] for e in small_table.all_entries()}, entries
    )
    res = small_table.expire_snapshots(keep_last=1)
    assert res["expired"] >= 1 and res["deleted_files"] > 0
    assert small_table.scan(spark).count() == 900
    # all remaining manifest-referenced files exist on disk
    for e in small_table.all_entries():
        assert os.path.exists(os.path.join(small_table.location, e["file_path"]))


def test_commit_replace_skips_disjoint_manifests(spark, tmp_table_dir, monkeypatch):
    """Manifest-list partition summaries: a replace commit scoped to
    one partition must not OPEN manifests whose summaries are disjoint
    — commit cost O(affected manifests), not O(table)."""
    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.tableformat.table import LakehouseTable as LT

    df = synth.images_df(spark, 600, partitions=4)
    t = LT.create(tmp_table_dir, df.schema, partition_col="bucket")
    # one manifest per partition value (disjoint summaries)
    for b in range(4):
        part = df.filter(df.bucket == b)
        if part.count():
            t.append(part, n_files=2)
    snap = t.current_snapshot()
    assert len(snap.manifests) >= 3
    assert all(m in snap.manifest_parts for m in snap.manifests)

    reads = []
    orig = LT.read_manifest_entries

    def spy(self, m):
        reads.append(m)
        return orig(self, m)

    monkeypatch.setattr(LT, "read_manifest_entries", spy)
    target = snap.manifest_parts[snap.manifests[0]][0]  # a partition id
    removed = {
        r["file_path"]
        for r in t.plan_files(spark, partition_values={target}).select("file_path").collect()
    }
    pre_rows = t.scan(spark).count()
    entries = t.write_data_files(t.scan_files(spark, sorted(removed)), n_files=1)
    t.commit_replace(removed, entries, affected_partitions={target})
    # only manifests whose summary contains the target partition opened
    opened_parts = {p for m in reads for p in t.current_snapshot().manifest_parts.get(m, [target])}
    assert all(target in snap.manifest_parts[m] for m in reads)
    assert len(reads) < len(snap.manifests)
    assert t.scan(spark).count() == pre_rows
    # wrong affected set -> loud failure, never silent loss
    import pytest as _pt

    snap2 = t.current_snapshot()
    some_part = sorted({p for ps in snap2.manifest_parts.values() for p in ps})[0]
    removed2 = {
        r["file_path"]
        for r in t.plan_files(spark, partition_values={some_part}).select("file_path").collect()
    }
    # (ConcurrentCommitError since the stale-plan unification: the
    # same surface a concurrent rewrite produces; a true caller bug
    # keeps failing on every replan, so it still shows loudly)
    with _pt.raises(ConcurrentCommitError, match="replan required"):
        t.commit_replace(removed2, [], affected_partitions={"nonexistent-part"})


def test_optimistic_commit_retry(spark, tmp_table_dir, monkeypatch):
    """A commit racing another writer retries against the refreshed
    metadata: appends always compose; a replace composes when its
    removed files survive; a truly stale replace plan fails loudly."""
    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
        LakehouseTable as LT,
    )

    df = synth.images_df(spark, 200, partitions=2)
    t = LT.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=2)

    # inject: the first _commit attempt races a concurrent writer (we
    # advance the table out from under it), subsequent attempts run real
    orig_commit = LT._commit
    state = {"raced": False}
    racer_entries = t.write_data_files(synth.images_df(spark, 50, partitions=1,
                                                       id_offset=10_000))

    def racing_commit(self, base_meta, new_snapshot, expected_parent,
                      branch="main", **kw):
        if not state["raced"]:
            state["raced"] = True
            # concurrent writer lands first (uses the real commit path)
            orig_commit(
                self, self.load_metadata(),
                *_mk_snap(self, racer_entries),
            )
        return orig_commit(self, base_meta, new_snapshot, expected_parent,
                           branch, **kw)

    def _mk_snap(tbl, entries):
        meta = tbl.load_metadata()
        parent = meta["current_snapshot_id"]
        snap_id, seq = tbl._next_ids(meta)
        manifest, parts, _mb = tbl._write_manifest(entries, snap_id)
        prev = tbl.current_snapshot(meta)
        from mobility_lakehouse_project_spark.tableformat.table import Snapshot
        import time as _time

        mp = dict(prev.manifest_parts if prev else {})
        mp[manifest] = parts
        snap = Snapshot(snap_id, parent, seq, int(_time.time() * 1000), "append",
                        (prev.manifests if prev else []) + [manifest],
                        {"added-files": len(entries)}, mp)
        return snap, parent

    monkeypatch.setattr(LT, "_commit", racing_commit)
    # append retries through the race and lands on top of the racer
    mine = t.write_data_files(synth.images_df(spark, 30, partitions=1,
                                              id_offset=20_000))
    t.commit_append(mine)
    assert t.scan(spark).count() == 200 + 50 + 30

    # replace retries when the racer's append is DISJOINT from the
    # affected partition...
    parts = sorted({
        r["partition_id"] for r in t.files(spark).select("partition_id").collect()
    })
    some_part = parts[0]
    other_part = int(parts[-1])
    state["raced"] = False
    racer_entries = t.write_data_files(
        synth.images_df(spark, 40, partitions=1, id_offset=30_000)
        .withColumn("bucket", F.lit(other_part))
    )
    removed = {
        r["file_path"]
        for r in t.plan_files(spark, partition_values={some_part})
        .select("file_path").collect()
    }
    rewritten = t.write_data_files(t.scan_files(spark, sorted(removed)), n_files=1)
    t.commit_replace(removed, rewritten, affected_partitions={some_part})
    assert t.scan(spark).count() == 200 + 50 + 30 + 40

    # ...but a racer appending INTO the affected partition invalidates
    # the rewrite plan: the retry must surface a replan error, never
    # silently merge data the plan did not see
    state["raced"] = False
    racer_entries = t.write_data_files(
        synth.images_df(spark, 10, partitions=1, id_offset=50_000)
        .withColumn("bucket", F.lit(int(some_part)))
    )
    removed2 = {
        r["file_path"]
        for r in t.plan_files(spark, partition_values={some_part})
        .select("file_path").collect()
    }
    rewritten2 = t.write_data_files(t.scan_files(spark, sorted(removed2)), n_files=1)
    import pytest as _pt

    # ConcurrentCommitError (not a plain ValueError): the caller's
    # contract is catch-and-replan, same as every pinned-commit path
    with _pt.raises(ConcurrentCommitError, match="replan"):
        t.commit_replace(removed2, rewritten2, affected_partitions={some_part})

    # retries exhausted -> the error surfaces
    def always_conflict(self, *a, **k):
        raise ConcurrentCommitError("busy table")

    monkeypatch.setattr(LT, "_commit", always_conflict)
    import pytest as _pt

    with _pt.raises(ConcurrentCommitError):
        t.commit_append(t.write_data_files(synth.images_df(spark, 5, partitions=1,
                                                           id_offset=40_000)),
                        retries=2)


def test_remove_orphan_files(spark, tmp_table_dir):
    """Crashed-writer outputs (written, never committed) and manifests
    from failed commit attempts are invisible to expire_snapshots;
    remove_orphan_files GCs them while live data survives — and the
    grace period protects in-flight writes."""
    from mobility_lakehouse_project_spark import synth

    df = synth.images_df(spark, 200, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=2)
    n_live = t.scan(spark).count()

    # a crashed writer: files written, commit never happened
    t.write_data_files(synth.images_df(spark, 50, partitions=1, id_offset=9999))
    # grace period: young orphans survive
    res = t.remove_orphan_files(older_than_s=3600)
    assert res["deleted_data_files"] == 0
    # age them out
    import glob as g
    import os

    for fp in g.glob(os.path.join(t.data_dir, "**", "*.parquet"), recursive=True):
        os.utime(fp, (1, 1))
    for fp in g.glob(os.path.join(t.manifest_dir, "manifest-*.parquet")):
        os.utime(fp, (1, 1))
    res = t.remove_orphan_files(older_than_s=60)
    assert res["deleted_data_files"] > 0  # the crashed writer's files
    assert t.scan(spark).count() == n_live  # live data untouched
    # idempotent
    assert t.remove_orphan_files(older_than_s=60)["deleted_data_files"] == 0


def test_cas_prevents_lost_commit(spark, small_table):
    """ADVICE r2: the version-file write must be a true CAS. Simulate a
    racer that wrote v<N+1>.metadata.json but has not yet swapped the
    hint — our commit passes the check-then-write version checks, so
    only an exclusive-create at the file itself can stop us from
    silently overwriting the racer's commit (lost commit)."""
    t = small_table
    racer_path = t._meta_path(t.current_version() + 1)
    with open(racer_path, "x") as f:
        f.write('{"racer": true}')
    with pytest.raises(ConcurrentCommitError):
        t.append(synth.images_df(spark, 10, id_offset=900), n_files=1)
    with open(racer_path) as f:
        assert "racer" in f.read()  # the racer's commit was NOT overwritten


def test_commit_append_expected_parent_pins_plan_snapshot(spark, small_table):
    """A check-then-commit caller (merge insert-only anti-join) pins the
    commit to the snapshot its premise was computed against; any commit
    landing in the plan->commit window must surface, not compose."""
    t = small_table
    parent = t.load_metadata()["current_snapshot_id"]
    entries = t.write_data_files(
        synth.images_df(spark, 10, id_offset=900), n_files=1
    )
    t.append(synth.images_df(spark, 5, id_offset=950), n_files=1)  # concurrent
    with pytest.raises(ConcurrentCommitError):
        t.commit_append(entries, retries=0, expected_parent=parent)


def test_snapshot_as_of_and_rollback(spark, small_table):
    """Timestamp time travel + rollback: rollback is a metadata-only
    commit through the CAS; the abandoned branch stays readable and the
    next data commit parents off the restored snapshot."""
    t = small_table
    s1 = t.current_snapshot()
    t.append(synth.images_df(spark, 100, id_offset=800), n_files=1)
    s2 = t.current_snapshot()
    assert t.scan(spark).count() == 900
    # timestamp travel: as-of s1's commit time resolves to s1
    assert t.snapshot_as_of(s1.timestamp_ms).snapshot_id == s1.snapshot_id
    assert t.snapshot_as_of(s2.timestamp_ms + 10).snapshot_id == s2.snapshot_id
    with pytest.raises(ValueError):
        t.snapshot_as_of(s1.timestamp_ms - 100_000)
    # rollback to s1: current scan shrinks, branch stays readable
    t.rollback_to(s1.snapshot_id)
    assert t.scan(spark).count() == 800
    assert t.scan(spark, snapshot_id=s2.snapshot_id).count() == 900
    with pytest.raises(ValueError):
        t.rollback_to(424242)
    # next commit parents off the restored snapshot
    t.append(synth.images_df(spark, 50, id_offset=900), n_files=1)
    assert t.scan(spark).count() == 850
    assert t.current_snapshot().parent_id == s1.snapshot_id


def test_table_properties_and_write_codec(spark, tmp_table_dir):
    """Table properties persist through metadata commits, and the
    write.parquet.compression-codec property controls the parquet codec
    of THIS table's data files (blob payloads are already compressed —
    recompressing burns CPU for no ratio)."""
    import glob as g
    import os

    import pyarrow.parquet as pq

    df = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(
        tmp_table_dir, df.schema, partition_col="bucket",
        properties={"write.parquet.compression-codec": "uncompressed"},
    )
    t.append(df, n_files=2)
    fp = g.glob(os.path.join(t.data_dir, "**", "*.parquet"), recursive=True)[0]
    md = pq.ParquetFile(fp).metadata
    codecs = {md.row_group(0).column(i).compression for i in range(md.num_columns)}
    assert codecs == {"UNCOMPRESSED"}
    assert t.scan(spark).count() == 120  # parquet is self-describing
    # property update is a CAS metadata commit; new writes honor it
    t.update_properties({"write.parquet.compression-codec": "zstd"})
    assert t.properties()["write.parquet.compression-codec"] == "zstd"
    t.append(synth.images_df(spark, 30, id_offset=120, partitions=1), n_files=1)
    newest = max(
        g.glob(os.path.join(t.data_dir, "**", "*.parquet"), recursive=True),
        key=os.path.getmtime,
    )
    md2 = pq.ParquetFile(newest).metadata
    codecs2 = {md2.row_group(0).column(i).compression for i in range(md2.num_columns)}
    assert codecs2 == {"ZSTD"}
    assert t.scan(spark).count() == 150  # mixed codecs read fine


def test_tags_pin_snapshots_through_expiry(spark, small_table):
    """Iceberg-style tag refs: a tagged snapshot stays readable by name
    and survives expire_snapshots even when it falls out of the
    keep-last window."""
    t = small_table
    first = t.current_snapshot().snapshot_id
    t.create_tag("audit-v1")  # defaults to current
    assert t.tags() == {"audit-v1": first}
    # advance the table well past keep_last
    for k in range(3):
        t.append(synth.images_df(spark, 50, id_offset=800 + 50 * k), n_files=1)
    t.expire_snapshots(keep_last=2)
    # tag target retained: readable by ref, files intact
    assert t.scan(spark, ref="audit-v1").count() == 800
    assert t.scan(spark).count() == 950
    with pytest.raises(ValueError, match="no tag or branch 'nope'"):
        t.scan(spark, ref="nope").count()
    with pytest.raises(ValueError):
        t.create_tag("audit-v1", t.current_snapshot().snapshot_id)  # repoint refused
    with pytest.raises(ValueError):
        t.create_tag("ghost", 123456)
    # drop the tag; the next expiry may collect it
    t.drop_tag("audit-v1")
    assert t.tags() == {}
    t.expire_snapshots(keep_last=2)
    with pytest.raises(Exception):
        t.scan(spark, snapshot_id=first).count()  # snapshot gone from the log


def test_unknown_ref_and_empty_as_of_errors(spark, small_table, tmp_path):
    """User-facing lookup errors are explicit ValueErrors, not a bare
    KeyError / min()-over-empty ValueError (ADVICE r3)."""
    import pytest

    with pytest.raises(ValueError, match="no tag or branch 'nope'"):
        small_table.scan(spark, ref="nope")
    empty = LakehouseTable.create(
        str(tmp_path / "empty"), small_table.schema(), partition_col="bucket"
    )
    with pytest.raises(ValueError, match="no snapshots"):
        empty.snapshot_as_of(10**15)


def test_multiprocess_cas_exactly_one_winner(spark, tmp_table_dir):
    """VERDICT r3 #7: the os.link CAS under REAL concurrency — two
    subprocess committers race the same version with the same base
    metadata (file-barrier synchronized); exactly one wins, the loser
    gets ConcurrentCommitError, and the surviving metadata is
    consistent with the winner's snapshot."""
    import subprocess
    import sys as _sys
    import time as _time
    import os as _os

    df = synth.images_df(spark, 50, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=1)
    racer = r'''
import os, sys, time
sys.path.insert(0, "/root/repo")
from mobility_lakehouse_project_spark.tableformat.table import (
    ConcurrentCommitError, LakehouseTable, Snapshot,
)
loc, tag = sys.argv[1], sys.argv[2]
t = LakehouseTable(loc)
entry = {"file_path": f"data/fake-{tag}.parquet", "partition_id": "0",
         "record_count": 1, "file_size_bytes": 10, "added_snapshot_id": -1,
         "int_mins": {}, "int_maxs": {}, "str_mins": {}, "str_maxs": {}}
meta = t.load_metadata()           # SAME base version in both racers
snap_id, seq = t._next_ids(meta)
manifest, parts, _mb = t._write_manifest([entry], snap_id)
prev = t.current_snapshot(meta)
manifests = (prev.manifests if prev else []) + [manifest]
mparts = dict(prev.manifest_parts if prev else {}); mparts[manifest] = parts
snap = Snapshot(snap_id + (1 if tag == "b" else 0), meta["current_snapshot_id"],
                seq, 0, "append", manifests, {"racer": tag}, mparts)
open(os.path.join(loc, f"ready-{tag}"), "w").close()
while not os.path.exists(os.path.join(loc, "go")):
    time.sleep(0.002)
try:
    t._commit(meta, snap, meta["current_snapshot_id"])
    print("WIN", snap.snapshot_id)
except ConcurrentCommitError:
    print("LOSE")
'''
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", racer, tmp_table_dir, tag],
            stdout=subprocess.PIPE, text=True,
        )
        for tag in ("a", "b")
    ]
    deadline = _time.time() + 30
    while _time.time() < deadline and not all(
        _os.path.exists(_os.path.join(tmp_table_dir, f"ready-{tag}"))
        for tag in ("a", "b")
    ):
        _time.sleep(0.01)
    open(_os.path.join(tmp_table_dir, "go"), "w").close()
    outs = [p.communicate(timeout=60)[0].strip() for p in procs]
    results = sorted(o.split()[0] for o in outs)
    assert results == ["LOSE", "WIN"], outs
    winner_id = int(next(o.split()[1] for o in outs if o.startswith("WIN")))
    t2 = LakehouseTable(tmp_table_dir)
    assert t2.current_snapshot().snapshot_id == winner_id
    assert t2.current_snapshot().summary.get("racer") in ("a", "b")
    # metadata chain still parses; the pre-race data is intact (the
    # racers' entries are fake paths, so scan at the parent snapshot)
    assert t2.scan(spark, snapshot_id=t2.current_snapshot().parent_id).count() == 50
    assert len(t2.snapshots_list()) == 2  # exactly ONE racer landed


def test_register_adhoc_sql_entry_point(spark, small_table):
    """VERDICT r3 #6: the reference's ad-hoc parameterized SQL entry
    point (dags/Queries_dag.py:54-95 `con.execute(query)`) — register
    the lakehouse table as a view and run an arbitrary SQL string over
    it, checked against the equivalent DataFrame computation."""
    small_table.register(spark, "images")
    got = spark.sql("""
        SELECT bucket, fmt, COUNT(*) AS n, AVG(w * h) AS avg_px
        FROM images
        WHERE w >= 32
        GROUP BY bucket, fmt
        HAVING COUNT(*) > 1
        ORDER BY bucket, fmt
    """).collect()
    want = (
        small_table.scan(spark)
        .filter(F.col("w") >= 32)
        .groupBy("bucket", "fmt")
        .agg(F.count("*").alias("n"), F.avg(F.col("w") * F.col("h")).alias("avg_px"))
        .filter(F.col("n") > 1)
        .orderBy("bucket", "fmt")
        .collect()
    )
    assert len(got) > 0 and got == want
    # parameterized form (the reference's f-string zone filter)
    zone = 2
    n = spark.sql("SELECT COUNT(*) AS n FROM images WHERE bucket = {z}", z=zone).collect()[0]["n"]
    assert n == small_table.scan(spark).filter(F.col("bucket") == zone).count()


def test_register_time_travel_views(spark, small_table):
    """register(ref=/snapshot_id=): SQL VERSION AS OF as pinned views —
    current and historical states queryable side by side."""
    t = small_table
    pre = t.current_snapshot().snapshot_id
    t.create_tag("v1")
    extra = synth.images_df(spark, 1).withColumn(
        "image_id", F.lit(10_000))
    t.append(extra)
    t.register(spark, "img_now")
    t.register(spark, "img_v1", ref="v1")
    t.register(spark, "img_pre", snapshot_id=pre)
    n_now = spark.sql("SELECT COUNT(*) n FROM img_now").collect()[0]["n"]
    n_v1 = spark.sql("SELECT COUNT(*) n FROM img_v1").collect()[0]["n"]
    n_pre = spark.sql("SELECT COUNT(*) n FROM img_pre").collect()[0]["n"]
    assert n_now == n_v1 + 1 == n_pre + 1
