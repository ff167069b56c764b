"""Branches + write-audit-publish (Iceberg branch refs).

The reference promotes data bronze->silver->gold only after quality
gates pass (dags/Silver_Transform_Dag.py:139-186 null/orphan checks);
the lakehouse-native form is WAP: ingest to an ``audit`` branch, run
the gates against ``scan(ref='audit')``, and fast-forward main — a
metadata-only atomic publish. A failed audit drops the branch; main
never saw the bad data.
"""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 400


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    return t


def test_branch_append_isolated_until_fast_forward(spark, table):
    t = table
    main_head = t.current_snapshot().snapshot_id
    t.create_branch("audit")
    staged1 = synth.images_df(spark, 50, seed=7, id_offset=10_000)
    staged2 = synth.images_df(spark, 30, seed=8, id_offset=20_000)
    s1 = t.append(staged1, n_files=1, branch="audit")
    s2 = t.append(staged2, n_files=1, branch="audit")
    assert s2.parent_id == s1.snapshot_id and s1.parent_id == main_head
    # main is untouched; the branch sees the staged rows
    assert t.current_snapshot().snapshot_id == main_head
    assert t.scan(spark).count() == N
    assert t.scan(spark, ref="audit").count() == N + 80
    assert t.branches()["audit"] == s2.snapshot_id

    # publish: fast-forward main to the branch head
    t.fast_forward("audit")
    assert t.current_snapshot().snapshot_id == s2.snapshot_id
    assert t.scan(spark).count() == N + 80
    # idempotent re-publish is a no-op
    t.fast_forward("audit")
    assert t.current_snapshot().snapshot_id == s2.snapshot_id


def test_fast_forward_rejects_divergent_target(spark, table):
    t = table
    t.create_branch("audit")
    t.append(synth.images_df(spark, 20, seed=9, id_offset=30_000),
             n_files=1, branch="audit")
    # main advances divergently after the branch was cut
    t.append(synth.images_df(spark, 10, seed=10, id_offset=40_000), n_files=1)
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("audit")
    # staged work is re-based by dropping and re-staging
    t.drop_branch("audit")
    assert "audit" not in t.branches()
    assert t.scan(spark).count() == N + 10


def test_wap_publish_gated(spark, table):
    """The reference's quality-gate idiom, branch-shaped: a bad batch
    fails the gate on the audit branch and never reaches main."""
    t = table
    t.create_branch("audit")
    bad = synth.images_df(spark, 40, seed=11, id_offset=50_000).withColumn(
        "caption", F.lit(None).cast("string")
    )
    t.append(bad, n_files=1, branch="audit")
    null_captions = (
        t.scan(spark, ref="audit").filter(F.col("caption").isNull()).count()
    )
    assert null_captions == 40  # gate FAILS
    t.drop_branch("audit")
    assert t.scan(spark).filter(F.col("caption").isNull()).count() == 0

    # good batch passes the gate and publishes
    t.create_branch("audit")
    good = synth.images_df(spark, 40, seed=12, id_offset=60_000)
    t.append(good, n_files=1, branch="audit")
    assert t.scan(spark, ref="audit").filter(
        F.col("caption").isNull()).count() == 0
    t.fast_forward("audit")
    t.drop_branch("audit")
    assert t.scan(spark).count() == N + 40


def test_branch_head_pinned_through_expiry(spark, table):
    t = table
    t.create_branch("audit")
    s = t.append(synth.images_df(spark, 25, seed=13, id_offset=70_000),
                 n_files=1, branch="audit")
    # churn main so expiry has snapshots to drop
    for i in range(3):
        t.append(synth.images_df(spark, 5, seed=20 + i,
                                 id_offset=80_000 + 100 * i), n_files=1)
    t.expire_snapshots(keep_last=1)
    # the branch head snapshot and its files survived
    assert t.scan(spark, ref="audit").count() == N + 25
    assert t.branches()["audit"] == s.snapshot_id


def test_branch_append_composes_with_main_commits(spark, table):
    """A branch append racing a main commit composes via the commit
    retry (different refs — disjoint by construction)."""
    t = table
    t.create_branch("audit")
    orig = t._commit
    fired = {"done": False}

    def racing(meta, snap, parent, branch="main", **kw):
        if not fired["done"] and branch != "main":
            fired["done"] = True
            t.append(synth.images_df(spark, 5, seed=30, id_offset=90_000),
                     n_files=1)
        return orig(meta, snap, parent, branch=branch, **kw)

    t._commit = racing
    t.append(synth.images_df(spark, 15, seed=31, id_offset=91_000),
             n_files=1, branch="audit")
    t._commit = orig
    assert fired["done"]
    assert t.scan(spark, ref="audit").count() == N + 15
    assert t.scan(spark).count() == N + 5


def test_branch_ref_errors(spark, table):
    t = table
    t.create_tag("v1")
    with pytest.raises(ValueError, match="already a tag"):
        t.create_branch("v1")
    with pytest.raises(ValueError, match="main is implicit"):
        t.create_branch("main")
    with pytest.raises(ValueError, match="no tag or branch"):
        t.scan(spark, ref="nope")
    with pytest.raises(ValueError, match="no branch"):
        t.drop_branch("nope")
    with pytest.raises(ValueError, match="no branch"):
        t.append(synth.images_df(spark, 5), n_files=1, branch="nope")


def test_ref_retention_branch_history(spark, table):
    """set_ref_retention(min_snapshots_to_keep=N): expiry keeps the
    branch's newest N ancestors, not just its head — the branch keeps
    its own time-travel window while main expires aggressively."""
    t = table
    t.create_branch("audit")
    heads = []
    for i in range(3):
        s = t.append(synth.images_df(spark, 10, seed=i, id_offset=50_000 + i * 100),
                     n_files=1, branch="audit")
        heads.append(s.snapshot_id)
    t.set_ref_retention("audit", min_snapshots_to_keep=2)
    res = t.expire_snapshots(keep_last=1)
    assert res["expired"] > 0 and res["dropped_refs"] == []
    kept = {s.snapshot_id for s in t.snapshots_list()}
    assert heads[2] in kept and heads[1] in kept  # newest 2 ancestors
    assert heads[0] not in kept                   # 3rd expired
    # the retained ancestor is scannable (its files survived GC)
    assert t.scan(spark, snapshot_id=heads[1]).count() == N + 20
    assert t.scan(spark, ref="audit").count() == N + 30


def test_ref_retention_max_ref_age_drops_stale_refs(spark, table):
    """max_ref_age_ms: a ref whose target snapshot is older than the
    cutoff is dropped by expire_snapshots (and its pin with it)."""
    import time as _time

    t = table
    old = t.current_snapshot().snapshot_id
    t.create_tag("ci-run")
    t.create_branch("stale")
    t.set_ref_retention("ci-run", max_ref_age_ms=1)
    t.set_ref_retention("stale", max_ref_age_ms=1)
    _time.sleep(0.05)
    t.append(synth.images_df(spark, 10, seed=9, id_offset=60_000), n_files=1)
    res = t.expire_snapshots(keep_last=1)
    assert res["dropped_refs"] == ["ci-run", "stale"]
    assert "ci-run" not in t.tags() and "stale" not in t.branches()
    assert old not in {s.snapshot_id for s in t.snapshots_list()}
    assert t.load_metadata().get("ref_retention", {}) == {}


def test_ref_retention_validation(spark, table):
    t = table
    with pytest.raises(ValueError, match="no ref"):
        t.set_ref_retention("nope", min_snapshots_to_keep=2)
    t.create_tag("v1")
    with pytest.raises(ValueError, match="branches"):
        t.set_ref_retention("v1", min_snapshots_to_keep=2)
    with pytest.raises(ValueError, match="main cannot age out"):
        t.set_ref_retention("main", max_ref_age_ms=1000)
    t.set_ref_retention("main", min_snapshots_to_keep=3)  # allowed
    t.set_ref_retention("main")  # all-None clears
    assert t.load_metadata().get("ref_retention", {}) == {}


def test_ref_age_gc_runs_below_keep_last(spark, table):
    """max_ref_age_ms GC must run even when no snapshot is old enough
    to expire (snapshot count <= keep_last)."""
    import time as _time

    t = table  # exactly 1 snapshot
    t.create_tag("stale-tag")
    t.set_ref_retention("stale-tag", max_ref_age_ms=1)
    _time.sleep(0.05)
    res = t.expire_snapshots(keep_last=5)
    assert res["dropped_refs"] == ["stale-tag"]
    assert "stale-tag" not in t.tags()
    # and the no-op path still reports the key
    assert t.expire_snapshots(keep_last=5)["dropped_refs"] == []


# ---------------- cherry-pick publish (main advanced) ----------------


def test_cherrypick_publishes_staged_append_onto_advanced_main(spark, table):
    t = table
    t.create_branch("audit")
    staged = t.append(
        synth.images_df(spark, 50, seed=7, id_offset=10_000),
        n_files=2, branch="audit", wap_id="job-42",
    )
    # main advances divergently -> fast_forward refuses, cherrypick works
    t.append(synth.images_df(spark, 10, seed=10, id_offset=40_000), n_files=1)
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("audit")
    pub = t.cherrypick_snapshot(staged.snapshot_id)
    assert pub.summary["op"] == "cherrypick"
    assert pub.summary["published-wap-id"] == "job-42"
    assert pub.summary["source-snapshot-id"] == staged.snapshot_id
    assert t.scan(spark).count() == N + 10 + 50
    # the staged rows and main's divergent rows both survive
    ids = {r["image_id"] for r in
           t.scan(spark, columns=["image_id"]).collect()}
    assert len(ids) == N + 60


def test_cherrypick_duplicate_wap_id_refused(spark, table):
    t = table
    t.create_branch("audit")
    s1 = t.append(synth.images_df(spark, 20, seed=7, id_offset=10_000),
                  n_files=1, branch="audit", wap_id="job-7")
    t.append(synth.images_df(spark, 5, seed=11, id_offset=50_000), n_files=1)
    t.cherrypick_snapshot(s1.snapshot_id)
    head = t.current_snapshot().snapshot_id
    n_after = t.scan(spark).count()
    # re-publishing the SAME snapshot id is an idempotent no-op: the
    # prior publish's source-snapshot-id marker matches (at-least-once
    # orchestrator replay must not duplicate rows)
    out = t.cherrypick_snapshot(s1.snapshot_id)
    assert out.snapshot_id == head
    assert t.current_snapshot().snapshot_id == head
    assert t.scan(spark).count() == n_after
    # a DIFFERENT staged snapshot carrying the same wap.id is refused
    s2 = t.append(synth.images_df(spark, 8, seed=12, id_offset=60_000),
                  n_files=1, branch="audit", wap_id="job-7")
    with pytest.raises(ValueError, match="already published"):
        t.cherrypick_snapshot(s2.snapshot_id)


def test_cherrypick_replay_without_wap_id_is_noop(spark, table):
    """An at-least-once publisher re-running `publish --cherrypick <id>`
    WITHOUT a wap.id must not append the staged files twice: the prior
    publish is found via its source-snapshot-id summary marker."""
    t = table
    t.create_branch("audit")
    staged = t.append(synth.images_df(spark, 25, seed=7, id_offset=10_000),
                      n_files=1, branch="audit")
    t.append(synth.images_df(spark, 5, seed=9, id_offset=70_000), n_files=1)
    t.cherrypick_snapshot(staged.snapshot_id)
    head = t.current_snapshot().snapshot_id
    assert t.scan(spark).count() == N + 30
    out = t.cherrypick_snapshot(staged.snapshot_id)
    assert out.snapshot_id == head
    assert t.scan(spark).count() == N + 30
    # and it stays a no-op even after main advances further
    t.append(synth.images_df(spark, 3, seed=13, id_offset=80_000), n_files=1)
    t.cherrypick_snapshot(staged.snapshot_id)
    assert t.scan(spark).count() == N + 33


def test_cherrypick_same_snapshot_in_ancestry_is_noop(spark, table):
    t = table
    t.create_branch("audit")
    s1 = t.append(synth.images_df(spark, 20, seed=7, id_offset=10_000),
                  n_files=1, branch="audit")
    t.fast_forward("audit")  # s1 is now main's head
    head = t.current_snapshot().snapshot_id
    assert head == s1.snapshot_id
    out = t.cherrypick_snapshot(s1.snapshot_id)
    assert out.snapshot_id == head
    assert t.scan(spark).count() == N + 20


def test_cherrypick_rejects_non_append_snapshot(spark, table):
    from mobility_lakehouse_project_spark.operators import delete

    t = table
    pre = t.current_snapshot().snapshot_id
    delete.delete_where(t, spark, "w = 16", mode="cow")
    snap = t.current_snapshot()
    assert snap.operation != "append"
    # strand the rewrite outside main's ancestry (else cherry-pick is
    # the already-published no-op), then try to republish it
    t.rollback_to(pre)
    with pytest.raises(ValueError, match="append snapshots only"):
        t.cherrypick_snapshot(snap.snapshot_id)


def test_cherrypick_resequences_past_equality_deletes(spark, table):
    """Iceberg data-sequence-at-publish: an equality delete committed
    on main BETWEEN staging and publish must not erase the
    republished rows (they get the publish commit's sequence, later
    than the delete's)."""
    t = table
    t.create_branch("audit")
    staged_df = synth.images_df(spark, 30, seed=7, id_offset=10_000)
    staged = t.append(staged_df, n_files=1, branch="audit", wap_id="w1")
    # main: equality-delete ONE staged key while the work is in audit
    victim = staged_df.select("image_id").limit(1).collect()[0]["image_id"]
    keys = spark.createDataFrame([(victim,)], "image_id string")
    entries = t.write_equality_delete_files(keys, ["image_id"])
    t.commit_equality_deletes(entries, ["image_id"])
    pub = t.cherrypick_snapshot(staged.snapshot_id)
    assert pub is not None
    # the republished row SURVIVES: its file sequence postdates the delete
    assert t.scan(spark).filter(
        F.col("image_id") == victim).count() == 1
    assert t.scan(spark).count() == N + 30
