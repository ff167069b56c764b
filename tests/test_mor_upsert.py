"""Merge-on-read MERGE and UPDATE (position-delete + append upserts).

The north-star MERGE at 10^12-image scale (BASELINE.json: upserts
keyed on image_id) cannot afford to rewrite a 500 MB blob file per
matched row; mode='mor' turns a small upsert into O(source) work:
key-scan positions -> tiny delete files + an append of the new row
versions, one atomic snapshot."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import delete, merge
from mobility_lakehouse_project_spark.streaming.changelog import changelog_df
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import (
    ConcurrentCommitError,
)

N = 800


def _mk(spark, loc):
    df = synth.images_df(spark, N, partitions=2)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    t.append(df, n_files=8)
    return t


def _files(t, spark):
    return {r["file_path"] for r in t.files(spark).select("file_path").collect()}


def _src(spark, n_upd=30, n_new=20):
    """n_upd updates of existing ids + n_new brand-new ids, all with a
    recognizable caption."""
    upd = synth.images_df(spark, n_upd, seed=50)
    new = synth.images_df(spark, n_new, seed=51, id_offset=100_000)
    return upd.unionByName(new).withColumn("caption", F.lit("v2"))


def test_mor_merge_upserts_without_touching_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    pre_files = _files(t, spark)
    res = merge.merge_into(t, spark, _src(spark), key="image_id", mode="mor")

    assert res["files_rewritten"] == 0
    assert res["rows_deleted_positions"] == 30
    assert res["delete_files_written"] >= 1 and res["files_written"] >= 1
    # every pre-existing data file survives untouched; only appends
    assert pre_files <= _files(t, spark)
    snap = t.current_snapshot()
    assert snap.operation == "merge-mor" and len(snap.delete_manifests) == 1

    # result correctness: N + 20 rows, exactly 50 'v2' captions, no
    # duplicate keys
    assert t.scan(spark).count() == N + 20
    assert t.scan(spark).filter("caption = 'v2'").count() == 50
    assert t.scan(spark).select("image_id").distinct().count() == N + 20


def test_mor_merge_matches_cow_merge(spark, tmp_path):
    """Same source, two table copies: MOR and CoW merges must produce
    identical logical tables (captions AND blob bytes)."""
    t_cow = _mk(spark, str(tmp_path / "cow"))
    t_mor = _mk(spark, str(tmp_path / "mor"))
    merge.merge_into(t_cow, spark, _src(spark), key="image_id", mode="cow")
    merge.merge_into(t_mor, spark, _src(spark), key="image_id", mode="mor")
    a = {r["image_id"]: (r["caption"], bytes(r["bytes"]))
         for r in t_cow.scan(spark).collect()}
    b = {r["image_id"]: (r["caption"], bytes(r["bytes"]))
         for r in t_mor.scan(spark).collect()}
    assert a == b


def test_mor_merge_when_matched_delete(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    res = merge.merge_into(t, spark, _src(spark), key="image_id",
                           mode="mor", when_matched="delete")
    assert res["rows_deleted_positions"] == 30
    assert t.scan(spark).count() == N - 30 + 20
    # matched ids gone, new ids present
    assert t.scan(spark).filter("caption = 'v2'").count() == 20


def test_mor_merge_rejects_update_cols(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="full-row"):
        merge.merge_into(t, spark, _src(spark), key="image_id",
                         mode="mor", update_cols=["caption"])


def test_mor_merge_conflict_forces_replan(spark, tmp_table_dir):
    """A concurrent append whose keys OVERLAP the merge source must
    surface even under the validated rebase (the appended copy of a
    matched key would dodge the position deletes -> duplicate rows).
    With rebasing disabled a DISJOINT append must surface too."""
    t = _mk(spark, tmp_table_dir)
    orig = t.commit_delete_files
    fired = {"done": False}

    def racing(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            # seed 60: same ids as _src's updates (0..4), new payloads
            t.append(synth.images_df(spark, 5, seed=60), n_files=1)
        return orig(*a, **k)

    t.commit_delete_files = racing
    with pytest.raises(ConcurrentCommitError):
        merge.merge_into(t, spark, _src(spark), key="image_id", mode="mor")
    t.commit_delete_files = orig
    assert not t.current_snapshot().delete_manifests
    assert t.scan(spark).count() == N + 5

    # rebase_retries=0 restores the round-3 surface-on-any-advance
    # behavior, even for a disjoint concurrent append
    fired2 = {"done": False}

    def racing2(*a, **k):
        if not fired2["done"]:
            fired2["done"] = True
            t.append(synth.images_df(spark, 5, seed=61, id_offset=200_000),
                     n_files=1)
        return orig(*a, **k)

    t.commit_delete_files = racing2
    with pytest.raises(ConcurrentCommitError):
        merge.merge_into(t, spark, _src(spark), key="image_id", mode="mor",
                         rebase_retries=0)
    t.commit_delete_files = orig


def test_mor_update_where_matches_cow_semantics(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "u"))
    pre_files = _files(t, spark)
    n16 = t.scan(spark).filter("w = 16").count()
    res = delete.update_where(
        t, spark, "w = 16", {"caption": F.concat(F.col("caption"),
                                                 F.lit("-upd"))},
        mode="mor",
    )
    assert res["rows_updated"] == n16 > 0
    assert pre_files <= _files(t, spark)  # old files untouched
    assert t.scan(spark).count() == N
    assert t.scan(spark).filter("caption LIKE '%-upd'").count() == n16
    assert t.scan(spark).filter(
        "w = 16 AND caption NOT LIKE '%-upd'").count() == 0
    # folding the deletes preserves the result
    delete.rewrite_position_deletes(t, spark, target_file_size=1 << 20)
    assert t.scan(spark).filter("caption LIKE '%-upd'").count() == n16
    assert t.scan(spark).count() == N


def test_changelog_covers_mor_upserts(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    s0 = t.current_snapshot().snapshot_id
    merge.merge_into(t, spark, _src(spark), key="image_id", mode="mor")
    ch = changelog_df(t, spark, from_snapshot_id=s0)
    dels = {(r["image_id"], r["caption"])
            for r in ch.filter("_change_type = 'delete'")
            .select("image_id", "caption").collect()}
    ins = {(r["image_id"], r["caption"])
           for r in ch.filter("_change_type = 'insert'")
           .select("image_id", "caption").collect()}
    assert len(dels) == 30 and all(c != "v2" for _, c in dels)
    assert len(ins) == 50 and all(c == "v2" for _, c in ins)
    # replay property over (id, caption) versions
    base = {(r["image_id"], r["caption"])
            for r in t.scan(spark, snapshot_id=s0)
            .select("image_id", "caption").collect()}
    final = {(r["image_id"], r["caption"])
             for r in t.scan(spark).select("image_id", "caption").collect()}
    assert (base - dels) | ins == final


def test_merge_not_matched_by_source_delete_full_sync(spark, tmp_table_dir):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE (full-sync MERGE): after
    the merge, the target's key set equals the source's — matched rows
    updated, source-only rows inserted, target-only rows position-
    deleted, all in ONE snapshot."""
    df = spark.createDataFrame(
        [(i, f"old{i}") for i in range(30)], "id long, val string")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=3)
    src = spark.createDataFrame(
        [(i, f"new{i}") for i in range(20, 40)], "id long, val string")
    pre_snaps = len(t.snapshots_list())
    res = merge.merge_into(t, spark, src, key="id", mode="mor",
                           when_not_matched_by_source="delete",
                           target_file_size=1 << 20)
    assert len(t.snapshots_list()) == pre_snaps + 1  # atomic
    assert res["rows_deleted_positions"] == 30  # 10 matched + 20 by-source
    rows = {r["id"]: r["val"] for r in t.scan(spark).collect()}
    assert set(rows) == set(range(20, 40))
    assert rows[25] == "new25" and rows[35] == "new35"
    sm = t.current_snapshot().summary
    assert sm["when_not_matched_by_source"] == "delete"
    assert sm["rows_deleted_by_source"] == 20


def test_merge_by_source_requires_mor(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df)
    with pytest.raises(ValueError, match="mode='mor'"):
        merge.merge_into(t, spark, df, key="id",
                         when_not_matched_by_source="delete")


def test_merge_by_source_delete_only(spark, tmp_table_dir):
    """Pure by-source delete: no matched clause, no insert — trims the
    target to the source's key set without touching matching rows."""
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=2)
    src = spark.createDataFrame([(i, "x") for i in range(4)],
                                "id long, val string")
    merge.merge_into(t, spark, src, key="id", mode="mor",
                     when_matched=None, when_not_matched=None,
                     when_not_matched_by_source="delete")
    rows = {r["id"]: r["val"] for r in t.scan(spark).collect()}
    assert rows == {i: f"v{i}" for i in range(4)}  # survivors untouched


def test_merge_by_source_update_marks_stale(spark, tmp_table_dir):
    """WHEN NOT MATCHED BY SOURCE THEN UPDATE (Delta's mark-stale
    action): matched rows upsert, source-only rows insert, TARGET-ONLY
    rows are rewritten with the assignments applied — all one atomic
    snapshot; blobs of untouched-by-source matched files never
    rewritten (the update rides position deletes + appends)."""
    df = spark.createDataFrame(
        [(i, f"old{i}", "live") for i in range(30)],
        "id long, val string, st string")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=3)
    src = spark.createDataFrame(
        [(i, f"new{i}", "live") for i in range(20, 40)],
        "id long, val string, st string")
    pre_snaps = len(t.snapshots_list())
    res = merge.merge_into(
        t, spark, src, key="id", mode="mor",
        when_not_matched_by_source="update",
        by_source_assignments={"st": "'stale'", "val": "concat(val, '!')"},
        target_file_size=1 << 20)
    assert len(t.snapshots_list()) == pre_snaps + 1  # atomic
    # 10 matched + 20 by-source positions deleted; 20 upserts + 20
    # source-only inserts + 20 stale rewrites appended
    assert res["rows_deleted_positions"] == 30
    assert res["rows_out"] == 40
    rows = {r["id"]: (r["val"], r["st"]) for r in t.scan(spark).collect()}
    assert set(rows) == set(range(40))
    assert rows[5] == ("old5!", "stale")      # target-only: assignments
    assert rows[25] == ("new25", "live")      # matched: source row
    assert rows[35] == ("new35", "live")      # source-only: inserted
    sm = t.current_snapshot().summary
    assert sm["when_not_matched_by_source"] == "update"
    assert sm["rows_updated_by_source"] == 20
    # lineage: the stale rows keep their predecessor ids
    ids = {r["id"]: r["_row_id"]
           for r in t.scan(spark, with_row_id=True).collect()}
    first = {r["id"]: r["_row_id"]
             for r in t.scan(spark, with_row_id=True,
                             snapshot_id=t.snapshots_list()[0].snapshot_id
                             ).collect()}
    assert all(ids[i] == first[i] for i in range(20))


def test_merge_by_source_update_dv_and_guards(spark, tmp_table_dir):
    """The DV mode writes ONE merged vector per touched file for the
    by-source update; guards: assignments required, schema-checked,
    refused without the update action."""
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(12)], "id long, val string")
    t = LakehouseTable.create(tmp_table_dir, df.schema)
    t.append(df, n_files=2)
    src = spark.createDataFrame([(i, f"n{i}") for i in range(6)],
                                "id long, val string")
    res = merge.merge_into(
        t, spark, src, key="id", mode="dv",
        when_matched=None, when_not_matched=None,
        when_not_matched_by_source="update",
        by_source_assignments={"val": "upper(val)"})
    rows = {r["id"]: r["val"] for r in t.scan(spark).collect()}
    assert rows == {**{i: f"v{i}" for i in range(6)},
                    **{i: f"V{i}" for i in range(6, 12)}}
    assert res["rows_out"] == 6
    with pytest.raises(ValueError, match="by_source_assignments"):
        merge.merge_into(t, spark, src, key="id", mode="mor",
                         when_not_matched_by_source="update")
    with pytest.raises(ValueError, match="not in"):
        merge.merge_into(t, spark, src, key="id", mode="mor",
                         when_not_matched_by_source="update",
                         by_source_assignments={"nope": "1"})
    with pytest.raises(ValueError, match="requires"):
        merge.merge_into(t, spark, src, key="id", mode="mor",
                         by_source_assignments={"val": "'x'"})
