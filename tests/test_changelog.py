"""CDC changelog scan (streaming/changelog.py): row-level changes
between snapshots, exact for append + merge-on-read delete histories,
transparent across compaction, loud on content rewrites."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, delete
from mobility_lakehouse_project_spark.streaming.changelog import (
    ChangelogUnsupportedError,
    changelog_df,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


@pytest.fixture()
def table(spark, tmp_table_dir):
    df = synth.images_df(spark, 300, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=3)
    return t


def _ids(df, change_type):
    return {
        r["image_id"]
        for r in df.filter(F.col("_change_type") == change_type)
        .select("image_id").collect()
    }


def test_changelog_inserts_and_mor_deletes(spark, table):
    t = table
    s0 = t.current_snapshot().snapshot_id
    t.append(synth.images_df(spark, 40, seed=5, id_offset=1_000), n_files=1)
    deleted_ids = {
        r["image_id"]
        for r in t.scan(spark).filter("w = 16").select("image_id").collect()
    }
    delete.delete_where(t, spark, "w = 16", mode="mor")

    # full history: every appended row as insert, the MOR'd rows as delete
    full = changelog_df(t, spark)
    assert full.filter("_change_type = 'insert'").count() == 340
    assert _ids(full, "delete") == deleted_ids

    # incremental: only the second append + the delete
    inc = changelog_df(t, spark, from_snapshot_id=s0)
    assert inc.filter("_change_type = 'insert'").count() == 40
    assert _ids(inc, "delete") == deleted_ids
    # each change is attributed to its commit (the MOR delete may
    # split into a full-file drop commit + a position-delete commit)
    assert inc.select("_snapshot_id").distinct().count() in (2, 3)


def test_changelog_replays_to_final_state(spark, table):
    """Base(from) + inserts - deletes == scan(to): the contract a
    downstream incremental consumer depends on."""
    t = table
    s0 = t.current_snapshot().snapshot_id
    t.append(synth.images_df(spark, 60, seed=6, id_offset=2_000), n_files=1)
    delete.delete_where(t, spark, "phash % 5 = 0", mode="mor")
    t.append(synth.images_df(spark, 20, seed=7, id_offset=3_000), n_files=1)

    base = {r["image_id"]
            for r in t.scan(spark, snapshot_id=s0).select("image_id").collect()}
    ch = changelog_df(t, spark, from_snapshot_id=s0)
    replayed = (base | _ids(ch, "insert")) - _ids(ch, "delete")
    final = {r["image_id"] for r in t.scan(spark).select("image_id").collect()}
    assert replayed == final


def test_changelog_transparent_across_compaction(spark, table):
    t = table
    t.append(synth.images_df(spark, 30, seed=8, id_offset=4_000), n_files=1)
    pre = changelog_df(t, spark).groupBy("_change_type").count().collect()
    compaction.compact(t, spark, target_file_size=1 << 20)
    post = changelog_df(t, spark).groupBy("_change_type").count().collect()
    assert {(r["_change_type"], r["count"]) for r in pre} == \
           {(r["_change_type"], r["count"]) for r in post}


def test_changelog_rejects_content_rewrites_and_can_scope_past(spark, table):
    t = table
    delete.delete_where(t, spark, "w = 8", mode="cow")  # content rewrite
    s_cow = t.current_snapshot().snapshot_id
    t.append(synth.images_df(spark, 10, seed=9, id_offset=5_000), n_files=1)
    with pytest.raises(ChangelogUnsupportedError, match="content rewrite"):
        changelog_df(t, spark)
    # scoping the range after the rewrite works
    inc = changelog_df(t, spark, from_snapshot_id=s_cow)
    assert inc.filter("_change_type = 'insert'").count() == 10
    assert inc.filter("_change_type = 'delete'").count() == 0


def test_changelog_empty_range_and_unknown_ids(spark, table):
    t = table
    head = t.current_snapshot().snapshot_id
    empty = changelog_df(t, spark, from_snapshot_id=head)
    assert empty.count() == 0
    assert "_change_type" in empty.columns
    with pytest.raises(ValueError, match="unknown from_snapshot"):
        changelog_df(t, spark, from_snapshot_id=123)


def test_changelog_cursor_incremental_consumption(spark, table, tmp_path):
    from mobility_lakehouse_project_spark.streaming.changelog import (
        ChangelogCursor,
    )

    t = table
    cur = ChangelogCursor(t, str(tmp_path / "cursor.json"))
    # first poll: full history (cursor empty)
    df, head = cur.poll(spark)
    assert df.filter("_change_type = 'insert'").count() == 300
    cur.ack(head)
    assert cur.poll(spark) is None  # nothing new

    # new commits: only the increment is delivered
    t.append(synth.images_df(spark, 25, seed=90, id_offset=9_000), n_files=1)
    n16 = t.scan(spark).filter("w = 16").count()
    delete.delete_where(t, spark, "w = 16", mode="mor")
    df, head2 = cur.poll(spark)
    assert head2 != head
    assert df.filter("_change_type = 'insert'").count() == 25
    assert df.filter("_change_type = 'delete'").count() == n16
    # replay before ack: identical delivery (at-least-once)
    df2, head3 = cur.poll(spark)
    assert head3 == head2 and df2.count() == df.count()
    cur.ack(head2)
    assert cur.poll(spark) is None


def test_changelog_full_file_mor_delete_and_drop_partitions(spark, tmp_table_dir):
    """Removal-only delete commits (MOR full-file fast path,
    drop_partitions) must emit every removed live row as a delete —
    previously-deleted rows are not re-emitted."""
    df = spark.createDataFrame(
        [(i, i % 3, f"t{i}") for i in range(90)], "id long, grp int, tag string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="grp")
    t.append(df, n_files=3)
    # MOR-delete a few grp-1 rows first (classic position deletes)
    delete.delete_where(t, spark, "id < 6 AND grp = 1", mode="mor")  # ids 1,4
    # now a MOR delete that kills ALL of grp 1 -> full-file drop path
    res = delete.delete_where(t, spark, "grp = 1", mode="mor")
    assert res["files_dropped"] > 0
    assert res["delete_files_written"] == 0  # pure removal, no new entries
    full = changelog_df(t, spark)
    del_ids = {r["id"] for r in full.filter("_change_type = 'delete'")
               .select("id").collect()}
    assert del_ids == {i for i in range(90) if i % 3 == 1}
    # each row deleted exactly once across the two delete commits
    assert full.filter("_change_type = 'delete'").count() == 30
    # drop_partitions is changelog-exact too
    res2 = delete.drop_partitions(t, spark, [2])
    inc = changelog_df(t, spark, from_snapshot_id=res["snapshot"])
    assert {r["id"] for r in inc.select("id").collect()} == \
        {i for i in range(90) if i % 3 == 2}
    assert inc.filter("_change_type = 'delete'").count() == 30
    assert res2["rows_dropped"] == 30
