"""_last_updated_sequence_number (Iceberg v3 row lineage, field 2).

Resolution: ``coalesce(materialized _lh_last_seq, file's own commit
sequence)`` (table.py::scan_files with_last_seq). Commits that WRITE a
row (append, MERGE insert/update, UPDATE WHERE) leave it null so it
inherits the new file's sequence; rewrites that merely CARRY a row
(compaction, clustering, CoW survivors, delete fold) materialize the
old value into the ``_lh_last_seq`` physical column.

Reference analog: the reference's silver rebuilds stamp a load_ts on
rewritten rows (src/sql/silver.sql); the lineage sequence is the
table-format-native form that distinguishes "row changed" from "file
rewritten".
"""
import pyspark.sql.functions as F
import pytest

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import clustering, compaction, merge
from mobility_lakehouse_project_spark.operators.delete import (
    delete_where,
    update_where,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def _seq_map(df, key="image_id"):
    return {r[key]: r["_last_updated_seq"]
            for r in df.select(key, "_last_updated_seq").collect()}


@pytest.fixture()
def seq_table(spark, tmp_path):
    loc = str(tmp_path / "ls_table")
    d1 = synth.images_df(spark, 40, dims=(8, 16), partitions=4)
    t = LakehouseTable.create(loc, d1.schema, partition_col="bucket")
    t.append(d1, n_files=4)
    return t


def test_appends_inherit_their_commit_sequence(spark, seq_table):
    t = seq_table
    s1 = t.current_snapshot().sequence
    assert set(_seq_map(t.scan(spark, with_last_seq=True)).values()) == {s1}
    d2 = synth.images_df(spark, 10, dims=(8, 16), partitions=2, id_offset=40)
    t.append(d2, n_files=1)
    s2 = t.current_snapshot().sequence
    assert s2 > s1
    seqs = _seq_map(t.scan(spark, with_last_seq=True))
    assert {v for k, v in seqs.items() if int(k[3:]) < 40} == {s1}
    assert {v for k, v in seqs.items() if int(k[3:]) >= 40} == {s2}


def test_compaction_and_clustering_carry_sequences(spark, seq_table):
    t = seq_table
    before = _seq_map(t.scan(spark, with_last_seq=True))
    compaction.compact(t, spark, target_file_size=1 << 30)
    mid = _seq_map(t.scan(spark, with_last_seq=True))
    assert mid == before, "compaction must not bump last-updated seqs"
    clustering.cluster(t, spark, target_file_size=1 << 30)
    after = _seq_map(t.scan(spark, with_last_seq=True))
    assert after == before, "clustering must not bump last-updated seqs"


def test_cow_update_bumps_only_matched_rows(spark, seq_table):
    t = seq_table
    before = _seq_map(t.scan(spark, with_last_seq=True))
    pre_snap = t.current_snapshot().snapshot_id
    hit = [k for k in before if int(k[3:]) % 5 == 0]
    update_where(t, spark, F.col("image_id").isin(hit),
                 {"caption": F.concat(F.col("caption"), F.lit(" upd"))})
    new_seq = t.current_snapshot().sequence
    after = _seq_map(t.scan(spark, with_last_seq=True))
    assert all(after[k] == new_seq for k in hit)
    assert all(after[k] == before[k] for k in before if k not in hit)
    # time travel reproduces the pre-update sequences exactly
    tt = _seq_map(t.scan(spark, snapshot_id=pre_snap, with_last_seq=True))
    assert tt == before


def test_mor_update_bumps_new_versions_only(spark, seq_table):
    t = seq_table
    before = _seq_map(t.scan(spark, with_last_seq=True))
    hit = [k for k in before if int(k[3:]) % 7 == 0]
    update_where(t, spark, F.col("image_id").isin(hit),
                 {"caption": F.lit("mor upd")}, mode="mor")
    new_seq = t.current_snapshot().sequence
    after = _seq_map(t.scan(spark, with_last_seq=True))
    assert all(after[k] == new_seq for k in hit)
    assert all(after[k] == before[k] for k in before if k not in hit)


def test_merge_classifies_updated_inserted_carried(spark, seq_table):
    t = seq_table
    before = _seq_map(t.scan(spark, with_last_seq=True))
    src = synth.merge_source_df(spark, 40, 10, overlap=0.5)
    upd_keys = {r["image_id"] for r in
                src.join(t.scan(spark), "image_id", "left_semi")
                .select("image_id").collect()}
    ins_keys = {r["image_id"] for r in src.select("image_id").collect()} - upd_keys
    assert upd_keys and ins_keys
    merge.merge_into(t, spark, src, target_file_size=1 << 30)
    new_seq = t.current_snapshot().sequence
    after = _seq_map(t.scan(spark, with_last_seq=True))
    assert all(after[k] == new_seq for k in upd_keys), "updates bump"
    assert all(after[k] == new_seq for k in ins_keys), "inserts get new seq"
    carried = set(before) - upd_keys
    assert all(after[k] == before[k] for k in carried), \
        "rows only carried through the CoW rewrite keep their sequence"


def test_delete_survivors_keep_sequences(spark, seq_table):
    t = seq_table
    before = _seq_map(t.scan(spark, with_last_seq=True))
    dead = [k for k in before if int(k[3:]) % 4 == 0]
    delete_where(t, spark, F.col("image_id").isin(dead))
    after = _seq_map(t.scan(spark, with_last_seq=True))
    assert set(after) == set(before) - set(dead)
    assert all(after[k] == before[k] for k in after), \
        "CoW DELETE survivors are carried, not updated"


def test_scan_updated_since_survives_cow_and_compaction(spark, seq_table):
    t = seq_table
    s1 = t.current_snapshot().sequence
    keys = [r["image_id"] for r in t.scan(spark).select("image_id").collect()]
    hit = sorted(k for k in keys if int(k[3:]) % 5 == 0)
    update_where(t, spark, F.col("image_id").isin(hit),
                 {"caption": F.lit("inc upd")})
    # the rewrite-everything ops a snapshot-diff changelog chokes on
    compaction.compact(t, spark, target_file_size=1 << 30)
    clustering.cluster(t, spark, target_file_size=1 << 30)
    got = {r["image_id"]: r["caption"]
           for r in t.scan(spark, updated_since=s1)
           .select("image_id", "caption").collect()}
    assert sorted(got) == hit
    assert set(got.values()) == {"inc upd"}
    # empty increment at the head sequence
    head = t.current_snapshot().sequence
    assert t.scan(spark, updated_since=head).count() == 0


def test_scan_updated_since_prunes_old_files(spark, seq_table, monkeypatch):
    t = seq_table
    s1 = t.current_snapshot().sequence
    d2 = synth.images_df(spark, 10, dims=(8, 16), partitions=2, id_offset=40)
    t.append(d2, n_files=1)
    read_paths: list[list[str]] = []
    orig = type(t).scan_files

    def spy(self, spark_, rel_paths, *a, **kw):
        read_paths.append(list(rel_paths))
        return orig(self, spark_, rel_paths, *a, **kw)

    monkeypatch.setattr(type(t), "scan_files", spy)
    got = {r["image_id"] for r in
           t.scan(spark, updated_since=s1).select("image_id").collect()}
    assert got == {r["image_id"] for r in d2.select("image_id").collect()}
    # exactly the second append's files are read; every file of the
    # first append is sequence-pruned without being opened
    snap2 = t.current_snapshot().snapshot_id
    added2 = {r["file_path"] for r in
              t.files(spark)
              .filter(F.col("added_snapshot_id") == snap2)
              .select("file_path").collect()}
    total = t.files(spark).count()
    assert len(read_paths) == 1
    assert set(read_paths[0]) == added2
    assert len(added2) < total
