"""Row lineage (Iceberg v3): stable per-row ids.

Allocation: every commit that adds data files reserves a contiguous
``first_row_id`` range per file from the table-level ``next_row_id``
counter (table.py::_assign_row_ids); a row's id is
``coalesce(materialized _lh_row_id, first_row_id + position)``
(table.py::scan_files with_row_id). Rewrites (compaction/clustering/
CoW) materialize carried ids into the ``_lh_row_id`` physical column
(table.py::write_data_files).

Reference analog: the reference keeps stable surrogate keys across its
silver rebuilds (src/sql/silver.sql row hashing); row lineage is the
table-format-native form of the same guarantee.
"""
import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import compaction, clustering
from mobility_lakehouse_project_spark.operators.delete import delete_where
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def _ids(df):
    return sorted(r["_row_id"] for r in df.select("_row_id").collect())


def _id_map(df, key="image_id"):
    return {r[key]: r["_row_id"] for r in df.select(key, "_row_id").collect()}


@pytest.fixture()
def lineage_table(spark, tmp_path):
    loc = str(tmp_path / "rl_table")
    d1 = synth.images_df(spark, 40, dims=(8, 16), partitions=4)
    t = LakehouseTable.create(loc, d1.schema, partition_col="bucket")
    t.append(d1, n_files=4)
    return t


def test_append_assigns_unique_contiguous_ids(spark, lineage_table, tmp_path):
    t = lineage_table
    ids1 = _ids(t.scan(spark, with_row_id=True))
    assert ids1 == list(range(40))
    assert t.load_metadata()["next_row_id"] == 40
    # second append continues the counter — no overlap ever
    d2 = synth.images_df(spark, 15, dims=(8, 16), partitions=2, id_offset=40)
    t.append(d2, n_files=2)
    ids2 = _ids(t.scan(spark, with_row_id=True))
    assert ids2 == list(range(55))
    assert t.load_metadata()["next_row_id"] == 55


def test_ids_stable_across_scans_and_snapshots(spark, lineage_table):
    t = lineage_table
    before = _id_map(t.scan(spark, with_row_id=True))
    snap1 = t.current_snapshot().snapshot_id
    d2 = synth.images_df(spark, 10, dims=(8, 16), partitions=2, id_offset=40)
    t.append(d2, n_files=1)
    after = _id_map(t.scan(spark, with_row_id=True))
    # every pre-existing row keeps its id after the append
    assert {k: after[k] for k in before} == before
    # time travel reproduces the original assignment exactly
    tt = _id_map(t.scan(spark, snapshot_id=snap1, with_row_id=True))
    assert tt == before


def test_mor_delete_preserves_survivor_ids(spark, lineage_table):
    t = lineage_table
    before = _id_map(t.scan(spark, with_row_id=True))
    deleted = {k for k in before if int(k[3:]) % 5 == 0}
    assert deleted
    delete_where(t, spark, F.col("image_id").isin(list(deleted)), mode="mor")
    after = _id_map(t.scan(spark, with_row_id=True))
    assert set(after) == set(before) - deleted
    assert all(after[k] == before[k] for k in after)


def test_compaction_materializes_ids(spark, lineage_table):
    t = lineage_table
    before = _id_map(t.scan(spark, with_row_id=True))
    compaction.compact(t, spark, target_file_size=1 << 30)
    after = _id_map(t.scan(spark, with_row_id=True))
    assert after == before
    # the rewrite consumed no new id space beyond its (unused) reserve
    # and the ids came from the materialized column, not fresh ranges:
    # rewritten files' first_row_id >= 40 yet every id is < 40
    assert max(after.values()) < 40


def test_clustering_materializes_ids(spark, lineage_table):
    t = lineage_table
    before = _id_map(t.scan(spark, with_row_id=True))
    clustering.cluster(t, spark, curve="zorder", target_file_size=1 << 30)
    after = _id_map(t.scan(spark, with_row_id=True))
    assert after == before


def test_legacy_table_rows_null_then_upgrade(spark, tmp_path):
    loc = str(tmp_path / "legacy")
    d1 = synth.images_df(spark, 12, dims=(8,), partitions=2)
    t = LakehouseTable.create(loc, d1.schema, partition_col="bucket")
    t.append(d1, n_files=2)
    # simulate a pre-lineage table: strip the counter and the manifest
    # column by rewriting metadata + manifests without them
    meta = t.load_metadata()
    meta.pop("next_row_id", None)
    import json as _json
    import os as _os
    import pyarrow.parquet as _pq

    v = t.current_version()
    with open(t._meta_path(v), "w") as f:
        f.write(_json.dumps(meta))
    for snap in t.snapshots_list():
        for m in snap.manifests:
            p = _os.path.join(t.meta_dir, m)
            tbl = _pq.read_table(p)
            _pq.write_table(tbl.drop_columns(["first_row_id"]), p)
    rows = t.scan(spark, with_row_id=True).select("_row_id").collect()
    assert all(r["_row_id"] is None for r in rows)
    # new appends auto-upgrade: fresh files get ids from 0
    d2 = synth.images_df(spark, 5, dims=(8,), partitions=1, id_offset=12)
    t.append(d2, n_files=1)
    got = t.scan(spark, with_row_id=True).select("_row_id").collect()
    assigned = sorted(r["_row_id"] for r in got if r["_row_id"] is not None)
    assert assigned == list(range(5))
    assert sum(r["_row_id"] is None for r in got) == 12


def test_row_id_survives_manifest_rewrite(spark, lineage_table):
    t = lineage_table
    d2 = synth.images_df(spark, 10, dims=(8, 16), partitions=2, id_offset=40)
    t.append(d2, n_files=2)
    before = _id_map(t.scan(spark, with_row_id=True))
    t.rewrite_manifests(spark)
    assert _id_map(t.scan(spark, with_row_id=True)) == before


def _merge_src(spark, t, upd_ids, new_offset, n_new):
    upd = (t.scan(spark).filter(F.col("image_id").isin(list(upd_ids)))
           .withColumn("caption", F.concat(F.col("caption"), F.lit(" v2"))))
    ins = synth.images_df(spark, n_new, dims=(8, 16), partitions=1,
                          id_offset=new_offset)
    return upd.unionByName(ins.select(*upd.columns))


@pytest.mark.parametrize("mode", ["cow", "mor", "dv"])
def test_merge_upsert_carries_ids(spark, lineage_table, mode):
    from mobility_lakehouse_project_spark.operators.merge import merge_into

    t = lineage_table
    before = _id_map(t.scan(spark, with_row_id=True))
    upd_ids = sorted(before)[:7]
    src = _merge_src(spark, t, upd_ids, new_offset=40, n_new=6)
    merge_into(t, spark, src, key="image_id", mode=mode)
    after_df = t.scan(spark, with_row_id=True)
    after = _id_map(after_df)
    # updated rows keep their predecessor's id; untouched rows theirs
    assert {k: after[k] for k in before} == before
    # inserted rows get fresh ids beyond every pre-existing allocation
    fresh = {k: v for k, v in after.items() if k not in before}
    assert len(fresh) == 6
    assert min(fresh.values()) >= 40
    # global uniqueness
    assert len(set(after.values())) == len(after)
    # and the updated rows really carry the new caption
    n_v2 = after_df.filter(F.col("caption").endswith(" v2")).count()
    assert n_v2 == len(upd_ids)


def test_with_pos_and_row_id_compose(spark, lineage_table):
    df = lineage_table.scan(spark, with_pos=True, with_row_id=True)
    rows = df.select("_file", "_pos", "_row_id").collect()
    assert len(rows) == 40
    assert all(r["_row_id"] is not None for r in rows)
    # within one file, _row_id - _pos is the file's constant base
    bases = {}
    for r in rows:
        bases.setdefault(r["_file"], set()).add(r["_row_id"] - r["_pos"])
    assert all(len(b) == 1 for b in bases.values())
