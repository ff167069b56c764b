"""Validated rebase for row-level DELETE/UPDATE (operators/rebase.py):
a concurrent plain append landing in the plan-to-commit window re-pins
the finished rewrite instead of forcing a replan — with SQL snapshot
isolation semantics (appended rows matching the predicate are
legitimately out of the plan's scope). Content-changing concurrent
commits still surface for a replan, and ``rebase_retries=0`` restores
surface-on-any-advance."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import delete
from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.table import (
    ConcurrentCommitError,
)

PRED = "image_id < 'img000000000030'"  # matches ids 0..29


def _mk(spark, loc, n=120):
    df = synth.images_df(spark, n, partitions=2)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    return t


def _race_write(t, fire):
    """Fire once after the op's rewrite output is written (CoW paths)."""
    orig = t.write_data_files
    state = {"done": False}

    def wrapper(*a, **k):
        entries = orig(*a, **k)
        if not state["done"]:
            state["done"] = True
            fire()
        return entries

    t.write_data_files = wrapper
    return orig


def _race_commit(t, attr, fire):
    """Fire once right before the op's commit call (MOR delete path)."""
    orig = getattr(t, attr)
    state = {"done": False}

    def wrapper(*a, **k):
        if not state["done"]:
            state["done"] = True
            fire()
        return orig(*a, **k)

    setattr(t, attr, wrapper)
    return orig


def test_cow_delete_rebases_over_concurrent_append(spark, tmp_table_dir):
    """The racer's rows survive UNTOUCHED even where they match the
    delete predicate — they were appended after the plan snapshot, so
    snapshot isolation puts them out of scope (Iceberg CoW DELETE
    validates deletes/rewrites, not appends)."""
    t = _mk(spark, tmp_table_dir)
    # ids 10..19, overlapping the predicate range, marked captions
    racer = synth.images_df(spark, 10, seed=77, id_offset=10).withColumn(
        "caption", F.lit("racer"))

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _race_write(t, fire)
    try:
        res = delete.delete_where(t, spark, PRED)
    finally:
        del t.write_data_files
    assert res["rows_deleted"] == 30
    got = t.scan(spark)
    assert got.count() == 120 - 30 + 10
    # every surviving sub-30 id is the racer's (snapshot semantics)
    low = got.filter(F.expr(PRED))
    assert low.count() == 10
    assert low.filter(F.col("caption") == "racer").count() == 10
    head = t.current_snapshot()
    parent = {s.snapshot_id: s for s in t.snapshots_list()}[head.parent_id]
    assert head.operation == "delete"
    assert parent.operation == "append"


def test_cow_delete_retries0_surfaces_on_any_append(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    racer = synth.images_df(spark, 5, id_offset=9000)  # disjoint

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _race_write(t, fire)
    try:
        with pytest.raises(ConcurrentCommitError):
            delete.delete_where(t, spark, PRED, rebase_retries=0)
    finally:
        del t.write_data_files
    res = delete.delete_where(t, spark, PRED)  # replan converges
    assert res["rows_deleted"] == 30
    assert t.scan(spark).count() == 120 - 30 + 5


def test_cow_delete_concurrent_content_commit_replans(spark, tmp_table_dir):
    """A concurrent NON-append (another DELETE's rewrite) must surface:
    the plan's touched files may be gone."""
    t = _mk(spark, tmp_table_dir)

    def fire():
        delete.delete_where(LakehouseTable(tmp_table_dir), spark,
                            "image_id = 'img000000000100'")

    _race_write(t, fire)
    try:
        with pytest.raises(ConcurrentCommitError):
            delete.delete_where(t, spark, PRED)
    finally:
        del t.write_data_files
    res = delete.delete_where(t, spark, PRED)
    assert res["rows_deleted"] == 30
    assert t.scan(spark).count() == 120 - 30 - 1


def test_mor_delete_rebases_over_concurrent_append(spark, tmp_table_dir):
    """Position deletes reference (file, pos) of the plan snapshot's
    files — untouched by a plain append, so the commit rebases."""
    t = _mk(spark, tmp_table_dir)
    racer = synth.images_df(spark, 8, id_offset=7000)

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _race_commit(t, "commit_delete_files", fire)
    try:
        res = delete.delete_where(t, spark, PRED, mode="mor")
    finally:
        del t.commit_delete_files
    assert res["rows_deleted"] == 30
    assert t.scan(spark).count() == 120 - 30 + 8
    assert t.current_snapshot().delete_manifests  # really MOR


def test_cow_update_rebases_over_concurrent_append(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    racer = synth.images_df(spark, 6, seed=5, id_offset=20).withColumn(
        "caption", F.lit("racer"))  # ids 20..25 match the predicate

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _race_write(t, fire)
    try:
        res = delete.update_where(
            t, spark, PRED, {"caption": F.lit("updated")})
    finally:
        del t.write_data_files
    assert res["rows_updated"] == 30
    got = t.scan(spark)
    assert got.count() == 126
    # only the plan snapshot's rows were updated; racer rows kept
    assert got.filter(F.col("caption") == "updated").count() == 30
    assert got.filter(F.col("caption") == "racer").count() == 6


def test_mor_update_rebases_over_concurrent_append(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    racer = synth.images_df(spark, 4, id_offset=8000)

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _race_commit(t, "commit_delete_files", fire)
    try:
        res = delete.update_where(
            t, spark, PRED, {"caption": F.lit("updated")}, mode="mor")
    finally:
        del t.commit_delete_files
    assert res["rows_updated"] == 30
    got = t.scan(spark)
    assert got.count() == 124
    assert got.filter(F.col("caption") == "updated").count() == 30
