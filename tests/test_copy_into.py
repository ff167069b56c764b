"""COPY INTO — idempotent exactly-once landing-zone ingest.

Reference analog: the bronze DAG's already-loaded-day skip
(/root/reference/dags/Bronze_Ingest_Dag.py:30-59), generalized to
per-file exactly-once with a staged-ledger two-phase protocol.  Tests
drive every crash window the protocol claims to survive and assert the
one invariant that matters: each landing file's rows appear in the
table EXACTLY once, no matter how many times copy_into reruns.
"""

import os

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import copy_into as ci
from mobility_lakehouse_project_spark.sql import execute_sql
from mobility_lakehouse_project_spark.tableformat import Catalog, LakehouseTable


def _landing(spark, tmp_path, n_files=4, rows=200, offset=0, sub="landing"):
    d = str(tmp_path / sub)
    df = synth.images_df(spark, rows, id_offset=offset)
    df.repartition(n_files).write.mode("append").parquet(d)
    return d, df


def _mk_table(spark, tmp_path, schema):
    return LakehouseTable.create(str(tmp_path / "tbl"), schema)


def test_copy_into_loads_once(spark, tmp_path):
    d, df = _landing(spark, tmp_path)
    t = _mk_table(spark, tmp_path, df.schema)
    out = ci.copy_into(t, spark, f"{d}/*.parquet")
    assert out["rows_loaded"] == 200 and out["files_loaded"] >= 4
    assert t.scan(spark).count() == 200
    again = ci.copy_into(t, spark, f"{d}/*.parquet")
    assert again["files_loaded"] == 0 and again["skipped"] == out["files_loaded"]
    assert t.scan(spark).count() == 200
    # only the new files load on arrival
    _landing(spark, tmp_path, n_files=2, rows=60, offset=200)
    inc = ci.copy_into(t, spark, f"{d}/*.parquet")
    assert inc["rows_loaded"] == 60
    got = t.scan(spark)
    assert got.count() == 260
    assert got.select("image_id").distinct().count() == 260


def test_copy_into_max_files_per_batch_drains(spark, tmp_path):
    d, df = _landing(spark, tmp_path, n_files=3, rows=90)
    t = _mk_table(spark, tmp_path, df.schema)
    total = 0
    for _ in range(5):
        out = ci.copy_into(t, spark, f"{d}/*.parquet",
                           max_files_per_batch=1)
        total += out["files_loaded"]
        if out["files_loaded"] == 0:
            break
    assert total >= 3 and t.scan(spark).count() == 90


def test_crash_after_commit_recovers_without_duplicates(
        spark, tmp_path, monkeypatch):
    d, df = _landing(spark, tmp_path)
    t = _mk_table(spark, tmp_path, df.schema)
    real = ci._finalize
    monkeypatch.setattr(ci, "_finalize",
                        lambda *a: (_ for _ in ()).throw(OSError("boom")))
    with pytest.raises(OSError):
        ci.copy_into(t, spark, f"{d}/*.parquet")
    # the commit landed; the ledger is still staged
    assert t.scan(spark).count() == 200
    assert len(ci._ledger_files(t, staged=True)) == 1
    assert len(ci._ledger_files(t)) == 0
    monkeypatch.setattr(ci, "_finalize", real)
    out = ci.copy_into(t, spark, f"{d}/*.parquet")
    assert out["recovered_batches"] == 1 and out["files_loaded"] == 0
    assert t.scan(spark).count() == 200  # exactly once
    assert len(ci._ledger_files(t, staged=True)) == 0


def test_crash_before_commit_reingests_exactly_once(
        spark, tmp_path, monkeypatch):
    d, df = _landing(spark, tmp_path)
    t = _mk_table(spark, tmp_path, df.schema)
    real = LakehouseTable.commit_append
    monkeypatch.setattr(
        LakehouseTable, "commit_append",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")))
    with pytest.raises(RuntimeError):
        ci.copy_into(t, spark, f"{d}/*.parquet")
    assert t.scan(spark).count() == 0
    # the failed attempt left nothing that counts as loaded
    assert len(ci._ledger_files(t)) == 0
    assert len(ci._ledger_files(t, staged=True)) == 0
    monkeypatch.setattr(LakehouseTable, "commit_append", real)
    out = ci.copy_into(t, spark, f"{d}/*.parquet")
    assert out["rows_loaded"] == 200
    assert t.scan(spark).count() == 200


def test_in_flight_lock_refuses_same_batch(spark, tmp_path):
    d, df = _landing(spark, tmp_path, n_files=1, rows=10)
    t = _mk_table(spark, tmp_path, df.schema)
    listing = sorted(
        p for p in os.listdir(d) if p.endswith(".parquet"))
    batch = ci._batch_token([os.path.join(d, p) for p in listing])
    os.makedirs(ci._ledger_dir(t), exist_ok=True)
    lock = os.path.join(ci._ledger_dir(t), f"{batch}.lock")
    open(lock, "w").close()
    with pytest.raises(RuntimeError, match="in flight"):
        ci.copy_into(t, spark, f"{d}/*.parquet")
    os.remove(lock)
    assert ci.copy_into(t, spark, f"{d}/*.parquet")["rows_loaded"] == 10


def test_copy_into_csv_and_sql(spark, tmp_path):
    df = synth.images_df(spark, 50).select("image_id", "w", "h", "fmt")
    d = str(tmp_path / "csv_landing")
    df.repartition(2).write.option("header", "true").csv(d)
    cat = Catalog(str(tmp_path / "wh"))
    cat.create_table("bronze.dims", df.schema)
    out = execute_sql(
        spark,
        f"COPY INTO bronze.dims FROM '{d}/*.csv' FORMAT csv "
        "OPTIONS(header='true')", catalog=cat)
    assert out["operation"] == "copy-into" and out["rows_loaded"] == 50
    t = cat.load_table("bronze.dims")
    assert t.scan(spark).count() == 50
    # SQL rerun is also a no-op
    out = execute_sql(
        spark,
        f"COPY INTO bronze.dims FROM '{d}/*.csv' FORMAT csv "
        "OPTIONS(header='true')", catalog=cat)
    assert out["files_loaded"] == 0
    got = t.scan(spark).orderBy("image_id").collect()
    want = df.orderBy("image_id").collect()
    assert got == want
