"""Multi-table catalog transactions: atomic publish across tables via
write-ahead intent journal + pinned-parent CAS.

The reference writes its layers in DAG order with no cross-table
atomicity (dags/Silver_Transform_Dag.py: silver, then gold — a crash
between leaves the warehouse inconsistent); CatalogTransaction closes
that gap, so these tests drive every outcome: clean commit, abort,
validation conflict, crash roll-forward, publish-window race rollback,
and serialization of concurrent transactions."""

import glob
import json
import os

import pytest

from mobility_lakehouse_project_spark.tableformat import Catalog
from mobility_lakehouse_project_spark.tableformat import catalog as catmod
from mobility_lakehouse_project_spark.tableformat.catalog import (
    TXN_SUMMARY_KEY,
    TransactionConflict,
)


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "warehouse"))


def _df(spark, lo=0, hi=20):
    return spark.range(lo, hi).selectExpr(
        "id AS image_id", "id * 7 AS phash", "concat('cap', id) AS caption"
    )


def _mk(cat, spark, *names):
    for n in names:
        cat.create_table(n, _df(spark).schema)


def _heads(cat, *names):
    out = {}
    for n in names:
        s = cat.load_table(n).current_snapshot()
        out[n] = None if s is None else s.snapshot_id
    return out


def test_commit_publishes_all_tables(spark, cat):
    _mk(cat, spark, "silver.images", "gold.stats")
    txn = cat.transaction()
    txn.stage_append("silver.images", _df(spark, 0, 30), n_files=2)
    txn.stage_append("gold.stats", _df(spark, 100, 110), n_files=1)
    # staged but uncommitted: invisible to readers
    assert _heads(cat, "silver.images", "gold.stats") == {
        "silver.images": None, "gold.stats": None}
    sids = txn.commit()
    assert set(sids) == {"silver.images", "gold.stats"}
    assert cat.load_table("silver.images").scan(spark).count() == 30
    assert cat.load_table("gold.stats").scan(spark).count() == 10
    for name in sids:
        head = cat.load_table(name).current_snapshot()
        assert head.summary[TXN_SUMMARY_KEY] == txn.txn_id
    assert cat.pending_transactions() == []
    # same txn again refuses
    with pytest.raises(RuntimeError, match="finished"):
        txn.commit()


def test_two_stages_one_table_coalesce_into_one_commit(spark, cat):
    _mk(cat, spark, "default.t")
    with cat.transaction() as txn:
        txn.stage_append("t", _df(spark, 0, 10), n_files=1)
        txn.stage_append("t", _df(spark, 10, 25), n_files=1)
    t = cat.load_table("default.t")
    assert t.scan(spark).count() == 25
    assert len(t.snapshots_list()) == 1  # one commit, not two


def test_abort_drops_staged_files(spark, cat):
    _mk(cat, spark, "default.t")
    txn = cat.transaction()
    txn.stage_append("t", _df(spark), n_files=2)
    root = catmod.to_local(cat.load_table("t").location)
    assert glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                     recursive=True)
    txn.abort()
    assert not glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                         recursive=True)
    assert cat.load_table("t").current_snapshot() is None


def test_context_manager_aborts_on_exception(spark, cat):
    _mk(cat, spark, "default.t")
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.stage_append("t", _df(spark), n_files=1)
            raise RuntimeError("boom")
    assert cat.load_table("t").current_snapshot() is None


def test_validation_conflict_publishes_nothing(spark, cat):
    _mk(cat, spark, "default.a", "default.b")
    txn = cat.transaction()
    txn.stage_append("a", _df(spark), n_files=1)
    txn.stage_append("b", _df(spark), n_files=1)
    # a direct writer beats the txn to table b
    cat.load_table("b").append(_df(spark, 500, 510), n_files=1)
    with pytest.raises(TransactionConflict, match="nothing published"):
        txn.commit()
    assert cat.load_table("a").current_snapshot() is None
    b = cat.load_table("b")
    assert b.scan(spark).count() == 10  # only the direct write
    assert TXN_SUMMARY_KEY not in b.current_snapshot().summary
    assert cat.pending_transactions() == []


def test_crash_mid_publish_rolls_forward(spark, cat, monkeypatch):
    _mk(cat, spark, "default.a", "default.b")
    txn = cat.transaction()
    txn.stage_append("a", _df(spark, 0, 12), n_files=1)
    txn.stage_append("b", _df(spark, 12, 30), n_files=1)

    real = catmod._publish_one
    calls = {"n": 0}

    def dying(t, tbl, txn_id):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash after first table published")
        real(t, tbl, txn_id)

    monkeypatch.setattr(catmod, "_publish_one", dying)
    with pytest.raises(OSError, match="simulated crash"):
        txn.commit()
    monkeypatch.setattr(catmod, "_publish_one", real)
    # committed-but-unfinished: journal pending, one table visible
    assert cat.pending_transactions() == [txn.txn_id]
    heads = _heads(cat, "default.a", "default.b")
    assert (heads["default.a"] is None) != (heads["default.b"] is None)
    report = cat.recover_transactions()
    assert report[txn.txn_id]["status"] == "completed"
    assert cat.load_table("a").scan(spark).count() == 12
    assert cat.load_table("b").scan(spark).count() == 18
    assert cat.pending_transactions() == []
    # replaying recovery is a no-op
    assert cat.recover_transactions() == {}


def test_recovery_is_idempotent_under_replay(spark, cat, monkeypatch):
    """Recovery of a journal whose commits ALL landed must not
    double-append."""
    _mk(cat, spark, "default.a")
    txn = cat.transaction()
    txn.stage_append("a", _df(spark), n_files=1)
    sids = txn.commit()
    # resurrect the journal as if the remove crashed
    os.makedirs(cat._txn_dir, exist_ok=True)
    with open(os.path.join(cat._txn_dir, f"{txn.txn_id}.json"), "w") as f:
        json.dump({"txn_id": txn.txn_id,
                   "tables": list(txn._staged.values())}, f)
    report = cat.recover_transactions()
    assert report[txn.txn_id]["status"] == "completed"
    t = cat.load_table("a")
    assert t.scan(spark).count() == 20
    assert t.current_snapshot().snapshot_id == sids["default.a"]


def test_publish_window_race_rolls_back_all(spark, cat):
    """A direct write that lands AFTER the journal but BEFORE that
    table's swap forces all-or-nothing rollback of the txn's already
    published tables."""
    _mk(cat, spark, "default.a", "default.b")
    txn = cat.transaction()
    txn.stage_append("a", _df(spark, 0, 12), n_files=1)
    txn.stage_append("b", _df(spark, 12, 30), n_files=1)
    # hand-write the journal (validation passed), then let a direct
    # writer advance b before recovery publishes it
    os.makedirs(cat._txn_dir, exist_ok=True)
    with open(os.path.join(cat._txn_dir, f"{txn.txn_id}.json"), "w") as f:
        json.dump({"txn_id": txn.txn_id,
                   "tables": list(txn._staged.values())}, f)
    cat.load_table("b").append(_df(spark, 900, 905), n_files=1)
    report = cat.recover_transactions()
    assert report[txn.txn_id]["status"] == "rolled_back"
    assert report[txn.txn_id]["rolled_back"] == ["default.a"]
    # a: rolled back to empty; b: only the direct write
    assert cat.load_table("a").current_snapshot() is None
    assert cat.load_table("b").scan(spark).count() == 5
    # evidence journal kept
    assert glob.glob(os.path.join(cat._txn_dir, "*.failed.json"))
    assert cat.pending_transactions() == []


def test_concurrent_txns_serialize_second_conflicts(spark, cat):
    _mk(cat, spark, "default.t")
    t1, t2 = cat.transaction(), cat.transaction()
    t1.stage_append("t", _df(spark, 0, 10), n_files=1)
    t2.stage_append("t", _df(spark, 10, 20), n_files=1)
    t1.commit()
    with pytest.raises(TransactionConflict):
        t2.commit()
    assert cat.load_table("t").scan(spark).count() == 10


def test_disjoint_txns_both_commit(spark, cat):
    _mk(cat, spark, "default.a", "default.b")
    t1, t2 = cat.transaction(), cat.transaction()
    t1.stage_append("a", _df(spark, 0, 10), n_files=1)
    t2.stage_append("b", _df(spark, 10, 20), n_files=1)
    t1.commit()
    t2.commit()
    assert cat.load_table("a").scan(spark).count() == 10
    assert cat.load_table("b").scan(spark).count() == 10


def test_txn_append_onto_existing_data_pins_parent(spark, cat):
    _mk(cat, spark, "default.t")
    t = cat.load_table("t")
    t.append(_df(spark, 0, 10), n_files=1)
    base = t.current_snapshot().snapshot_id
    with cat.transaction() as txn:
        txn.stage_append("t", _df(spark, 10, 30), n_files=1)
    head = cat.load_table("t").current_snapshot()
    assert head.parent_id == base
    assert cat.load_table("t").scan(spark).count() == 30


def test_stale_lock_is_stolen(spark, cat):
    _mk(cat, spark, "default.t")
    os.makedirs(cat._txn_dir, exist_ok=True)
    lock = os.path.join(cat._txn_dir, "LOCK")
    with open(lock, "w") as f:
        f.write("dead-pid")
    old = os.path.getmtime(lock) - 600
    os.utime(lock, (old, old))
    with cat.transaction() as txn:
        txn.stage_append("t", _df(spark), n_files=1)
    assert cat.load_table("t").scan(spark).count() == 20
    assert not os.path.exists(lock)
