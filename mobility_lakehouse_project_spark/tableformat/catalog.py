"""Filesystem warehouse catalog: namespaced tables under one root.

The reference attaches multiple DuckDB databases and addresses tables
as ``layer.table`` (src/ingest_bronze.py ATTACH + dags use
``bronze.x`` / ``silver.y``); the Iceberg analog is a catalog mapping
``namespace.table`` names to table locations. This is the
HadoopCatalog flavor: the directory tree IS the catalog —
``<warehouse>/<namespace>/<table>/`` — so no external service is
needed, concurrent creates are arbitrated by the table's own
exclusive-v1-metadata CAS, and the catalog scales to any number of
tables because listing touches only directory entries, never table
metadata.

At 100 TB the value is operational: one ``Catalog.maintain_all`` call
is the whole warehouse's maintenance schedule (each table's policy
declared on the table itself via properties like ``write.sort-order``),
and ``register_all`` exposes every table to ad-hoc ``spark.sql``
under ``ns_table`` view names — the reference's cross-layer
federation (dags/Queries_dag.py) without an attach step per query.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .paths import join_path, to_local
from .table import (
    ConcurrentCommitError,
    LakehouseTable,
    _atomic_write,
    _exclusive_write,
)

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

TXN_SUMMARY_KEY = "txn-id"


class TransactionConflict(RuntimeError):
    """A multi-table transaction lost to a concurrent commit: nothing
    it staged was published (or everything it had published was rolled
    back). Re-run the transaction against current state."""


def _split(name: str) -> tuple[str, str]:
    parts = name.split(".")
    if len(parts) == 1:
        parts = ["default", parts[0]]
    if len(parts) != 2 or not all(_NAME_RE.fullmatch(p) for p in parts):
        raise ValueError(
            f"bad table name {name!r}: expected [namespace.]table with "
            "identifier-safe segments")
    return parts[0], parts[1]


class Catalog:
    """Warehouse of lakehouse tables addressed as ``namespace.table``
    (bare ``table`` means ``default.table``)."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse.rstrip("/")
        self._local = to_local(self.warehouse)

    def _location(self, name: str) -> str:
        ns, tbl = _split(name)
        return join_path(self.warehouse, ns, tbl)

    # ---------------- DDL ----------------

    def create_table(self, name: str, schema: T.StructType,
                     **kwargs) -> LakehouseTable:
        """Create ``namespace.table`` (namespace dirs appear on first
        use, like HadoopCatalog). kwargs pass through to
        ``LakehouseTable.create`` (partition_col, properties, ...);
        racing creates lose on the table's exclusive v1 write."""
        if self.view_exists(name):
            raise ValueError(f"{name!r} is a view, not a table")
        return LakehouseTable.create(self._location(name), schema, **kwargs)

    def create_table_as(self, name: str, df, n_files: int | None = None,
                        **kwargs) -> LakehouseTable:
        """CTAS: create ``name`` with the DataFrame's schema and load
        it with the data in one call (the reference's CREATE TABLE AS
        SELECT layer steps, src/sql/silver.sql)."""
        t = self.create_table(name, df.schema, **kwargs)
        t.append(df, n_files=n_files)
        return t

    def load_table(self, name: str) -> LakehouseTable:
        t = LakehouseTable(self._location(name))
        if not t.exists:
            raise ValueError(f"no table {name!r} in {self.warehouse}")
        return t

    def table_exists(self, name: str) -> bool:
        return LakehouseTable(self._location(name)).exists

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Remove the table from the catalog. The directory tree is the
        catalog, so dropping deletes the tree — refused unless
        ``purge=True`` when the table still holds data files (the
        Iceberg dropTable(purge) distinction, kept deliberately loud
        because there is no metadata-only unlink in a directory
        catalog)."""
        t = self.load_table(name)
        local = to_local(t.location)
        if not purge:
            cur = t.current_snapshot()
            if cur is not None and cur.manifests:
                raise ValueError(
                    f"table {name!r} still has data; pass purge=True to "
                    "delete it")
        shutil.rmtree(local)

    def rename_table(self, src: str, dst: str) -> LakehouseTable:
        """Rename/move a table within the warehouse (Iceberg's
        renameTable). Every path a manifest records is RELATIVE to the
        table root, so the move is one atomic directory rename — no
        metadata rewrite, O(1) at any table size. The destination
        namespace directory is created; an existing destination
        refuses."""
        t = self.load_table(src)  # validates src exists
        dst_loc = self._location(dst)
        dst_local = to_local(dst_loc)
        if LakehouseTable(dst_loc).exists or os.path.exists(dst_local):
            raise ValueError(f"destination table {dst!r} already exists")
        os.makedirs(os.path.dirname(dst_local), exist_ok=True)
        os.rename(to_local(t.location), dst_local)
        return LakehouseTable(dst_loc)

    def clone_table(self, spark, src: str, dst: str,
                    snapshot_id: int | None = None) -> LakehouseTable:
        """Zero-copy clone within the warehouse (Delta SHALLOW CLONE
        shape): see :meth:`LakehouseTable.clone_to`. The destination
        must not exist; it becomes an ordinary, independent table."""
        t = self.load_table(src)
        dst_loc = self._location(dst)
        if self.view_exists(dst) or LakehouseTable(dst_loc).exists:
            raise ValueError(f"destination {dst!r} already exists")
        return t.clone_to(spark, dst_loc, snapshot_id=snapshot_id)

    # ---------------- views ----------------
    #
    # Iceberg-view analog: a named, versioned SQL definition stored in
    # the catalog (view.json in the view's directory — no data, no
    # metadata pointer, so table listings never see it). The reference
    # keeps derived layers as materialized CTAS tables refreshed by
    # DAG runs (src/sql/gold.sql); a catalog view is the lazy form —
    # the query re-plans against current table state on every read,
    # which at 100 TB is the difference between storing a derived copy
    # and storing ~1 KB of SQL. View SQL references tables (and other
    # views) by their flattened ``ns_name`` SQL identifiers.

    def _view_local(self, name: str) -> str:
        ns, v = _split(name)
        return os.path.join(self._local, ns, v, "view.json")

    def create_view(self, name: str, sql: str,
                    replace: bool = False) -> dict:
        """CREATE [OR REPLACE] VIEW: store the SQL text under
        ``namespace.view``. Replacing keeps the version history
        (Iceberg views are versioned; the current version is last).
        A name already holding a TABLE refuses — one name, one kind."""
        import json
        import time

        if self.table_exists(name):
            raise ValueError(f"{name!r} is a table, not a view")
        path = self._view_local(name)
        doc = {"versions": []}
        if os.path.exists(path):
            if not replace:
                raise ValueError(f"view {name!r} already exists "
                                 "(use replace=True)")
            with open(path, encoding="utf-8") as f:
                doc = json.load(f)
        doc["versions"] = (doc["versions"]
                           + [{"sql": sql,
                               "created_ms": int(time.time() * 1000)}])[-10:]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        _atomic_write(path, json.dumps(doc, indent=1))
        return doc

    def view_exists(self, name: str) -> bool:
        return os.path.exists(self._view_local(name))

    def load_view(self, name: str) -> str:
        """The view's current SQL text."""
        return self.view_meta(name)["versions"][-1]["sql"]

    def view_meta(self, name: str) -> dict:
        import json

        path = self._view_local(name)
        if not os.path.exists(path):
            raise ValueError(f"no view {name!r} in {self.warehouse}")
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    def drop_view(self, name: str) -> None:
        path = self._view_local(name)
        if not os.path.exists(path):
            raise ValueError(f"no view {name!r} in {self.warehouse}")
        shutil.rmtree(os.path.dirname(path))

    def list_views(self, namespace: str | None = None) -> list[str]:
        if namespace is not None and not _NAME_RE.fullmatch(namespace):
            raise ValueError(f"bad namespace {namespace!r}")
        spaces = ([namespace] if namespace is not None
                  else self.list_namespaces())
        out = []
        for ns in spaces:
            nsdir = os.path.join(self._local, ns)
            if not os.path.isdir(nsdir):
                continue
            for d in sorted(os.listdir(nsdir)):
                if (_NAME_RE.fullmatch(d)
                        and os.path.exists(
                            os.path.join(nsdir, d, "view.json"))):
                    out.append(f"{ns}.{d}")
        return out

    # ---------------- listing ----------------

    def list_namespaces(self) -> list[str]:
        root = self._local
        if not os.path.isdir(root):
            return []
        return sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)) and _NAME_RE.fullmatch(d)
        )

    def list_tables(self, namespace: str | None = None) -> list[str]:
        """``namespace.table`` names, every namespace unless given one.
        A directory counts as a table only if its name is
        identifier-safe AND it has the metadata pointer (half-created
        or foreign junk is invisible, matching load_table — every
        listed name round-trips through it)."""
        if namespace is not None and not _NAME_RE.fullmatch(namespace):
            raise ValueError(f"bad namespace {namespace!r}")
        spaces = [namespace] if namespace is not None else self.list_namespaces()
        out = []
        for ns in spaces:
            nsdir = os.path.join(self._local, ns)
            if not os.path.isdir(nsdir):
                continue
            for d in sorted(os.listdir(nsdir)):
                if (_NAME_RE.fullmatch(d)
                        and LakehouseTable(
                            join_path(self.warehouse, ns, d)).exists):
                    out.append(f"{ns}.{d}")
        return out

    # ---------------- warehouse-wide operations ----------------

    def register_all(self, spark: SparkSession,
                     metadata: bool = False) -> list[str]:
        """Temp views ``<ns>_<table>`` for every table (SQL view names
        cannot hold dots); ``metadata=True`` also registers the
        inspection tables as ``<ns>_<table>_files`` etc."""
        tables = self.list_tables()
        views = {}
        for name in tables:
            ns, tbl = _split(name)
            view = f"{ns}_{tbl}"
            if view in views:
                # 'a_b.c' and 'a.b_c' both flatten to 'a_b_c' —
                # refuse rather than let the second silently win
                raise ValueError(
                    f"view name {view!r} collides: {views[view]!r} "
                    f"and {name!r}")
            views[view] = name
        for view, name in views.items():
            t = self.load_table(name)
            t.register(spark, view)
            if metadata:
                t.register_metadata(spark, view)
        # catalog views register AFTER tables; views may reference
        # other views, so iterate to a fixpoint (dependency order is
        # whatever succeeds — a view registers once its references do)
        pending = {}
        for name in self.list_views():
            ns, v = _split(name)
            flat = f"{ns}_{v}"
            if flat in views:
                raise ValueError(
                    f"view name {flat!r} collides with table "
                    f"{views[flat]!r}")
            if flat in pending:
                raise ValueError(
                    f"view name {flat!r} collides: two catalog views "
                    "flatten to the same SQL name")
            pending[flat] = self.load_view(name)
        registered = list(views)
        while pending:
            progressed = False
            last_err: Exception | None = None
            for flat, sql in list(pending.items()):
                try:
                    spark.sql(f"CREATE OR REPLACE TEMP VIEW {flat} AS {sql}")
                    del pending[flat]
                    registered.append(flat)
                    progressed = True
                except Exception as e:  # noqa: BLE001 — retried below
                    last_err = e
            if not progressed:
                flat = next(iter(pending))
                raise ValueError(
                    f"view {flat!r} failed to register: {last_err}")
        return registered

    # ---------------- multi-table transactions ----------------

    @property
    def _txn_dir(self) -> str:
        return os.path.join(self._local, "_txns")

    def transaction(self) -> "CatalogTransaction":
        """Begin a multi-table ATOMIC transaction (the Nessie /
        Iceberg-REST multi-table-commit shape the reference's
        cross-database DAG steps approximate with ordered DuckDB
        writes, dags/Silver_Transform_Dag.py): stage appends to any
        number of catalog tables, then publish ALL of them or NONE.
        See :class:`CatalogTransaction` for the protocol and its
        guarantees."""
        return CatalogTransaction(self)

    def pending_transactions(self) -> list[str]:
        """Intent journals of transactions that crashed mid-publish
        (committed-but-unfinished; :meth:`recover_transactions` rolls
        them forward)."""
        d = self._txn_dir
        if not os.path.isdir(d):
            return []
        return sorted(
            f[: -len(".json")] for f in os.listdir(d)
            if f.endswith(".json") and not f.endswith(".failed.json")
        )

    def recover_transactions(self) -> dict[str, dict]:
        """Roll forward every pending transaction journal: a journal
        exists only for transactions that passed validation and MUST
        complete (write-ahead intent). Per table: already published by
        this txn -> done; head still at the pinned parent -> publish
        now; head moved otherwise -> the txn can no longer complete,
        so published tables are rolled back (all-or-nothing) and the
        journal is marked ``.failed`` for operator inspection."""
        import json

        report: dict[str, dict] = {}
        for txn_id in self.pending_transactions():
            path = os.path.join(self._txn_dir, f"{txn_id}.json")
            with open(path, encoding="utf-8") as f:
                journal = json.load(f)
            try:
                for tbl in journal["tables"]:
                    _publish_one(LakehouseTable(tbl["location"]), tbl, txn_id)
                os.remove(path)
                report[txn_id] = {"status": "completed"}
            except ConcurrentCommitError as e:
                undone = _undo_published(journal, txn_id)
                os.replace(path, path[: -len(".json")] + ".failed.json")
                report[txn_id] = {
                    "status": "rolled_back",
                    "reason": str(e),
                    "rolled_back": undone,
                }
        return report

    def maintain_all(self, spark: SparkSession, **kwargs) -> dict[str, dict]:
        """Run the one-call maintenance orchestrator over every table,
        per-table policy from its own properties (a table declaring
        ``write.sort-order`` gets re-clustered, others just compacted).
        One failed table doesn't stop the sweep — its error is reported
        in its slot, the rest proceed (the Airflow-retry property,
        without Airflow)."""
        from ..plans.maintenance import run_maintenance

        report = {}
        for name in self.list_tables():
            try:
                report[name] = run_maintenance(
                    self.load_table(name), spark, **kwargs)
            except Exception as e:  # noqa: BLE001 — sweep must finish
                report[name] = {"error": f"{type(e).__name__}: {e}"}
        return report


def _publish_one(t: LakehouseTable, tbl: dict, txn_id: str) -> None:
    """Idempotently publish one journal table entry: skip if a snapshot
    stamped with this txn id already exists on the main history, else
    commit with the pinned parent (retries=0: any divergence surfaces
    as ConcurrentCommitError for the caller's all-or-nothing policy)."""
    meta = t.load_metadata()
    for s in t.snapshots_list(meta):
        if s.summary.get(TXN_SUMMARY_KEY) == txn_id:
            return  # this txn's commit already landed
    entries = [dict(e) for e in tbl["entries"]]
    for e in entries:
        e["added_snapshot_id"] = -1  # journal copies are pre-commit
    t.commit_append(
        entries,
        summary={TXN_SUMMARY_KEY: txn_id, **tbl.get("summary", {})},
        retries=0,
        expected_parent=tbl["expected_parent"],
    )


def _undo_published(journal: dict, txn_id: str) -> list[str]:
    """Roll back the journal's tables that THIS txn already published
    and that nobody has committed on top of (head snapshot still
    stamped with the txn id). A table someone already built on cannot
    be safely unwound — it is reported, not touched (the journal's
    ``.failed`` marker keeps the evidence)."""
    undone: list[str] = []
    for tbl in journal["tables"]:
        t = LakehouseTable(tbl["location"])
        meta = t.load_metadata()
        head = t.current_snapshot(meta)
        if head is None or head.summary.get(TXN_SUMMARY_KEY) != txn_id:
            continue
        parent = head.parent_id
        if parent is not None:
            t.rollback_to(parent)
        else:
            # bootstrap commit: unwind to the empty table
            for _ in range(4):
                meta = t.load_metadata()
                cur = t.current_snapshot(meta)
                if cur is None or cur.summary.get(TXN_SUMMARY_KEY) != txn_id:
                    break
                meta["current_snapshot_id"] = None
                try:
                    t._commit_metadata(meta)
                    break
                except ConcurrentCommitError:
                    continue
        undone.append(tbl["name"])
    return undone


class CatalogTransaction:
    """Atomic append transaction across MULTIPLE catalog tables.

    Protocol (two-phase with a write-ahead intent journal):

    1. ``stage_append(name, df)`` — the table's main head is pinned on
       first touch, and the data files are written NOW (the heavy,
       distributed work) but NOT committed: invisible to every reader,
       and plain orphans (``remove_orphan_files``) if the txn dies
       here. Multiple stages to one table coalesce into one commit.
    2. ``commit()`` — under the catalog publish lock (an ``os.link``
       CAS on ``_txns/LOCK``, so catalog transactions serialize):
       a. validate every touched table's head still equals its pin —
          any concurrent commit aborts with TransactionConflict and
          publishes NOTHING;
       b. write the intent journal ``_txns/<id>.json`` (table
          locations, pinned parents, manifest entries). From this
          instant the txn is COMMITTED: a crash at any later point is
          rolled FORWARD by ``Catalog.recover_transactions()``;
       c. publish per table via ``commit_append(retries=0,
          expected_parent=pin)`` stamped with the txn id — idempotent
          under recovery replay;
       d. remove the journal, release the lock.

    Isolation honesty at 10^12 scale: commits are per-table atomic
    swaps, so a reader scanning table A then table B DURING publish
    can see A's new snapshot and B's old one for the microseconds
    between the two swaps — same contract as Nessie's non-transactional
    readers. Writers are fully serialized: concurrent transactions
    queue on the lock, and a direct-to-table writer racing the
    publish window is detected by the pinned-parent CAS, triggering
    all-or-nothing rollback of anything this txn already swapped
    (see ``_undo_published``; the one unwindable case — someone
    committed ON TOP of this txn's snapshot mid-publish — is left
    intact and reported via the ``.failed`` journal).

    Reference analog: the DAG-ordered cross-database writes the
    reference performs with no atomicity at all
    (dags/Silver_Transform_Dag.py writes silver then gold; a crash
    between them leaves the warehouse inconsistent until the next
    run). This class closes exactly that gap."""

    def __init__(self, catalog: Catalog):
        import uuid

        self.catalog = catalog
        self.txn_id = uuid.uuid4().hex[:16]
        self._staged: dict[str, dict] = {}  # name -> journal table entry
        self._done = False

    # -- staging --------------------------------------------------

    def stage_append(self, name: str, df, n_files: int | None = None,
                     sort_cols: list[str] | None = None) -> None:
        if self._done:
            raise RuntimeError("transaction already finished")
        name = ".".join(_split(name))  # canonical namespace.table
        t = self.catalog.load_table(name)
        slot = self._staged.get(name)
        if slot is None:
            slot = {
                "name": name,
                "location": t.location,
                "expected_parent": t.load_metadata()["current_snapshot_id"],
                "entries": [],
                "summary": {},
            }
            self._staged[name] = slot
        entries = t.write_data_files(t.conform(df), n_files, sort_cols)
        slot["entries"].extend(entries)

    # -- finish ---------------------------------------------------

    def commit(self) -> dict[str, int]:
        """Publish everything staged; returns name -> snapshot_id."""
        import json

        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        if not self._staged:
            return {}
        cat = self.catalog
        os.makedirs(cat._txn_dir, exist_ok=True)
        journal = {"txn_id": self.txn_id,
                   "tables": list(self._staged.values())}
        path = os.path.join(cat._txn_dir, f"{self.txn_id}.json")
        with _publish_lock(cat._txn_dir):
            # phase 1: validate every pin while holding the lock
            for tbl in journal["tables"]:
                head = LakehouseTable(
                    tbl["location"]).load_metadata()["current_snapshot_id"]
                if head != tbl["expected_parent"]:
                    self._drop_staged_files()
                    raise TransactionConflict(
                        f"{tbl['name']}: head {head} != pinned "
                        f"{tbl['expected_parent']}; nothing published")
            # phase 2: write-ahead intent — the commit point
            _exclusive_write(path, json.dumps(journal, indent=1))
            # phase 3: publish (idempotent; recovery replays this loop)
            try:
                for tbl in journal["tables"]:
                    _publish_one(LakehouseTable(tbl["location"]), tbl,
                                 self.txn_id)
            except ConcurrentCommitError as e:
                undone = _undo_published(journal, self.txn_id)
                os.replace(path, path[: -len(".json")] + ".failed.json")
                raise TransactionConflict(
                    f"direct write raced the publish window: {e}; "
                    f"rolled back {undone}") from e
            os.remove(path)
        out = {}
        for tbl in journal["tables"]:
            t = LakehouseTable(tbl["location"])
            out[tbl["name"]] = t.current_snapshot().snapshot_id
        return out

    def abort(self) -> None:
        """Discard the staged (uncommitted) files; nothing was ever
        visible."""
        if not self._done:
            self._done = True
            self._drop_staged_files()

    def _drop_staged_files(self) -> None:
        import contextlib

        for tbl in self._staged.values():
            root = to_local(tbl["location"])
            for e in tbl["entries"]:
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(root, e["file_path"]))

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.abort()
        elif not self._done:
            self.commit()


class _publish_lock:
    """Exclusive catalog publish lock: os.link CAS on ``_txns/LOCK``
    (the same no-overwrite primitive as table commits — works on any
    POSIX filesystem, no server). Stale locks (holder died mid-publish;
    its journal, if any, is recovery's job) are stolen after
    ``ttl_s``."""

    def __init__(self, txn_dir: str, ttl_s: float = 120.0,
                 timeout_s: float = 30.0):
        self.path = os.path.join(txn_dir, "LOCK")
        self.ttl_s = ttl_s
        self.timeout_s = timeout_s

    def __enter__(self) -> None:
        import contextlib
        import time

        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                _exclusive_write(self.path, str(os.getpid()))
                return
            except ConcurrentCommitError:
                try:
                    age = time.time() - os.stat(self.path).st_mtime
                except FileNotFoundError:
                    continue  # released between link and stat — retry
                if age > self.ttl_s:
                    with contextlib.suppress(OSError):
                        os.remove(self.path)
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"catalog publish lock busy for {self.timeout_s}s "
                        f"({self.path})") from None
                time.sleep(0.05)

    def __exit__(self, exc_type, exc, tb) -> None:
        import contextlib

        with contextlib.suppress(OSError):
            os.remove(self.path)
