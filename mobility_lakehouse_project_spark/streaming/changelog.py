"""CDC changelog scan — row-level changes between two snapshots.

Iceberg's changelog reads (`create_changelog_view` /
`spark.read.format("iceberg").option("start-snapshot-id", ...)`)
re-expressed on this table format: walk the snapshot log between two
snapshots and emit each commit's row-level changes tagged with
``_change_type`` ('insert' | 'delete') and ``_snapshot_id``. The
reference has no CDC surface at all — downstream layers re-read whole
days (dags/Silver_Transform_Dag.py:188-207); a changelog feed is what
lets a 10^12-image silver layer consume bronze incrementally instead.

Commit classification (mirrors Iceberg's changelog contract, which
likewise refuses snapshots it cannot attribute row-level):

* ``append`` (ingest, streaming batches, insert-only MERGE) — inserts:
  exactly the rows of the files the snapshot added (distributed scan
  of `added_snapshot_id == snapshot` files; no diffing).
* merge-on-read DELETE — deletes: the snapshot's NEW position-delete
  files joined back to the rows they reference ((file, pos) semi-join;
  prior manifests never re-list a pair, so this is exactly the newly
  deleted row set).
* compaction / clustering / manifest rewrite / position-delete rewrite
  / snapshot expiry — no logical change, emitted as nothing.
* copy-on-write content rewrites (CoW DELETE/UPDATE, MERGE upsert,
  partition overwrite, CTAS replace) — cannot be attributed row-level
  from file metadata alone; raises ChangelogUnsupportedError naming
  the snapshot (callers either scope the range around it or use MOR
  deletes, whose changelog is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tableformat import LakehouseTable


class ChangelogUnsupportedError(ValueError):
    """The range contains a content rewrite that file metadata cannot
    attribute row-level."""


_NOOP_OPS = {"rewrite-manifests", "rewrite-deletes", "expire-snapshots"}


def _classify(snap) -> str:
    if snap.operation == "append":
        return "insert"
    if snap.operation in _NOOP_OPS:
        return "skip"
    summ_op = str(snap.summary.get("op", ""))
    if snap.operation == "replace" and (
        summ_op in ("compact", "migrate-partitions")
        or summ_op.startswith("cluster-")
    ):
        return "skip"
    if snap.operation == "delete" and summ_op in (
            "mor-delete", "drop-partitions", "truncate"):
        # mor-delete covers BOTH its forms: position-delete manifests
        # (partial files) and pure file removal (fully-matched files
        # dropped metadata-only); drop-partitions/truncate are
        # removal-only
        return "mor-delete"
    # MOR upserts (MERGE mode='mor', UPDATE mode='mor') are exactly
    # attributable: position-delete files name the old row versions,
    # added files carry the new ones
    if summ_op in ("merge-mor", "mor-update"):
        return "mor-upsert"
    # equality deletes/upserts: the deleted rows are the parent
    # snapshot's earlier-sequenced rows matching the delete keys
    if summ_op == "eq-delete":
        return "eq-delete"
    if summ_op == "eq-upsert":
        return "eq-upsert"
    return "unsupported"


def changelog_df(
    table: LakehouseTable,
    spark: SparkSession,
    from_snapshot_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Row-level changes AFTER ``from_snapshot_id`` (exclusive; None =
    from the beginning) up to ``to_snapshot_id`` (inclusive; None =
    current). Returns the table's columns plus ``_change_type`` and
    ``_snapshot_id``, ordered within each commit as stored. The range
    must lie within retained history (expired snapshots have no files
    to read — same constraint as Iceberg's changelog)."""
    snaps = sorted(table.snapshots_list(), key=lambda s: s.sequence)
    by_id = {s.snapshot_id: s for s in snaps}
    if from_snapshot_id is not None and from_snapshot_id not in by_id:
        raise ValueError(f"unknown from_snapshot {from_snapshot_id}")
    cur = table.current_snapshot()
    if to_snapshot_id is None:
        to_snapshot_id = cur.snapshot_id if cur else None
    if to_snapshot_id is not None and to_snapshot_id not in by_id:
        raise ValueError(f"unknown to_snapshot {to_snapshot_id}")
    lo = by_id[from_snapshot_id].sequence if from_snapshot_id is not None else -1
    hi = by_id[to_snapshot_id].sequence if to_snapshot_id is not None else -1

    data_cols = [f.name for f in table.schema().fields]
    pieces: list[DataFrame] = []
    for snap in snaps:
        if not (lo < snap.sequence <= hi):
            continue
        kind = _classify(snap)
        if kind == "skip":
            continue
        if kind == "unsupported":
            raise ChangelogUnsupportedError(
                f"snapshot {snap.snapshot_id} ({snap.operation}"
                f"/{snap.summary.get('op')}) is a content rewrite; its "
                "row-level changes cannot be derived from file metadata "
                "— scope the changelog range around it, or use "
                "merge-on-read deletes"
            )
        if kind in ("insert", "mor-upsert", "eq-upsert"):
            added = [
                r["file_path"]
                for r in table.files(spark, snap.snapshot_id)
                .filter(F.col("added_snapshot_id") == snap.snapshot_id)
                .select("file_path").collect()
            ]
            if added:
                # freshly appended files can carry no delete entries at
                # their own snapshot — skip the MOR join outright
                rows = table.scan_files(spark, added, apply_deletes=False)
                pieces.append(rows.select(
                    *data_cols,
                    F.lit("insert").alias("_change_type"),
                    F.lit(snap.snapshot_id).alias("_snapshot_id"),
                ))
        if kind in ("eq-delete", "eq-upsert"):
            import os as _os

            import pyspark.sql.types as T

            parent = by_id.get(snap.parent_id)
            parent_dm = set(parent.delete_manifests) if parent else set()
            snap_seqs = {s.snapshot_id: s.sequence for s in snaps}
            schema = table.schema()
            for m, cols, eq_seq in snap.equality_delete_manifests():
                if m in parent_dm or parent is None:
                    continue
                entries = table.read_manifest_entries(m)
                if not entries:
                    continue
                keys_df = spark.read.schema(
                    T.StructType([schema[c] for c in cols])
                ).parquet(*[_os.path.join(table._local_root, e["file_path"])
                            for e in entries])
                keys2 = keys_df.select(
                    *[F.col(c).alias(f"__eq_{c}") for c in cols])
                if sum(e["record_count"] for e in entries) \
                        <= LakehouseTable.MOR_BROADCAST_ROWS:
                    keys2 = F.broadcast(keys2)
                # only parent files sequenced BEFORE the delete can hold
                # affected rows — the candidate filter IS the seq scope
                cand = [
                    r["file_path"]
                    for r in table.files(spark, parent.snapshot_id)
                    .select("file_path", "added_snapshot_id").collect()
                    if snap_seqs.get(r["added_snapshot_id"], 0) < eq_seq
                ]
                if not cand:
                    continue
                # parent-scoped scan: rows already deleted before this
                # commit are not re-emitted
                rows = table.scan_files(spark, cand, with_pos=True,
                                        snapshot=parent)
                cond = None
                for c in cols:
                    cc = rows[c] == keys2[f"__eq_{c}"]
                    cond = cc if cond is None else cond & cc
                deleted = rows.join(keys2, cond, "left_semi")
                pieces.append(deleted.select(
                    *data_cols,
                    F.lit("delete").alias("_change_type"),
                    F.lit(snap.snapshot_id).alias("_snapshot_id"),
                ))
        if kind in ("mor-delete", "mor-upsert"):
            parent = by_id.get(snap.parent_id)
            # files REMOVED by this commit (full-file MOR delete /
            # drop-partitions): every LIVE parent row of a removed file
            # is a deletion — read through the PARENT's delete set so
            # previously-deleted rows are not re-emitted
            if parent is not None:
                cur_files = {
                    r["file_path"]
                    for r in table.files(spark, snap.snapshot_id)
                    .select("file_path").collect()
                }
                removed = sorted(
                    r["file_path"]
                    for r in table.files(spark, parent.snapshot_id)
                    .select("file_path").collect()
                    if r["file_path"] not in cur_files
                )
                if removed:
                    rows = table.scan_files(spark, removed, snapshot=parent)
                    pieces.append(rows.select(
                        *data_cols,
                        F.lit("delete").alias("_change_type"),
                        F.lit(snap.snapshot_id).alias("_snapshot_id"),
                    ))
            parent_dm = set(parent.delete_manifests) if parent else set()
            new_dm = [m for m in snap.delete_manifests if m not in parent_dm]
            entries = []
            dv_infos = []
            for m in new_dm:
                info = snap.delete_manifest_meta.get(m, {})
                if info.get("kind") == "dv":
                    dv_infos.append(
                        (m, int(info["seq"]), int(info.get("positions", 0))))
                else:
                    entries.extend(table.read_manifest_entries(m))
            import os as _os

            dd = None
            if entries:
                dd = spark.read.schema("file_path string, pos long").parquet(
                    *[_os.path.join(table._local_root, e["file_path"])
                      for e in entries]
                )
            if dv_infos:
                # a deletion vector is the file's FULL pending set
                # (merge-on-write superset); the rows deleted BY THIS
                # COMMIT are its positions minus the parent's pending
                # deletes for the same files
                dv_new, _n = table._dv_positions_df(spark, dv_infos)
                if dv_new is not None:
                    if parent is not None:
                        prior, _np = table.position_deletes_df(spark, parent)
                        if prior is not None:
                            dv_new = dv_new.join(
                                prior, ["file_path", "pos"], "left_anti")
                    dd = dv_new if dd is None else dd.unionByName(dv_new)
            if dd is None:
                continue
            ref_files = sorted(
                r["file_path"] for r in dd.select("file_path").distinct().collect()
            )
            # the deleted rows themselves: (file, pos) semi-join against
            # the referenced data files. A pair appears in exactly one
            # delete manifest (MOR planning scans with prior deletes
            # applied), so no already-deleted row is re-emitted.
            rows = table.scan_files(spark, ref_files, with_pos=True,
                                    apply_deletes=False)
            dd2 = dd.select(F.col("file_path").alias("__cf"),
                            F.col("pos").alias("__cp"))
            n_pairs = (sum(e["record_count"] for e in entries)
                       + sum(npos for _m, _s, npos in dv_infos))
            if n_pairs <= LakehouseTable.MOR_BROADCAST_ROWS:
                dd2 = F.broadcast(dd2)
            deleted = rows.join(
                dd2,
                (rows["_file"] == dd2["__cf"]) & (rows["_pos"] == dd2["__cp"]),
                "left_semi",
            )
            pieces.append(deleted.select(
                *data_cols,
                F.lit("delete").alias("_change_type"),
                F.lit(snap.snapshot_id).alias("_snapshot_id"),
            ))
    if not pieces:
        import pyspark.sql.types as T

        schema = T.StructType(
            list(table.schema().fields)
            + [T.StructField("_change_type", T.StringType()),
               T.StructField("_snapshot_id", T.LongType())]
        )
        return spark.createDataFrame([], schema)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


class ChangelogCursor:
    """Durable consumption cursor for incremental CDC reads — the
    consumer half of the changelog (Iceberg's
    `stream-from-timestamp`/`start-snapshot-id` reader loop, without
    a long-running streaming query): each ``poll`` returns the
    changes committed since the last acknowledged snapshot, and
    ``ack`` durably advances the cursor AFTER the consumer has
    processed them — at-least-once delivery, so downstream processing
    must be idempotent on replay (the same contract as every
    checkpointed source). The cursor file lives wherever the consumer
    keeps state; one file per (table, consumer) pair."""

    def __init__(self, table: LakehouseTable, cursor_path: str):
        self.table = table
        self.cursor_path = cursor_path

    def position(self) -> int | None:
        import json
        import os

        if not os.path.exists(self.cursor_path):
            return None
        with open(self.cursor_path) as f:
            return json.load(f)["snapshot_id"]

    def poll(self, spark: SparkSession) -> "tuple[DataFrame, int] | None":
        """(changes_df, head_snapshot_id) for everything after the
        cursor, or None when the table has not advanced. Pass the
        returned head to :meth:`ack` once processed. Raises
        ChangelogUnsupportedError if the span contains a content
        rewrite — ack the offending snapshot explicitly (``ack(id)``)
        to skip past it after handling it out of band (e.g. a full
        re-sync)."""
        cur = self.table.current_snapshot()
        if cur is None:
            return None
        pos = self.position()
        if pos == cur.snapshot_id:
            return None
        df = changelog_df(self.table, spark, from_snapshot_id=pos,
                          to_snapshot_id=cur.snapshot_id)
        return df, cur.snapshot_id

    def ack(self, snapshot_id: int) -> None:
        import json
        import os
        import uuid

        tmp = f"{self.cursor_path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": snapshot_id}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.cursor_path)
