"""Validated commit rebase for content-sensitive row-level operations.

MERGE / DELETE / UPDATE pin their commit to the snapshot the plan read
(``expected_parent`` + ``retries=0``): their row classification
(matched / not-matched, predicate-TRUE rows, delete positions) is a
table-wide or file-content precondition that a generic partition-scoped
retry cannot re-validate. Before this module, ANY commit landing in the
plan-to-commit window therefore surfaced ``ConcurrentCommitError`` and
discarded the finished (often expensive — blob rewrite) output.

This module implements Iceberg's conflicting-commit validation
(SnapshotManager validateNoConflictingAppends / validateDataFilesExist,
core/src/main/java of apache/iceberg — public design): after a lost
commit race, inspect exactly the commits that landed since the plan
snapshot and decide whether the already-written output is still valid
on the new head. If so, re-pin and re-commit — the work is kept. If
not, raise the same ``ConcurrentCommitError`` the pinned commit
already raises, so callers' replan handling is unchanged.

A rebase is legal iff every commit since the plan snapshot

* is a plain ``append`` — a rewrite / delete / overwrite may have
  rewritten or removed files the plan classified or is replacing;
* added no delete files — concurrent position/equality deletes or DVs
  could target rows the plan carries through a rewrite (resurrection)
  or stack onto files the plan is dropping;
* changed no schema / partition-spec / rename / CHECK-constraint
  metadata (the ``plan fingerprint``) — the output files were written
  under the old shape;
* and, for key-conditioned plans (MERGE), appended NO row whose merge
  key appears in the plan's key set — checked EXACTLY with a key
  semi-join over the ``updated_since`` incremental read, which prunes
  to just the concurrently appended files: cost is O(concurrent append
  volume), never O(table). Predicate-conditioned plans (DELETE/UPDATE)
  need no key check at all: under snapshot isolation they operate on
  the rows of THEIR snapshot, and rows appended after the plan are
  legitimately out of scope (Iceberg CoW DELETE likewise validates
  only deletes/rewrites, not appends, at snapshot isolation).

At 10^12-image scale this is the difference between absorbing a
streaming ingest that lands during an hour-long maintenance MERGE or
retention DELETE and redoing the whole blob rewrite.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..tableformat import LakehouseTable
from ..tableformat.table import ConcurrentCommitError, Snapshot


def rebase_fingerprint(meta: dict) -> tuple:
    """The parts of table metadata a row-level plan depends on beyond
    the snapshot content: schema, partition spec, rename history, CHECK
    constraints. A concurrent change to ANY of these invalidates the
    already-written output files (wrong columns / wrong layout /
    unvalidated constraint), so a rebase is only legal when the
    fingerprint is unchanged."""
    props = meta.get("properties", {})
    return (
        meta.get("schema_json"),
        meta.get("partition_col"),
        meta.get("partition_transform"),
        json.dumps(meta.get("column_renames", {}), sort_keys=True),
        json.dumps({k: v for k, v in sorted(props.items())
                    if k.startswith("constraints.")}),
    )


def validate_rebase(
    table: LakehouseTable,
    spark: SparkSession,
    plan_snap: Snapshot,
    plan_fp: tuple,
    conflict_keys: DataFrame | None = None,
    keys: list[str] | None = None,
    full_sync: bool = False,
    op: str = "rebase",
) -> Snapshot:
    """Decide whether a plan derived at ``plan_snap`` is still valid
    against the advanced table head (see module docstring for the
    rules). ``conflict_keys``/``keys``: the plan's key set for
    key-conditioned plans (MERGE) — pass ``None`` for
    predicate-conditioned plans (DELETE/UPDATE), which conflict with
    nothing an append can add. ``full_sync=True`` (MERGE WHEN NOT
    MATCHED BY SOURCE) rejects ANY concurrent append: the plan's
    by-source delete set was the whole key universe.

    Returns the new head :class:`Snapshot` to re-pin the commit to, or
    raises :class:`ConcurrentCommitError` (``non_retryable``) when the
    caller must replan."""

    def _replan(why: str) -> ConcurrentCommitError:
        err = ConcurrentCommitError(
            f"{op} rebase rejected: {why}; replan required")
        err.non_retryable = True
        return err

    meta = table.load_metadata()
    if rebase_fingerprint(meta) != plan_fp:
        raise _replan("schema/partition-spec/constraints changed since plan")
    head = table.current_snapshot(meta)
    if head is None:
        raise _replan("table has no current snapshot anymore")
    snaps = {s.snapshot_id: s for s in table.snapshots_list(meta)}
    chain: list[Snapshot] = []  # head -> ... -> child-of-plan
    sid: int | None = head.snapshot_id
    while sid is not None and sid != plan_snap.snapshot_id:
        s = snaps.get(sid)
        if s is None:  # expired from history, or a rollback rewired it
            raise _replan(
                f"plan snapshot {plan_snap.snapshot_id} is not an "
                f"ancestor of head {head.snapshot_id}")
        chain.append(s)
        sid = s.parent_id
    if sid is None:
        raise _replan(
            f"plan snapshot {plan_snap.snapshot_id} is not an ancestor "
            f"of head {head.snapshot_id}")
    non_append = [s for s in chain if s.operation != "append"]
    if non_append:
        raise _replan(
            "concurrent non-append commit(s): "
            + ", ".join(f"{s.snapshot_id}={s.operation}"
                        for s in non_append[:3]))
    if set(head.delete_manifests) != set(plan_snap.delete_manifests):
        raise _replan("concurrent commit added/removed delete files")
    if chain and full_sync:
        raise _replan(
            "WHEN NOT MATCHED BY SOURCE plan cannot absorb ANY "
            "concurrent append (its delete set was the key universe)")
    if chain and conflict_keys is not None:
        # appends-only since plan => updated_since returns exactly the
        # concurrently appended rows (carried files are seq-pruned)
        appended = table.scan(spark, columns=list(keys),
                              updated_since=plan_snap.sequence)
        n_hit = (appended.join(conflict_keys.select(*keys), list(keys),
                               "left_semi")
                 .limit(1).count())
        if n_hit:
            raise _replan("a concurrent append contains merge-key matches")
    return head


def commit_with_rebase(
    commit_fn,
    table: LakehouseTable,
    spark: SparkSession,
    plan_snap: Snapshot,
    plan_fp: tuple,
    rebase_retries: int,
    conflict_keys: DataFrame | None = None,
    keys: list[str] | None = None,
    full_sync: bool = False,
    op: str = "rebase",
):
    """Run ``commit_fn(pin_snapshot_id)``; on a lost commit race,
    validate-and-rebase (:func:`validate_rebase`) up to
    ``rebase_retries`` times before surfacing the conflict. Keeps the
    expensive part of the operation — the blob rewrite already on
    disk — when the concurrent commits are non-conflicting appends
    (the streaming-ingest-lands-during-maintenance shape).
    ``rebase_retries=0`` disables rebasing entirely (every concurrent
    commit surfaces, the pre-rebase behavior)."""
    pin = plan_snap
    for attempt in range(rebase_retries + 1):
        try:
            return commit_fn(pin.snapshot_id)
        except ConcurrentCommitError:
            if attempt == rebase_retries:
                raise
            head = validate_rebase(table, spark, plan_snap, plan_fp,
                                   conflict_keys=conflict_keys, keys=keys,
                                   full_sync=full_sync, op=op)
            if head.snapshot_id == pin.snapshot_id:
                # the head never advanced past our pin — the failure
                # was not a lost commit race (e.g. a stale-plan
                # conflict from inside the commit itself), so
                # re-running the identical commit cannot succeed
                raise
            pin = head
    raise AssertionError("unreachable")
