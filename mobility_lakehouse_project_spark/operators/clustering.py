"""Z-order / Hilbert clustering rewrite.

Replaces the table's data layout with one sorted by a space-filling
curve over (phash, w, h): the engine's substitute for the reference's
ART indexes (SURVEY.md §4) — after clustering, per-file min/max stats
in the manifests make point/range scans on the clustered columns prune
most files.

Two-pass plan, designed so the image blobs are read EXACTLY ONCE:

  pass 1 (key-only):  scan only (partition, phash, w, h) — parquet
      column pruning makes this ~16 bytes/row vs ~KBs of blob — compute
      the curve key (Arrow-vectorized pandas UDF, functions/sfc.py) and
      per-partition quantile boundaries (percentile_approx) that split
      each partition into target-file-size groups.
      A naive ``repartitionByRange`` would instead let RangePartitioner
      sample the full child plan — executing the blob scan twice, which
      at 100 TB doubles the dominant cost. The key-only pass is the
      scale-correct substitute.

  pass 2 (single blob shuffle):  full scan -> curve key -> file-group
      index via np.searchsorted against the broadcast boundaries ->
      exact-slot hash shuffle (one group per reduce task, see
      ``_slot_tokens``) -> sortWithinPartitions(partition, key) ->
      write. Each output file is a contiguous curve range inside its
      partition -> tight phash/w/h manifest stats.

Resumable per chunk via the lineage log, like compaction.
"""

from __future__ import annotations

import json
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.sfc import (
    curve_key_udf,
    str_common_skip,
    str_prefix_expr,
    str_prefix_int,
    zorder_col,
)
from ..lineage import LineageLog
from ..tableformat import LakehouseTable
from .compaction import (
    DEFAULT_TARGET_FILE_SIZE,
    _chunk,
    _op_fingerprint,
    chunk_file_paths,
    chunk_key,
)

_SFC_COL = "_sfc"
_GRP_COL = "_grp"
_TOK_COL = "_tok"
_QUANTILES = 128


from ..tableformat.distribute import slot_tokens as _slot_tokens  # noqa: E402


def _token_assigner(bounds: dict, offsets: dict, tokens: np.ndarray):
    """Arrow UDF over two narrow columns: (partition, curve_key) ->
    shuffle token (searchsorted against broadcast quantile boundaries,
    then slot-token lookup). For the zorder curve the key column itself
    is a pure Catalyst expression (sfc.zorder_col), so this is the only
    Python in the rewrite besides optional recompression."""

    @F.pandas_udf(T.LongType())
    def assign(part: pd.Series, key: pd.Series) -> pd.Series:
        kv = key.to_numpy(dtype=np.int64, na_value=0)
        grp = np.empty(len(part), dtype=np.int64)
        pv = part.to_numpy()
        for p in pd.unique(pv):
            m = pv == p
            grp[m] = offsets[str(p)] + np.searchsorted(bounds[str(p)], kv[m], side="right")
        return pd.Series(tokens[grp])

    return assign


def resolve_sort_order(
    table: LakehouseTable, curve: str | None, cols: tuple[str, ...] | None,
) -> tuple[str, tuple[str, ...]]:
    """Resolve the layout to cluster by, PER AXIS: an explicit value
    always wins; a None axis falls back to the table's declared
    ``write.sort-order`` property (declare once, every maintenance
    pass agrees), then to the image-payload default
    ``zorder(phash, w, h)``. An explicit ``curve`` with ``cols=None``
    therefore re-sorts the DECLARED columns under the requested curve
    — it is never silently overridden."""
    declared = (table.sort_order()
                if curve is None or cols is None else None)
    if cols is None:
        cols = declared[1] if declared else ("phash", "w", "h")
    if curve is None:
        curve = declared[0] if declared else "zorder"
    return curve, tuple(cols)


def _string_dims(table: LakehouseTable, cols: tuple[str, ...]) -> dict[str, bool]:
    """Which cluster dims are STRING columns (they participate through
    the order-preserving int64 prefix image, sfc.str_prefix_expr; their
    bounds come from manifest str_mins/str_maxs)."""
    schema = {f.name: f.dataType for f in table.schema().fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"cluster column {c!r} not in table schema")
        if isinstance(schema[c], (T.DoubleType, T.FloatType)):
            # double manifest stats live in the order-key encoded
            # domain (tableformat.table.double_order_key); the Catalyst
            # curve key would read the RAW value — mismatched scales.
            raise ValueError(
                f"cluster column {c!r} is double/float — cluster by an "
                "integer image (e.g. a scaled/rounded derived column) "
                "instead")
    return {c: isinstance(schema[c], T.StringType) for c in cols}


def _stat_aggs(cols, is_str):
    """Per-dim manifest-stats extrema aggregates (int or string maps)."""
    return [
        *[F.min(F.col("str_mins" if is_str[c] else "int_mins")[c]).alias(f"lo_{c}")
          for c in cols],
        *[F.max(F.col("str_maxs" if is_str[c] else "int_maxs")[c]).alias(f"hi_{c}")
          for c in cols],
    ]


def _dim_spec(lo, hi, is_str: bool) -> tuple[int, int, int]:
    """(skip_bytes, lo_int, hi_int) for one dim. String dims strip the
    common prefix of the observed range first (id-like columns share a
    constant head — ``img0000...`` — that would otherwise swallow the
    whole 7-byte window), then map to the order-preserving int64
    image."""
    if is_str:
        skip = str_common_skip(str(lo), str(hi))
        return (skip, str_prefix_int(str(lo), skip),
                str_prefix_int(str(hi), skip))
    return 0, int(lo), int(hi)


def _dim_exprs(cols, is_str, skips=None):
    skips = skips or {}
    return [str_prefix_expr(c, skips.get(c, 0)) if is_str[c] else F.col(c)
            for c in cols]


def _make_key_expr(curve, cols, is_str, dim_bounds, skips=None):
    if curve == "zorder":
        return lambda: zorder_col(*_dim_exprs(cols, is_str, skips),
                                  bounds=dim_bounds)
    _udf = curve_key_udf(curve, dim_bounds)
    return lambda: _udf(*_dim_exprs(cols, is_str, skips))


def cluster(
    table: LakehouseTable,
    spark: SparkSession,
    curve: str | None = None,
    cols: tuple[str, ...] | None = None,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    n_chunks: int = 4,
    op_id: str | None = None,
    recompress_level: int | None = None,
    only_partitions: set[str] | None = None,
) -> dict:
    """Rewrite the table clustered by ``curve`` over ``cols``
    (1-3 integer OR string columns; a single column degenerates to a
    plain sort — the right layout when only one column carries
    selective predicates, see BENCH/BASELINE.md's coarse-granularity
    reading). A string dim participates through its order-preserving
    7-byte-prefix int64 image (``sfc.str_prefix_expr``) with bounds
    from manifest ``str_mins``/``str_maxs`` — the layout that makes
    string-range pruning (``image_id`` point lookups, ``dt`` retention
    windows) effective. ``cols=None`` adopts the table's
    ``write.sort-order`` property (see resolve_sort_order)."""
    curve, cols = resolve_sort_order(table, curve, cols)
    if not 1 <= len(cols) <= 3:
        raise ValueError(f"cluster over 1-3 columns, got {cols!r}")
    from .compaction import require_single_spec

    require_single_spec(table, spark)
    # planning = ONE aggregation over the files metadata DataFrame: a
    # single metadata-sized row per partition reaches the driver,
    # carrying BOTH the per-partition sizing and the per-partition
    # stats extrema. The table-wide dim bounds for range-scaled key
    # normalization derive from those rows driver-side — folding what
    # used to be a second manifest job into this one (each tiny job
    # costs ~0.3-0.5 s of fixed scheduling, an Amdahl term the 4N level
    # pays in full). Without range normalization, a narrow-range dim
    # (w, h in {16..128}) contributes no high bits to the interleaved
    # key and its file stats never prune (measured 0.000 pruned
    # pre-fix — tools/run_pruning.py).
    is_str = _string_dims(table, cols)
    plan_rows = (
        table.files(spark)
        .groupBy("partition_id")
        .agg(
            F.sum("file_size_bytes").alias("bytes"),
            F.count("*").alias("n_files"),
            *_stat_aggs(cols, is_str),
        )
        .collect()
    )
    if not plan_rows:
        return {"curve": curve, "cols": ",".join(cols),
                "files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
                "wall_ms": 0, "chunks_skipped": 0, "snapshots": []}
    dim_bounds = None
    bvals = [
        (
            min((r[f"lo_{c}"] for r in plan_rows if r[f"lo_{c}"] is not None),
                default=None),
            max((r[f"hi_{c}"] for r in plan_rows if r[f"hi_{c}"] is not None),
                default=None),
        )
        for c in cols
    ]
    skips = {c: 0 for c in cols}
    if all(lo is not None and hi is not None for lo, hi in bvals):
        specs = [_dim_spec(lo, hi, is_str[c])
                 for (lo, hi), c in zip(bvals, cols)]
        skips = {c: sp[0] for sp, c in zip(specs, cols)}
        dim_bounds = tuple((sp[1], sp[2]) for sp in specs)
    key_expr = _make_key_expr(curve, cols, is_str, dim_bounds, skips)
    op_id = op_id or _op_fingerprint("cluster-" + curve, table, ",".join(cols))
    log = LineageLog(table.location)
    done = log.completed_chunks(op_id)
    pcol = table._partition_col()

    part_bytes_all = {r["partition_id"]: int(r["bytes"]) for r in plan_rows}
    if only_partitions is not None:
        # incremental clustering: only the partitions a recent ingest
        # disturbed are rewritten; dim bounds above stay TABLE-wide so
        # keys remain comparable with already-clustered partitions
        part_bytes_all = {
            p: b for p, b in part_bytes_all.items() if p in only_partitions
        }
    part_ids = sorted(part_bytes_all)

    metrics = {"curve": curve, "cols": ",".join(cols),
               "files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
               "wall_ms": 0, "chunks_skipped": 0, "snapshots": [],
               "phases_ms": {"plan": 0, "pass1_quantiles": 0,
                             "pass2_rewrite": 0, "commit": 0}}
    ph = metrics["phases_ms"]
    # The rewrite's physical plan is fully pinned: the exact-slot
    # repartition fixes the reduce partition count, there are no joins
    # to re-strategize, and sizing comes from manifest stats — AQE's
    # materialize-and-replan pause at every stage boundary is pure
    # driver latency here (event-log measured: the pauses are an Amdahl
    # constant the 4N level pays in full). Disabled for the rewrite
    # jobs only, restored after.
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        _cluster_chunks(
            table, spark, part_ids, n_chunks, done, metrics, ph, pcol,
            part_bytes_all, target_file_size, key_expr, recompress_level,
            log, op_id, curve, cols, dim_bounds=dim_bounds, skips=skips,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    return metrics


def _cluster_chunks(table, spark, part_ids, n_chunks, done, metrics, ph,
                    pcol, part_bytes_all, target_file_size, key_expr,
                    recompress_level, log, op_id, curve, cols,
                    paths_fn=None, dim_bounds=None, minor=False,
                    skips=None):
    for chunk_parts in _chunk(part_ids, n_chunks):
        ck = chunk_key(list(chunk_parts))
        if ck in done:
            metrics["chunks_skipped"] += 1
            continue
        t0 = time.time()
        # only this chunk's file paths are ever collected (bounded)
        if paths_fn is not None:
            removed = set(paths_fn(list(chunk_parts)))
        else:
            removed = set(chunk_file_paths(table, spark, list(chunk_parts)))
        if not removed:
            continue
        n_out_p = {
            p: max(1, round(part_bytes_all[p] / target_file_size))
            for p in chunk_parts
        }
        ph["plan"] += int((time.time() - t0) * 1000)
        t1 = time.time()

        # ---- pass 1: key-only quantile boundaries per partition ----
        key_cols = ([pcol] if pcol else []) + [c for c in cols if c != pcol]
        keys_df = table.scan_files(spark, sorted(removed), columns=key_cols)
        # the key columns are ~16 bytes/row vs KBs of blob, so the scan
        # inherits far more splits than its data justifies (hundreds of
        # near-empty tasks whose fixed cost dominates); coalesce to a
        # couple of waves — no shuffle, each task reads several files
        keys_df = keys_df.coalesce(max(spark.sparkContext.defaultParallelism * 2, 8))
        keyed = keys_df.withColumn(_SFC_COL, key_expr())
        probs = [i / _QUANTILES for i in range(1, _QUANTILES)]
        # group by partition VALUE (transform of the source column
        # under hidden partitioning) so quantile groups line up with
        # the manifest partition_ids the plan chunked by
        group_col = table.partition_value_expr() if pcol else F.lit(0)
        qrows = (
            keyed.groupBy(group_col.alias("_p"))
            .agg(F.percentile_approx(_SFC_COL, probs, 2_500).alias("qs"))
            .collect()
        )
        bounds: dict[str, np.ndarray] = {}
        offsets: dict[str, int] = {}
        off = 0
        for p in chunk_parts:
            bkey = p if pcol else "0"  # unpartitioned: single group key
            row = next((r for r in qrows if str(r["_p"]) == bkey), None)
            n_o = n_out_p[p]
            if row is None or n_o <= 1:
                b = np.array([], dtype=np.int64)
            else:
                qs = row["qs"]
                b = np.array(
                    sorted({qs[int(_QUANTILES * i / n_o) - 1] for i in range(1, n_o)}),
                    dtype=np.int64,
                )
            bounds[bkey] = b
            offsets[bkey] = off
            off += len(b) + 1
        total_out = off
        ph["pass1_quantiles"] += int((time.time() - t1) * 1000)
        t2 = time.time()

        # ---- pass 2: single blob shuffle into exact slots ----
        # within-file order does not change FILE-level min/max stats
        # (group membership does), so sort by (partition, phash) — the
        # curve key itself need not ride the shuffle.
        tokens = np.array(_slot_tokens(spark, total_out), dtype=np.int64)
        # delete-manifest set the blob scan applies — commit guard
        # against concurrent MOR/DV deletes resurrecting (the key pass
        # above never affects row content, so the window starts here)
        plan_snap = table.current_snapshot()
        plan_dm = set(plan_snap.delete_manifests) if plan_snap else set()
        # with_row_id: row lineage rides the one blob shuffle as an
        # 8-byte column and materializes into the rewritten files
        df = table.scan_files(spark, sorted(removed), with_row_id=True,
                              with_last_seq=True)
        if recompress_level is not None:
            from .multimodal import recompress_images

            df = recompress_images(df, recompress_level)
        assign = _token_assigner(bounds, offsets, tokens)
        shaped = (
            df.withColumn(_SFC_COL, key_expr())
            .withColumn(_TOK_COL, assign(group_col.cast("string"), F.col(_SFC_COL)))
            .repartition(total_out, F.col(_TOK_COL))
            .sortWithinPartitions(*(([pcol] if pcol else []) + [cols[0]]))
            .drop(_TOK_COL, _SFC_COL)
        )
        new_entries = table.write_data_files(shaped, distribution="none",
                                             enforce_constraints=False)
        ph["pass2_rewrite"] += int((time.time() - t2) * 1000)
        for k, v in getattr(table, "last_write_phases", {}).items():
            ph[k] = ph.get(k, 0) + v
        t3 = time.time()
        snap = table.commit_replace(
            removed, new_entries, operation="replace",
            summary={"op": f"cluster-{curve}", "op_id": op_id, "chunk": ck,
                     # signature of the layout this commit produced —
                     # cluster_incremental resolves "when was this
                     # table last clustered THIS way" and reuses the
                     # key-normalization bounds so minor runs stay
                     # comparable with the majority layout
                     "cluster_cols": ",".join(cols),
                     "cluster_minor": "1" if minor else "0",
                     "cluster_bounds": json.dumps(list(dim_bounds))
                     if dim_bounds else "",
                     # byte-skips of string dims (common-prefix strip);
                     # persisted so minor runs rebuild the SAME key
                     "cluster_skips": json.dumps(
                         [(skips or {}).get(c, 0) for c in cols])
                     if skips and any(skips.values()) else ""},
            affected_partitions=set(chunk_parts),
            expected_delete_manifests=plan_dm,
        )
        ph["commit"] += int((time.time() - t3) * 1000)
        wall_ms = int((time.time() - t0) * 1000)
        rows = sum(e["record_count"] for e in new_entries)
        nbytes = sum(e["file_size_bytes"] for e in new_entries)
        log.record(op_id, ck, list(chunk_parts), len(removed),
                   len(new_entries), rows, nbytes, wall_ms, snap.snapshot_id)
        metrics["files_in"] += len(removed)
        metrics["files_out"] += len(new_entries)
        metrics["rows"] += rows
        metrics["bytes"] += nbytes
        metrics["wall_ms"] += wall_ms
        metrics["snapshots"].append(snap.snapshot_id)


def _last_cluster_snapshot(table, curve, cols):
    """Most recent FULL-layout cluster commit with the same curve+cols
    signature (minor commits don't reset the incremental baseline — a
    sequence of minor runs still measures newness against the last
    major layout, so un-merged minor files keep being candidates for
    the eventual major merge). Returns (snapshot|None, bounds|None,
    skips|None)."""
    want_op = f"cluster-{curve}"
    want_cols = ",".join(cols)
    for s in reversed(table.snapshots_list()):
        sm = s.summary or {}
        if (sm.get("op") == want_op
                and sm.get("cluster_cols", want_cols) == want_cols
                and sm.get("cluster_minor", "0") != "1"):
            bounds = None
            if sm.get("cluster_bounds"):
                bounds = tuple(
                    (int(lo), int(hi))
                    for lo, hi in json.loads(sm["cluster_bounds"])
                )
            skips = None
            if sm.get("cluster_skips"):
                skips = dict(zip(cols, json.loads(sm["cluster_skips"])))
            return s, bounds, skips
    return None, None, None


def cluster_incremental(
    table: LakehouseTable,
    spark: SparkSession,
    curve: str | None = None,
    cols: tuple[str, ...] | None = None,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    n_chunks: int = 4,
    merge_threshold: float = 0.4,
    op_id: str | None = None,
    recompress_level: int | None = None,
) -> dict:
    """Cluster only what a recent ingest disturbed — the maintenance
    shape that survives 100 TB.

    A full ``cluster()`` rewrites every byte of the table; at 10^12
    images that is a multi-PB shuffle per maintenance run, which is why
    real engines (Iceberg's rewrite_data_files with a where-clause, LSM
    minor compaction) re-sort only the *delta*. This operator:

      1. finds the last full cluster commit with the same curve+cols
         signature (its sequence number is the layout baseline);
      2. classifies each partition by how much data arrived since —
         new-bytes / total-bytes >= ``merge_threshold`` means sorting
         just the delta would leave the partition mostly unsorted, so
         it gets a MAJOR (full partition) re-cluster via ``cluster(
         only_partitions=...)``;
      3. every other touched partition gets a MINOR pass: ONLY the
         post-baseline files are read, curve-sorted, and rewritten —
         already-clustered files are never touched, so the rewrite cost
         is O(ingested bytes), not O(table bytes).

    Minor output files form a second sorted run next to the major
    layout. File-level min/max stats stay exact, so scan pruning
    degrades only by the (bounded, < merge_threshold) overlap until the
    next major run folds the runs together. Minor commits carry
    ``cluster_minor=1`` so the baseline keeps pointing at the last
    MAJOR layout and minor files remain merge candidates.

    Key comparability: minor runs reuse the baseline's persisted
    range-normalization bounds (commit summary ``cluster_bounds``);
    out-of-range new values clamp — file stats, and therefore pruning,
    remain exact regardless.

    Never-clustered tables fall through to a full ``cluster()``.
    """
    from .compaction import require_single_spec

    curve, cols = resolve_sort_order(table, curve, cols)
    require_single_spec(table, spark)
    last, prior_bounds, prior_skips = _last_cluster_snapshot(table, curve, cols)
    if last is None:
        return {"mode": "full",
                **cluster(table, spark, curve=curve, cols=cols,
                          target_file_size=target_file_size,
                          n_chunks=n_chunks, op_id=op_id,
                          recompress_level=recompress_level)}
    cutoff_seq = last.sequence
    seqs = table._snapshot_seqs()
    new_ids = [sid for sid, sq in seqs.items() if sq > cutoff_seq]
    # post-baseline snapshots split into INGEST commits vs this op's own
    # minor-run outputs: a partition is touched only when real ingest
    # reached it — otherwise back-to-back maintenance runs would
    # re-sort their own minor output forever (O(minor-set) per run at
    # zero ingest). Once ingest does arrive, the partition's WHOLE
    # post-baseline set (prior minor outputs included) re-sorts, so the
    # runs keep folding together.
    minor_sig = {"op": f"cluster-{curve}", "cluster_cols": ",".join(cols),
                 "cluster_minor": "1"}
    live = {s.snapshot_id: (s.summary or {}) for s in table.snapshots_list()}
    ingest_ids = [
        sid for sid in new_ids
        if not all(live.get(sid, {}).get(k) == v for k, v in minor_sig.items())
    ]
    empty = {"files_in": 0, "files_out": 0, "rows": 0, "bytes": 0,
             "wall_ms": 0, "chunks_skipped": 0, "snapshots": []}
    if not ingest_ids:
        return {"mode": "noop", "major_partitions": [],
                "minor_partitions": [], **empty}
    newf = F.col("added_snapshot_id").isin(new_ids)
    ingf = F.col("added_snapshot_id").isin(ingest_ids)
    plan_rows = (
        table.files(spark)
        .groupBy("partition_id")
        .agg(
            F.sum(F.when(newf, F.col("file_size_bytes"))).alias("new_bytes"),
            F.count(F.when(newf, F.lit(1))).alias("new_files"),
            F.count(F.when(ingf, F.lit(1))).alias("ingest_files"),
            F.sum("file_size_bytes").alias("total_bytes"),
        )
        .collect()
    )
    majors = {
        r["partition_id"] for r in plan_rows
        if r["ingest_files"]
        and r["new_bytes"] / max(r["total_bytes"], 1) >= merge_threshold
    }
    minor_bytes = {
        r["partition_id"]: int(r["new_bytes"]) for r in plan_rows
        if r["ingest_files"] and r["partition_id"] not in majors
    }
    if not majors and not minor_bytes:
        # the post-baseline snapshots exist but none of their files
        # survive (already folded by a prior minor run / rewritten)
        return {"mode": "noop", "major_partitions": [],
                "minor_partitions": [], **empty}
    report: dict = {"mode": "incremental",
                    "curve": curve, "cols": ",".join(cols),
                    "major_partitions": sorted(majors),
                    "minor_partitions": sorted(minor_bytes)}
    if majors:
        report["major"] = cluster(
            table, spark, curve=curve, cols=cols,
            target_file_size=target_file_size, n_chunks=n_chunks,
            recompress_level=recompress_level, only_partitions=majors,
        )
    if not minor_bytes:
        report.setdefault("minor", dict(empty))
        return report

    is_str = _string_dims(table, cols)
    dim_bounds, skips = prior_bounds, prior_skips or {c: 0 for c in cols}
    if dim_bounds is None:
        # legacy baseline without persisted bounds: derive from the
        # minor candidates alone (clamping still keeps stats exact)
        brows = (
            table.files(spark)
            .filter(newf & F.col("partition_id").isin(sorted(minor_bytes)))
            .agg(*_stat_aggs(cols, is_str))
            .collect()[0]
        )
        if all(brows[f"lo_{c}"] is not None and brows[f"hi_{c}"] is not None
               for c in cols):
            specs = [_dim_spec(brows[f"lo_{c}"], brows[f"hi_{c}"], is_str[c])
                     for c in cols]
            skips = {c: sp[0] for sp, c in zip(specs, cols)}
            dim_bounds = tuple((sp[1], sp[2]) for sp in specs)
    key_expr = _make_key_expr(curve, cols, is_str, dim_bounds, skips)

    def paths_fn(parts: list[str]) -> list[str]:
        return sorted(
            r["file_path"]
            for r in table.plan_files(spark, partition_values=set(parts))
            .filter(F.col("added_snapshot_id").isin(new_ids))
            .select("file_path").collect()
        )

    op_id = op_id or _op_fingerprint(
        "cluster-inc-" + curve, table, ",".join(cols))
    log = LineageLog(table.location)
    done = log.completed_chunks(op_id)
    pcol = table._partition_col()
    metrics = dict(empty)
    metrics["snapshots"] = []
    metrics["phases_ms"] = {"plan": 0, "pass1_quantiles": 0,
                            "pass2_rewrite": 0, "commit": 0}
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        _cluster_chunks(
            table, spark, sorted(minor_bytes), n_chunks, done, metrics,
            metrics["phases_ms"], pcol, minor_bytes, target_file_size,
            key_expr, recompress_level, log, op_id, curve, cols,
            paths_fn=paths_fn, dim_bounds=dim_bounds, minor=True,
            skips=skips,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    report["minor"] = metrics
    return report


def pruning_ratio(
    table: LakehouseTable,
    spark: SparkSession,
    col: str,
    lo: int,
    hi: int,
) -> dict:
    """Measure stats-pruning effectiveness for a range predicate: the
    fraction of files a clustered scan can skip (the observable payoff
    of Z-order/Hilbert). Counted on the manifest DataFrame — two
    scalar aggregates reach the driver."""
    row = (
        table.files(spark)
        .agg(
            F.count("*").alias("total"),
            F.count(
                F.when(
                    F.col("int_maxs")[col].isNull()
                    | ((F.col("int_maxs")[col] >= lo) & (F.col("int_mins")[col] <= hi)),
                    1,
                )
            ).alias("kept"),
        )
        .collect()[0]
    )
    total, kept = int(row["total"]), int(row["kept"])
    return {"total_files": total, "scanned_files": kept,
            "pruned_fraction": 1.0 - kept / max(total, 1)}
