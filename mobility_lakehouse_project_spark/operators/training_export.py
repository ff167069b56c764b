"""Training-corpus export: deterministic shard packing and
aspect-ratio batch assembly.

The reference ships its gold outputs as whole-table CSV/parquet dumps
(`/root/reference/dags/Queries_dag.py:96-118` export step); a
10^12-image training corpus instead ships as

  * **size-bounded shards in a deterministic global shuffle order** —
    the data-loader contract of webdataset/tfrecord-style training
    input: each shard holds a pseudo-random sample of the corpus, sums
    to ~``target_bytes``, and the (shard, position) of every sample is
    a pure function of (id, seed) so two exports of the same snapshot
    are byte-identical and a killed export resumes by re-writing only
    missing shards; and
  * **aspect-ratio-bucketed fixed-size batches** — image training
    pads every batch to a common (w, h); grouping same-aspect images
    into full batches first (the bucketing idiom of image-generation
    training stacks) removes cross-shape padding waste. Batch
    membership and within-batch slots are again pure functions of
    (id, seed).

Scale design (the part Spark gets wrong by default): both ops need a
GLOBAL ordinal over a deterministic shuffle order — and the naive
``row_number() OVER (ORDER BY key)`` / running-``SUM`` window with no
``PARTITION BY`` collapses the whole table into ONE task (Spark plans
an Exchange SinglePartition), the textbook 100 TB scale-killer.
Instead both use a two-phase distributed prefix sum:

  1. bucket every row by an order-preserving PREFIX of its shuffle
     key (``prefix_chars`` hex chars -> 16^k buckets; hex prefixes
     sort exactly like the full key, so bucket order == key order);
  2. aggregate per-bucket totals (a metadata-sized relation: 16^k
     rows per partition group), turn them into EXCLUSIVE offsets with
     a window over that tiny relation, and broadcast-join the offsets
     back: global_ordinal = bucket_offset + within-bucket ordinal.

The within-bucket windows partition by bucket, so every stage keeps
16^k-way parallelism; equality with the single-window form is exact
(tested) because the buckets partition the key order.

The shuffle key is ``md5(seed-tag || id)`` — portable (the DuckDB
oracle twins compute the identical key), collision-tied rows are
broken by id, and shard/batch arithmetic stays in integer division so
the assignment is bit-stable across engines.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KEY_COL = "_shuffle_key"
_PBK = "_prefix_bucket"


def shuffle_key(id_col: str | Column, seed: int, tag: str = "shard") -> Column:
    """Deterministic per-row shuffle key: ``md5('<tag><seed>|' || id)``.
    md5 is available verbatim in DuckDB, so oracle twins reproduce the
    exact global order; hex output makes prefix buckets order-preserving."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat_ws("|", F.lit(f"{tag}{seed}"), c.cast("string")))


def _with_key_and_bucket(df: DataFrame, id_col: str, seed: int, tag: str,
                         prefix_chars: int) -> DataFrame:
    return df.withColumn(KEY_COL, shuffle_key(id_col, seed, tag)) \
             .withColumn(_PBK, F.substring(KEY_COL, 1, prefix_chars))


def assign_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    target_bytes: int,
    seed: int = 42,
    prefix_chars: int = 2,
) -> DataFrame:
    """Assign every row a ``shard_id`` so that rows, taken in the
    deterministic shuffle order, fill shards of ~``target_bytes`` each
    (greedy byte cumsum: a row opens a new shard when the bytes before
    it cross a ``target_bytes`` boundary — Iceberg's bin-pack split
    rule applied to a shuffled corpus).

    Returns the input columns plus ``_shuffle_key`` and ``shard_id``.
    shard_id is dense 0..n-1, nondecreasing in key order, and a pure
    function of (ids, weights, seed, target) — independent of input
    partitioning (tested), so re-exports and resumed exports agree.

    The exclusive byte cumsum is the two-phase distributed prefix sum
    described in the module docstring: per-prefix-bucket totals
    (16^prefix_chars rows) -> exclusive bucket offsets (window over
    the tiny relation only) -> broadcast join + within-bucket running
    sum. No stage ever plans a single-partition Exchange over data
    rows (tested via the physical plan)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    d = _with_key_and_bucket(df, id_col, seed, "shard", prefix_chars)
    per = d.groupBy(_PBK).agg(F.sum(weight_col).alias("_bw"))
    # window over <= 16^prefix_chars metadata rows — bounded by
    # construction, never by table size
    off_w = Window.orderBy(_PBK).rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(
        _PBK, F.coalesce(F.sum("_bw").over(off_w), F.lit(0)).alias("_off")
    )
    in_w = (
        Window.partitionBy(_PBK)
        .orderBy(KEY_COL, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offs), _PBK)
        .withColumn(
            "_cum_before",
            F.col("_off") + F.sum(weight_col).over(in_w) - F.col(weight_col),
        )
        .withColumn("shard_id", F.expr(f"_cum_before div {int(target_bytes)}"))
        .drop(_PBK, "_off", "_cum_before")
    )


def pack_batches(
    df: DataFrame,
    id_col: str,
    bucket_col: str,
    batch_size: int,
    seed: int = 42,
    prefix_chars: int = 2,
    drop_partial: bool = True,
) -> DataFrame:
    """Group rows of each ``bucket_col`` value (e.g. an aspect-ratio
    bucket) into fixed-size training batches in deterministic shuffle
    order: adds ``batch_id`` (0-based per bucket) and
    ``slot_in_batch`` (0..batch_size-1). With ``drop_partial`` (the
    training default) each bucket's trailing ``n % batch_size`` rows
    are dropped so every surviving batch is exactly full.

    The per-bucket ordinal is the same two-phase prefix sum as
    :func:`assign_shards` but COUNT-weighted and partitioned by
    bucket: per-(bucket, prefix) counts -> exclusive offsets (window
    over the metadata relation, partitioned by bucket) -> broadcast
    join + within-(bucket, prefix) row_number. A hot bucket (most
    corpora are overwhelmingly ~1:1) therefore spreads over its 16^k
    prefix groups instead of serializing into one task — the same
    salting-shaped answer the engine gives phash hot spots, except
    the "salt" is the order-preserving key prefix so the numbering
    stays exact."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    d = _with_key_and_bucket(df, id_col, seed, "batch", prefix_chars)
    per = d.groupBy(bucket_col, _PBK).agg(F.count("*").alias("_bn"))
    off_w = (
        Window.partitionBy(bucket_col)
        .orderBy(_PBK)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = per.select(
        bucket_col, _PBK,
        F.coalesce(F.sum("_bn").over(off_w), F.lit(0)).alias("_off"),
        F.sum("_bn").over(
            Window.partitionBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_tot"),
    )
    in_w = Window.partitionBy(bucket_col, _PBK).orderBy(KEY_COL, id_col)
    out = (
        d.join(F.broadcast(offs), [bucket_col, _PBK])
        .withColumn("_slot", F.col("_off") + F.row_number().over(in_w) - 1)
        .withColumn("batch_id", F.expr(f"_slot div {int(batch_size)}"))
        .withColumn("slot_in_batch", F.pmod(F.col("_slot"), F.lit(int(batch_size))))
    )
    if drop_partial:
        out = out.filter(
            F.col("_slot") < F.expr(f"(_tot div {int(batch_size)}) * {int(batch_size)}")
        )
    return out.drop(_PBK, "_off", "_tot", "_slot")


def aspect_bucket(w_col: str | Column, h_col: str | Column) -> Column:
    """Snap an image's w/h ratio to the nearest of the five canonical
    aspect buckets {1:2, 3:4, 1:1, 4:3, 2:1} — nearest in LOG space
    (so 1:2 and 2:1 are symmetric), decided entirely in integer
    arithmetic: the log-space midpoint between buckets a and b is
    sqrt(a*b), and r < sqrt(a*b) <=> w^2 * denom < h^2 * num, which is
    exact in int64 and reproduces bit-identically in the SQL oracle
    twin (no float log/sqrt crosses an engine boundary)."""
    w = F.col(w_col) if isinstance(w_col, str) else w_col
    h = F.col(h_col) if isinstance(h_col, str) else h_col
    w2 = (w * w).cast("long")
    h2 = (h * h).cast("long")
    return (
        # midpoints^2 between (1/2, 3/4, 1, 4/3, 2): 3/8, 3/4, 4/3, 8/3
        F.when(w2 * 8 < h2 * 3, F.lit("1:2"))
        .when(w2 * 4 < h2 * 3, F.lit("3:4"))
        .when(w2 * 3 < h2 * 4, F.lit("1:1"))
        .when(w2 * 3 < h2 * 8, F.lit("4:3"))
        .otherwise(F.lit("2:1"))
    )


def write_shards(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    weight_col: str,
    out_dir: str,
    target_bytes: int,
    seed: int = 42,
    compression: str = "zstd",
) -> dict:
    """Materialize :func:`assign_shards` output as ONE parquet file
    per shard under ``out_dir/shard_id=K/``, rows sorted by shuffle
    key within the shard, plus a ``_manifest`` parquet of per-shard
    (shard_id, n_samples, shard_bytes). Shard placement uses
    :func:`..tableformat.distribute.exact_slot_repartition`, so every
    shard is exactly one reduce task (no birthday-collision straggler
    writes a double shard while another slot idles).

    Resume: the assignment is deterministic, so a killed export is
    re-run with the same arguments and only the missing shard
    directories are rewritten (existing complete shards are skipped by
    shard_id). Returns {"n_shards", "written", "skipped", "rows",
    "bytes", "wall_ms"}."""
    t0 = time.time()
    asg = assign_shards(df, id_col, weight_col, target_bytes,
                        seed=seed, prefix_chars=2).persist()
    summary = (
        asg.groupBy("shard_id")
        .agg(F.count("*").alias("n_samples"),
             F.sum(weight_col).alias("shard_bytes"))
        .collect()
    )  # one metadata row per shard — bounded by corpus_bytes/target
    n_shards = len(summary)
    done = set()
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("shard_id="):
                sid = int(name.split("=", 1)[1])
                if os.path.exists(os.path.join(out_dir, name, "_DONE")):
                    done.add(sid)
    todo = sorted(r["shard_id"] for r in summary if r["shard_id"] not in done)
    todo_set = set(todo)
    rows = bytes_ = 0
    if todo:
        from ..tableformat.distribute import exact_slot_repartition

        todo_idx = {sid: i for i, sid in enumerate(todo)}
        mapping = F.broadcast(spark.createDataFrame(
            [(sid, i) for sid, i in todo_idx.items()],
            "shard_id bigint, _grp int"))
        pend = asg.join(mapping, "shard_id")
        out = exact_slot_repartition(
            spark, pend, F.col("_grp"), len(todo), sort_cols=[KEY_COL]
        ).drop("_grp")
        (out.write.mode("append")
            .partitionBy("shard_id")
            .option("compression", compression)
            .parquet(out_dir))
        for sid in todo:
            open(os.path.join(out_dir, f"shard_id={sid}", "_DONE"), "w").close()
    man = spark.createDataFrame(
        [(int(r["shard_id"]), int(r["n_samples"]), int(r["shard_bytes"]))
         for r in summary],
        "shard_id bigint, n_samples bigint, shard_bytes bigint",
    )
    man.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "_manifest"))
    for r in summary:
        if r["shard_id"] in todo_set:
            rows += r["n_samples"]
            bytes_ += r["shard_bytes"]
    asg.unpersist()
    return {"n_shards": n_shards, "written": len(todo),
            "skipped": n_shards - len(todo), "rows": int(rows),
            "bytes": int(bytes_), "wall_ms": int((time.time() - t0) * 1000)}
