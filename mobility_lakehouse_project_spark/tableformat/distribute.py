"""Exact-slot shuffle distribution — collision-free task placement.

``df.repartition(n, cols)`` places rows by ``pmod(murmur3(cols), n)``;
with ~n distinct group keys, birthday collisions leave ~37% of reduce
slots empty and give the colliding tasks 2-3x the work — the straggler
tail that dominates wall time when groups are file-sized (measured:
compaction spent most of its tail at <20% utilization).

``slot_tokens(spark, n)`` searches integers whose murmur3 slots are
pairwise distinct, so mapping group ``g`` -> ``tokens[g]`` and
repartitioning on the token column gives EXACTLY one group per reduce
task — a custom partitioner expressed entirely in DataFrame primitives
(no RDD API, no RangePartitioner sampling pass over the data).

The search is metadata-sized (~n*H(n) candidates scanned distributed,
n rows collected) and independent of table size, so it holds at
100k+ output files per commit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_COL = "_slot_tok"
GROUP_COL = "_slot_grp"
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def murmur3_long(values: np.ndarray, seed: int = 42) -> np.ndarray:
    """Spark-compatible Murmur3_x86_32 hash of LongType columns
    (the hash behind ``F.hash``/HashPartitioning), vectorized. Ported
    from the public Murmur3 algorithm (Austin Appleby, public domain)
    with Spark's hashLong layout: low 32 bits then high 32 bits,
    seed 42. Verified against ``F.hash`` in tests."""
    i32 = np.uint32
    v = values.astype(np.int64).view(np.uint64)
    h1 = np.full(len(v), seed, dtype=i32)
    for part in (v & np.uint64(0xFFFFFFFF), v >> np.uint64(32)):
        k1 = part.astype(i32)
        k1 = k1 * i32(0xCC9E2D51)
        k1 = (k1 << i32(15)) | (k1 >> i32(17))
        k1 = k1 * i32(0x1B873593)
        h1 ^= k1
        h1 = (h1 << i32(13)) | (h1 >> i32(19))
        h1 = h1 * i32(5) + i32(0xE6546B64)
    h1 ^= i32(8)  # total byte length
    h1 ^= h1 >> i32(16)
    h1 = h1 * i32(0x85EBCA6B)
    h1 ^= h1 >> i32(13)
    h1 = h1 * i32(0xC2B2AE35)
    h1 ^= h1 >> i32(16)
    return h1.view(np.int32).astype(np.int64)


def slot_tokens(spark: SparkSession | None, n: int) -> list[int]:
    """``n`` integers with pairwise-distinct ``pmod(hash(x), n)`` slots.

    Computed entirely driver-side with the Murmur3 port above — zero
    Spark jobs (an earlier version ran a spark.range search per chunk;
    at small job sizes those fixed costs dominated wall time)."""
    tokens: dict[int, int] = {}
    lo = 0
    while len(tokens) < n:
        hi = lo + max(256, 8 * n)
        cand = np.arange(lo, hi, dtype=np.int64)
        slots = murmur3_long(cand) % n  # python % = pmod (non-negative)
        for s, t in zip(slots.tolist(), cand.tolist()):
            tokens.setdefault(int(s), int(t))
        lo = hi
    return [tokens[s] for s in range(n)]


def exact_slot_repartition(
    spark: SparkSession,
    df: DataFrame,
    group_expr: Column,
    total_groups: int,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition ``df`` so each value of ``group_expr`` (a dense
    0..total_groups-1 index) lands alone in its own reduce task; the
    group column is dropped afterwards. ``sort_cols`` adds a local
    within-task sort (tight parquet/manifest stats, no extra shuffle)."""
    toks = slot_tokens(spark, total_groups)
    tok_df = F.broadcast(
        spark.createDataFrame(
            [(g, int(t)) for g, t in enumerate(toks)],
            f"{GROUP_COL} int, {TOKEN_COL} long",
        )
    )
    out = (
        df.withColumn(GROUP_COL, group_expr.cast("int"))
        # LEFT join + runtime assert: an inner join would silently DROP
        # rows whose group_expr is null (e.g. a partition value missing
        # from a lookup map) — data loss in a rewrite commit. assert_true
        # fails the task instead, surfacing the planning bug.
        .join(tok_df, GROUP_COL, "left")
        # assert_true returns NULL when the condition holds, so this
        # filter keeps every valid row; expressed as a FILTER (not a
        # dropped projection) so Catalyst cannot prune the check away.
        .where(
            F.assert_true(
                F.col(TOKEN_COL).isNotNull(),
                F.lit("exact_slot_repartition: null slot token (group_expr "
                      "evaluated to null / out-of-range group)"),
            ).isNull()
        )
        .repartition(total_groups, F.col(TOKEN_COL))
    )
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    return out.drop(GROUP_COL, TOKEN_COL)


def partitioned_group_expr(
    partition_col: str,
    key_col: str,
    n_groups_per_partition: dict[str, int],
    cast_type: str = "int",
    partition_expr: Column | None = None,
) -> tuple[Column, int, dict[str, int]]:
    """Dense group index for a partitioned rewrite: rows of partition p
    spread uniformly over its ``n_groups_per_partition[p]`` slots by
    key hash (deterministic salting — a hot partition splits across
    its groups instead of hot-spotting one task).

    Returns (expr, total_groups, offsets). Uses literal-map expressions
    (fine up to ~thousands of partitions per chunk — chunking bounds
    this); beyond that, swap for a broadcast join on partition_col.
    """
    offsets: dict[str, int] = {}
    off = 0
    pairs_n = []
    pairs_o = []
    for p, n in sorted(n_groups_per_partition.items()):
        offsets[p] = off
        pairs_n += [F.lit(p), F.lit(n)]
        pairs_o += [F.lit(p), F.lit(off)]
        off += n
    nmap = F.create_map(*pairs_n)
    omap = F.create_map(*pairs_o)
    # NULL partition values land in Hive's default-partition directory;
    # the manifest partition_id records that sentinel, so the lookup key
    # must coalesce to it too (a bare cast-to-string of NULL would miss
    # the map and exact_slot_repartition would fail the assert).
    # the partition VALUE may be a transform of the source column
    # (hidden partitioning) — the caller passes the table's
    # partition_value_expr so the lookup key matches manifest
    # partition_ids under bucket/truncate/day layouts too
    pv = partition_expr if partition_expr is not None else F.col(partition_col)
    pkey = F.coalesce(pv.cast("string"), F.lit(HIVE_DEFAULT_PARTITION))
    expr = omap[pkey] + F.pmod(F.xxhash64(F.col(key_col)), nmap[pkey])
    return expr, off, offsets
