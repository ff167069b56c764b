"""Temporal joins the reference's SQL surface cannot express but every
time-series analytics user needs: as-of join and interval (range) join.

Neither exists as a built-in Spark operator, so both are implemented as
compositions of existing DataFrame ops — no UDFs, no per-row Python —
chosen specifically for their 100-TB shuffle profile:

* ``asof_join`` uses the union + partitioned-window formulation (one
  shuffle on the join keys, zero joins) instead of the textbook
  "theta-join then argmax" which degenerates to an O(n*m) range join.
  Each side is tagged, unioned, and a ``last(ignorenulls)`` running
  window carries the most recent right-side payload onto every left
  row.  Cost = one hash exchange of (left + right) keyed rows + an
  in-partition sort — the same price as the equi-join that a plain
  enrichment would pay, regardless of time-range width.
* ``interval_join`` bins both sides onto fixed-width time buckets
  (intervals explode to the buckets they span via ``sequence``) and
  equi-joins on (keys, bucket) before applying the exact containment
  predicate.  A point lands in exactly one bucket, so matches are
  produced exactly once and no post-dedup is needed.  Bucket width
  trades explode-factor against join selectivity; both sides stay
  fully parallel and Catalyst sees a plain equi-join (AQE can still
  re-plan skewed buckets).

Reference provenance: the reference has no temporal joins at all (its
closest idiom is the daily-partition catch-up loop,
dags/Bronze_Ingest_Dag.py:84-118); these extend SURVEY.md §2.3's join
family (J1-J11) the way a time-series lakehouse user expects.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = True,
    tolerance_sec: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` (direction="backward") or the
    least ``right_ts`` >= ``left_ts`` ("forward"), matching on the equi
    keys ``on``.  Unmatched left rows keep NULL payload (left-outer
    semantics, like pandas ``merge_asof``).

    The right side must be unique per (``on``, ``right_ts``) — ties at
    the same instant make "the most recent row" ill-defined.  Callers
    dedupe first (e.g. ``groupBy(keys, ts).agg(F.max_by(...))``).

    ``tolerance_sec`` nulls out matches farther than the tolerance
    (applied after the window, so it never changes *which* row matched).

    Scale: one shuffle on ``on``; window state is a single struct per
    partition row (``last ignorenulls`` is O(1) per row).  No range
    join, no broadcast requirement, no skew beyond the key histogram.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload = list(payload) if payload is not None else [
        c for c in right.columns if c not in on and c != right_ts
    ]
    reserved = {"__asof_ts", "__asof_pay", "__is_left", "__match"}
    if reserved & set(left.columns):
        raise ValueError(f"left columns collide with asof internals: "
                         f"{sorted(reserved & set(left.columns))}")
    out_names = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in payload]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(
            f"suffixed right columns collide with left columns: "
            f"{sorted(clash)} (pick a different suffix)")

    pay_struct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in payload]
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__asof_ts"),
        pay_struct.alias("__asof_pay"),
    )
    pay_type = r.schema["__asof_pay"].dataType

    left_cols = left.columns
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(None).cast(pay_type).alias("__asof_pay"),
        F.lit(1).alias("__is_left"),
    )
    r_tagged = r.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.col("__asof_ts"),
        F.col("__asof_pay"),
        F.lit(0).alias("__is_left"),
    )
    both = l_tagged.unionByName(r_tagged)

    # Within one timestamp: right rows must be visible to left rows iff
    # exact matches are allowed -> sort right first (side asc) when
    # allow_exact, left first (side desc) otherwise.
    side = F.col("__is_left") if allow_exact else -F.col("__is_left")
    if direction == "backward":
        w = Window.partitionBy(*on).orderBy(F.col("__asof_ts").asc(), side.asc())
    else:
        w = Window.partitionBy(*on).orderBy(F.col("__asof_ts").desc(), side.asc())
    w = w.rowsBetween(Window.unboundedPreceding, 0)

    carried = both.withColumn("__match", F.last("__asof_pay", ignorenulls=True).over(w))

    out = carried.filter(F.col("__is_left") == 1)
    match_ts = F.col("__match.__ts")
    if tolerance_sec is not None:
        if direction == "backward":
            gap = F.unix_timestamp(F.col("__asof_ts")) - F.unix_timestamp(match_ts)
        else:
            gap = F.unix_timestamp(match_ts) - F.unix_timestamp(F.col("__asof_ts"))
        out = out.withColumn(
            "__match",
            F.when(gap <= F.lit(float(tolerance_sec)), F.col("__match")),
        )

    proj = [F.col(c) for c in left_cols]
    proj.append(F.col("__match.__ts").alias(f"{right_ts}{suffix}"))
    proj.extend(F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload)
    return out.select(*proj)


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    point_ts: str = "ts",
    on: Sequence[str] = (),
    bucket_sec: int = 3600,
) -> DataFrame:
    """Inner-join ``points`` rows onto the ``intervals`` rows that
    contain them: ``start <= point_ts <= end`` plus optional equi keys
    ``on``.  Returns interval columns + point columns (names must not
    collide; callers project/rename first).

    Physical plan: intervals explode onto every ``bucket_sec``-wide
    epoch bucket they overlap; points map to their single bucket; the
    match is a plain equi-join on (on..., bucket) followed by the exact
    containment filter.  Because a point belongs to exactly one bucket,
    each (interval, point) pair is emitted at most once — no dedup.

    Scale: explode factor = ceil(interval_len / bucket_sec) + 1; pick
    ``bucket_sec`` near the median interval length so the factor stays
    O(1) while buckets keep the join selective.  Both sides shuffle on
    (on..., bucket) — hot buckets are ordinary join skew that AQE's
    skew-join splitting handles.
    """
    on = list(on)
    if int(bucket_sec) < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    dup = set(intervals.columns) & set(points.columns)
    if dup - set(on):
        raise ValueError(f"colliding non-key columns: {sorted(dup - set(on))}")

    b = F.lit(int(bucket_sec))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / b),
                F.floor(F.unix_timestamp(F.col(end)) / b),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / b))

    cond = [iv["__bucket"] == pt["__bucket"]] + [iv[k] == pt[k] for k in on]
    joined = iv.join(pt, cond, "inner").filter(
        (pt[point_ts] >= iv[start]) & (pt[point_ts] <= iv[end])
    )
    keep = [iv[c] for c in intervals.columns] + [
        pt[c] for c in points.columns if c not in on
    ]
    return joined.select(*keep)
