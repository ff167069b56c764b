"""Deterministic weighted corpus mixing (epoch up/down-sampling).

A pretraining corpus is never consumed at its natural proportions: the
mixing stage assigns every domain/language/source stratum a WEIGHT and
materializes a corpus where each stratum appears ``weight`` times —
``weight < 1`` downsamples (keep a hash-selected fraction), ``weight
> 1`` upsamples by repetition (extra epochs of a small high-quality
stratum, the LLaMA/Dolma mixing idiom). The reference has no sampling
stage at all (its DAGs always process whole tables, e.g.
dags/Queries_dag.py:54-95); at 10^12 scale mixing IS the corpus
definition.

Everything is a pure function of (id, seed, weights):

 * copies(row) = floor(w) + [residue(id, seed) < frac(w) * 2^24]
   with residue = the first 24 bits of md5("mix<seed>|" || id) —
   content-derived, so the mix is byte-identical across reruns,
   repartitioning, compaction, and cluster sizes (none of which holds
   for ``rand()`` / ``sample()``), and a grown corpus never flips the
   membership of pre-existing rows.
 * fractional thresholds are exact INTEGER comparisons (frac(w)
   quantized onto the 2^24 grid at plan time on the driver), so the
   assignment reproduces bit-identically in any engine — the DuckDB
   oracle twin runs the same arithmetic.

Scale shape: the weights relation is O(strata) and broadcast; the
repeat is ``explode(sequence(...))`` — row-local generation, no
shuffle, no UDF. The only shuffle in a full mix job is whatever the
caller does downstream (e.g. shard packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# fractional weights are quantized onto this grid (24 bits of the md5
# residue) — exact in int64 on every engine
FRAC_GRID = 1 << 24


def mix_residue(id_col: str | Column, seed: int) -> Column:
    """First 24 bits of md5('mix<seed>|' || id) as a long in
    [0, 2^24) — the per-row sampling coordinate."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.md5(F.concat_ws("|", F.lit(f"mix{seed}"), c.cast("string")))
    return F.conv(F.substring(key, 1, 6), 16, 10).cast("long")


def weight_plan(weights: dict[str, float], default: float = 1.0):
    """Driver-side quantization of the weight map: returns rows of
    (stratum, base_copies, frac_threshold) with frac_threshold on the
    2^24 grid, plus the (base, threshold) pair for unlisted strata.
    Raises on negative weights; a weight of 0 drops the stratum."""
    def split(w: float) -> tuple[int, int]:
        if w < 0:
            raise ValueError(f"negative mix weight {w}")
        base = int(w)
        thresh = round((w - base) * FRAC_GRID)
        return base, thresh

    rows = [(s, *split(w)) for s, w in sorted(weights.items())]
    return rows, split(default)


def mix_weighted(
    spark: SparkSession,
    df: DataFrame,
    strat_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: int = 42,
    default_weight: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Materialize the weighted mix of ``df``: every row appears
    ``floor(w)`` times plus one more iff its hash residue falls under
    the fractional threshold, where ``w`` is its stratum's weight
    (``default_weight`` for strata absent from ``weights``). Output =
    input columns + ``copy_col`` (0-based repetition index, so
    downstream shuffle keys can mix copies apart: key on
    (id, copy_idx), not id).

    The weights relation is broadcast (O(strata) rows); the repeat is
    row-local ``explode`` — the whole operator adds zero shuffles."""
    rows, (dbase, dthresh) = weight_plan(weights, default_weight)
    wdf = spark.createDataFrame(
        rows or [("\u0000never", 0, 0)],
        f"{strat_col} string, _mix_base int, _mix_thresh long",
    )
    res = mix_residue(id_col, seed)
    copies = (
        F.coalesce(F.col("_mix_base"), F.lit(dbase))
        + F.when(
            res < F.coalesce(F.col("_mix_thresh"), F.lit(dthresh)), 1
        ).otherwise(0)
    ).alias("_mix_copies")
    return (
        df.join(F.broadcast(wdf), strat_col, "left")
        .select(*df.columns, copies)
        .filter(F.col("_mix_copies") > 0)
        # sequence(0, n-1) only reaches explode for n >= 1 (filter
        # above) — Spark's sequence would happily count DOWN for n <= 0
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0),
                                                   F.col("_mix_copies") - 1)))
        .drop("_mix_copies")
    )
