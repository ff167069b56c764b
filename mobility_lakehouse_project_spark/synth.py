"""Deterministic synthesis of the engine's input table (FIXTURES.md F1/F2).

Target schema (BASELINE.json input_hint):
  image_id string, bytes binary, w int, h int, fmt string,
  caption string, phash int64   (+ engine-added partition col `bucket`)

Generation is pure-function-of-row-index (splitmix64 mixing — public
domain constant scheme from Steele et al., "Fast Splittable PRNGs"),
so any slice regenerates byte-identically on any executor: no RNG
state, no wall clock — the property the oracle comparisons and the
kill/resume tests rely on (SURVEY.md §7.3 "Deterministic synthesis").

Rows are produced distributed: ``spark.range`` -> ``mapInPandas`` with
numpy-vectorized column derivation; only the variable-size pixel
encode runs per row inside the Arrow batch (same posture as a real
image pipeline, where the codec is the per-row kernel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions import imagecodec

SCHEMA_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, bucket int"
)

_WORDS = np.array(
    (
        "amber bridge canyon delta ember forest glacier harbor island "
        "juniper keystone lagoon meadow nebula orchard prairie quarry "
        "river summit tundra umbra valley willow zenith basalt cobalt "
        "dune estuary fjord grove heath inlet"
    ).split()
)

HOT_PHASHES = (7777777777777777777, -6666666666666666666, 5555555555555555555)
N_BUCKETS = 16


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def synth_batch(idx: np.ndarray, seed: int, dims: tuple[int, ...]) -> pd.DataFrame:
    """Materialize the F1 columns for the given row indices."""
    u = _splitmix64(idx.astype(np.uint64) ^ np.uint64(seed))
    dims_arr = np.array(dims, dtype=np.int64)
    w = dims_arr[(u >> np.uint64(8)) % np.uint64(len(dims_arr))].astype(np.int32)
    h = dims_arr[(u >> np.uint64(16)) % np.uint64(len(dims_arr))].astype(np.int32)
    # fmt skew per FIXTURES.md: 80% jpeg
    fsel = (u >> np.uint64(24)) % np.uint64(10)
    fmt = np.where(fsel < 8, "jpeg", np.where(fsel == 8, "png", "raw"))
    # phash: seeded 64-bit; ~5% of rows share one of 3 hot values
    phash = _splitmix64(u).view(np.int64).copy()
    hot_sel = (u >> np.uint64(32)) % np.uint64(100)
    for k, hp in enumerate(HOT_PHASHES):
        phash[(hot_sel < 5) & ((u >> np.uint64(40)) % np.uint64(3) == k)] = hp
    caption = [
        " ".join(
            (
                _WORDS[(ui >> 44) % 32],
                _WORDS[(ui >> 49) % 32],
                _WORDS[(ui >> 54) % 32],
                _WORDS[(ui >> 59) % 32],
                str(int(i)),
            )
        )
        for ui, i in zip(u.tolist(), idx.tolist())
    ]
    # Pixel synthesis vectorized per (w, h, fmt) group (16 dims x 3
    # fmts): one numpy lattice per group instead of per-row mgrid/hash
    # kernels (the per-call overhead dominated for small images). The
    # per-row zlib.compress inside encode() is the irreducible kernel —
    # same bytes, same codec. Chunked so the uint64 noise intermediate
    # stays under ~64 MB regardless of batch size.
    blobs: list = [None] * len(idx)
    order = np.lexsort((fmt, h, w))
    splits = np.flatnonzero(
        (np.diff(w[order]) != 0) | (np.diff(h[order]) != 0)
        | (fmt[order][1:] != fmt[order][:-1])
    ) + 1
    for grp in np.split(order, splits):
        wi, hi, f = int(w[grp[0]]), int(h[grp[0]]), str(fmt[grp[0]])
        # chunk to ~256k pixels-elements: the uint64 noise lattice then
        # stays ~2 MB — inside L2/L3, where the hash chain runs at
        # core speed instead of memory bandwidth (measured 4x)
        chunk = max(1, 262_144 // (hi * wi * 3))
        for sub in (grp[k:k + chunk] for k in range(0, len(grp), chunk)):
            px = imagecodec.synth_pixels_batch(idx[sub], wi, hi)
            for j, blob in zip(sub.tolist(), imagecodec.encode_batch(px, f)):
                blobs[j] = blob
    return pd.DataFrame(
        {
            "image_id": [f"img{int(i):012d}" for i in idx],
            "bytes": blobs,
            "w": w,
            "h": h,
            "fmt": fmt,
            "caption": caption,
            "phash": phash,
            "bucket": (phash % N_BUCKETS + N_BUCKETS) % N_BUCKETS,
        }
    ).astype({"w": "int32", "h": "int32", "bucket": "int32"})


def images_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    dims: tuple[int, ...] = (8, 16, 32, 64),
    partitions: int | None = None,
    id_offset: int = 0,
) -> DataFrame:
    """Distributed deterministic F1 `images` DataFrame."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield synth_batch(pdf["id"].to_numpy(), seed, dims)

    return (
        spark.range(id_offset, id_offset + n_rows, numPartitions=parts)
        .mapInPandas(gen, schema=SCHEMA_DDL)
    )


def phash_variant_batch(
    idx: np.ndarray, seed: int, dims: tuple[int, ...]
) -> pd.DataFrame:
    """Near-duplicate variants of base rows for phash-hamming dedup
    tests: the SAME synthesis as ``synth_batch`` but with 1-3
    deterministically chosen bits of the phash flipped and a fresh
    ``var...`` image_id namespace. Flip positions may collide (two
    flips of one bit cancel), so the resulting hamming distance is
    whatever the flips produce — ground truth is established by
    all-pairs popcount (tools/golden_phash.py), never assumed."""
    out = synth_batch(idx, seed, dims)
    u = _splitmix64(
        idx.astype(np.uint64) ^ np.uint64((seed * 1315423911 + 7) % (1 << 64))
    )
    n_flips = (idx.astype(np.uint64) % np.uint64(3)) + np.uint64(1)
    mask = np.zeros(len(idx), dtype=np.uint64)
    for j in range(3):
        bit = np.uint64(1) << ((u >> np.uint64(6 * j + 1)) % np.uint64(64))
        mask = np.where(n_flips > np.uint64(j), mask ^ bit, mask)
    phash = (out["phash"].to_numpy().astype(np.int64).view(np.uint64) ^ mask).view(
        np.int64
    )
    out["phash"] = phash
    out["image_id"] = [f"var{int(i):012d}" for i in idx]
    out["bucket"] = ((phash % N_BUCKETS + N_BUCKETS) % N_BUCKETS).astype("int32")
    return out


def phash_variants_df(
    spark: SparkSession,
    n_rows: int,
    step: int = 10,
    seed: int = 42,
    dims: tuple[int, ...] = (8, 16, 32, 64),
    partitions: int | None = None,
) -> DataFrame:
    """Distributed near-dup variants of every ``step``-th base row."""
    parts = partitions or max(4, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield phash_variant_batch(pdf["id"].to_numpy(), seed, dims)

    return spark.range(0, n_rows, step, numPartitions=parts).mapInPandas(
        gen, schema=SCHEMA_DDL
    )


def merge_source_df(
    spark: SparkSession,
    base_rows: int,
    source_rows: int,
    seed: int = 42,
    dims: tuple[int, ...] = (8, 16, 32, 64),
    overlap: float = 0.10,
) -> DataFrame:
    """F2 MERGE source: ~``overlap`` of ids collide with the base table
    (updates carrying new caption/bytes, derived with seed+1), the rest
    are fresh inserts past the base id range."""
    n_upd = int(source_rows * overlap)
    parts = max(4, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            k = pdf["id"].to_numpy()
            # first n_upd logical slots map onto existing ids (stride spread),
            # the rest to brand-new ids after the base range
            upd_mask = k < n_upd
            ids = np.where(
                upd_mask,
                (k * 97 + 13) % max(base_rows, 1),
                base_rows + k,
            )
            out = synth_batch(ids, seed + 1, dims)
            out["image_id"] = [f"img{int(i):012d}" for i in ids]
            yield out

    return spark.range(0, source_rows, numPartitions=parts).mapInPandas(gen, schema=SCHEMA_DDL)
