"""Space-filling-curve clustering keys (Z-order / Morton and Hilbert).

The reference relies on DuckDB ART indexes for selective access
(src/sql/silver.sql:123-132, src/sql/gold.sql:252-260). Spark has no
secondary indexes; the engine's equivalent is *clustering + file
stats*: compute a space-filling-curve key over (phash, w, h), range-
partition + sort by it, and record per-file min/max in manifests so
scans prune files (tableformat/table.py). This module provides the
key computation as numpy-vectorized kernels wrapped in Arrow-batched
pandas UDFs — no per-row Python, per the input_hint.

Morton: classic magic-number bit spreading. Hilbert: Skilling's
transpose algorithm (J. Skilling, "Programming the Hilbert curve",
AIP Conf. Proc. 707, 2004 — public domain), vectorized with np.where.

Each of the 3 dimensions contributes BITS_PER_DIM=21 bits -> a 63-bit
key that fits a Spark LongType.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

BITS_PER_DIM = 21
_DIM_MASK = np.uint64((1 << BITS_PER_DIM) - 1)


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 21 bits of ``x`` to every 3rd bit."""
    x = x.astype(np.uint64) & _DIM_MASK
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def interleave3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """63-bit interleave; ``a`` supplies the most significant bit of
    each 3-bit group."""
    return (
        (_part1by2(a) << np.uint64(2))
        | (_part1by2(b) << np.uint64(1))
        | _part1by2(c)
    )


def normalize_i64(x: np.ndarray) -> np.ndarray:
    """Order-preserving map int64 -> top-21-bits uint64.

    Signed order is preserved by flipping the sign bit before taking
    the high bits, so the curve key sorts phash in its natural order.
    """
    u = x.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
    return (u >> np.uint64(64 - BITS_PER_DIM)) & _DIM_MASK


def normalize_u32(x: np.ndarray) -> np.ndarray:
    """Clamp small non-negative ints (w, h) into the 21-bit dim space."""
    return np.clip(x.astype(np.int64), 0, int(_DIM_MASK)).astype(np.uint64)


# ---------------- range-scaled normalization ----------------
#
# Clipping alone collapses narrow-range dims: w,h in {16..128} occupy
# only bits 4-7 of their 21-bit dim while a uniform 64-bit phash fills
# all 21, so the interleaved key is ordered by ~13 phash bits before
# any w/h bit participates and file min/max stats on w/h span the whole
# table (measured: 0.000 pruned for w-only/h-only predicates pre-fix).
# Iceberg/Delta Z-order range-normalizes each column from its observed
# min/max before interleaving; we do the same. The (lo, scale) pair is
# computed DRIVER-SIDE in exact Python int arithmetic, and both the
# numpy kernels and the Catalyst twin then apply the identical IEEE-754
# double sequence  clamp((x - lo) * scale, 0, M) |> floor  — monotone
# (order-preserving) and bit-identical across the two engines.

_M_F = float(int(_DIM_MASK))


def dim_params(lo: int, hi: int) -> tuple[float, float]:
    """(lo_as_double, scale) mapping [lo, hi] onto [0, 2^21-1]."""
    span = max(int(hi) - int(lo), 1)  # exact Python ints: no overflow
    return float(lo), _M_F / float(span)


def normalize_scaled(x: np.ndarray, lo_f: float, scale: float) -> np.ndarray:
    v = (x.astype(np.float64) - lo_f) * scale
    return np.floor(np.clip(v, 0.0, _M_F)).astype(np.uint64)


def morton3(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Morton/Z-order index of three 21-bit dims -> int64 (always >= 0)."""
    return interleave3(d0, d1, d2).astype(np.int64)


def axes_to_transpose(coords: list[np.ndarray], bits: int) -> list[np.ndarray]:
    """Skilling's AxesToTranspose, vectorized: in-place-style transform
    of ``n`` coordinate arrays into the 'transposed' Hilbert form."""
    x = [c.astype(np.uint64).copy() for c in coords]
    n = len(x)
    m = np.uint64(1 << (bits - 1))
    # Inverse undo
    q = m
    while q > np.uint64(1):
        p = q - np.uint64(1)
        for i in range(n):
            hi = (x[i] & q) != 0
            # where hi: invert low bits of x[0]; else exchange low bits x[0]<->x[i]
            t = (x[0] ^ x[i]) & p
            x0_inv = x[0] ^ p
            x0_exc = x[0] ^ t
            xi_exc = x[i] ^ t
            x[0] = np.where(hi, x0_inv, x0_exc)
            if i != 0:
                x[i] = np.where(hi, x[i], xi_exc)
        q >>= np.uint64(1)
    # Gray encode
    for i in range(1, n):
        x[i] ^= x[i - 1]
    t = np.zeros_like(x[0])
    q = m
    while q > np.uint64(1):
        t = np.where((x[n - 1] & q) != 0, t ^ (q - np.uint64(1)), t)
        q >>= np.uint64(1)
    for i in range(n):
        x[i] ^= t
    return x


def hilbert3(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray, bits: int = BITS_PER_DIM) -> np.ndarray:
    """Hilbert index of three ``bits``-bit dims -> int64.

    The transposed form is converted to the linear Hilbert distance by
    bit-interleaving with x[0] most significant (Skilling's layout).
    """
    tx = axes_to_transpose([d0, d1, d2], bits)
    if bits == BITS_PER_DIM:
        return interleave3(tx[0], tx[1], tx[2]).astype(np.int64)
    # generic width (used by property tests at small bit counts)
    out = np.zeros_like(tx[0])
    for level in range(bits - 1, -1, -1):
        for i in range(3):
            out = (out << np.uint64(1)) | ((tx[i] >> np.uint64(level)) & np.uint64(1))
    return out.astype(np.int64)


def _dims_np(
    phash: np.ndarray, w: np.ndarray, h: np.ndarray,
    bounds: tuple[tuple[int, int], ...] | None,
):
    """Normalize the three dim arrays; ``bounds`` = ((lo,hi),)*3 raw
    column min/max (range-scaled) or None (legacy clip/top-bits)."""
    if bounds is None:
        return (normalize_i64(phash), normalize_u32(w), normalize_u32(h))
    params = [dim_params(lo, hi) for lo, hi in bounds]
    return tuple(
        normalize_scaled(x, lo_f, sc)
        for x, (lo_f, sc) in zip((phash, w, h), params)
    )


def curve_key_udf(curve: str, bounds: tuple[tuple[int, int], ...] | None = None):
    """Arrow-batched pandas UDF computing the curve key, range-scaling
    each dim from ``bounds`` (per-column min/max, e.g. one manifest
    aggregation) so every dimension carries entropy in the key."""
    fn = morton3 if curve == "zorder" else hilbert3

    @F.pandas_udf(T.LongType())
    def key(phash: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        d0, d1, d2 = _dims_np(
            phash.to_numpy(dtype=np.int64, na_value=0),
            w.to_numpy(dtype=np.int64, na_value=0),
            h.to_numpy(dtype=np.int64, na_value=0),
            bounds,
        )
        return pd.Series(fn(d0, d1, d2))

    return key


# legacy fixed-normalization UDFs (kept for the bit-identity tests)
zorder_key = curve_key_udf("zorder")
hilbert_key = curve_key_udf("hilbert")

CURVES = {"zorder": zorder_key, "hilbert": hilbert_key}


_SPREAD_MASKS = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)


def zorder_col(phash, w, h, bounds: tuple[tuple[int, int], ...] | None = None):
    """The Z-order key as PURE Catalyst expressions (shiftleft/AND bit
    spreading) — whole-stage-codegen'd, no Python worker in the plan.
    Bit-identical to ``morton3``/``zorder_key``/``curve_key_udf``
    (tested). Used for the clustering key pass so the metadata pass is
    JVM-only; the Hilbert variant stays an Arrow UDF (its loop
    structure doesn't reduce to fixed-point expressions).

    With ``bounds`` each dim is range-scaled onto the full 21-bit space
    via the same driver-computed (lo, scale) doubles as the numpy
    kernels — identical IEEE op sequence, so keys stay bit-identical."""
    from pyspark.sql import functions as F  # local to keep module import-light

    def spread(col):
        x = col
        for shift, mask in _SPREAD_MASKS:
            x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
        return x

    if bounds is not None:
        def scaled(col, lo, hi):
            lo_f, sc = dim_params(lo, hi)
            v = (col.cast("double") - F.lit(lo_f)) * F.lit(sc)
            v = F.least(F.greatest(v, F.lit(0.0)), F.lit(_M_F))
            return F.floor(v).cast("long")

        d0 = scaled(phash, *bounds[0])
        d1 = scaled(w, *bounds[1])
        d2 = scaled(h, *bounds[2])
    else:
        d0 = F.shiftrightunsigned(
            phash.cast("long").bitwiseXOR(F.lit(-(2**63))), 64 - BITS_PER_DIM
        )
        lim = F.lit((1 << BITS_PER_DIM) - 1)
        d1 = F.least(F.greatest(w.cast("long"), F.lit(0)), lim)
        d2 = F.least(F.greatest(h.cast("long"), F.lit(0)), lim)
    return (
        F.shiftleft(spread(d0), 2)
        .bitwiseOR(F.shiftleft(spread(d1), 1))
        .bitwiseOR(spread(d2))
    )


def curve_np(
    curve: str, phash: np.ndarray, w: np.ndarray, h: np.ndarray,
    bounds: tuple[tuple[int, int], ...] | None = None,
) -> np.ndarray:
    """Raw numpy curve kernel (for fused UDFs that combine the key with
    further vectorized work in one Arrow round-trip)."""
    d0, d1, d2 = _dims_np(phash, w, h, bounds)
    return morton3(d0, d1, d2) if curve == "zorder" else hilbert3(d0, d1, d2)
