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


def _keys_from_series(phash: pd.Series, w: pd.Series, h: pd.Series):
    d0 = normalize_i64(phash.to_numpy(dtype=np.int64, na_value=0))
    d1 = normalize_u32(w.to_numpy(dtype=np.int64, na_value=0))
    d2 = normalize_u32(h.to_numpy(dtype=np.int64, na_value=0))
    return d0, d1, d2


@F.pandas_udf(T.LongType())
def zorder_key(phash: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    """Vectorized Z-order key over (phash, w, h)."""
    d0, d1, d2 = _keys_from_series(phash, w, h)
    return pd.Series(morton3(d0, d1, d2))


@F.pandas_udf(T.LongType())
def hilbert_key(phash: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    """Vectorized Hilbert key over (phash, w, h)."""
    d0, d1, d2 = _keys_from_series(phash, w, h)
    return pd.Series(hilbert3(d0, d1, d2))


CURVES = {"zorder": zorder_key, "hilbert": hilbert_key}


_SPREAD_MASKS = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)


def zorder_col(phash, w, h):
    """The Z-order key as PURE Catalyst expressions (shiftleft/AND bit
    spreading) — whole-stage-codegen'd, no Python worker in the plan.
    Bit-identical to ``morton3``/``zorder_key`` (tested). Used for the
    clustering key pass so the metadata pass is JVM-only; the Hilbert
    variant stays an Arrow UDF (its loop structure doesn't reduce to
    fixed-point expressions)."""
    from pyspark.sql import functions as F  # local to keep module import-light

    def spread(col):
        x = col
        for shift, mask in _SPREAD_MASKS:
            x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
        return x

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


def curve_np(curve: str, phash: np.ndarray, w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Raw numpy curve kernel (for fused UDFs that combine the key with
    further vectorized work in one Arrow round-trip)."""
    d0 = normalize_i64(phash)
    d1 = normalize_u32(w)
    d2 = normalize_u32(h)
    return morton3(d0, d1, d2) if curve == "zorder" else hilbert3(d0, d1, d2)
