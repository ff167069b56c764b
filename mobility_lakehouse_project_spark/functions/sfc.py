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


# ---------------- string dims ----------------
#
# A string column participates in the curve through an ORDER-PRESERVING
# int64 image: the first 7 UTF-8 bytes, right-padded with 0x00, read
# big-endian (Iceberg's truncate-transform idiom applied to Z-order —
# UTF8String comparison is bytewise, so prefix order == string order,
# and 7 bytes stay inside a signed int64). The image is computed as a
# pure Catalyst expression so the numpy/Arrow kernels only ever see
# int64 dims; the driver mirrors it exactly for manifest str_mins/
# str_maxs bounds.

STR_PREFIX_BYTES = 7


def str_common_skip(lo: str, hi: str) -> int:
    """Length (bytes) of the common UTF-8 prefix of the observed
    column range. Id-like columns share a long constant prefix
    (``img0000...``) that carries zero entropy — skipping it puts the
    7-byte window on the bytes that actually distinguish rows. Safe:
    within [lo, hi] every value shares that prefix, so order on the
    suffix == order on the string."""
    a, b = lo.encode("utf-8"), hi.encode("utf-8")
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def str_prefix_int(s: str, skip: int = 0) -> int:
    """Driver-side twin of :func:`str_prefix_expr` (exact)."""
    b = s.encode("utf-8")[skip:skip + STR_PREFIX_BYTES]
    return int.from_bytes(b.ljust(STR_PREFIX_BYTES, b"\x00"), "big")


def str_prefix_expr(name: str, skip: int = 0):
    """Catalyst expression: order-preserving int64 image of a string
    column — bytes [skip, skip+7) of the UTF-8 encoding, right-padded
    with 0x00, big-endian (NULL -> 0, same as the empty string — NULLs
    sort first either way). Whole-stage-codegen'd, no Python worker."""
    from pyspark.sql import functions as F  # keep module import-light

    k = STR_PREFIX_BYTES
    return F.coalesce(
        F.expr(
            f"cast(conv(hex(rpad(substring(encode(`{name}`, 'UTF-8'),"
            f" {skip + 1}, {k}), {k}, x'00')), 16, 10) as bigint)"
        ),
        F.lit(0).cast("long"),
    )


def morton3(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Morton/Z-order index of three 21-bit dims -> int64 (always >= 0)."""
    return interleave3(d0, d1, d2).astype(np.int64)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 21 bits of ``x`` to every 2nd bit."""
    x = x.astype(np.uint64) & _DIM_MASK
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_n(dims: list[np.ndarray]) -> np.ndarray:
    """Z-order key over 1-3 dims. One dim = the (normalized) value
    itself — a plain sort key, the right choice when only a single
    column carries selective predicates (BENCH/BASELINE.md: at coarse
    file granularity a multi-dim key dilutes single-dim pruning)."""
    n = len(dims)
    if n == 1:
        return (dims[0].astype(np.uint64) & _DIM_MASK).astype(np.int64)
    if n == 2:
        return ((_part1by1(dims[0]) << np.uint64(1)) | _part1by1(dims[1])).astype(np.int64)
    return morton3(*dims)


def hilbert_n(dims: list[np.ndarray], bits: int = BITS_PER_DIM) -> np.ndarray:
    """Hilbert key over 1-3 dims (1 dim degenerates to the value)."""
    n = len(dims)
    if n == 1:
        return (dims[0].astype(np.uint64) & _DIM_MASK).astype(np.int64)
    if n == 3:
        return hilbert3(*dims, bits=bits)
    tx = axes_to_transpose(list(dims), bits)
    out = np.zeros_like(tx[0])
    for level in range(bits - 1, -1, -1):
        for i in range(n):
            out = (out << np.uint64(1)) | ((tx[i] >> np.uint64(level)) & np.uint64(1))
    return out.astype(np.int64)


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
    arrays: tuple[np.ndarray, ...],
    bounds: tuple[tuple[int, int], ...] | None,
) -> list[np.ndarray]:
    """Normalize 1-3 dim arrays; ``bounds`` = ((lo,hi),)*n raw column
    min/max (range-scaled) or None (legacy: top-bits for the first dim,
    clip for the rest — the pre-r3 fixed scheme)."""
    if bounds is None:
        return [normalize_i64(arrays[0])] + [normalize_u32(a) for a in arrays[1:]]
    params = [dim_params(lo, hi) for lo, hi in bounds]
    return [
        normalize_scaled(x, lo_f, sc)
        for x, (lo_f, sc) in zip(arrays, params)
    ]


def curve_key_udf(curve: str, bounds: tuple[tuple[int, int], ...] | None = None):
    """Arrow-batched pandas UDF computing the curve key over 1-3 dims,
    range-scaling each dim from ``bounds`` (per-column min/max, e.g.
    one manifest aggregation) so every dimension carries entropy in
    the key."""
    fn = morton_n if curve == "zorder" else hilbert_n

    @F.pandas_udf(T.LongType())
    def key(*cols: pd.Series) -> pd.Series:
        dims = _dims_np(
            tuple(c.to_numpy(dtype=np.int64, na_value=0) for c in cols), bounds
        )
        return pd.Series(fn(dims))

    return key


# legacy fixed-normalization UDFs (kept for the bit-identity tests)
zorder_key = curve_key_udf("zorder")
hilbert_key = curve_key_udf("hilbert")

CURVES = {"zorder": zorder_key, "hilbert": hilbert_key}


_SPREAD_MASKS_3 = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)
_SPREAD_MASKS_2 = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def zorder_col(*cols, bounds: tuple[tuple[int, int], ...] | None = None):
    """The Z-order key over 1-3 columns as PURE Catalyst expressions
    (shiftleft/AND bit spreading) — whole-stage-codegen'd, no Python
    worker in the plan. Bit-identical to ``morton_n``/``curve_key_udf``
    (tested). Used for the clustering key pass so the metadata pass is
    JVM-only; the Hilbert variant stays an Arrow UDF (its loop
    structure doesn't reduce to fixed-point expressions).

    With ``bounds`` each dim is range-scaled onto the full 21-bit space
    via the same driver-computed (lo, scale) doubles as the numpy
    kernels — identical IEEE op sequence, so keys stay bit-identical.
    One column = plain (normalized) sort key, no interleaving."""
    from pyspark.sql import functions as F  # local to keep module import-light

    n = len(cols)
    masks = _SPREAD_MASKS_3 if n == 3 else _SPREAD_MASKS_2

    def spread(col):
        x = col
        for shift, mask in masks:
            x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
        return x

    if bounds is not None:
        def scaled(col, lo, hi):
            lo_f, sc = dim_params(lo, hi)
            v = (col.cast("double") - F.lit(lo_f)) * F.lit(sc)
            v = F.least(F.greatest(v, F.lit(0.0)), F.lit(_M_F))
            return F.floor(v).cast("long")

        dims = [scaled(c, *b) for c, b in zip(cols, bounds)]
    else:
        lim = F.lit((1 << BITS_PER_DIM) - 1)
        dims = [
            F.shiftrightunsigned(
                cols[0].cast("long").bitwiseXOR(F.lit(-(2**63))), 64 - BITS_PER_DIM
            )
        ] + [F.least(F.greatest(c.cast("long"), F.lit(0)), lim) for c in cols[1:]]
    if n == 1:
        return dims[0]
    out = F.shiftleft(spread(dims[0]), n - 1)
    for i, d in enumerate(dims[1:], start=1):
        out = out.bitwiseOR(F.shiftleft(spread(d), n - 1 - i))
    return out


def curve_np(
    curve: str, phash: np.ndarray, w: np.ndarray, h: np.ndarray,
    bounds: tuple[tuple[int, int], ...] | None = None,
) -> np.ndarray:
    """Raw numpy curve kernel (for fused UDFs that combine the key with
    further vectorized work in one Arrow round-trip)."""
    dims = _dims_np((phash, w, h), bounds)
    return morton_n(dims) if curve == "zorder" else hilbert_n(dims)
