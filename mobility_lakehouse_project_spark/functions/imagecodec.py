"""Deterministic image codec for the image+caption payload.

The engine's per-row invariant (BASELINE.json input_hint) is
"decoded-pixel allclose (PSNR>=40dB for lossy fmt) + caption equality"
across every maintenance rewrite. Real image libraries (PIL/opencv) are
not in this container, so the codec here is a self-contained,
deterministic stand-in with the same *shape* as a real one:

- ``raw``  : uncompressed interleaved RGB bytes (w*h*3), lossless.
- ``png``  : zlib-compressed RGB with a tiny header, lossless.
- ``jpeg`` : quantize-to-multiple-of-Q then zlib — LOSSY. With Q=4 the
  quantization error is uniform in [-2, 2], MSE ~= Q^2/12 ~= 1.33, so
  PSNR ~= 10*log10(255^2/1.33) ~= 46.9 dB — above the 40 dB gate, which
  is exactly the property the verification scan asserts.

All encode/decode paths are numpy-vectorized and are only ever invoked
from Arrow-batched pandas UDFs / mapInPandas (no per-row Python in a
Spark plan; see operators/verify.py).

A real deployment would swap `_encode_one/_decode_one` for
PIL/turbojpeg calls behind the same interface; the Spark-side plumbing
(schema, batch shape, PSNR gate) is unchanged. Mirrors the reference's
Python-side raster/geometry shims (its only "UDF surface",
dags/Demo_dag.py:76-138, src/visualization.py:53-69).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC_PNG = b"FPNG"
_MAGIC_JPG = b"FJPG"
_JPEG_Q = 4  # quantization step -> ~46.9 dB PSNR


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic (seed-free) pixel field for row index ``i``.

    Gradient base + hash-derived noise: reproducible from ``i`` alone,
    non-constant (so lossy-codec PSNR is meaningful), and high-entropy
    (so encoded blob sizes behave like real photos, not flat fills —
    the property the GB/s compaction benchmark depends on).
    """
    return synth_pixels_batch(np.array([i], dtype=np.int64), w, h)[0]


def synth_pixels_batch(ids: np.ndarray, w: int, h: int) -> np.ndarray:
    """Vectorized ``synth_pixels`` for many row indices at one (w, h):
    returns ``(len(ids), h, w, 3)`` uint8, byte-identical to the
    per-row form (pinned by tests/test_imagecodec.py). Amortizes the
    per-call numpy overhead (mgrid allocation, small-array kernel
    launches) that dominated per-row synthesis for small images —
    the modular arithmetic is row-independent, so batching is pure
    reassociation: ``(grid + b) % m == (grid % m + b) % m``.

    Intermediates are O(len(ids) * h * w * 3 * 8) bytes (the uint64
    noise lattice); callers chunk ``ids`` to bound memory
    (synth.synth_batch caps the product at ~64 MB)."""
    n = h * w * 3
    g = len(ids)
    yy, xx = np.mgrid[0:h, 0:w]
    # int16 is exact here: grid % 160 < 160 and (i*31) % 251 < 251, so
    # the sum stays < 411 — half the memory traffic of int64
    grid = ((xx * 7 + yy * 13) % 160).astype(np.int16)
    b = ((ids.astype(np.int64) * 31) % 251).astype(np.int16)
    base = ((grid[None, :, :] + b[:, None, None]) % 160).astype(np.uint8)
    lane = np.arange(n, dtype=np.uint64)
    noise = _mix64(
        lane[None, :] ^ (ids.astype(np.uint64) * np.uint64(0x9E3779B1))[:, None]
    )
    noise8 = (noise & np.uint64(0x5F)).astype(np.uint8).reshape(g, h, w, 3)
    return base[:, :, :, None] + noise8  # (g, h, w, 3) uint8


def encode(pixels: np.ndarray, fmt: str, level: int = 6) -> bytes:
    h, w, _ = pixels.shape
    raw = pixels.tobytes()
    if fmt == "raw":
        return raw
    if fmt == "png":
        return _MAGIC_PNG + struct.pack("<HH", w, h) + zlib.compress(raw, level)
    if fmt == "jpeg":
        q = (pixels.astype(np.int32) // _JPEG_Q * _JPEG_Q).astype(np.uint8)
        return _MAGIC_JPG + struct.pack("<HH", w, h) + zlib.compress(q.tobytes(), level)
    raise ValueError(f"unknown fmt {fmt!r}")


def encode_batch(pixels: np.ndarray, fmt: str, level: int = 6) -> list[bytes]:
    """Encode a ``(g, h, w, 3)`` uint8 batch; byte-identical to
    per-row :func:`encode`. The jpeg quantization runs as one
    vectorized pass over the whole batch and the 8-byte header is
    built once; only the per-row ``zlib.compress`` (the codec kernel
    proper) remains in the loop."""
    g, h, w, _ = pixels.shape
    if fmt == "raw":
        return [pixels[k].tobytes() for k in range(g)]
    if fmt == "png":
        hdr = _MAGIC_PNG + struct.pack("<HH", w, h)
        return [hdr + zlib.compress(pixels[k].tobytes(), level) for k in range(g)]
    if fmt == "jpeg":
        q = (pixels.astype(np.int32) // _JPEG_Q * _JPEG_Q).astype(np.uint8)
        hdr = _MAGIC_JPG + struct.pack("<HH", w, h)
        return [hdr + zlib.compress(q[k].tobytes(), level) for k in range(g)]
    raise ValueError(f"unknown fmt {fmt!r}")


def recompress(blob: bytes, w: int, h: int, fmt: str, level: int) -> bytes:
    """Decode + re-encode at the given compression level. Pixel-exact:
    png/raw are lossless, and jpeg's quantization is idempotent (the
    decoded pixels are already on the quantization grid), so any
    PSNR gate sees identical pixels after recompression."""
    if fmt == "raw":
        return blob
    return encode(decode(blob, w, h, fmt), fmt, level)


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt in ("png", "jpeg"):
        magic = _MAGIC_PNG if fmt == "png" else _MAGIC_JPG
        if data[:4] != magic:
            raise ValueError(f"bad magic for fmt {fmt!r}")
        ew, eh = struct.unpack("<HH", data[4:8])
        if (ew, eh) != (w, h):
            raise ValueError(f"header dims {(ew, eh)} != column dims {(w, h)}")
        raw = zlib.decompress(data[8:])
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    raise ValueError(f"unknown fmt {fmt!r}")


def regenerate_decoded(i: int, w: int, h: int, fmt: str) -> np.ndarray:
    """Expected decoded pixels reconstructed from the generative model
    ALONE — no encoded bytes involved: synth_pixels plus the analytic
    quantization a lossy decode would land on. Used as the independent
    cross-check path for decode validation (a decode bug shows up as an
    aHash mismatch against this regeneration)."""
    px = synth_pixels(i, w, h)
    if fmt == "jpeg":
        px = (px.astype(np.int32) // _JPEG_Q * _JPEG_Q).astype(np.uint8)
    return px


def luma_milli(pixels: np.ndarray) -> int:
    """Per-image mean luma in integer milli-units — the integerized
    form both the Spark kernel and the Spark-free golden path
    (tools/golden_mm.py) aggregate, so sums are exact and
    order-independent. Computed from EXACT integer channel sums with
    one IEEE double division at the end: a float `.mean()` here once
    landed within epsilon of a .5 rounding boundary and flapped the
    golden constant by 1 between runs — integer accumulation makes the
    rounding input bit-identical on every host."""
    s = pixels.reshape(-1, 3).astype(np.int64).sum(axis=0)
    n = pixels.size // 3
    num = 299 * int(s[0]) + 587 * int(s[1]) + 114 * int(s[2])
    return int(np.rint(num / n))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def average_hash(pixels: np.ndarray) -> int:
    """64-bit average-hash perceptual fingerprint (public aHash scheme):
    downsample luminance to 8x8, threshold at the mean, pack 64 bits.
    Used by tests to sanity-check the synth pipeline; the table's
    ``phash`` column itself is generator-assigned (FIXTURES.md F1)."""
    lum = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = lum.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            cells[r, c] = lum[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
    bits = (cells >= cells.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= 1 << 63 else val
