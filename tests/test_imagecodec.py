"""Codec invariants backing the engine's per-row PSNR>=40dB gate."""

import numpy as np
import pytest

from mobility_lakehouse_project_spark.functions import imagecodec as ic


@pytest.mark.parametrize("fmt", ["raw", "png"])
def test_lossless_roundtrip(fmt):
    px = ic.synth_pixels(7, 32, 16)
    assert np.array_equal(ic.decode(ic.encode(px, fmt), 32, 16, fmt), px)


def test_jpeg_lossy_psnr_above_gate():
    for i in (0, 3, 99):
        px = ic.synth_pixels(i, 64, 64)
        dec = ic.decode(ic.encode(px, "jpeg"), 64, 64, "jpeg")
        p = ic.psnr(px, dec)
        assert 40.0 <= p < 60.0, p


def test_psnr_identical_is_inf():
    px = ic.synth_pixels(1, 8, 8)
    assert ic.psnr(px, px) == float("inf")


def test_deterministic_encoding():
    a = ic.encode(ic.synth_pixels(5, 16, 16), "png")
    b = ic.encode(ic.synth_pixels(5, 16, 16), "png")
    assert a == b


def test_average_hash_stable_and_64bit():
    h1 = ic.average_hash(ic.synth_pixels(11, 32, 32))
    h2 = ic.average_hash(ic.synth_pixels(11, 32, 32))
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63
