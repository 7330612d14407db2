"""Codec round-trip properties (SURVEY.md §5.2.4):
lossless: decode(encode(img)) == img exactly; lossy: PSNR ≥ 40 dB."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from biz_crawlers_spark import codecs
from biz_crawlers_spark.codecs.phash import hamming64, phash64


def _rand_img(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _smooth_img(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Gradient+sinusoid image like the fixture generator produces —
    the realistic content class for the lossy PSNR check."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 128 + 60 * np.sin(xx / 7.0) + 50 * np.cos(yy / 5.0)
    img = np.stack([base, np.roll(base, 3, 0), np.roll(base, 5, 1)], axis=-1)
    img += rng.normal(0, 4, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["png", "ppm"])
@pytest.mark.parametrize("wh", [(16, 16), (32, 64), (33, 17), (128, 128), (1, 1)])
def test_lossless_roundtrip_exact(fmt, wh):
    rng = np.random.default_rng(42)
    img = _rand_img(rng, *wh)
    data = codecs.encode(img, fmt)
    out = codecs.decode(data, fmt)
    assert out.shape == img.shape
    assert np.array_equal(out, img)
    assert codecs.sniff_fmt(data) == fmt


@pytest.mark.parametrize("wh", [(16, 16), (32, 64), (33, 17), (128, 128)])
def test_qjpg_psnr_above_40(wh):
    rng = np.random.default_rng(7)
    img = _smooth_img(rng, *wh)
    data = codecs.encode(img, "qjpg")
    out = codecs.decode(data, "qjpg")
    assert out.shape == img.shape
    p = codecs.psnr(img, out)
    assert p >= 40.0, f"PSNR {p:.2f} < 40 dB"
    assert not np.array_equal(out, img), "qjpg should be genuinely lossy"
    assert codecs.sniff_fmt(data) == "qjpg"


def test_qjpg_worst_case_noise_psnr():
    # pure noise is the hardest content; still must clear 40 dB at default q
    rng = np.random.default_rng(3)
    img = _rand_img(rng, 64, 64)
    out = codecs.decode(codecs.encode(img, "qjpg"), "qjpg")
    assert codecs.psnr(img, out) >= 40.0


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    img = _rand_img(rng, w, h)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)


def test_png_filtered_decode():
    # decoder must handle all five filter types (encoder only emits 0);
    # build a tiny PNG with Sub/Up/Average/Paeth rows by hand
    import struct
    import zlib

    from biz_crawlers_spark.codecs.png import _SIG, _chunk, decode_png

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3) * 3
    stride = 4 * 3
    rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].reshape(-1).astype(np.int32)
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ft == 0:
                enc[x] = cur[x]
            elif ft == 1:
                enc[x] = cur[x] - a
            elif ft == 2:
                enc[x] = cur[x] - b
            elif ft == 3:
                enc[x] = cur[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = cur[x] - pred
        rows.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    data = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_phash_properties():
    rng = np.random.default_rng(42)
    img = _smooth_img(rng, 64, 64)
    h1 = phash64(img)
    assert -(2**63) <= h1 < 2**63
    # determinism
    assert phash64(img.copy()) == h1
    # mild noise → small hamming distance (near-dup detectable)
    noisy = np.clip(img.astype(np.int16) + rng.integers(-4, 5, img.shape), 0, 255).astype(
        np.uint8
    )
    assert hamming64(h1, phash64(noisy)) <= 12
    # unrelated image → large distance
    other = _smooth_img(np.random.default_rng(99), 64, 64)
    other = np.rot90(other).copy()
    assert hamming64(h1, phash64(other)) >= 16
    # lossy round-trip preserves phash closely
    rt = codecs.decode(codecs.encode(img, "qjpg"), "qjpg")
    assert hamming64(h1, phash64(rt)) <= 8
