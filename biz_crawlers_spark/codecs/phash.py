"""64-bit perceptual hash: sign pattern of the 8×8 low-frequency DCT block.

The reference's content identity is sha256 of the whole payload
(GCISCrawler.php:412-420) — exact identity only. The engine adds `phash`
(input_hint column) for near-duplicate detection: grayscale → 32×32 area
resample → 2-D DCT → top-left 8×8 block → bit k = coeff > median.
"""

from __future__ import annotations

import numpy as np


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_M32 = _dct_matrix(32)


def _resize_area(gray: np.ndarray, size: int = 32) -> np.ndarray:
    """Deterministic area-average resample to size×size: box filter over
    index bins, fully vectorized via integral-image gathers (no Python
    loop — this runs twice per image in the crawl hot path)."""
    h, w = gray.shape
    ys = (np.arange(size + 1) * h) // size
    xs = (np.arange(size + 1) * w) // size
    y0, x0 = ys[:-1], xs[:-1]
    y1 = np.maximum(ys[1:], y0 + 1)
    x1 = np.maximum(xs[1:], x0 + 1)
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return (
        csum[np.ix_(y1, x1)] - csum[np.ix_(y0, x1)] - csum[np.ix_(y1, x0)] + csum[np.ix_(y0, x0)]
    ) / area


def phash64(img: np.ndarray) -> int:
    """Signed int64 perceptual hash of an RGB uint8 image."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_area(gray, 32)
    d = _M32 @ small @ _M32.T
    # round before comparing: BLAS matmul results differ in the last ulp
    # across processes/thread counts, which would flip bits that sit exactly
    # on the median — the hash must be bit-identical driver vs executor
    block = np.round(d[:8, :8].ravel(), 4)
    med = np.median(block)
    bits = block > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
