"""Pure-numpy image codecs + perceptual hash (no Pillow in sandbox).

Formats match FIXTURES.md §1: png (lossless), ppm (lossless), qjpg
(quantized-DCT lossy stand-in; PSNR ≥ 40 dB round-trip).
"""

from __future__ import annotations

import numpy as np

from biz_crawlers_spark.codecs.phash import hamming64, phash64
from biz_crawlers_spark.codecs.png import decode_png, encode_png
from biz_crawlers_spark.codecs.ppm import decode_ppm, encode_ppm
from biz_crawlers_spark.codecs.qjpg import decode_qjpg, encode_qjpg, psnr

LOSSLESS_FMTS = frozenset({"png", "ppm"})
LOSSY_FMTS = frozenset({"qjpg"})
ALL_FMTS = LOSSLESS_FMTS | LOSSY_FMTS

_ENCODERS = {"png": encode_png, "ppm": encode_ppm, "qjpg": encode_qjpg}
_DECODERS = {"png": decode_png, "ppm": decode_ppm, "qjpg": decode_qjpg}


def encode(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def sniff_fmt(data: bytes) -> str:
    """Detect format from magic bytes (analog of trusting file extensions in
    the reference; content-sniffing is safer at scale)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"P6":
        return "ppm"
    if data[:4] == b"QJPG":
        return "qjpg"
    raise ValueError("unknown image format")


__all__ = [
    "encode",
    "decode",
    "sniff_fmt",
    "encode_png",
    "decode_png",
    "encode_ppm",
    "decode_ppm",
    "encode_qjpg",
    "decode_qjpg",
    "phash64",
    "hamming64",
    "psnr",
    "LOSSLESS_FMTS",
    "LOSSY_FMTS",
    "ALL_FMTS",
]
