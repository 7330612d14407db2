"""QJPG — a deterministic quantized-DCT lossy codec (JPEG stand-in).

No Pillow/libjpeg in the sandbox, so the PSNR ≥ 40 dB lossy-fidelity path
(BASELINE.json input_hint) is exercised with this stand-in: 8×8 block DCT per
RGB channel, uniform quantization, zlib-compressed int16 coefficients.
Quantization is mild by construction (flat table, default q=6) so round-trips
stay comfortably above 40 dB while remaining genuinely lossy.

Layout: b"QJPG" | u16 w | u16 h | u8 q | zlib(int16 coeffs little-endian,
shape (3, ceil(h/8)*8, ceil(w/8)*8) in C order).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"QJPG"


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_M = _dct_matrix()


def _blockify(chan: np.ndarray) -> np.ndarray:
    """(H, W) → (H//8, W//8, 8, 8) view-shuffle."""
    h, w = chan.shape
    return chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray) -> np.ndarray:
    nbh, nbw = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8)


def encode_qjpg(img: np.ndarray, q: int = 6) -> bytes:
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_qjpg expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    x = padded.astype(np.float64) - 128.0
    coeffs = np.empty((3, ph, pw), dtype=np.int16)
    for c in range(3):
        blocks = _blockify(x[:, :, c])
        d = np.einsum("ij,abjk,lk->abil", _M, blocks, _M)
        coeffs[c] = _unblockify(np.round(d / q).astype(np.int16))
    return (
        _MAGIC
        + struct.pack("<HHB", w, h, q)
        + zlib.compress(coeffs.astype("<i2").tobytes(), 6)
    )


def decode_qjpg(data: bytes) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not a QJPG")
    w, h, q = struct.unpack_from("<HHB", data, 4)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    coeffs = (
        np.frombuffer(zlib.decompress(data[9:]), dtype="<i2")
        .reshape(3, ph, pw)
        .astype(np.float64)
        * q
    )
    out = np.empty((ph, pw, 3), dtype=np.uint8)
    for c in range(3):
        blocks = _blockify(coeffs[c])
        x = np.einsum("ji,abjk,kl->abil", _M, blocks, _M)  # inverse: M.T @ B @ M
        out[:, :, c] = np.clip(np.round(_unblockify(x) + 128.0), 0, 255).astype(np.uint8)
    return out[:h, :w]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
