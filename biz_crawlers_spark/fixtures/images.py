"""Deterministic synthetic image + caption generation (FIXTURES.md §1).

Pixel content is a seeded gradient + per-image sinusoid + id-derived glyph
blocks, so near-duplicates exist (same glyph, different noise) for phash
tests. Everything is a pure function of (seed, key) — no wall clock, no
global RNG — so the Spark engine, the pure-Python reference simulator, and
golden files all regenerate byte-identical content.
"""

from __future__ import annotations

import hashlib

import numpy as np

from biz_crawlers_spark import codecs

SIZES = (16, 32, 64, 128)
FMTS = ("png", "ppm", "qjpg")


def _rng_for(seed: int, key: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64((seed << 32) ^ (key & 0xFFFFFFFF)))


def gen_pixels(seed: int, key: int, w: int, h: int, glyph_id: int) -> np.ndarray:
    """(h, w, 3) uint8 image: gradient + sinusoid + glyph blocks + noise."""
    rng = _rng_for(seed, key)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    phase = rng.uniform(0, 2 * np.pi)
    base = 120 + 50 * np.sin(xx / max(w / 9.0, 1.0) + phase) + 40 * np.cos(
        yy / max(h / 7.0, 1.0)
    )
    img = np.stack([base, np.roll(base, 2, axis=0), np.roll(base, 4, axis=1)], axis=-1)
    # glyph: deterministic 8x8 on/off block pattern from glyph_id (same glyph
    # across noise variants → near-duplicate pairs for phash)
    bits = np.unpackbits(
        np.frombuffer(hashlib.sha256(glyph_id.to_bytes(8, "little", signed=True)).digest()[:8], dtype=np.uint8)
    ).reshape(8, 8)
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    glyph = np.kron(bits, np.ones((bh, bw)))[:h, :w]
    img[:, :, 0] = np.where(glyph > 0, 230.0, img[:, :, 0])
    img[:, :, 1] = np.where(glyph > 0, img[:, :, 1] * 0.5, img[:, :, 1])
    img += rng.normal(0, 3.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_image(
    seed: int, key: int, k: int, entity_name: str, entity_id: str, category: str,
    sizes: tuple = SIZES,
) -> dict:
    """Full image record per input_hint schema (image_id, bytes, w, h, fmt,
    caption, phash). ``key`` is the content key (e.g. url_key ^ k).
    ``sizes`` narrows the dimension pool (scaling benches use small images so
    the measurement reflects the engine, not local-disk bandwidth)."""
    rng = _rng_for(seed, key ^ 0x5EED)
    w = int(rng.choice(sizes))
    h = int(rng.choice(sizes))
    fmt = str(rng.choice(FMTS))
    pixels = gen_pixels(seed, key, w, h, glyph_id=key % 1000)
    data = codecs.encode(pixels, fmt)
    caption = f"{entity_name} 統一編號 {entity_id} {category} seal {k}"
    return {
        "image_id": hashlib.sha256(data).hexdigest()[:16],
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": codecs.phash64(pixels),
        # pre-encode golden pixels — the truth side of the PSNR≥40dB /
        # exact-allclose invariant; never serialized into pages
        "pixels": pixels,
    }
