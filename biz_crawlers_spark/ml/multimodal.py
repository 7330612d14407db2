"""Multimodal binary-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched mapInPandas.

The image path is REAL (pure-numpy codecs from biz_crawlers_spark.codecs);
formats the sandbox can't decode (jpeg/webp/mp3/mp4 — no Pillow/ffmpeg
offline) are stubbed behind clearly-marked NotImplementedError raises or a
deterministic fake, with the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) real and tested.

Scale notes: binary payloads stay inside the worker between the decode and
feature steps (fused in one mapInPandas); only small feature rows are
shuffled. Batch size is capped by spark.sql.execution.arrow.maxRecordsPerBatch
so a batch of 128×128 images stays well under executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from biz_crawlers_spark import codecs
from biz_crawlers_spark.fixtures.images import make_image

IMAGE_FEATURES_DDL = (
    "image_id string, fmt string, w int, h int, mean_r double, mean_g double, "
    "mean_b double, phash long, error string"
)

AUDIO_FEATURES_DDL = "clip_id string, n_samples int, rms double, peak double, error string"


def decode_image_features(df: DataFrame) -> DataFrame:
    """(image_id, bytes, fmt) → per-image features. Decode failures and
    unsupported formats become error rows, never exceptions (the reference's
    warn-and-continue semantics, BaseCrawler.php:176-183)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for image_id, raw, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                row = {
                    "image_id": image_id, "fmt": fmt, "w": None, "h": None,
                    "mean_r": None, "mean_g": None, "mean_b": None,
                    "phash": None, "error": None,
                }
                try:
                    if fmt in ("jpeg", "jpg", "webp"):
                        # STUB: no libjpeg/Pillow in this environment
                        raise NotImplementedError(f"no decoder for {fmt} in sandbox")
                    pix = codecs.decode(bytes(raw), fmt)
                    means = pix.reshape(-1, 3).mean(axis=0)
                    row.update(
                        w=int(pix.shape[1]), h=int(pix.shape[0]),
                        mean_r=float(round(means[0], 4)),
                        mean_g=float(round(means[1], 4)),
                        mean_b=float(round(means[2], 4)),
                        phash=codecs.phash64(pix),
                    )
                except NotImplementedError as e:
                    row["error"] = f"unsupported: {e}"
                except Exception as e:
                    row["error"] = f"decode_error: {type(e).__name__}"
                rows.append(row)
            out = pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "w", "h", "mean_r", "mean_g", "mean_b",
                         "phash", "error"],
                dtype=object,
            )
            for c, t in (("w", "Int32"), ("h", "Int32"), ("phash", "Int64")):
                out[c] = out[c].astype(t)
            for c in ("mean_r", "mean_g", "mean_b"):
                out[c] = out[c].astype("float64")
            yield out

    return df.mapInPandas(batches, IMAGE_FEATURES_DDL)


def resize_images(df: DataFrame, size: int = 32) -> DataFrame:
    """(image_id, bytes, fmt) → (image_id, bytes[ppm], w, h): area-resample
    to size×size and re-encode losslessly. The canonical normalize step of a
    vision-training pipeline."""
    from biz_crawlers_spark.codecs.phash import _resize_area

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for image_id, raw, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    pix = codecs.decode(bytes(raw), fmt)
                except Exception:
                    continue
                chans = [
                    np.clip(np.round(_resize_area(pix[:, :, c].astype(np.float64), size)), 0, 255)
                    for c in range(3)
                ]
                small = np.stack(chans, axis=-1).astype(np.uint8)
                ids.append(image_id)
                blobs.append(codecs.encode_ppm(small))
            yield pd.DataFrame(
                {"image_id": ids, "bytes": blobs, "w": size, "h": size},
                columns=["image_id", "bytes", "w", "h"],
            )

    return df.mapInPandas(batches, "image_id string, bytes binary, w int, h int")


WAV_FEATURES_DDL = (
    "clip_id string, sample_rate int, n_channels int, n_samples int, "
    "duration_s double, rms double, peak double, zero_crossings int, error string"
)


def decode_wav_features(df: DataFrame) -> DataFrame:
    """REAL audio decode path: RIFF/WAVE PCM via stdlib ``wave`` (present in
    the sandbox — no external audio lib needed), features vectorized in
    numpy. mp3/flac/ogg would slot in behind the same signature; they remain
    stubbed (fake_audio_decode / NotImplementedError) because their codecs
    aren't available offline."""
    import io
    import wave

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for clip_id, raw in zip(pdf["clip_id"], pdf["bytes"]):
                row = {"clip_id": clip_id, "sample_rate": None, "n_channels": None,
                       "n_samples": None, "duration_s": None, "rms": None,
                       "peak": None, "zero_crossings": None, "error": None}
                try:
                    with wave.open(io.BytesIO(bytes(raw))) as w:
                        sr, nch, nframes = w.getframerate(), w.getnchannels(), w.getnframes()
                        width = w.getsampwidth()
                        if width != 2:
                            raise NotImplementedError(f"{8 * width}-bit PCM")
                        pcm = np.frombuffer(w.readframes(nframes), dtype="<i2")
                    if nch > 1:  # downmix to mono for features
                        pcm = pcm.reshape(-1, nch).mean(axis=1)
                    x = pcm.astype(np.float64)
                    if len(x) == 0:
                        raise ValueError("empty clip")
                    row.update(
                        sample_rate=sr, n_channels=nch, n_samples=int(len(x)),
                        duration_s=float(round(len(x) / sr, 6)),
                        rms=float(round(np.sqrt((x**2).mean()), 4)),
                        peak=float(round(np.abs(x).max(), 4)),
                        zero_crossings=int(np.count_nonzero(np.diff(np.signbit(x)))),
                    )
                except NotImplementedError as e:
                    row["error"] = f"unsupported: {e}"
                except Exception as e:
                    row["error"] = f"decode_error: {type(e).__name__}"
                rows.append(row)
            out = pd.DataFrame(rows, dtype=object)
            for c in ("sample_rate", "n_channels", "n_samples", "zero_crossings"):
                out[c] = out[c].astype("Int32")
            for c in ("duration_s", "rms", "peak"):
                out[c] = out[c].astype("float64")
            yield out

    return df.mapInPandas(batches, WAV_FEATURES_DDL)


def synthetic_wav_df(spark: SparkSession, n: int = 16, seed: int = 42) -> DataFrame:
    """Deterministic (clip_id, bytes) WAV table: sine bursts + one corrupted
    clip, written with the stdlib wave encoder (real RIFF containers)."""
    import io
    import wave

    rows = []
    for i in range(n):
        sr = 8000
        t = np.arange(sr // 4, dtype=np.float64) / sr  # 250 ms
        freq = 110.0 * (1 + (seed + i) % 7)
        amp = 8000 + 500 * (i % 5)
        pcm = (amp * np.sin(2 * np.pi * freq * t)).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        rows.append((f"clip{i:04d}", buf.getvalue()))
    rows.append(("clip_bad", b"RIFFnot-really-a-wav"))
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def fake_audio_decode(df: DataFrame) -> DataFrame:
    """Audio plumbing with a deterministic fake decoder (no audio libs in
    sandbox): treats the binary payload as little-endian int16 PCM. Real
    mp3/flac would slot in here behind the same signature."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for clip_id, raw in zip(pdf["clip_id"], pdf["bytes"]):
                row = {"clip_id": clip_id, "n_samples": None, "rms": None,
                       "peak": None, "error": None}
                try:
                    buf = bytes(raw)
                    samples = np.frombuffer(buf[: len(buf) // 2 * 2], dtype="<i2").astype(
                        np.float64
                    )
                    if len(samples) == 0:
                        raise ValueError("empty clip")
                    row.update(
                        n_samples=len(samples),
                        rms=float(round(np.sqrt((samples**2).mean()), 4)),
                        peak=float(round(np.abs(samples).max(), 4)),
                    )
                except Exception as e:
                    row["error"] = f"decode_error: {type(e).__name__}"
                rows.append(row)
            out = pd.DataFrame(rows, dtype=object)
            out["n_samples"] = out["n_samples"].astype("Int32")
            for c in ("rms", "peak"):
                out[c] = out[c].astype("float64")
            yield out

    return df.mapInPandas(batches, AUDIO_FEATURES_DDL)


def frame_sample_video(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB: no video decoder in the sandbox. The
    signature and schema are the real contract; calling it raises."""
    raise NotImplementedError(
        "video decoding unavailable in sandbox (no ffmpeg); "
        "contract: (video_id, bytes) -> (video_id, frame_idx, bytes[ppm])"
    )


def synthetic_images_df(spark: SparkSession, n: int = 48, seed: int = 42) -> DataFrame:
    """Deterministic (image_id, bytes, fmt, w, h) table from the fixture
    generator — the input for multimodal queries/tests."""
    rows = []
    for i in range(n):
        rec = make_image(seed, i * 0x9E3779B9, i % 3, f"公司{i:04d}", f"{i:08d}", "est")
        rows.append((rec["image_id"], rec["bytes"], rec["fmt"], rec["w"], rec["h"]))
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, w int, h int")


def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: decode the synthetic image table, aggregate by fmt.
    (sf_dir unused — the table is generated, deterministic per seed.)"""
    from pyspark.sql import functions as F

    feats = decode_image_features(synthetic_images_df(spark))
    return (
        feats.filter(F.col("error").isNull())
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("w"), 4).alias("avg_w"),
            F.round(F.avg("h"), 4).alias("avg_h"),
            F.round(F.avg("mean_r"), 2).alias("avg_mean_r"),
        )
        .orderBy("fmt")
    )
