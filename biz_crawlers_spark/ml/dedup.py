"""Deduplication operators over the ``documents`` / ``embeddings`` tables —
the core of a large-scale training-data pipeline.

Five strategies, in increasing fuzziness:

- exact           hash-groupBy canonical form                (SQL oracle ✓)
- ngram-Jaccard   exact set similarity via shingle inverted
                  index self-join (no O(n²) pair scan)       (SQL oracle ✓)
- MinHash + LSH   probabilistic candidate generation, exact
                  verification of candidates                 (rows-only: LSH
                  recall is probabilistic, not SQL-expressible)
- SimHash         64-bit sign-random-projection over token
                  hashes, banded hamming search              (rows-only)
- embedding-cosine near-dup pairs over array<float>          (SQL oracle ✓)

Scale notes (10^10-document framing):
- the inverted-index join shuffles (shingle → [doc]) postings; common-shingle
  hot keys are the skew risk — production adds prefix filtering (Xiao et al.,
  "Efficient Similarity Joins for Near Duplicate Detection", WWW'08); here
  the join is left exact so the DuckDB oracle can replicate it.
- MinHash banding turns all-pairs into equality joins on (band, band_hash) —
  the standard LSH trick (Broder '97; Leskovec et al., MMDS ch.3); candidate
  verification reuses the exact-Jaccard join restricted to candidate pairs.
- pairs always emitted with a < b to halve the join output.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biz_crawlers_spark.filters.bloom import splitmix64
from biz_crawlers_spark.ml.vectors import cosine_expr

NGRAM = 5
JACCARD_T = 0.5
MINHASH_K = 64
LSH_BANDS = 16  # 16 bands × 4 rows
COSINE_T = 0.45  # sf0.01 embeddings have no true near-dups; 0.45 exercises the path


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _norm_text() -> F.Column:
    return F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash: every doc mapped to the
    canonical (min doc_id) member of its content group."""
    d = _docs(spark, sf_dir).select("doc_id", F.md5(_norm_text()).alias("content_fp"))
    canon = d.groupBy("content_fp").agg(F.min("doc_id").alias("canonical_id"))
    return (
        d.join(canon, "content_fp")
        .select("doc_id", "canonical_id", (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"))
        .orderBy("doc_id")
    )


def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → distinct character n-grams (the exact similarity basis)."""
    d = _docs(spark, sf_dir)
    norm = _norm_text()
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (NGRAM - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(NGRAM)),
        )
    )
    return d.select("doc_id", grams.alias("grams"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold via inverted-index self-join:
    explode distinct shingles, join on shingle (only docs sharing ≥1 shingle
    ever meet), count intersections, compute |A∩B| / (|A|+|B|−|A∩B|)."""
    sh = _shingles_df(spark, sf_dir)
    sizes = sh.select("doc_id", F.size("grams").alias("n_grams"))
    posts = sh.select("doc_id", F.explode("grams").alias("g"))
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
        .orderBy("id_a", "id_b")
    )


def _minhash_sig_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → MinHash signature (array<long>, k=MINHASH_K). One Arrow batch
    per call; shingle → crc32 (C speed) → k permutations via vectorized
    splitmix64(crc ^ seed_p) — no per-row Python beyond the string shingling
    itself."""
    # small parquet inputs arrive as one partition; spread the signature
    # computation across the cluster before the Python stage
    par = spark.sparkContext.defaultParallelism
    sh = _shingles_df(spark, sf_dir).repartition(par, "doc_id")
    k = MINHASH_K
    seeds = np.arange(1, k + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def sig_batches(it):
        for pdf in it:
            out_ids, out_sigs = [], []
            for doc_id, grams in zip(pdf["doc_id"], pdf["grams"]):
                crcs = np.array(
                    [zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64
                )
                if len(crcs) == 0:
                    crcs = np.array([0], dtype=np.uint64)
                hs = splitmix64(crcs[:, None] ^ seeds[None, :])  # (n, k)
                out_ids.append(doc_id)
                out_sigs.append(hs.min(axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": out_ids, "sig": out_sigs})

    return sh.mapInPandas(sig_batches, "doc_id long, sig array<long>")


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature (16 bands × 4 rows),
    equality-join on (band, band_key), verify candidates with estimated
    Jaccard = fraction of agreeing signature components ≥ threshold."""
    sigs = _minhash_sig_df(spark, sf_dir)
    rows_per_band = MINHASH_K // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band).cast(
                            "array<string>"
                        ),
                    )
                ),
            )
        ).alias("band", "band_key"),
    ).select("doc_id", "sig", "band", "band_key")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e)
    ) / F.lit(MINHASH_K)
    return (
        cand.select("id_a", "id_b", F.round(est, 6).alias("jaccard_est"))
        .filter(F.col("jaccard_est") >= JACCARD_T)
        .orderBy("id_a", "id_b")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (Charikar STOC'02 / Manku et al. WWW'07): 64-bit sign of
    summed token-hash ±1 vectors; near-dups = hamming ≤ 3, found by the
    pigeonhole band trick (4 bands of 16 bits: any pair within hamming 3
    agrees exactly on ≥1 band)."""
    d = _docs(spark, sf_dir)

    def sim_batches(it):
        for pdf in it:
            ids, sims = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.lower().split()
                if not toks:
                    ids.append(doc_id)
                    sims.append(0)
                    continue
                hs = splitmix64(
                    np.array([zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.uint64)
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                    np.int64
                )
                v = (2 * bits - 1).sum(axis=0)
                sim = 0
                for bit in (v > 0).astype(np.uint64):
                    sim = (sim << 1) | int(bit)
                sims.append(sim - (1 << 64) if sim >= (1 << 63) else sim)
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "simhash": sims})

    sims = (
        d.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .mapInPandas(sim_batches, "doc_id long, simhash long")
    )
    bands = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "band_bits"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold over array<float>.
    Brute-force pair join here (exact, oracle-checkable); the scale path is
    the LSH bucketing in ml/similarity.py."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= COSINE_T)
        .orderBy("id_a", "id_b")
    )
