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


def _shingles_df(
    spark: SparkSession, sf_dir: str, sample_mod: int | None = None
) -> DataFrame:
    """doc_id → distinct character n-grams (the exact similarity basis).
    ``sample_mod``: keep only doc_id % sample_mod == 0 — the deterministic
    audit-slice mode the bench uses for the exact-join strategies (the
    co-posting stream scales ~quadratically in corpus size, so exact joins
    at production scale run on slices/oracles, never the full corpus).

    The normalized text is materialized BEHIND A SHUFFLE before the
    per-gram ``transform`` lambda: referencing the norm expression directly
    inside the lambda makes Catalyst re-evaluate the regexp_replace once per
    gram element (~200× per doc — measured 18 s of pure regexp at sf0.1);
    the exchange pins ``norm`` as a physical column so each substr reads a
    computed value. Doubles as the parallelism spreader for the small
    single-partition parquet input."""
    par = spark.sparkContext.defaultParallelism
    d = _docs(spark, sf_dir).select("doc_id", _norm_text().alias("norm"))
    if sample_mod:
        d = d.filter(F.col("doc_id") % sample_mod == 0)
    d = d.repartition(par, "doc_id")
    norm = F.col("norm")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (NGRAM - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(NGRAM)),
        )
    )
    return d.select("doc_id", grams.alias("grams"))


def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = JACCARD_T,
    sample_mod: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold via inverted-index self-join
    with a LENGTH FILTER fused into the join condition (J ≥ t requires
    t·max(|A|,|B|) ≤ |A∩B| ≤ min(|A|,|B|), so |B| ≥ t·|A| and vice versa —
    pairs failing it never enter the pair-count aggregation). Intersection
    counts come from the groupBy over co-postings, which Spark partial-
    aggregates map-side — measured the fastest exact strategy on this corpus
    at EVERY threshold (see dedup_ngram_jaccard_prefix for why the PPJOIN
    variant cannot prune a uniformly-hot shingle distribution)."""
    sh = _shingles_df(spark, sf_dir, sample_mod)
    posts = sh.select(
        "doc_id", F.size("grams").alias("n_grams"), F.explode("grams").alias("g")
    )
    a, b = posts.alias("a"), posts.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n_grams") >= F.col("a.n_grams") * threshold)
            & (F.col("a.n_grams") >= F.col("b.n_grams") * threshold),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n_grams").alias("na"),
            F.first("b.n_grams").alias("nb"),
        )
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def dedup_ngram_jaccard_prefix(
    spark: SparkSession, sf_dir: str, threshold: float = JACCARD_T
) -> DataFrame:
    """The same exact join via PPJOIN-style PREFIX FILTERING (Xiao et al.,
    "Efficient Similarity Joins for Near Duplicate Detection", WWW'08;
    Bayardo et al. WWW'07):

    1. order each doc's shingles by ASCENDING GLOBAL DOCUMENT FREQUENCY
       (ties by gram) and post only the first |g| − ⌈t·|g|⌉ + 1 — any pair
       with J ≥ t must share its df-smallest common shingle inside BOTH
       prefixes, and hot shingles (the quadratic co-posting blowup) land in
       suffixes, never generating candidates;
    2. length filter in the candidate join;
    3. exact verification: join the full gram arrays for candidates only,
       |A∩B| via array_intersect (JVM-side).

    Output is IDENTICAL to dedup_ngram_jaccard (same DuckDB oracle). Prefix
    filtering pays when the shingle document-frequency distribution has a
    rare tail (Zipfian real-world text): each doc's prefix is its RAREST
    shingles, so candidate counts collapse at high t. MEASURED on the
    synthetic bench corpus it never wins (sf0.1, 32 cores: t=0.7 count-join
    39.5 s vs prefix 98 s; t=0.8 32.8 s vs ~90 s): the tiny generator
    vocabulary makes every 5-gram hot, so prefixes stay hot and the df
    ordering is pure overhead — there is no crossover HERE, by corpus
    construction, not by algorithm. Both remain exact and oracle-checked;
    at 10^10 docs the production fuzzy path is MinHash-LSH either way, with
    exact joins reserved for oracle/audit slices."""
    sh = _shingles_df(spark, sf_dir).withColumn("grams", F.array_sort("grams"))
    all_posts = sh.select("doc_id", F.size("grams").alias("n_grams"),
                          F.explode("grams").alias("g"))
    gram_df = all_posts.groupBy("g").agg(F.count("*").alias("df"))
    n = F.col("n_grams")
    plen = F.greatest(n - F.ceil(n * F.lit(threshold)).cast("int") + 1, F.lit(1))
    posts = (
        all_posts.join(gram_df, "g")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.array_sort(F.collect_list(F.struct("df", "g"))).alias("ordered"),
        )
        .select(
            "doc_id", "n_grams",
            F.explode(
                F.slice(F.transform("ordered", lambda x: x["g"]), F.lit(1), plen)
            ).alias("g"),
        )
    )
    a, b = posts.alias("a"), posts.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J ≥ t needs t·max ≤ overlap ≤ min
            & (F.col("b.n_grams") >= F.col("a.n_grams") * threshold)
            & (F.col("a.n_grams") >= F.col("b.n_grams") * threshold),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    jac = inter / (F.size("grams_a") + F.size("grams_b") - inter)
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _minhash_sig_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → MinHash signature (array<long>, k=MINHASH_K).

    Fully vectorized two-stage split: gram hashing runs JVM-SIDE
    (``transform(grams, g -> crc32(encode(g)))`` — whole-stage codegen,
    bit-identical to zlib.crc32), then ONE numpy pass per Arrow batch builds
    all signatures at once: flatten every doc's crc array, apply the k=64
    splitmix64 permutations over the flat array, and segment-min with
    ``np.minimum.reduceat`` — zero per-row Python, zero per-gram Python
    (the round-1 per-row `[zlib.crc32(g) for g in grams]` list comprehension
    was 37% of the whole bench)."""
    sh = _shingles_df(spark, sf_dir)  # already spread across the cluster
    k = MINHASH_K
    seeds = np.arange(1, k + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    crcs = F.transform("grams", lambda g: F.crc32(F.encode(g, "utf-8")))
    # empty docs hash a single 0 gram (keeps every reduceat segment non-empty
    # and reproduces the round-1 crcs=[0] fallback exactly)
    crcs = F.when(F.size(crcs) == 0, F.array(F.lit(0).cast("long"))).otherwise(crcs)
    hashed = sh.select("doc_id", crcs.alias("crcs"))

    def sig_batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            arrs = [np.asarray(a, dtype=np.uint64) for a in pdf["crcs"]]
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            flat = np.concatenate(arrs)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sig = np.empty((len(lens), len(seeds)), dtype=np.int64)
            for p, seed in enumerate(seeds):
                hs = splitmix64(flat ^ seed)
                sig[:, p] = np.minimum.reduceat(hs, starts).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": list(sig)})

    return hashed.mapInPandas(sig_batches, "doc_id long, sig array<long>")


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

    # token hashing JVM-side (codegen'd): lower → whitespace split → drop
    # empties (mirrors Python str.split()) → crc32 per token
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    tok_crcs = F.transform(toks, lambda t: F.crc32(F.encode(t, "utf-8")))

    def sim_batches(it):
        """One numpy pass per Arrow batch: flatten all token hashes, then per
        bit position segment-sum the bit columns with np.add.reduceat — no
        per-row Python, no (n_tokens × 64) materialization. Bit-identical to
        the round-1 per-row loop (bit j of the hash lands at sim bit 63-j)."""
        for pdf in it:
            if not len(pdf):
                continue
            arrs = [np.asarray(a, dtype=np.uint64) for a in pdf["crcs"]]
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            nonempty = lens > 0
            sims = np.zeros(len(lens), dtype=np.uint64)
            if nonempty.any():
                flat = splitmix64(np.concatenate(arrs))
                ne_lens = lens[nonempty]
                starts = np.zeros(len(ne_lens), dtype=np.int64)
                np.cumsum(ne_lens[:-1], out=starts[1:])
                word = np.zeros(len(ne_lens), dtype=np.uint64)
                for j in range(64):
                    ones = np.add.reduceat((flat >> np.uint64(j)) & np.uint64(1), starts)
                    pos = (2 * ones.astype(np.int64) - ne_lens) > 0  # sum(2b-1) > 0
                    word |= pos.astype(np.uint64) << np.uint64(63 - j)
                sims[nonempty] = word
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash": sims.view(np.int64)}
            )

    sims = (
        d.select("doc_id", tok_crcs.alias("crcs"))
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
