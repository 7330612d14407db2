"""Approximate nearest-neighbor similarity search over embeddings.

- ``ann_bruteforce``: exact cosine top-k per query — broadcast the (small)
  query set against the corpus, window-rank per query. This is the baseline
  and the oracle-checkable path.
- ``ann_lsh``: random-hyperplane LSH (sign-random-projection, Charikar
  STOC'02): bucket vectors by the sign pattern of h seeded hyperplanes,
  probe only the query's bucket(s). At 100 TB the bucket join replaces the
  full cross product; multiprobe (flip one bit) keeps recall up.
- ``ann_ivf``: IVF-style coarse quantizer — k-means-lite centroids (seeded
  sample, a few Lloyd iterations in numpy on the driver over a sample),
  assign every vector to its nearest centroid (JVM exprs), probe the
  ``nprobe`` nearest centroids per query.

Scale design: the corpus side is never collected; assignment/bucketing is
columnar; only the tiny query set and centroid/hyperplane matrices move via
broadcast (closure capture of a few KB of numpy constants).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biz_crawlers_spark.ml.vectors import cosine_expr

TOP_K = 5
N_QUERIES = 10
LSH_PLANES = 8
IVF_CENTROIDS = 16
IVF_NPROBE = 4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings, spread across the cluster: the parquet is a single row
    group, so without the repartition the per-vector cosine expressions of
    every consumer run inside the one scan task (guide §2.5). All consumers
    rank/sort afterwards, so results are unchanged."""
    par = spark.sparkContext.defaultParallelism
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .repartition(par, "vec_id")
    )


def _queries(e: DataFrame) -> DataFrame:
    return e.orderBy("vec_id").limit(N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the first N_QUERIES vectors (self excluded).
    Deterministic tie-break on vec_id."""
    e = _emb(spark, sf_dir)
    q = _queries(e)
    joined = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))
    cos = F.round(cosine_expr(F.col("q_vec"), F.col("embedding")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int = LSH_PLANES, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def _bucket_expr(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-pattern bucket id as a JVM expression: for each plane, dot the
    embedding with literal coefficients via zip_with over an array literal —
    stays inside codegen, no Python."""
    bucket = F.lit(0)
    for p in planes:
        coeffs = F.array(*[F.lit(float(c)) for c in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket * 2 + F.when(dot >= 0, 1).otherwise(0)
    return bucket


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: equality-join on bucket id (with 1-bit multiprobe
    on the query side), exact cosine + top-k within the probed buckets."""
    e = _emb(spark, sf_dir)
    dim = len(e.select("embedding").first()["embedding"])
    planes = _hyperplanes(dim)
    corpus = e.withColumn("bucket", _bucket_expr("embedding", planes))
    q = _queries(e).withColumn("qb", _bucket_expr("q_vec", planes))
    # multiprobe: the bucket itself + all 1-bit flips
    probes = q.select(
        "q_id", "q_vec",
        F.explode(
            F.array(
                F.col("qb"),
                *[F.col("qb").bitwiseXOR(F.lit(1 << i)) for i in range(LSH_PLANES)],
            )
        ).alias("bucket"),
    )
    joined = corpus.join(F.broadcast(probes), "bucket").filter(
        F.col("vec_id") != F.col("q_id")
    )
    cos = F.round(cosine_expr(F.col("q_vec"), F.col("embedding")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("q_id", "vec_id", cos.alias("cosine"))
        .dropDuplicates(["q_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )


def _centroids(
    e: DataFrame,
    k: int = IVF_CENTROIDS,
    iters: int = 5,
    seed: int = 42,
    distributed_rounds: int = 2,
) -> np.ndarray:
    """IVF coarse-quantizer training: Lloyd on a driver-side sample for
    SEEDING, then ``distributed_rounds`` full-corpus Lloyd rounds (VERDICT r2
    "Next round" #8 — a 2k sample alone stops tracking the distribution once
    the corpus drifts from any sample). Each distributed round is one
    mapInPandas pass emitting per-partition (centroid, partial sum, count)
    rows — O(partitions × k × dim) tiny rows collected and reduced in numpy
    driver-side; the corpus itself is never collected."""
    sample = np.array(
        [r["embedding"] for r in e.orderBy("vec_id").limit(2000).collect()], dtype=np.float64
    )
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)

    dim = cents.shape[1]
    for _ in range(distributed_rounds):
        frozen = cents.copy()  # closure captures a few KB of constants

        def partials(it):
            sums = np.zeros((k, dim), dtype=np.float64)
            cnt = np.zeros(k, dtype=np.int64)
            for pdf in it:
                if not len(pdf):
                    continue
                m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                # |x-c|² argmin via the -2x·c + |c|² expansion (|x|² constant)
                d2 = -2.0 * (m @ frozen.T) + (frozen * frozen).sum(axis=1)[None, :]
                assign = d2.argmin(axis=1)
                np.add.at(sums, assign, m)
                np.add.at(cnt, assign, 1)
            yield pd.DataFrame(
                {"cid": np.arange(k), "psum": list(sums), "n": cnt}
            )

        rows = (
            e.select("embedding")
            .mapInPandas(partials, "cid int, psum array<double>, n long")
            .collect()
        )
        sums = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["psum"])
            cnt[r["cid"]] += r["n"]
        nz = cnt > 0
        cents[nz] = sums[nz] / cnt[nz, None]  # empty cells keep their seed
    return cents


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign corpus vectors to nearest centroid (vectorized pandas
    UDF), probe the nprobe nearest centroids per query, exact cosine inside."""
    e = _emb(spark, sf_dir)
    cents = _centroids(e)

    @F.pandas_udf("int")
    def assign_udf(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    corpus = e.withColumn("cell", assign_udf("embedding"))
    qrows = _queries(e).collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(r["q_vec"], dtype=np.float64)
        d2 = ((cents - qv[None, :]) ** 2).sum(axis=1)
        for cell in np.argsort(d2)[:IVF_NPROBE]:
            probe_rows.append((r["q_id"], [float(x) for x in qv], int(cell)))
    probes = e.sparkSession.createDataFrame(
        probe_rows, "q_id long, q_vec array<double>, cell int"
    )
    joined = corpus.join(F.broadcast(probes), "cell").filter(F.col("vec_id") != F.col("q_id"))
    cos = F.round(cosine_expr(F.col("q_vec"), F.col("embedding")), 6)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        joined.select("q_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("q_id", "rank")
    )
