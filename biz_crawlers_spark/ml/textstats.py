"""Text analysis over the ``documents`` table — language-ID, quality scoring,
token counting, document fingerprinting.

Every function here is pure Spark column expressions (JVM, whole-stage
codegen — no UDF), and each has an equivalent DuckDB SQL oracle registered in
__spark_entry__.py. Regex dialects differ (Java regex vs RE2), so the oracle
text is written in RE2 syntax (e.g. \\x{4e00} instead of \\u4e00) — outputs
are verified equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table, spread across the cluster: the parquet is one
    row group, so an unspread scan runs every downstream regex in a single
    task (guide §2.5 input skew — repartition immediately after the read).
    The ~15 MB exchange is paid back ~30× by parallel regex evaluation;
    every consumer here ends in an orderBy, so results are unchanged."""
    par = spark.sparkContext.defaultParallelism
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(par, "doc_id")
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword pieces (letter runs / digit runs /
    single punctuation) per document."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+"), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(pieces).alias("n_pieces"),
        F.length("text").alias("n_chars_exact"),
    ).orderBy("doc_id")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class heuristic language ID: CJK ratio vs ASCII-letter
    ratio (the n-gram-free version that is exactly SQL-expressible)."""
    d = _docs(spark, sf_dir)
    n = F.length("text")
    cjk = F.length(F.regexp_replace(F.col("text"), r"[^一-鿿]", ""))
    ascii_l = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    pred = (
        F.when(n == 0, "und")
        .when(cjk / n > 0.25, "zh")
        .when(ascii_l / n > 0.4, "en")
        .otherwise("other")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        pred.alias("pred_lang"),
        F.round(cjk / n, 6).alias("cjk_ratio"),
        F.round(ascii_l / n, 6).alias("ascii_ratio"),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / digit / stopword heuristics (the standard
    pre-training quality gates, e.g. Gopher rules — Rae et al. 2021)."""
    d = _docs(spark, sf_dir)
    n = F.length("text")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_tok = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    digit = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
    score = (
        F.when((n >= 200) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when(stop / n_tok > 0.02, F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when(punct / n < 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when(digit / n < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return d.select(
        "doc_id",
        F.round(stop / n_tok, 6).alias("stopword_ratio"),
        F.round(punct / n, 6).alias("punct_ratio"),
        F.round(digit / n, 6).alias("digit_ratio"),
        F.round(score, 1).alias("quality"),
    ).orderBy("doc_id")


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of normalized text (exact identity) +
    min-shingle fingerprint (winnowing-style min over 8-char-gram md5s —
    Schleimer et al., SIGMOD'03)."""
    d = _docs(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    k = 8
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
        lambda i: F.md5(norm.substr(i, F.lit(k))),
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("exact_fp"),
        F.array_min(shingles).alias("min_shingle_fp"),
    ).orderBy("doc_id")
