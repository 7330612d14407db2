"""Rare-tail (Zipfian) fixture for PPJOIN prefix filtering (VERDICT r3 #8).

The synthetic sf corpora have a tiny generator vocabulary — every 5-gram is
hot, prefixes cannot prune, and dedup_ngram_jaccard_prefix NEVER beats the
fused-length-filter count join there (measured round 3: t=0.7 at sf0.1 was
98 s prefix vs 39.5 s count-join). That is a corpus property; the WWW'08
claim (Xiao et al.: prefixes made of globally-RARE tokens collapse the
candidate set at high thresholds) needs a corpus with a rare tail to be
demonstrated rather than cited.

This tool builds one — documents drawn from a Zipf(a) word distribution
over a large vocabulary, with a seeded fraction of near-duplicate pairs —
then times both exact strategies at t=0.7 on it and verifies they return
the IDENTICAL pair set. Prints one JSON line; PLANS.md links the recorded
run.

Usage: python tools/bench_prefix_zipf.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ZIPF_A = 1.15
VOCAB = 30_000
DOC_WORDS = 80
DUP_FRACTION = 0.1  # fraction of docs that are near-dup mutations of another
MUTATE_WORDS = 6  # words replaced in a near-dup (keeps J comfortably >= 0.7)


def zipf_corpus_rows(n_docs: int, seed: int = 42) -> list[tuple[int, str]]:
    """Deterministic Zipfian corpus: each doc is DOC_WORDS words sampled
    with P(rank r) ∝ r^-a over a VOCAB-word vocabulary (words are distinct
    5-letter codes so rare words yield rare character 5-grams). The last
    DUP_FRACTION of docs are near-duplicates of earlier docs with
    MUTATE_WORDS random word substitutions."""
    rng = np.random.Generator(np.random.PCG64(seed))
    # bounded Zipf via inverse-CDF over the finite vocabulary (np.zipf is
    # unbounded); rank 0 is the hottest word
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    p = ranks ** -ZIPF_A
    p /= p.sum()
    words = np.array(
        ["".join(chr(97 + int(c, 26)) for c in np.base_repr(i, 26).zfill(4)) for i in range(VOCAB)]
    )
    n_base = int(n_docs * (1 - DUP_FRACTION))
    docs: list[np.ndarray] = []
    for _ in range(n_base):
        docs.append(rng.choice(VOCAB, size=DOC_WORDS, p=p))
    for i in range(n_docs - n_base):
        src = docs[int(rng.integers(0, n_base))].copy()
        idx = rng.choice(DOC_WORDS, size=MUTATE_WORDS, replace=False)
        src[idx] = rng.choice(VOCAB, size=MUTATE_WORDS, p=p)
        docs.append(src)
    return [(i, " ".join(words[d])) for i, d in enumerate(docs)]


def write_zipf_corpus(spark, n_docs: int, dest_dir: str, seed: int = 42) -> str:
    rows = zipf_corpus_rows(n_docs, seed)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(dest_dir, "documents.parquet"))
    return dest_dir


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    from biz_crawlers_spark.ml import dedup as D
    from biz_crawlers_spark.session import get_spark

    spark = get_spark(cores=cores, shuffle_partitions=cores, app="prefix_zipf")
    tmp = tempfile.mkdtemp(prefix="zipf_corpus_")
    try:
        write_zipf_corpus(spark, n_docs, tmp)
        t = 0.7
        # warmup at 1/8 scale: same plan shapes, JIT/codegen compiled
        warm = tempfile.mkdtemp(prefix="zipf_warm_")
        try:
            write_zipf_corpus(spark, max(n_docs // 8, 100), warm, seed=7)
            for fn in (D.dedup_ngram_jaccard, D.dedup_ngram_jaccard_prefix):
                fn(spark, warm, threshold=t).write.format("noop").mode(
                    "overwrite"
                ).save()
        finally:
            shutil.rmtree(warm, ignore_errors=True)

        t0 = time.time()
        D.dedup_ngram_jaccard(spark, tmp, threshold=t).write.format("noop").mode(
            "overwrite"
        ).save()
        count_join_sec = round(time.time() - t0, 2)
        t0 = time.time()
        D.dedup_ngram_jaccard_prefix(spark, tmp, threshold=t).write.format(
            "noop"
        ).mode("overwrite").save()
        prefix_sec = round(time.time() - t0, 2)

        pairs_cj = {
            (r["id_a"], r["id_b"])
            for r in D.dedup_ngram_jaccard(spark, tmp, threshold=t).collect()
        }
        pairs_px = {
            (r["id_a"], r["id_b"])
            for r in D.dedup_ngram_jaccard_prefix(spark, tmp, threshold=t).collect()
        }
        assert pairs_cj == pairs_px, "strategies disagree on the Zipfian corpus"
        print(
            json.dumps(
                {
                    "corpus": "zipf",
                    "zipf_a": ZIPF_A,
                    "vocab": VOCAB,
                    "n_docs": n_docs,
                    "threshold": t,
                    "cores": cores,
                    "count_join_sec": count_join_sec,
                    "prefix_sec": prefix_sec,
                    "pairs": len(pairs_cj),
                    "prefix_wins": prefix_sec < count_join_sec,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
