"""Round-3 operator additions: X1 report-ID extraction (oracle-checked
in-test vs DuckDB), the high-threshold Jaccard pair (count-join vs PPJOIN
prefix — identical output), and distributed IVF centroid training recall."""

from __future__ import annotations

import duckdb
import pytest

from biz_crawlers_spark import queries as Q
from biz_crawlers_spark.ml import dedup as D
from biz_crawlers_spark.ml import similarity as S

SF = "/root/testdata/sf0.001"


def test_x1_report_ids_matches_duckdb(spark):
    got = [(r["doc_id"], r["company_id"]) for r in Q.x1_report_ids(spark, SF).collect()]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = [tuple(r) for r in con.sql(Q.X1_SQL).fetchall()]
    assert got == want
    # every ID is 8 digits; the duplicate stamp was uniqued (≤2 per doc)
    assert all(len(c) == 8 and c.isdigit() for _, c in got)
    from collections import Counter

    per_doc = Counter(d for d, _ in got)
    assert max(per_doc.values()) <= 2 and len(got) > 0


def test_x1_preg_match_all_semantics(spark):
    """Non-overlapping left-to-right matching + uniqueness, exactly
    preg_match_all('/\\d{8}/') + array_unique (GCISCrawler.php:174-208):
    a 10-digit run yields only its first 8 digits; repeats collapse."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("0123456789 zz 11112222 and 11112222 but 1234567",)], "body string"
    )
    ids = df.select(
        F.array_distinct(
            F.regexp_extract_all("body", F.lit(r"\d{8}"), 0)
        ).alias("ids")
    ).first()["ids"]
    assert ids == ["01234567", "11112222"]


def test_jaccard_t07_variants_identical(spark):
    a = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.dedup_ngram_jaccard(spark, SF, threshold=0.7).collect()
    }
    b = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.dedup_ngram_jaccard_prefix(spark, SF, threshold=0.7).collect()
    }
    assert a == b
    # the t=0.7 set is a subset of the t=0.5 set
    lo = {
        (r["id_a"], r["id_b"])
        for r in D.dedup_ngram_jaccard(spark, SF, threshold=0.5).collect()
    }
    assert {(x, y) for x, y, _ in a} <= lo


@pytest.mark.parametrize("rounds", [0, 2])
def test_ivf_distributed_centroids_recall(spark, rounds):
    """Distributed Lloyd rounds must not degrade recall vs bruteforce;
    rounds=0 is the old sample-only quantizer (the baseline)."""
    from pyspark.sql import functions as F  # noqa: F401

    e = S._emb(spark, SF)
    cents = S._centroids(e, distributed_rounds=rounds)
    assert cents.shape[0] == S.IVF_CENTROIDS
    truth = {
        (r["q_id"], r["vec_id"]) for r in S.ann_bruteforce(spark, SF).collect()
    }
    import biz_crawlers_spark.ml.similarity as sim

    orig = sim._centroids
    sim._centroids = lambda df, **kw: cents
    try:
        got = {(r["q_id"], r["vec_id"]) for r in S.ann_ivf(spark, SF).collect()}
    finally:
        sim._centroids = orig
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"
