"""Salted two-phase top-K == unsalted exact top-K (the north_rule priority
queue must be a pure optimization, never a semantics change)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biz_crawlers_spark.engine.budget import select_per_host_topk
from biz_crawlers_spark.frontier.seed import FRONTIER_DDL, ORDER_COLS


def _mk_frontier(spark, n=500, hosts=3):
    rows = []
    for i in range(n):
        host = f"h{0 if i % 10 < 8 else (i % 10) - 7}.t"  # 80% on h0
        rows.append(
            (i * 7919 - n, f"https://{host}/u{i}", host, i % 14, i % 3, 0,
             i % 97, "pending", 0, 0, 0)
        )
    return spark.createDataFrame(rows, FRONTIER_DDL)


def test_topk_matches_exact(spark):
    df = _mk_frontier(spark)
    for k in (1, 5, 40):
        got = select_per_host_topk(df, k, salt_buckets=4)
        w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in ORDER_COLS])
        exact = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        g = sorted((r["host"], r["url_key"]) for r in got.collect())
        e = sorted((r["host"], r["url_key"]) for r in exact.collect())
        assert g == e, f"k={k}"


def test_topk_small_groups_passthrough(spark):
    df = _mk_frontier(spark, n=20)
    got = select_per_host_topk(df, 1000, salt_buckets=8)
    assert got.count() == 20
