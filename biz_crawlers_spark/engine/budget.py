"""Per-host priority-queue budget selection (north_rule P9).

The skew problem: ~80% of frontier URLs share one host (FIXTURES.md §2), so a
naive `row_number() OVER (PARTITION BY host ORDER BY …)` sends 80% of the
table through one sort partition. The fix is classic two-phase top-K:

  phase 1 — salted local heaps: repartition on (host, salt) where
            salt = pmod(url_key, S); each group keeps its local top-K with a
            numpy partial sort (the per-partition heap). The hot host's rows
            are spread over S groups; output ≤ S·K rows per host.
  phase 2 — exact per-host top-K over that reduced set with a window
            row_number (input is tiny: ≤ S·K per host).

Result is exactly the K smallest rows per host by the deterministic crawl
order key — identical to the unsalted single-sort answer, without the skewed
shuffle. ``K = per-host politeness budget per epoch``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biz_crawlers_spark.frontier.seed import ORDER_COLS


def select_per_host_topk(df: DataFrame, k: int, salt_buckets: int = 8) -> DataFrame:
    """K highest-priority (lowest order-key) pending rows per host."""
    cols = df.columns
    order_idx = [cols.index(c) for c in ORDER_COLS]

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= k:
            return pdf[cols]
        arr = pdf[ORDER_COLS].to_numpy()
        # lexicographic partial selection: full lexsort is O(n log n) but
        # only on this salt-bucket's slice; np.lexsort keys are reversed
        order = np.lexsort(tuple(arr[:, i] for i in reversed(range(len(ORDER_COLS)))))
        return pdf.iloc[order[:k]][cols]

    salt = F.pmod(F.col("url_key"), F.lit(salt_buckets))
    local = df.groupBy(F.col("host"), salt.alias("_salt")).applyInPandas(
        lambda key, pdf: local_topk(pdf), schema=df.schema
    )
    w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in ORDER_COLS])
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
