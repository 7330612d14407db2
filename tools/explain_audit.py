"""Plan audit: print formatted physical plans for the headline queries and
grep them for the properties that matter at 100 TB — parquet filter
pushdown, column pruning (ReadSchema), broadcast joins on dims, whole-stage
codegen coverage, shuffle (Exchange) counts. Findings land in PLANS.md."""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biz_crawlers_spark import queries as Q  # noqa: E402
from biz_crawlers_spark.ml import dedup as D  # noqa: E402
from biz_crawlers_spark.ml import textstats as TX  # noqa: E402
from biz_crawlers_spark.session import get_spark  # noqa: E402

AUDIT = {
    "flagship_pricing_summary": Q.flagship_pricing_summary,
    "q_join_revenue_per_nation": Q.q_join_revenue_per_nation,
    "r1_filter_contains": Q.r1_filter_contains,
    "r6_latest_pick": Q.r6_latest_pick,
    "r11_anti_join": Q.r11_anti_join,
    "w1_running_sum": Q.w1_running_sum,
    "token_stats": TX.token_stats,
    "dedup_ngram_jaccard": D.dedup_ngram_jaccard,
    "dedup_exact": D.dedup_exact,
    "x1_report_ids": Q.x1_report_ids,
    "dedup_minhash_lsh": D.dedup_minhash_lsh,
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=4, shuffle_partitions=4, app="explain-audit")
    for name, fn in AUDIT.items():
        txt = plan_text(fn(spark, sf_dir))
        n_exchange = len(re.findall(r"\bExchange\b", txt))
        n_bhj = len(re.findall(r"BroadcastHashJoin", txt))
        n_smj = len(re.findall(r"SortMergeJoin", txt))
        n_wsc = len(re.findall(r"WholeStageCodegen", txt))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", txt)
        schemas = re.findall(r"ReadSchema: ([^\n]*)", txt)
        print(f"\n===== {name} =====")
        print(f"exchanges={n_exchange} broadcast_joins={n_bhj} sortmerge_joins={n_smj} "
              f"codegen_stages={n_wsc}")
        for p in pushed:
            print(f"  PushedFilters: [{p[:120]}]")
        for s in schemas:
            print(f"  ReadSchema: {s[:160]}")
        if os.environ.get("FULL"):
            print(txt)


if __name__ == "__main__":
    main()
