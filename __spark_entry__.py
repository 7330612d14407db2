"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke at sf0.001.
``queries()``   — one entry per implemented operator family (SURVEY.md §2 +
                  the training-data ops); each callable (spark, sf_dir) → DataFrame.
``oracle_sql()``— DuckDB-equivalent SQL per query. Omitted for the genuinely
                  non-SQL-expressible ops (probabilistic LSH candidate
                  generation, the crawl engine itself, binary decode) — the
                  driver records a weaker rows-only check for those.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biz_crawlers_spark import queries as Q  # noqa: E402
from biz_crawlers_spark.ml import dedup as D  # noqa: E402
from biz_crawlers_spark.ml import multimodal as MM  # noqa: E402
from biz_crawlers_spark.ml import similarity as S  # noqa: E402
from biz_crawlers_spark.ml import textstats as TX  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.flagship_pricing_summary(spark, "/root/testdata/sf0.001")


def crawl_epoch_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl engine as a query: seed the fixture web, crawl to
    drain, aggregate the committed images table (deterministic per seed)."""
    from pyspark.sql import functions as F

    from biz_crawlers_spark.engine.crawl import CrawlEngine
    from biz_crawlers_spark.fixtures.web import company_seed, school_seed
    from biz_crawlers_spark.politeness.budget import PolitenessBudget

    wd = tempfile.mkdtemp(prefix="crawlq_")
    eng = CrawlEngine(
        spark, wd, web_params={"seed": 42, "n_hosts": 4},
        budget=PolitenessBudget(time_scale=0.0), per_host_budget=10_000,
        bloom_shards=4, bloom_bits=1 << 16, table_buckets=4,
    )
    eng.seed_from_urls(company_seed(114, 3) + school_seed(base_priority=1000))
    eng.run(max_epochs=20)
    img = eng.images.read()
    return (
        img.groupBy("fmt")
        .agg(F.count("*").alias("n"), F.round(F.avg(F.col("w") * F.col("h")), 2).alias("avg_px"))
        .orderBy("fmt")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational / expression operators (SURVEY.md §2.5-2.6)
        "flagship_pricing_summary": Q.flagship_pricing_summary,
        "r1_filter_contains": Q.r1_filter_contains,
        "r2_point_lookup": Q.r2_point_lookup,
        "r3_union_distinct": Q.r3_union_distinct,
        "r4_group_consolidate": Q.r4_group_consolidate,
        "r5_r7_sort_limit_offset": Q.r5_r7_sort_limit_offset,
        "r6_latest_pick": Q.r6_latest_pick,
        "p9_topk_per_group": Q.p9_topk_per_group,
        "r8_merge_overlay": Q.r8_merge_overlay,
        "r10_distinct_count": Q.r10_distinct_count,
        "r11_anti_join": Q.r11_anti_join,
        "r11_semi_join": Q.r11_semi_join,
        "x5_shareholder_flatten": Q.x5_shareholder_flatten,
        "x9_roc_date_roundtrip": Q.x9_roc_date_roundtrip,
        "x12_clean_battery": Q.x12_clean_battery,
        "x16_zero_pad": Q.x16_zero_pad,
        "x1_report_ids": Q.x1_report_ids,
        "q_join_revenue_per_nation": Q.q_join_revenue_per_nation,
        "q_rollup_revenue": Q.q_rollup_revenue,
        "w1_running_sum": Q.w1_running_sum,
        "events_tumbling_window": Q.events_tumbling_window,
        # text analysis (documents)
        "token_stats": TX.token_stats,
        "lang_id": TX.lang_id,
        "quality_score": TX.quality_score,
        "doc_fingerprint": TX.doc_fingerprint,
        # dedup family
        "dedup_exact": D.dedup_exact,
        "dedup_ngram_jaccard": D.dedup_ngram_jaccard,
        "dedup_ngram_jaccard_prefix": D.dedup_ngram_jaccard_prefix,
        # the high-threshold regime (both strategies, same oracle — the
        # measured crossover where prefix filtering starts to pay)
        "dedup_ngram_jaccard_t07": lambda sp, sf: D.dedup_ngram_jaccard(
            sp, sf, threshold=0.7
        ),
        "dedup_ngram_jaccard_prefix_t07": lambda sp, sf: D.dedup_ngram_jaccard_prefix(
            sp, sf, threshold=0.7
        ),
        "dedup_minhash_lsh": D.dedup_minhash_lsh,  # rows-only (probabilistic)
        "dedup_simhash": D.dedup_simhash,  # rows-only (hash fn not in SQL)
        "dedup_embedding_cosine": D.dedup_embedding_cosine,
        # similarity search (embeddings)
        "ann_bruteforce": S.ann_bruteforce,
        "ann_lsh": S.ann_lsh,  # rows-only (probabilistic buckets)
        "ann_ivf": S.ann_ivf,  # rows-only (learned centroids)
        # multimodal plumbing
        "multimodal_image_stats": MM.multimodal_image_stats,  # rows-only (binary decode)
        # the crawl engine end-to-end
        "crawl_epoch_images": crawl_epoch_images,  # rows-only (stateful engine)
    }


_STOP = "('the','a','of','and','to','in','is','it','for','on')"

TOKEN_SQL = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS n_pieces,
       length(text) AS n_chars_exact
FROM documents ORDER BY doc_id
"""

LANG_SQL = r"""
SELECT doc_id, lang AS lang_label,
  CASE WHEN length(text) = 0 THEN 'und'
       WHEN length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) * 1.0
            / length(text) > 0.25 THEN 'zh'
       WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
            / length(text) > 0.4 THEN 'en'
       ELSE 'other' END AS pred_lang,
  round(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) * 1.0
        / length(text), 6) AS cjk_ratio,
  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
        / length(text), 6) AS ascii_ratio
FROM documents ORDER BY doc_id
"""

QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id, text, length(text) AS n,
         string_split_regex(trim(lower(text)), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
  round(len(list_filter(toks, x -> x IN {_STOP})) * 1.0 / len(toks), 6)
    AS stopword_ratio,
  round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / n, 6)
    AS punct_ratio,
  round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / n, 6)
    AS digit_ratio,
  round((CASE WHEN n BETWEEN 200 AND 20000 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN len(list_filter(toks, x -> x IN {_STOP})) * 1.0 / len(toks)
              > 0.02 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / n
              < 0.1 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / n
              < 0.2 THEN 1.0 ELSE 0.0 END), 1) AS quality
FROM t ORDER BY doc_id
"""

FP_SQL = r"""
WITH t AS (
  SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm FROM documents
)
SELECT doc_id, md5(norm) AS exact_fp,
  list_min(list_transform(generate_series(1, greatest(length(norm) - 7, 1)),
           i -> md5(substring(norm, i, 8)))) AS min_shingle_fp
FROM t ORDER BY doc_id
"""

DEDUP_EXACT_SQL = r"""
WITH d AS (
  SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS content_fp
  FROM documents
),
c AS (SELECT content_fp, min(doc_id) AS canonical_id FROM d GROUP BY content_fp)
SELECT d.doc_id, c.canonical_id, d.doc_id <> c.canonical_id AS is_dup
FROM d JOIN c USING (content_fp) ORDER BY doc_id
"""

def _jaccard_sql(t: float) -> str:
    return rf"""
WITH d AS (
  SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS norm FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(length(norm) - 4, 1)),
                       i -> substring(norm, i, 5))) AS grams
  FROM d
),
sizes AS (SELECT doc_id, len(grams) AS n_grams FROM sh),
posts AS (SELECT doc_id, unnest(grams) AS g FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM posts a JOIN posts b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter * 1.0 / (sa.n_grams + sb.n_grams - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(inter * 1.0 / (sa.n_grams + sb.n_grams - inter), 6) >= {t}
ORDER BY id_a, id_b
"""


JACCARD_SQL = _jaccard_sql(0.5)

COSDUP_SQL = r"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
    AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45
ORDER BY id_a, id_b
"""

ANN_SQL = r"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
q AS (SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 10),
j AS (
  SELECT q.q_id, e.vec_id,
         round(list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6)
           AS cosine
  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM j
)
SELECT q_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5 ORDER BY q_id, rank
"""


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_pricing_summary": Q.FLAGSHIP_SQL,
        "r1_filter_contains": Q.R1_SQL,
        "r2_point_lookup": Q.R2_SQL,
        "r3_union_distinct": Q.R3_SQL,
        "r4_group_consolidate": Q.R4_SQL,
        "r5_r7_sort_limit_offset": Q.R5_R7_SQL,
        "r6_latest_pick": Q.R6_SQL,
        "p9_topk_per_group": Q.P9_SQL,
        "r8_merge_overlay": Q.R8_SQL,
        "r10_distinct_count": Q.R10_SQL,
        "r11_anti_join": Q.R11_SQL,
        "r11_semi_join": Q.R11_SEMI_SQL,
        "x5_shareholder_flatten": Q.X5_SQL,
        "x9_roc_date_roundtrip": Q.X9_SQL,
        "x12_clean_battery": Q.X12_SQL,
        "x16_zero_pad": Q.X16_SQL,
        "x1_report_ids": Q.X1_SQL,
        "q_join_revenue_per_nation": Q.JOIN_SQL,
        "q_rollup_revenue": Q.ROLLUP_SQL,
        "w1_running_sum": Q.W1_SQL,
        "events_tumbling_window": Q.EVENTS_SQL,
        "token_stats": TOKEN_SQL,
        "lang_id": LANG_SQL,
        "quality_score": QUALITY_SQL,
        "doc_fingerprint": FP_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": JACCARD_SQL,
        "dedup_ngram_jaccard_prefix": JACCARD_SQL,  # identical output by design
        "dedup_ngram_jaccard_t07": _jaccard_sql(0.7),
        "dedup_ngram_jaccard_prefix_t07": _jaccard_sql(0.7),
        "dedup_embedding_cosine": COSDUP_SQL,
        "ann_bruteforce": ANN_SQL,
    }
