"""Frontier table schema + seed construction.

The frontier is the distributed analog of the reference's org×type×month
enumeration loops (GCISCrawler.php:46-66, :221-265) plus the retry state
that lives in PHP control flow. Crawl order is made explicit as a sort key
(priority, org_idx, type_idx, page, url_key) — per host, this reproduces the
reference's array-insertion-order iteration (SURVEY.md §7 fidelity).

``not_before`` is epoch-denominated: a row re-enqueued after a failed epoch
becomes eligible at ``epoch >= not_before`` (the distributed re-expression of
in-process backoff sleeps; within-epoch throttle retries happen in-worker to
preserve reference ordering — see engine/stage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biz_crawlers_spark.fixtures.web import SeedURL
from biz_crawlers_spark.frontier.canonical import canonicalize, url_key

FRONTIER_DDL = (
    "url_key long, canonical_url string, host string, org_idx int, type_idx int, "
    "page int, priority int, state string, retries int, not_before int, "
    "discovered_epoch int"
)

SEEN_DDL = "url_key long, seen_epoch int"

IMAGES_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, url_key long, seq int, epoch int"
)

# The full detail-record surface (X4-X8): names are always-array (X19 union
# normalize), shareholders/managers/capital are JSON-encoded nested lists
# (query them typed via queries.records_nested / F.from_json), parse_mode
# records whether the DOM grammar or the X8 regex fallback produced the row.
# ``corrupt`` is a GENERATED column (SnapTable derived expr, recomputed on
# every write by any caller) — the D7 corrupted-record invalidation
# (DetailCrawler.php:1172-1210) reads it via manifest-stats pruning instead
# of try_parse_json-scanning the table every TTL epoch.
RECORDS_DDL = (
    "entity_id string, entity_name string, entity_names string, address string, "
    "change_date string, biz_items string, shareholders string, managers string, "
    "capital string, parse_mode string, category string, url_key long, epoch int, "
    "corrupt boolean"
)

RECORDS_CORRUPT_EXPR = (
    "biz_items IS NOT NULL AND try_parse_json(biz_items) IS NULL"
)

LINEAGE_DDL = (
    "epoch int, partition_id int, host string, fetched long, ok long, deduped long, "
    "failed long, retried long, robots_denied long, not_found long, images long, "
    "cache_hits long"
)

# K5 raw-page archive (status-tagged bodies, DetailCrawler.php:1155-1170);
# the D9 routing join re-parses from here instead of re-fetching
PAGES_DDL = "url_key long, status string, body binary, epoch int"

ORDER_COLS = ["priority", "org_idx", "type_idx", "page", "url_key"]


def seed_rows(seeds: list[SeedURL], epoch: int = 0) -> list[tuple]:
    out = []
    for s in seeds:
        cu = canonicalize(s.url)
        out.append(
            (url_key(s.url), cu, s.host, s.org_idx, s.type_idx, s.page, s.priority,
             "pending", 0, 0, epoch)
        )
    return out


def seed_df(spark: SparkSession, seeds: list[SeedURL], epoch: int = 0) -> DataFrame:
    return spark.createDataFrame(seed_rows(seeds, epoch), FRONTIER_DDL)


def synthetic_seed_df(
    spark: SparkSession, n: int, n_hosts: int = 64, start_yyymm: int = 10001,
    start_id: int = 0,
) -> DataFrame:
    """Large-scale seed generation entirely in Spark expressions (no driver
    loop, no Python UDF) — used by the bench to build 10^5–10^7-row
    frontiers. Grammar matches fixtures.web company reports; hosts use the
    same skewed-assignment formula as fixtures.web.host_for.

    ``start_id`` offsets the id range: (yyymm, org, typ) is injective in id,
    so disjoint id ranges yield disjoint URL sets — how the sustained
    multi-epoch campaign seeds FRESH URLs every epoch without driver-side
    generation."""
    base = spark.range(start_id, start_id + n)
    org = F.format_string("O%02d", (F.col("id") % 14).cast("int"))
    typ = F.element_at(F.array(F.lit("est"), F.lit("chg"), F.lit("dis")),
                       ((F.col("id") / 14) % 3).cast("int") + 1)
    yyymm = F.format_string("%05d", (F.lit(start_yyymm) + (F.col("id") / 42)).cast("int"))
    fname = F.concat(yyymm, org, typ, F.lit(".pdf"))
    r = F.pmod(F.xxhash64(fname), F.lit(10))
    spread = F.pmod(
        F.xxhash64(F.concat(fname, F.lit("#h"))), F.lit(max(n_hosts - 1, 1))
    )
    host = F.when(
        (r < 8) | (F.lit(n_hosts) == 1), F.lit("h0.fixture.test")
    ).otherwise(
        F.format_string("h%d.fixture.test", (F.lit(1) + spread).cast("int"))
    )
    blocked = F.pmod(F.xxhash64(fname), F.lit(31)) == 0
    path = F.when(blocked, F.lit("/blocked/report")).otherwise(F.lit("/report"))
    url = F.concat(
        F.lit("https://"), host, path, F.lit("?fileName="), fname, F.lit("&subPath="), yyymm
    )
    return base.select(
        F.xxhash64(url).alias("url_key"),
        url.alias("canonical_url"),
        host.alias("host"),
        (F.col("id") % 14).cast("int").alias("org_idx"),
        ((F.col("id") / 14) % 3).cast("int").alias("type_idx"),
        F.lit(0).alias("page"),
        (F.col("id") % 42).cast("int").alias("priority"),
        F.lit("pending").alias("state"),
        F.lit(0).alias("retries"),
        F.lit(0).alias("not_before"),
        F.lit(0).alias("discovered_epoch"),
    )
