"""Relational query surface over /root/testdata — one entry per relational/
expression operator family from SURVEY.md §2.5-2.6, each with a DuckDB
oracle (registered in __spark_entry__.py).

Float aggregates are rounded explicitly (sums to 2 dp, ratios to 6 dp) so
Spark-vs-DuckDB summation-order ulp differences can't break value-hash
comparison. Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------- flagship: TPC-H-Q1-style pricing summary ----------

def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


FLAGSHIP_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------- R1 substring filter / R2 point lookup ----------

def r1_filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.lower(F.col("p_type")).contains("med"))
        .select("p_partkey", "p_type", "p_brand")
        .orderBy("p_partkey")
    )


R1_SQL = """
SELECT p_partkey, p_type, p_brand FROM part
WHERE contains(lower(p_type), 'med') ORDER BY p_partkey
"""


def r2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") == 42).select("c_custkey", "c_name", "c_mktsegment")


R2_SQL = "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 42"


# ---------- R3 union / R4 group-consolidate / R5+R7 sort+limit/offset ----------

def r3_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return a.union(b).distinct().orderBy("c_custkey")


R3_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
ORDER BY c_custkey
"""


def r4_group_consolidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


R4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def r5_r7_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(50)
    )


R5_R7_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 10
"""


# ---------- R6/X3 latest-pick / P9 top-k per group ----------

def r6_latest_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — the latest-by-date pick of
    DetailCrawler.php:371-430 (arsort + first)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


R6_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1 ORDER BY o_custkey
"""


def p9_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", F.round("value", 6).alias("value"))
        .orderBy("event_type", "rank")
    )


P9_SQL = """
SELECT event_type, rank, event_id, round(value, 6) AS value FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY value DESC, event_id ASC) AS rank
  FROM events
) WHERE rank <= 3 ORDER BY event_type, rank
"""


# ---------- R8/R9 merge-upsert (full-outer-join + overlay) ----------

def r8_merge_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE rewrite (R8) as a pure query: base customers overlaid with
    an updates set (field overlay, new wins when present — crawl-others.php
    :186-204); updates also insert synthetic new keys."""
    c = _t(spark, sf_dir, "customer")
    upd = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("u_key"), F.lit("VIP").alias("u_segment")
    )
    ins = c.select((F.col("c_custkey") + 1_000_000).alias("u_key"),
                   F.lit("NEW").alias("u_segment")).filter(F.col("u_key") % 100 == 0)
    u = upd.union(ins)
    j = c.join(u, c.c_custkey == u.u_key, "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("u_key")).alias("id"),
        F.coalesce(F.col("u_segment"), F.col("c_mktsegment")).alias("segment"),
        F.col("c_name").alias("name"),
    ).orderBy("id")


R8_SQL = """
WITH u AS (
  SELECT c_custkey AS u_key, 'VIP' AS u_segment FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT c_custkey + 1000000 AS u_key, 'NEW' AS u_segment FROM customer
  WHERE (c_custkey + 1000000) % 100 = 0
)
SELECT coalesce(c_custkey, u_key) AS id,
       coalesce(u_segment, c_mktsegment) AS segment,
       c_name AS name
FROM customer FULL OUTER JOIN u ON c_custkey = u_key
ORDER BY id
"""


# ---------- R10 distinct counts / R11 semi+anti joins ----------

def r10_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("n_name")
    )


R10_SQL = """
SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
       count(DISTINCT c_mktsegment) AS n_segments
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def r11_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (the existence-check / skip-if-seen shape,
    D2/R11: LEFT ANTI against the target table)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


R11_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def r11_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o.filter(F.col("o_totalprice") > 400000), c.c_custkey == o.o_custkey,
               "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


R11_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_totalprice > 400000)
ORDER BY c_custkey
"""


# ---------- X9 ROC dates / X16 zero-pad ----------

def x9_roc_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-calendar round trip (X9: +1911 conversion, regex parse —
    GCISCrawler.php:367-400, DetailCrawler.php:586-592)."""
    o = _t(spark, sf_dir, "orders")
    roc = F.concat(
        (F.year("o_orderdate") - 1911).cast("string"), F.lit("年"),
        F.month("o_orderdate").cast("string"), F.lit("月"),
        F.dayofmonth("o_orderdate").cast("string"), F.lit("日"),
    )
    y = F.regexp_extract(F.col("roc_str"), r"(\d+)年", 1).cast("int") + 1911
    m = F.regexp_extract(F.col("roc_str"), r"年(\d+)月", 1).cast("int")
    d = F.regexp_extract(F.col("roc_str"), r"月(\d+)日", 1).cast("int")
    return (
        o.filter(F.col("o_orderkey") <= 200)
        .select("o_orderkey", roc.alias("roc_str"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orig_date"))
        .withColumn("parsed_date", F.date_format(F.make_date(y, m, d), "yyyy-MM-dd"))
        .orderBy("o_orderkey")
    )


X9_SQL = r"""
WITH base AS (
  SELECT o_orderkey,
         (year(o_orderdate) - 1911)::VARCHAR || '年' ||
         month(o_orderdate)::VARCHAR || '月' ||
         day(o_orderdate)::VARCHAR || '日' AS roc_str,
         strftime(o_orderdate, '%Y-%m-%d') AS orig_date
  FROM orders WHERE o_orderkey <= 200
)
SELECT o_orderkey, roc_str, orig_date,
       strftime(make_date(regexp_extract(roc_str, '(\d+)年', 1)::INT + 1911,
                          regexp_extract(roc_str, '年(\d+)月', 1)::INT,
                          regexp_extract(roc_str, '月(\d+)日', 1)::INT),
                '%Y-%m-%d') AS parsed_date
FROM base ORDER BY o_orderkey
"""


def x16_zero_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_id"),
            (F.length(F.lpad(F.col("c_custkey").cast("string"), 8, "0")) == 8).alias(
                "valid"
            ),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


X16_SQL = """
SELECT c_custkey, lpad(c_custkey::VARCHAR, 8, '0') AS padded_id,
       length(lpad(c_custkey::VARCHAR, 8, '0')) = 8 AS valid
FROM customer ORDER BY c_custkey LIMIT 500
"""


# ---------- X5 nested flatten / X12 cleaning battery ----------

# Typed view over the records table's JSON-encoded nested columns — how a
# consumer queries shareholders/managers/capital (engine/stage.py populates
# them; schemas mirror DetailCrawler.php:604-695, :783-829)
SHAREHOLDERS_SCHEMA = (
    "array<struct<seq:string,title:string,name:string,"
    "legal_id:string,legal_name:string,stake:string>>"
)
MANAGERS_SCHEMA = (
    "array<struct<seq:string,name:string,"
    "date:struct<year:int,month:int,day:int>>>"
)
CAPITAL_SCHEMA = "array<struct<name:string,amount:long>>"


def records_nested(records: DataFrame) -> DataFrame:
    """records with shareholders/managers/capital parsed into typed arrays
    (from_json over the JSON-string storage columns)."""
    return records.withColumns(
        {
            "shareholders": F.from_json("shareholders", SHAREHOLDERS_SCHEMA),
            "managers": F.from_json("managers", MANAGERS_SCHEMA),
            "capital": F.from_json("capital", CAPITAL_SCHEMA),
        }
    )


def x5_shareholder_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 flatten evidence on oracle-checkable data: build a JSON-encoded
    shareholder-like array per customer (the records table's storage shape),
    re-type it with from_json, explode, aggregate — exactly the
    records_nested consumption path of the engine's shareholders column."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    j = o.groupBy("o_custkey").agg(
        F.to_json(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("o_orderkey").alias("seq"),
                        F.col("o_totalprice").alias("stake"),
                    )
                )
            )
        ).alias("shareholders")
    )
    parsed = j.select(
        "o_custkey",
        F.explode(
            F.from_json("shareholders", "array<struct<seq:long,stake:double>>")
        ).alias("sh"),
    )
    return (
        parsed.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_shareholders"),
            F.round(F.sum("sh.stake"), 2).alias("total_stake"),
            F.min("sh.seq").alias("first_seq"),
        )
        .orderBy("o_custkey")
    )


X5_SQL = """
SELECT o_custkey, count(*) AS n_shareholders,
       round(sum(o_totalprice), 2) AS total_stake,
       min(o_orderkey) AS first_seq
FROM orders WHERE o_custkey <= 300
GROUP BY o_custkey ORDER BY o_custkey
"""


def _clean_battery_col(col: F.Column) -> F.Column:
    """X12 as a JVM-side chained-regexp_replace expression (codegen'd) —
    the column-expression form of extract.pages.clean_field_value
    (DetailCrawler.php:978-1007)."""
    c = F.regexp_replace(col, r"[\r\n\t]+", " ")
    for pat in (
        r"\s*訂閱\s*$", r"\s*Google搜尋\s*", r"\s*電子地圖\s*",
        r"\s*地址所屬公司家數:\s*\d+\s*", r"客服專線：.*?$", r"\s*關閉\s*$",
    ):
        c = F.regexp_replace(c, pat, "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def x12_clean_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 cleaning battery over oracle-checkable data: dirty strings are
    synthesized from part names with the reference's boilerplate suffixes,
    cleaned with the chained-regexp battery on both sides."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    dirty = F.concat(
        F.col("p_name"), F.lit("\t電子地圖 地址所屬公司家數: 42"),
        F.when(F.col("p_partkey") % 3 == 0, F.lit(" 客服專線：0800-000-000"))
        .when(F.col("p_partkey") % 3 == 1, F.lit("  Google搜尋  訂閱"))
        .otherwise(F.lit(" 關閉")),
    )
    return (
        p.select(
            "p_partkey",
            dirty.alias("dirty"),
            _clean_battery_col(dirty).alias("cleaned"),
            (_clean_battery_col(dirty) == F.col("p_name")).alias("roundtrip"),
        )
        .orderBy("p_partkey")
    )


X12_SQL = r"""
WITH d AS (
  SELECT p_partkey, p_name,
         p_name || chr(9) || '電子地圖 地址所屬公司家數: 42' ||
         CASE WHEN p_partkey % 3 = 0 THEN ' 客服專線：0800-000-000'
              WHEN p_partkey % 3 = 1 THEN '  Google搜尋  訂閱'
              ELSE ' 關閉' END AS dirty
  FROM part WHERE p_partkey <= 500
),
c AS (
  SELECT p_partkey, p_name, dirty,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(dirty, '[\r\n\t]+', ' ', 'g'),
                '\s*訂閱\s*$', '', 'g'),
              '\s*Google搜尋\s*', '', 'g'),
            '\s*電子地圖\s*', '', 'g'),
          '\s*地址所屬公司家數:\s*\d+\s*', '', 'g'),
        '客服專線：.*?$', '', 'g'),
      '\s*關閉\s*$', '', 'g'),
    '\s+', ' ', 'g')) AS cleaned
  FROM d
)
SELECT p_partkey, dirty, cleaned, cleaned = p_name AS roundtrip
FROM c ORDER BY p_partkey
"""


# ---------- joins + windows + event-time ----------

def q_join_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with broadcast dims — revenue per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
        .orderBy("r_name", "n_name")
    )


JOIN_SQL = """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (region → nation → grand total) — part of the
    'for free from Spark SQL' surface beyond the reference (SURVEY.md §2.6
    note), oracle-checked; GROUPING() disambiguates subtotal rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


ROLLUP_SQL = """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders,
       GROUPING(r_name)::INT AS g_region, GROUPING(n_name)::INT AS g_nation
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


def w1_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    return (
        li.filter(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey", "l_orderkey", "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


W1_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
FROM lineitem WHERE l_suppkey <= 5
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling 1-hour aggregation — the batch expression of the
    Structured-Streaming windowed agg (identical plan shape with readStream)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("window_start", "event_type")
    )


EVENTS_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def x1_report_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — report → 8-digit company-ID extraction (GCISCrawler.php:174-208:
    pdftotext, then ``preg_match_all('/\\d{8}/')`` + ``array_unique``).

    The sandbox has no PDF decoder (env constraint), so the "report body" is
    DERIVED DETERMINISTICALLY from the documents table inside the query —
    the identical expression runs in the DuckDB oracle — stamping each doc's
    text with two synthetic IDs, a repeat of the first (exercising the
    unique step), and a 6-digit run (must not match). Match semantics equal
    preg_match_all: non-overlapping, left-to-right. The reference returns
    the unique IDs in first-occurrence order; this emits the unique SET
    sorted by (doc_id, company_id) — a global deterministic order for the
    oracle compare (order within a doc is not load-bearing downstream: the
    reference unions the IDs into a seen-set)."""
    # NOT spread (unlike the textstats/dedup documents consumers): A/B at
    # sf1.0 measured the \d{8} extraction cheaper than the repartition
    # exchange it would buy back (0.78 s scan-task vs 0.92 s spread)
    d = _t(spark, sf_dir, "documents")
    id1 = F.lpad(((F.col("doc_id") * 2654435761) % 100000000).cast("string"), 8, "0")
    id2 = F.lpad(((F.col("doc_id") * 40503 + 7) % 100000000).cast("string"), 8, "0")
    body = F.concat_ws(
        " ", F.col("text"), F.lit("uid"), id1, F.lit("ref"), id2,
        F.lit("again"), id1, F.lit("no:"), F.lit("123456"),
    )
    ids = F.array_distinct(F.regexp_extract_all(body, F.lit(r"\d{8}"), 0))
    return (
        d.select("doc_id", F.explode(ids).alias("company_id"))
        .orderBy("doc_id", "company_id")
    )


X1_SQL = r"""
WITH b AS (
  SELECT doc_id,
         concat_ws(' ', text,
                   'uid', lpad(CAST((doc_id * 2654435761) % 100000000 AS VARCHAR), 8, '0'),
                   'ref', lpad(CAST((doc_id * 40503 + 7) % 100000000 AS VARCHAR), 8, '0'),
                   'again', lpad(CAST((doc_id * 2654435761) % 100000000 AS VARCHAR), 8, '0'),
                   'no:', '123456') AS body
  FROM documents
)
SELECT doc_id, unnest(list_distinct(regexp_extract_all(body, '\d{8}'))) AS company_id
FROM b ORDER BY doc_id, company_id
"""
