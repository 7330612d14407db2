"""Bulk import sources: JSONL.gz (S10), XML (S9), BOM-prefixed CSV (S8),
and the field-overlay dataset merge (R8/R9 of crawl-others.php /
crawl-temple.php / extract-records.php)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEMPLE_FIELDS = [
    "寺廟名稱", "主祀神祇", "行政區", "地址", "教別", "登記別", "電話",
    "負責人", "其他", "WGS84X", "WGS84Y", "統一編號", "核准設立日期", "備註",
]


def read_jsonl_gz(spark: SparkSession, path: str) -> DataFrame:
    """JSONL.gz bulk scan — native, distributed, codec-transparent
    (extract-records.php:13-90 did this line-by-line with gzgets).
    IDs are zero-pad-normalized (X16, :49)."""
    df = spark.read.json(path)
    return df.select(
        F.lpad(F.col("統一編號"), 8, "0").alias("entity_id"),
        F.col("名稱").alias("entity_name"),
        F.col("資本額").cast("long").alias("capital"),
    )


def read_temple_xml(spark: SparkSession, path: str) -> DataFrame:
    """Temple XML (crawl-temple.php:84-116): no spark-xml jar offline, so
    parse with stdlib xml.etree inside an Arrow-batched mapInPandas over
    binaryFile rows — one parse per FILE, scales by adding files."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in it:
            rows = []
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob).decode("utf-8"))
                for el in root.iter("OpenData_3"):
                    rows.append({f: (el.findtext(f) or "") for f in TEMPLE_FIELDS})
            yield pd.DataFrame(rows, columns=TEMPLE_FIELDS, dtype=object)

    ddl = ", ".join(f"`{f}` string" for f in TEMPLE_FIELDS)
    parsed = raw.mapInPandas(parse, ddl)
    return parsed.select(
        F.lpad(F.col("統一編號"), 8, "0").alias("entity_id"),
        F.col("寺廟名稱").alias("entity_name"),
        F.col("地址").alias("address"),
        F.col("負責人").alias("principal"),
        F.col("WGS84X").cast("double").alias("lon"),  # geo strings → double (§1.2)
        F.col("WGS84Y").cast("double").alias("lat"),
        F.col("核准設立日期").alias("approved_roc"),
    )


def read_bom_csv(spark: SparkSession, path: str) -> DataFrame:
    """BOM-prefixed CSV (crawl-others.php:139-156). Spark leaves the BOM in
    the first header name — strip it; key-column discovery = substring match
    over headers (S8: the reference finds 統一編號 by stripos)."""
    df = spark.read.option("header", True).csv(path)
    renames = {c: c.lstrip("﻿") for c in df.columns}
    for old, new in renames.items():
        if old != new:
            df = df.withColumnRenamed(old, new)
    key_col = next((c for c in df.columns if "統一編號" in c), None)
    if key_col is None:
        raise ValueError("no 統一編號 column found")
    if key_col != "entity_id":
        df = df.withColumnRenamed(key_col, "entity_id")
    return df.withColumn("entity_id", F.lpad("entity_id", 8, "0"))


def overlay_merge(base: DataFrame, update: DataFrame, key: str = "entity_id") -> DataFrame:
    """Field-overlay merge, reference semantics: the update wins per field
    whenever the field is PRESENT (non-null) — including explicit empty
    string (crawl-others.php:190-193); absent (null) keeps the old value."""
    cols = [c for c in base.columns if c != key]
    b, u = base.alias("b"), update.alias("u")
    return b.join(u, on=key, how="full_outer").select(
        F.col(key),
        *[F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c) for c in cols],
    )
