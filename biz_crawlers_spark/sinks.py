"""Compatibility export sinks (K3/K6, SURVEY.md §2.7).

The reference hands IDs between pipeline stages as plain text files and
exports CSV reports. Kept as thin writers over DataFrames; note the
reference has TWO different empty-input semantics and both are preserved:

- BaseCrawler.saveIdsToDataRepository skips the write entirely when the ID
  list is empty (BaseCrawler.php:286-288)
- GCISCrawler.saveIdList always writes, producing an empty file
  (GCISCrawler.php:513-532)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_id_list(df: DataFrame, id_col: str, dest: str, write_if_empty: bool = False) -> bool:
    """One ID per line, sorted (crawl-details.php:199 sorts before batch).
    Returns True if a file was written."""
    ids = df.select(F.col(id_col).cast("string").alias("value")).distinct().orderBy("value")
    if not write_if_empty and ids.limit(1).count() == 0:
        return False  # BaseCrawler semantics: skip empty
    ids.coalesce(1).write.mode("overwrite").text(dest)
    return True


def export_csv(df: DataFrame, dest: str, single_file: bool = True) -> str:
    """CSV with header (SchoolCrawler.php:173-211). ``single_file`` matches
    the reference's one-file output; large exports should pass False and
    keep one file per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(dest)
    return dest


def read_id_list(spark, path: str) -> DataFrame:
    """The consuming side (crawl.php:319-333): text file → id column."""
    return spark.read.text(path).select(F.col("value").alias("id")).filter(F.length("id") > 0)
