"""Tax-registry bulk ingest (TaxCrawler analog — SURVEY.md S6/S7, X9/X11/
X14/X15, D5).

The reference streams a CSV with fgetcsv, skipping comment lines, validating
a 16-column header, stripping full-width spaces, dropping non-8-digit IDs,
zipping industry (code, name) pairs, converting ROC dates, batching 10k rows
per yield (TaxCrawler.php:81-225), with an md5 short-circuit when the
downloaded file is unchanged (:48-57).

Spark-first re-expression: read lines distributed → filter comments →
from_csv with an explicit 16-column schema (header validated, schema assert)
→ column expressions for every cleanup rule. The 10k batching disappears —
Arrow/partition iterators batch by construction (§4.1).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biz_crawlers_spark.fixtures.files import TAX_HEADERS

COMMENT_PREFIXES = ("備註:", "檔案產生日期：")  # TaxCrawler.php:98-101

_COLS = [f"c{i}" for i in range(len(TAX_HEADERS))]
_CSV_SCHEMA = ", ".join(f"{c} string" for c in _COLS)


class HeaderValidationError(ValueError):
    pass


def read_tax_csv(spark: SparkSession, path: str) -> DataFrame:
    """Parsed, cleaned tax records. Raises HeaderValidationError when the
    16-column header contract is broken (TaxCrawler.php:109-137)."""
    lines = spark.read.text(path)
    clean = lines.filter(
        ~F.col("value").startswith(COMMENT_PREFIXES[0])
        & ~F.col("value").startswith(COMMENT_PREFIXES[1])
        & (F.length("value") > 0)
    )
    expected_header = ",".join(TAX_HEADERS)
    header_rows = clean.filter(F.col("value") == expected_header).count()
    if header_rows != 1:
        raise HeaderValidationError(
            f"expected exactly one header row matching the 16-column contract, got {header_rows}"
        )
    data = clean.filter(F.col("value") != expected_header)
    parsed = data.select(
        F.from_csv(F.col("value"), _CSV_SCHEMA).alias("r")
    ).select([F.col(f"r.{c}").alias(c) for c in _COLS])

    # X14: strip full-width spaces; trim everything
    cleaned = parsed.select(
        *[F.translate(F.trim(F.col(c)), "　", "").alias(c) for c in _COLS]
    )

    # X15: 8-digit ID validity — invalid rows are FILTERED but the caller can
    # lineage-count them via the returned flag before filtering
    flagged = cleaned.withColumn("valid_id", F.col("c1").rlike(r"^\d{8}$"))

    roc = F.col("c5")  # 設立日期, 7-digit ROC like 1090315 (X9)
    est_date = F.when(
        roc.rlike(r"^\d{7}$"),
        F.make_date(
            F.substring(roc, 1, 3).cast("int") + 1911,
            F.substring(roc, 4, 2).cast("int"),
            F.substring(roc, 6, 2).cast("int"),
        ),
    )

    # X11: industry (code, name) pair zipping, empty pairs dropped
    industries = F.filter(
        F.arrays_zip(
            F.array(F.col("c8"), F.col("c10"), F.col("c12"), F.col("c14")).alias("code"),
            F.array(F.col("c9"), F.col("c11"), F.col("c13"), F.col("c15")).alias("name"),
        ),
        lambda x: (x["code"].isNotNull()) & (x["code"] != ""),
    )

    return flagged.select(
        F.col("c1").alias("tax_id"),
        F.lpad(F.col("c2"), 8, "0").alias("head_office_id"),  # X16
        F.col("c3").alias("name"),
        F.col("c0").alias("address"),
        F.col("c4").cast("long").alias("capital"),
        est_date.alias("established"),
        F.col("c6").alias("org_type"),
        (F.col("c7") == "Y").alias("uses_uniform_invoice"),
        industries.alias("industries"),
        "valid_id",
    )


def valid_tax_records(spark: SparkSession, path: str) -> DataFrame:
    return read_tax_csv(spark, path).filter(F.col("valid_id")).drop("valid_id")


def file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def ingest_tax_zip(spark: SparkSession, zip_path: str, table) -> dict:
    """ZIP download → extract → md5 change detection → parse → MERGE
    (S6 + D5: TaxCrawler.php:26-79). ``table`` is a SnapTable keyed by
    tax_id. Returns {status, rows} — status 'no_changes' short-circuits the
    whole job when the source md5 matches the last ingest snapshot."""
    md5 = file_md5(zip_path)
    for snap in reversed(table.snapshots()):
        if snap["summary"].get("src_md5") == md5:
            return {"status": "no_changes", "rows": 0, "md5": md5}
    with tempfile.TemporaryDirectory() as td:
        with zipfile.ZipFile(zip_path) as z:
            inner = [n for n in z.namelist() if n.endswith(".csv")]
            if not inner:
                raise ValueError("no CSV inside zip")
            z.extract(inner[0], td)
        df = valid_tax_records(spark, os.path.join(td, inner[0]))
        df = df.withColumn("industries", F.to_json("industries"))
        n = df.count()
        table.merge(df, summary={"src_md5": md5, "rows": n, "op": "tax_ingest"})
    return {"status": "ingested", "rows": n, "md5": md5}
