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


def entity_doc(rec: dict) -> dict:
    """The per-entity JSON document shape (K1 analog of
    DetailCrawler.php:888-949 saveCompanyDetail): nested columns are
    re-materialized from their JSON storage encoding so the doc carries real
    arrays/objects, exactly like the reference's on-disk files. Field-name
    mapping vs the reference is documented in SURVEY.md §1.2."""
    import json as _json

    doc = {"id": rec["entity_id"].rjust(8, "0")}
    for k in ("entity_name", "address", "change_date", "category", "parse_mode"):
        if rec.get(k) is not None:
            doc[k] = rec[k]
    for k in ("entity_names", "biz_items", "shareholders", "managers", "capital"):
        v = rec.get(k)
        if v:
            doc[k] = _json.loads(v)
    return doc


def write_entity_json(records: DataFrame, dest: str) -> int:
    """K1 compat writer (DetailCrawler.php:888-949): one pretty-printed
    UTF-8-unescaped JSON file per entity under a FIRST-DIGIT directory
    ({dest}/{id[0]}/{id}.json — the reference's partitioning at :899-906),
    with the reference's 3-level encode fallback (:916-941): plain encode →
    control-char-sanitized encode → minimal error document. Executed
    per-partition on executors (distributed writer; the compat target is a
    shared filesystem, exactly like the reference's data dir). Returns the
    number of documents written."""
    import json as _json

    from biz_crawlers_spark.extract.pages import _sanitize_leaf

    # count via accumulator inside the SAME pass — a separate .count() would
    # recompute the records plan a second time just to return a number
    acc = records.sparkSession.sparkContext.accumulator(0)

    def _write_rows(rows) -> None:
        n = 0
        for r in rows:
            n += 1
            rec = r.asDict()
            doc = entity_doc(rec)
            eid = doc["id"]
            sub = os.path.join(dest, eid[0])
            os.makedirs(sub, exist_ok=True)
            try:
                s = _json.dumps(doc, ensure_ascii=False, indent=4)
            except (TypeError, ValueError):
                try:
                    s = _json.dumps(_sanitize_leaf(doc), ensure_ascii=False, indent=4)
                except (TypeError, ValueError):
                    s = _json.dumps(
                        {"id": eid, "error": "encode_failed"}, ensure_ascii=False, indent=4
                    )
            tmp = os.path.join(sub, f".{eid}.json.tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(s)
            os.replace(tmp, os.path.join(sub, f"{eid}.json"))
        acc.add(n)

    records.foreachPartition(_write_rows)
    return acc.value


def load_existing(records: DataFrame, wanted: DataFrame, key: str = "entity_id"):
    """R12 cache read-through (BaseCrawler.php:242-265 loadExistingData +
    GCISCrawler.php:466-482): split a requested key set into (hits = rows
    already materialized in the records table, missing = keys that still
    need crawling). The semi/anti pair is the distributed form of the
    reference's "read the JSON store before recomputing" — callers feed
    ``missing`` to the frontier and union ``hits`` straight into results."""
    hits = records.join(wanted.select(key), key, "left_semi")
    missing = wanted.select(key).distinct().join(records, key, "left_anti")
    return hits, missing
