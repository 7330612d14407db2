"""S11 — dataset-catalog JSON source (crawl-others.php:89-126).

The reference fetches a data.gov.tw dataset API document, walks
``result.distribution``, picks the FIRST entry whose format/URL says CSV,
and downloads it. Here the walk is a pure function over catalog bytes and
the chosen URLs feed the frontier as seeds — the catalog call is a
driver-side, bounded operation (one JSON document per dataset id), exactly
like the reference's file_get_contents; the heavy lifting (the CSV fetch)
stays in the distributed fetch stage.
"""

from __future__ import annotations

import json

from biz_crawlers_spark.fixtures.web import SeedURL
from biz_crawlers_spark.frontier.canonical import url_host


def pick_csv_distribution(catalog_bytes: bytes) -> str | None:
    """Walk result.distribution and return the first CSV resource URL
    (crawl-others.php:100-118: format == 'CSV' or a .csv download URL);
    None when the document has no CSV distribution — the reference logs and
    skips the dataset."""
    try:
        doc = json.loads(catalog_bytes.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return None
    result = doc.get("result") or {}
    for dist in result.get("distribution") or []:
        fmt = (dist.get("resourceFormat") or dist.get("format") or "").strip().upper()
        url = dist.get("resourceDownloadUrl") or dist.get("downloadURL") or ""
        if not url:
            continue
        if fmt == "CSV" or url.lower().split("?")[0].endswith(".csv"):
            return url
    return None


def catalog_seeds(
    catalogs: list[tuple[str, bytes]], base_priority: int = 0
) -> list[SeedURL]:
    """One seed per dataset that exposes a CSV distribution, in catalog
    order (the reference processes its dataset-id list sequentially —
    crawl-others.php:60-87); datasets without a CSV are skipped."""
    out = []
    for i, (_dataset_id, body) in enumerate(catalogs):
        url = pick_csv_distribution(body)
        if url is None:
            continue
        out.append(
            SeedURL(url, 0, 0, 0, base_priority + i, url_host(url))
        )
    return out
