"""URL canonicalization + frontier key derivation.

The reference builds URLs imperatively (``http_build_query`` over fixed
param maps — GCISCrawler.php:120-141, :305-319; page URLs
SchoolCrawler.php:47-50) and uses the raw string / filename as the dedup
identity (GCISCrawler.php:124-127). At 10^10-URL scale the identity must be a
canonical form + 64-bit hash key:

    url_key = xxhash64(canonicalize(url))      # F.xxhash64 Spark-side

Canonicalization rules (idempotent — property-tested):
  - strip surrounding whitespace
  - lowercase scheme and host; drop default ports (:80 http, :443 https)
  - drop the fragment
  - empty path → "/"
  - query params sorted by (key, value), re-encoded canonically
  - trailing "?" with no query removed

Spark-side: ``canonicalize_udf`` is an Arrow-batched pandas UDF (one Python
call per batch; the per-element parse is stdlib urllib — cheap relative to
fetch, and only runs at seed/discovery time, never in the per-epoch hot
loop, where rows already carry url_key).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from biz_crawlers_spark.hashing import spark_xxhash64

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str) -> str:
    """Canonical form of a URL (idempotent)."""
    u = urlsplit(url.strip())
    scheme = u.scheme.lower()
    host = (u.hostname or "").lower()
    port = u.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = u.path or "/"
    query = urlencode(sorted(parse_qsl(u.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def url_key(url: str) -> int:
    """Signed-int64 frontier key for a URL — matches Spark's
    ``F.xxhash64(canonical_url)`` bit-for-bit (see hashing.py)."""
    return spark_xxhash64(canonicalize(url))


def url_host(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()


def canonicalize_udf():
    """Arrow-batched pandas UDF: url → canonical_url. Built lazily because
    PySpark 4 requires an active session to parse the DDL return type."""

    @F.pandas_udf("string")
    def _canon(urls: pd.Series) -> pd.Series:
        return urls.map(canonicalize)

    return _canon


def host_udf():
    @F.pandas_udf("string")
    def _host(urls: pd.Series) -> pd.Series:
        return urls.map(url_host)

    return _host


def url_key_col(canonical_url: Column | str) -> Column:
    """Spark column expression for the frontier key (JVM-side, codegen'd)."""
    return F.xxhash64(canonical_url)
