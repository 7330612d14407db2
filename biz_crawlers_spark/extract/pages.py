"""Page → records extraction (the X-series operators, SURVEY.md §2.5).

Pure functions over page bytes; they run inside Arrow-batched UDFs
(mapInPandas / pandas_udf) — one Python call per batch, stdlib regex per
element, no lxml dependency (X2: BaseCrawler.php:152-185 CSS extraction is
re-expressed as pattern extraction with warn-and-null failure semantics).
"""

from __future__ import annotations

import base64
import re

from biz_crawlers_spark.fixtures.web import NOT_FOUND_SENTINEL, THROTTLE_SENTINEL

MIN_PAGE_BYTES = 1000  # sanity gate, DetailCrawler.php:194-196

_FIGURE_RE = re.compile(
    r'<figure><img src="data:image/(\w+);base64,([A-Za-z0-9+/=]+)"/>'
    r"<figcaption>(.*?)</figcaption></figure>",
    re.S,
)
_KV_RE = re.compile(r"<tr><td>([^<]+)</td><td>([^<]*)</td></tr>")
_SCHOOL_ROW_RE = re.compile(
    r"<tr class='td_style0[12]'><td>\d+</td><td>([^<]*)</td><td>(\d+)</td><td>([^<]*)</td></tr>"
)
_ROC_DATE_RE = re.compile(r"(\d+)年(\d+)月(\d+)日")  # DetailCrawler.php:676-682
_SEARCH_ROW_RE = re.compile(
    r"<tr>(?:<td>[^<]*</td>){5}<td><a href='([^']+)'>[^<]*</a></td>"
    r"<td data-title='核准變更日期'>(\d+)年(\d+)月(\d+)日</td></tr>"
)
_BIZ_ITEM_RE = re.compile(r"([A-Z][A-Z0-9]\d{5})\s*([^A-Z]*)")  # X10, DetailCrawler.php:544-584


def classify_page(status: str, body: bytes) -> str:
    """Fetch-result classification (X20/X21/P4): sentinel detection +
    minimum-content gate, mirroring DetailCrawler.php:162-196."""
    if status in ("not_found", "throttled", "junk", "robots_denied", "error"):
        # transport-level classification already decided (mock fetcher);
        # re-derive from body for defense in depth
        pass
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return "error"
    if THROTTLE_SENTINEL in text:
        return "throttled"
    if NOT_FOUND_SENTINEL in text:
        return "not_found"
    if len(body) < MIN_PAGE_BYTES:
        return "junk"
    return "ok"


def extract_figures(body: bytes) -> list[dict]:
    """Embedded image+caption pairs from a detail page. Returns
    [{fmt, bytes, caption, seq}] — decode failures yield nothing (the
    warn-and-empty semantics of BaseCrawler.php:176-183)."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return []
    out = []
    for seq, m in enumerate(_FIGURE_RE.finditer(text)):
        fmt, b64, caption = m.group(1), m.group(2), m.group(3)
        try:
            raw = base64.b64decode(b64, validate=True)
        except Exception:
            continue
        out.append({"fmt": fmt, "bytes": raw, "caption": caption, "seq": seq})
    return out


def parse_search_results(body: bytes) -> list[tuple[str, tuple[int, int, int]]]:
    """Search-results rows (X3: DetailCrawler.php:371-430) —
    [(detail_url, (roc_y, m, d))] from the eslist-table."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return []
    return [
        (url, (int(y), int(m), int(d)))
        for url, y, m, d in _SEARCH_ROW_RE.findall(text)
    ]


def pick_latest(rows: list[tuple[str, tuple[int, int, int]]]) -> str | None:
    """Latest-by-change-date pick (the arsort-then-first of
    DetailCrawler.php:426-429); URL string breaks exact-date ties
    deterministically."""
    if not rows:
        return None
    return max(rows, key=lambda r: (r[1], r[0]))[0]


def parse_roc_date(s: str) -> tuple[int, int, int] | None:
    """ROC date string → (western_year, month, day) (X9:
    DetailCrawler.php:586-592 — ROC year + 1911)."""
    m = _ROC_DATE_RE.search(s)
    if not m:
        return None
    return int(m.group(1)) + 1911, int(m.group(2)), int(m.group(3))


def parse_business_items(s: str) -> list[tuple[str, str]]:
    """Code-segmented business items (X10: DetailCrawler.php:544-584) —
    [(code, description)], trailing sort numbers stripped
    (the `/\\s+\\d+$/` rule at DetailCrawler.php:857)."""
    out = []
    for code, desc in _BIZ_ITEM_RE.findall(s):
        desc = re.sub(r"\s+\d+$", "", desc.strip())
        out.append((code, desc))
    return out


def parse_names(value: str) -> list[str]:
    """Multi-value name extraction (X19: DetailCrawler.php:495-527) — split
    lines, trim, keep length>2. The reference returns string-or-array; the
    engine normalizes the union type to always-array (SURVEY.md §1.2)."""
    return [n.strip() for n in value.splitlines() if len(n.strip()) > 2]


def parse_detail_fields(body: bytes) -> dict[str, str]:
    """Label→value pairs from the detail table (X4 analog:
    DetailCrawler.php:448-599 per-<tr> dispatch)."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return {}
    return {k.strip(): v.strip() for k, v in _KV_RE.findall(text)}


def parse_school_rows(body: bytes) -> list[tuple[str, str, str]]:
    """(category, tax_id, name) rows from a paginated list page (X17/X18:
    SchoolCrawler.php:71-131); empty list ⇒ end of pagination (F4)."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return []
    return [(c, t, n) for c, t, n in _SCHOOL_ROW_RE.findall(text)]
