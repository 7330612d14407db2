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

# ---------- X12/X13: the string-cleaning battery ----------

# X13: control characters that break JSON encoding, stripped from every
# string field at record-build time (DetailCrawler.php:1048-1076
# cleanStringForJson, applied recursively via cleanDataForJson at :909)
_CONTROL_CHAR_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")

# X12: the 11 unwanted-boilerplate patterns (DetailCrawler.php:984-996),
# applied after collapsing [\r\n\t]+ and before collapsing spaces (:978-1007)
_UNWANTED_PATTERNS = [
    re.compile(r"\s*訂閱\s*$"),
    re.compile(r"\s*Google搜尋\s*"),
    re.compile(r"\s*電子地圖\s*"),
    re.compile(r"\s*地址所屬公司家數:\s*\d+\s*"),
    re.compile(r"「查詢最新營業狀況請至.*?」"),
    re.compile(r"「國際貿易署廠商英文名稱查詢.*?」"),
    re.compile(r"「國際貿易署廠商英文名稱查詢」本項查詢服務.*?關閉", re.S),
    re.compile(r"本項查詢服務.*?關閉", re.S),
    re.compile(r"客服專線：.*?$"),
    re.compile(r"已了解，開始查詢.*?$"),
    re.compile(r"\s*關閉\s*$"),
]

# X8: the 10-label whitelist of the regex-fallback parse
# (DetailCrawler.php:1084-1095); the engine adds 統一編號 because identity
# must be in-band here (the reference gets the id from its per-ID loop)
FALLBACK_FIELDS = (
    "登記現況", "公司名稱", "章程所訂外文公司名稱", "資本總額(元)", "代表人姓名",
    "公司所在地", "登記機關", "核准設立日期", "最後核准變更日期", "所營事業資料",
)
_TRIM_KEY_FIELDS = {"登記現況", "公司名稱", "公司所在地"}  # DetailCrawler.php:1116

_SHAREHOLDER_DIV_RE = re.compile(
    r"<div[^>]*id=.tabShareHolderContent.[^>]*>(.*?)</div>", re.S
)
_MGR_DIV_RE = re.compile(r"<div[^>]*id=.tabMgrContent.[^>]*>(.*?)</div>", re.S)
_BUSM_DIV_RE = re.compile(r"<div[^>]*id=.tabBusmContent.[^>]*>(.*?)</div>", re.S)
_CMPY_DIV_RE = re.compile(r"<div[^>]*id=.tabCmpyContent.[^>]*>(.*?)</div>", re.S)
_TABLE_RE = re.compile(r"<table[^>]*>(.*?)</table>", re.S)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.S)
_TD_RE = re.compile(r"<td[^>]*>(.*?)</td>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
# legal-entity link: queryCmpy('name','id',…) → [id, name]
# (DetailCrawler.php:628-638)
_QUERY_CMPY_RE = re.compile(r"queryCmpy\('([^']+)','(\d+)',")
_FALLBACK_CELL_RE = re.compile(
    r'<td[^>]*class="txt_td"[^>]*>(.*?)</td>\s*<td[^>]*>(.*?)</td>', re.S
)
_AMOUNT_RE = re.compile(r"出資額\(元\):(\d+)")  # DetailCrawler.php:806-808
_ROC_DATE_FULL_RE = re.compile(r"^(\d+)年(\d+)月(\d+)日$")


def sanitize_json_string(value: str) -> str:
    """X13 (DetailCrawler.php:1064-1076): strip the control characters that
    break JSON encoding, then trim. Arrow keeps everything UTF-8, so the
    mb_convert_encoding branch has no analog here."""
    return _CONTROL_CHAR_RE.sub("", value).strip()


def clean_field_value(value: str) -> str:
    """X12 (DetailCrawler.php:978-1007): collapse [\\r\\n\\t]+ to a space,
    strip the 11 boilerplate patterns in order, collapse spaces, trim.
    Idempotent (property-tested)."""
    value = re.sub(r"[\r\n\t]+", " ", value)
    for pat in _UNWANTED_PATTERNS:
        value = pat.sub("", value)
    return re.sub(r"\s+", " ", value).strip()


def trim_key_field(value: str) -> str:
    """DetailCrawler.php:1039-1046 — final normalize for key fields."""
    return re.sub(r"\s+", " ", value).strip()


def clean_address(value: str) -> str:
    """Address/status cleanup (X4: DetailCrawler.php:533-545 per-label
    branch): truncate at CR, strip ALL whitespace, drop &nbsp;."""
    cr = value.find("\r")
    if cr != -1:
        value = value[:cr]
    value = re.sub(r"\s", "", value.strip())
    return value.replace("\xa0", "").replace("&nbsp;", "")


def _strip_tags(s: str) -> str:
    return _TAG_RE.sub("", s)


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


def parse_business_items(s: str, strip_sort_number: bool = False) -> list[tuple[str, str]]:
    """Code-segmented business items (X10) — [(code, description)].
    ``strip_sort_number`` applies the trailing `/\\s+\\d+$/` rule, which the
    reference uses on BUSINESS pages only (DetailCrawler.php:857); company
    pages keep the raw description (:548-584 has no such strip)."""
    out = []
    for code, desc in _BIZ_ITEM_RE.findall(s):
        desc = desc.strip()
        if strip_sort_number:
            desc = re.sub(r"\s+\d+$", "", desc)
        out.append((code, desc))
    return out


def parse_business_items_simple(s: str) -> list[tuple[str, str]]:
    """The simpler split-variant used by the regex-fallback path (X8 →
    parseBusinessItems, DetailCrawler.php:1009-1037): split on
    `([A-Z]\\d{6})\\s+` delimiters, zip code/description pairs."""
    parts = [p for p in re.split(r"([A-Z]\d{6})\s+", s) if p.strip()]
    out = []
    i = 0
    # re.split with a capture yields [pre?, code, desc, code, desc, ...];
    # drop any non-code prefix, then take (code, desc) pairs
    if parts and not re.fullmatch(r"[A-Z]\d{6}", parts[0]):
        i = 1
    while i + 1 < len(parts):
        code, desc = parts[i].strip(), parts[i + 1].strip()
        if re.fullmatch(r"[A-Z]\d{6}", code) and desc:
            out.append((code, desc))
        i += 2
    return out


def parse_shareholders(body: bytes) -> list[dict]:
    """X5 (DetailCrawler.php:604-653): rows of the SECOND table inside
    #tabShareHolderContent (the first is an empty spacer, skipped exactly as
    the reference does), exactly-5-td rows → {seq, title, name, legal_id,
    legal_name, stake}. The reference's 所代表法人 union type (string OR
    [id, name] from the queryCmpy link) is normalized to the
    (legal_id, legal_name) struct pair: link → both set; plain string →
    legal_name only; empty → both empty (SURVEY.md §1.2)."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return []
    m = _SHAREHOLDER_DIV_RE.search(text)
    if not m:
        return []
    tables = _TABLE_RE.findall(m.group(1))
    table = tables[1] if len(tables) > 1 else (tables[0] if tables else None)
    if table is None:
        return []
    out = []
    for tr in _TR_RE.findall(table):
        tds = _TD_RE.findall(tr)
        if len(tds) != 5:
            continue
        legal_html = tds[3]
        lm = _QUERY_CMPY_RE.search(legal_html)
        if lm:
            legal_name, legal_id = lm.group(1), lm.group(2)
        else:
            legal_name, legal_id = _strip_tags(legal_html).strip(), None
        out.append(
            {
                "seq": _strip_tags(tds[0]).strip(),
                "title": _strip_tags(tds[1]).strip(),
                "name": _strip_tags(tds[2]).strip(),
                "legal_id": legal_id,
                "legal_name": legal_name,
                "stake": _strip_tags(tds[4]).strip(),
            }
        )
    return out


def parse_managers(body: bytes) -> list[dict]:
    """X6 (DetailCrawler.php:656-695): first table inside #tabMgrContent,
    exactly-3-td rows → {seq, name, date:{year,month,day}|None}; the 就任日期
    ROC year is converted (+1911) exactly like the reference."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return []
    m = _MGR_DIV_RE.search(text)
    if not m:
        return []
    tables = _TABLE_RE.findall(m.group(1))
    if not tables:
        return []
    out = []
    for tr in _TR_RE.findall(tables[0]):
        tds = _TD_RE.findall(tr)
        if len(tds) != 3:
            continue
        dm = _ROC_DATE_RE.search(_strip_tags(tds[2]))
        date = (
            {"year": 1911 + int(dm.group(1)), "month": int(dm.group(2)),
             "day": int(dm.group(3))}
            if dm
            else None
        )
        out.append(
            {"seq": _strip_tags(tds[0]).strip(), "name": _strip_tags(tds[1]).strip(),
             "date": date}
        )
    return out


_CAPITAL_CELL_RE = re.compile(
    r"負責人姓名\s*</td>\s*<td[^>]*>\s*(<table[^>]*>.*?</table>)", re.S
)


def parse_capital_contributions(busm_html: str) -> tuple[str | None, list]:
    """X7 nested-capital parse (DetailCrawler.php:783-829): each 負責人姓名
    cell containing an inner table yields a (person, 出資額(元) amount) pair
    from the inner table's FIRST row (exactly the reference's innerTr pick).
    Returns (last responsible-person name — the reference overwrites the
    field per row — and the accumulated [{name, amount}, ...] list; the
    reference's list-of-single-key-maps is normalized to structs so the
    column is from_json-typed as array<struct<name,amount>>)."""
    person_last = None
    amounts: list[dict] = []
    for inner in _CAPITAL_CELL_RE.findall(busm_html):
        inner_rows = _TR_RE.findall(inner)
        if not inner_rows:
            continue
        inner_tds = _TD_RE.findall(inner_rows[0])
        if len(inner_tds) < 2:
            continue
        person = _strip_tags(inner_tds[0]).strip()
        am = _AMOUNT_RE.search(_strip_tags(inner_tds[1]))
        amount = int(am.group(1)) if am else 0
        if person:
            person_last = person
            amounts.append({"name": person, "amount": amount})
    return person_last, amounts


def parse_detail_fallback(body: bytes) -> dict[str, str]:
    """X8 regex-fallback parse (DetailCrawler.php:1078-1153): when the
    primary grammar yields nothing, extract `<td class="txt_td">label</td>
    <td>value</td>` pairs inside #tabCmpyContent, keep only the 10-label
    whitelist (+ 統一編號 for in-band identity), and run every value through
    the X12 cleaning battery (values here are dirty by assumption)."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return {}
    m = _CMPY_DIV_RE.search(text)
    if not m:
        return {}
    out: dict[str, str] = {}
    for tr in _TR_RE.findall(m.group(1)):
        for k_html, v_html in _FALLBACK_CELL_RE.findall(tr):
            key = _strip_tags(k_html).strip()
            if key != "統一編號" and key not in FALLBACK_FIELDS:
                continue
            value = clean_field_value(_strip_tags(v_html))
            if key in _TRIM_KEY_FIELDS:
                value = trim_key_field(value)
            out[key] = value
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


def _sanitize_leaf(v):
    """X13 applied recursively over the parsed record (the cleanDataForJson
    walk of DetailCrawler.php:1048-1061)."""
    if isinstance(v, str):
        return sanitize_json_string(v)
    if isinstance(v, (list, tuple)):
        return [_sanitize_leaf(x) for x in v]
    if isinstance(v, dict):
        return {sanitize_json_string(k): _sanitize_leaf(x) for k, x in v.items()}
    return v


def build_entity_record(body: bytes) -> dict | None:
    """The full detail-record extraction (X4-X8, X12, X13, X19) shared by the
    Spark stage and the reference simulator. Returns a flat dict:

      entity_id, entity_name, entity_names(JSON), address, change_date,
      biz_items(JSON), shareholders(JSON), managers(JSON), capital(JSON),
      parse_mode('dom'|'regex')

    Dispatch mirrors the reference: company DOM grammar
    (DetailCrawler.php:448-599 + shareholders/managers :604-695), business
    grammar with nested capital (:706-886), then the regex fallback
    (:1078-1153) when the primary grammar yields nothing. Every string leaf
    passes the X13 sanitizer (:1048-1076) before JSON encoding, exactly as
    the reference's save path does (:909)."""
    import json as _json

    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return None
    fields = {k.strip(): v.strip() for k, v in _KV_RE.findall(text)}
    busm = _BUSM_DIV_RE.search(text)

    rec: dict | None = None
    if "統一編號" in fields:
        # --- company DOM path (X4) ---
        names = parse_names(fields.get("公司名稱", ""))
        roc = parse_roc_date(fields.get("核准變更日期", ""))
        raw_items = fields.get("所營事業資料", "")
        items = parse_business_items(raw_items, strip_sort_number=False)
        if not items and raw_items.strip():
            # no codes found → line-split fallback (DetailCrawler.php:581-584)
            items = [ln.strip() for ln in raw_items.split("\n") if ln.strip()]
        rec = {
            "entity_id": fields["統一編號"].rjust(8, "0"),
            "names": names,
            "address": clean_address(fields["公司所在地"])
            if "公司所在地" in fields
            else None,
            "change_date": roc,
            "biz_items": items,
            "shareholders": parse_shareholders(body),
            "managers": parse_managers(body),
            "capital": [],
            "parse_mode": "dom",
        }
    elif busm and "商業統一編號" in fields:
        # --- business DOM path (X7) ---
        names = parse_names(fields.get("商業名稱", ""))
        roc = parse_roc_date(fields.get("核准變更日期", ""))
        items = parse_business_items(fields.get("營業項目", ""), strip_sort_number=True)
        person, capital = parse_capital_contributions(busm.group(1))
        if person and not names:
            names = [person]
        rec = {
            "entity_id": fields["商業統一編號"].rjust(8, "0"),
            "names": names,
            "address": clean_address(fields["地址"]) if "地址" in fields else None,
            "change_date": roc,
            "biz_items": items,
            "shareholders": [],
            "managers": [],
            "capital": capital,
            "parse_mode": "dom",
        }
    else:
        # --- X8 regex fallback ---
        fb = parse_detail_fallback(body)
        if "統一編號" not in fb:
            return None
        roc = parse_roc_date(fb.get("最後核准變更日期", ""))
        name = fb.get("公司名稱", "")
        rec = {
            "entity_id": fb["統一編號"].rjust(8, "0"),
            "names": [name] if len(name) > 2 else [],
            "address": fb.get("公司所在地"),
            "change_date": roc,
            "biz_items": parse_business_items_simple(fb.get("所營事業資料", "")),
            "shareholders": [],  # left empty by the fallback (php:1141-1145)
            "managers": [],
            "capital": [],
            "parse_mode": "regex",
        }

    rec = _sanitize_leaf(rec)
    names = rec.pop("names")
    roc = rec.pop("change_date")
    dumps = lambda v: _json.dumps(v, ensure_ascii=False)  # noqa: E731
    rec.update(
        {
            "entity_name": names[0] if names else None,
            "entity_names": dumps(names),
            "change_date": f"{roc[0]:04d}-{roc[1]:02d}-{roc[2]:02d}" if roc else None,
            "biz_items": dumps(rec["biz_items"]),
            "shareholders": dumps(rec["shareholders"]),
            "managers": dumps(rec["managers"]),
            "capital": dumps(rec["capital"]),
        }
    )
    return rec


def parse_school_rows(body: bytes) -> list[tuple[str, str, str]]:
    """(category, tax_id, name) rows from a paginated list page (X17/X18:
    SchoolCrawler.php:71-131); empty list ⇒ end of pagination (F4)."""
    try:
        text = body.decode("utf-8", errors="replace")
    except Exception:
        return []
    return [(c, t, n) for c, t, n in _SCHOOL_ROW_RE.findall(text)]
