"""The deterministic "virtual web" served to the fetch stage in tests/bench.

Every page is a pure function of (seed, url, attempt) — no corpus needs to be
generated or shipped to executors, which is what lets the bench run 10^6+
frontier URLs with zero input I/O and lets the pure-Python reference
simulator see the exact same web as the Spark engine.

URL grammar mirrors the reference's enumeration (synthetic codes, not the
reference's data):

- company reports:  https://{host}/report?fileName={yyymm}{org}{type}.pdf&subPath={yyymm}
  (filename grammar of GCISCrawler.php:120-141)
- business reports: https://{host}/report?fileName={org}{type}{yyymm}.pdf&subPath={yyymm}
  (GCISCrawler.php:305-319 — note the swapped filename order)
- school list:      https://{host}/school_list?pages={n}  (SchoolCrawler.php:47-50),
  paginated until an empty page terminates the crawl (SchoolCrawler.php:19-43)
- a seeded fraction of report URLs live under /blocked/… which host h1's
  robots.txt disallows (new surface per north_rule P8)

Sentinel behavior mirrors DetailCrawler.php:
- throttle page (本系統限制使用者間隔2秒鐘才能進行下一次查詢, :162) on the first
  attempt for a seeded subset; success on retry
- not-found page (很抱歉，我們無法找到符合條件的查詢結果。, :170) — permanent
- junk page < 1000 bytes (:194-196) — permanent → retries then failure
"""

from __future__ import annotations

import base64
from dataclasses import dataclass
from urllib.parse import parse_qs, urlsplit

from biz_crawlers_spark.fixtures.images import make_image
from biz_crawlers_spark.hashing import spark_xxhash64

N_ORGS = 14  # 14 orgs × 3 types for companies (GCISCrawler.php:95-116, :13-17)
N_AREAS = 25  # 25 areas × 3 types for businesses (GCISCrawler.php:221-255)
ORG_CODES = [f"O{i:02d}" for i in range(N_ORGS)]
AREA_CODES = [f"A{i:02d}" for i in range(N_AREAS)]
REPORT_TYPES = ["est", "chg", "dis"]  # establishments / changes / dissolutions

THROTTLE_SENTINEL = "本系統限制使用者間隔2秒鐘才能進行下一次查詢"
NOT_FOUND_SENTINEL = "很抱歉，我們無法找到符合條件的查詢結果。"

THROTTLE_MOD = 17  # throttled on attempt 0
NOT_FOUND_MOD = 23  # permanent not-found
JUNK_MOD = 29  # permanent <1000-byte page
BLOCKED_MOD = 31  # path under /blocked/ (robots-disallowed on h1)


def hosts(n_hosts: int = 4) -> list[str]:
    return [f"h{i}.fixture.test" for i in range(n_hosts)]


def host_for(name: str, n_hosts: int = 4) -> str:
    """Skewed host assignment: ~80% of URLs land on host 0 (FIXTURES.md §2) —
    exercises the salted-repartition skew kill. The remaining 20% spread
    UNIFORMLY over h1..h{n-1} via an independent hash (the old
    ``(r-8) % (n-1)`` spread only ever reached h1/h2, so "n-host" seeds
    really used 3 hosts)."""
    r = spark_xxhash64(name) % 10
    if r < 0:
        r += 10
    if r < 8 or n_hosts == 1:
        return hosts(n_hosts)[0]
    s = spark_xxhash64(name + "#h") % (n_hosts - 1)
    if s < 0:
        s += n_hosts - 1
    return hosts(n_hosts)[1 + s]


@dataclass(frozen=True)
class SeedURL:
    url: str
    org_idx: int
    type_idx: int
    page: int
    priority: int
    host: str


def _report_url(fname: str, yyymm: str, n_hosts: int) -> tuple[str, str]:
    host = host_for(fname, n_hosts)
    fkey = spark_xxhash64(fname) % BLOCKED_MOD
    path = "/blocked/report" if fkey == 0 else "/report"
    return f"https://{host}{path}?fileName={fname}&subPath={yyymm}", host


def company_seed(year: int, month: int, n_hosts: int = 4, base_priority: int = 0) -> list[SeedURL]:
    """org-outer/type-inner enumeration order = the reference crawl order
    (GCISCrawler.php:46-66: fixed array insertion order). ``priority``
    encodes that insertion order globally (base_priority separates seed
    groups), which is what lets the engine's priority sort reproduce the
    reference's sequential order per host (SURVEY.md §7)."""
    yyymm = f"{year:03d}{month:02d}"
    out = []
    for oi, org in enumerate(ORG_CODES):
        for ti, typ in enumerate(REPORT_TYPES):
            url, host = _report_url(f"{yyymm}{org}{typ}.pdf", yyymm, n_hosts)
            out.append(
                SeedURL(url, oi, ti, 0, base_priority + oi * len(REPORT_TYPES) + ti, host)
            )
    return out


def business_seed(year: int, month: int, n_hosts: int = 4, base_priority: int = 0) -> list[SeedURL]:
    yyymm = f"{year:03d}{month:02d}"
    out = []
    for ai, area in enumerate(AREA_CODES):
        for ti, typ in enumerate(REPORT_TYPES):
            url, host = _report_url(f"{area}{typ}{yyymm}.pdf", yyymm, n_hosts)
            out.append(
                SeedURL(url, ai, ti, 0, base_priority + ai * len(REPORT_TYPES) + ti, host)
            )
    return out


def school_seed(n_hosts: int = 4, base_priority: int = 0) -> list[SeedURL]:
    host = hosts(n_hosts)[0]
    return [SeedURL(f"https://{host}/school_list?pages=1", 0, 0, 1, base_priority, host)]


def search_seed(n_entities: int, n_hosts: int = 4, base_priority: int = 0) -> list[SeedURL]:
    """Detail-crawl seeds: one search URL per 8-digit entity id (the
    DetailCrawler flow, §3.2 — search page → latest-by-date detail page)."""
    out = []
    for i in range(n_entities):
        entity_id = f"{(37 * i + 11) % 10**8:08d}"
        host = host_for(f"search{entity_id}", n_hosts)
        out.append(
            SeedURL(f"https://{host}/search?qryCond={entity_id}", 0, 0, 0,
                    base_priority + i, host)
        )
    return out


class FixtureWeb:
    """Pure-function web: fetch(url, attempt) → {status, body}."""

    def __init__(
        self,
        seed: int = 42,
        n_hosts: int = 4,
        school_pages: int = 5,
        rows_per_school_page: int = 10,
        max_images_per_page: int = 3,
        image_sizes: tuple | None = None,
    ):
        self.seed = seed
        self.n_hosts = n_hosts
        self.school_pages = school_pages
        self.rows_per_school_page = rows_per_school_page
        self.max_images = max_images_per_page
        self.image_sizes = tuple(image_sizes) if image_sizes else None

    # ---------- robots ----------

    def robots_txt(self, host: str) -> bytes | None:
        """h1 disallows /blocked/; last host has no robots.txt (=> allow all);
        everyone else fully permissive."""
        hs = hosts(self.n_hosts)
        if self.n_hosts > 1 and host == hs[1]:
            return b"User-agent: *\nDisallow: /blocked/\n"
        if host == hs[-1] and self.n_hosts > 2:
            return None
        return b"User-agent: *\nDisallow:\n"

    # ---------- page synthesis ----------

    @staticmethod
    def _mod(key: int, m: int) -> int:
        r = key % m
        return r + m if r < 0 else r

    def classify(self, url: str) -> str:
        """Deterministic sentinel class of a URL (disjoint, precedence fixed)."""
        key = spark_xxhash64(url)
        if self._mod(key, NOT_FOUND_MOD) == 0:
            return "not_found"
        if self._mod(key, JUNK_MOD) == 0:
            return "junk"
        if self._mod(key, THROTTLE_MOD) == 0:
            return "throttle_once"
        return "ok"

    def n_images_for(self, url: str) -> int:
        if self.classify(url) != "ok":
            return 0
        return 1 + self._mod(spark_xxhash64(url) >> 8, self.max_images)

    def entity_for(self, url: str) -> tuple[str, str, str]:
        key = spark_xxhash64(url)
        entity_id = f"{self._mod(key, 10**8):08d}"
        entity_name = f"公司{self._mod(key >> 16, 10000):04d}"
        q = parse_qs(urlsplit(url).query)
        fname = q.get("fileName", [""])[0]
        category = next((t for t in REPORT_TYPES if t in fname), "est")
        return entity_id, entity_name, category

    def images_for(self, url: str) -> list[dict]:
        """The image records embedded in this URL's page — the golden truth
        the engine's extraction must reproduce."""
        entity_id, entity_name, category = self.entity_for(url)
        key = spark_xxhash64(url)
        kw = {"sizes": self.image_sizes} if self.image_sizes else {}
        return [
            make_image(
                self.seed, key ^ (k * 0x9E3779B9), k, entity_name, entity_id, category, **kw
            )
            for k in range(self.n_images_for(url))
        ]

    def _figures_html(self, url: str) -> str:
        figs = []
        for img in self.images_for(url):
            b64 = base64.b64encode(img["bytes"]).decode("ascii")
            figs.append(
                f'<figure><img src="data:image/{img["fmt"]};base64,{b64}"/>'
                f"<figcaption>{img['caption']}</figcaption></figure>"
            )
        return "".join(figs)

    def _dirty_address(self, key: int) -> str:
        """Address dirt exercising the X4 cleanup (truncate at CR, strip all
        whitespace and &nbsp; — DetailCrawler.php:533-545): cleans to
        台北市測試N區範例路M號."""
        return (
            f"台北市測試{self._mod(key >> 7, 9)}區&nbsp;範例 路"
            f"{self._mod(key >> 11, 200) + 1}號\r已了解，開始查詢"
        )

    def _shareholder_rows(self, key: int) -> str:
        """X5 shape (DetailCrawler.php:604-653): exactly-5-td rows; the
        所代表法人 cell cycles the union type — queryCmpy legal-entity link /
        plain string / empty."""
        titles = ["董事長", "董事", "監察人"]
        rows = []
        for i in range(1 + self._mod(key >> 5, 3)):
            name = f"股東{chr(65 + i)}{self._mod(key >> (13 + i), 100):02d}"
            v = self._mod(key >> (17 + i), 3)
            if v == 0:
                lid = self._mod(key >> (19 + i), 10**8)
                lname = f"法人投資{self._mod(key >> (25 + i), 100):02d}"
                legal = (
                    f"<a href=\"#\" onclick=\"queryCmpy('{lname}','{lid:08d}',1)\">"
                    f"{lname}</a>"
                )
            elif v == 1:
                legal = "個人股東"
            else:
                legal = ""
            stake = str(1000 * (i + 1) + self._mod(key >> 21, 1000))
            rows.append(
                f"<tr><td>{i + 1}</td><td>{titles[i % 3]}</td><td>{name}</td>"
                f"<td>{legal}</td><td>{stake}</td></tr>"
            )
        return "".join(rows)

    def _manager_rows(self, key: int) -> str:
        """X6 shape (DetailCrawler.php:656-695): exactly-3-td rows with a ROC
        就任日期."""
        rows = []
        for i in range(self._mod(key >> 9, 3)):
            yy = 100 + self._mod(key >> (23 + i), 20)
            mm = 1 + self._mod(key >> (27 + i), 12)
            dd = 1 + self._mod(key >> (31 + i), 28)
            rows.append(
                f"<tr><td>{i + 1}</td><td>經理{chr(65 + i)}{self._mod(key >> 15, 100):02d}</td>"
                f"<td>{yy}年{mm}月{dd}日</td></tr>"
            )
        return "".join(rows)

    def _detail_page(self, url: str) -> bytes:
        """Company detail page (DOM grammar), business detail page (nested
        capital table), or malformed-but-salvageable page (txt_td grammar →
        the X8 regex-fallback path), chosen deterministically from the URL."""
        entity_id, entity_name, category = self.entity_for(url)
        key = spark_xxhash64(url)
        u = urlsplit(url)
        fname = parse_qs(u.query).get("fileName", [""])[0]
        figs = self._figures_html(url)
        # X19 union type: a seeded third of entities carry an English name
        # variant on a second line (the string-or-array shape of
        # DetailCrawler.php:499-527); extraction must normalize to array
        if self._mod(key >> 3, 3) == 0:
            entity_name = f"{entity_name}\nTest Corp {self._mod(key >> 16, 10000):04d}"
        # X13 dirt: a seeded fifth embeds a JSON-breaking control char the
        # sanitizer (DetailCrawler.php:1064-1076) must strip
        if self._mod(key >> 6, 5) == 0:
            entity_name = f"{entity_name}\x01"
        if fname.startswith("A"):  # business registry page (area-code report)
            cap_rows = []
            for i in range(1 + self._mod(key >> 5, 3)):
                person = f"合夥人{chr(65 + i)}{self._mod(key >> (13 + i), 100):02d}"
                amt = 10000 * (i + 1) + self._mod(key >> (19 + i), 10000)
                cap_rows.append(
                    f"<tr><td>負責人姓名</td><td><table><tr><td>{person}</td>"
                    f"<td>出資額(元):{amt}</td></tr></table></td></tr>"
                )
            rows = (
                f"<tr><td>商業統一編號</td><td>{entity_id}</td></tr>"
                f"<tr><td>商業名稱</td><td>{entity_name}</td></tr>"
                f"<tr><td>地址</td><td>{self._dirty_address(key)}</td></tr>"
                f"<tr><td>核准變更日期</td><td>114年03月05日</td></tr>"
                + "".join(cap_rows)
                + "<tr><td>營業項目</td><td>F102030 餐館業 2 F203010 食品什貨 15</td></tr>"
            )
            html = (
                f"<html><body><div id='tabBusmContent'><table><tbody>{rows}"
                f"</tbody></table></div><div class='seals'>{figs}</div>"
                f"<p>category:{category}</p></body></html>"
            )
        elif self._mod(key >> 2, 13) == 0:
            # genuinely malformed page: txt_td label cells AND no <table>
            # wrapper (bare <tr> soup) — both the compiled KV grammar and a
            # DOM table walk fail; only the X8 regex-fallback whitelist +
            # X12 cleaning battery salvage it (DetailCrawler.php:1078-1153)
            name_line = entity_name.splitlines()[0]
            rows = (
                f'<tr><td class="txt_td">統一編號</td><td>{entity_id}</td></tr>'
                f'<tr><td class="txt_td">公司名稱</td><td>{name_line}   訂閱</td></tr>'
                f'<tr><td class="txt_td">公司所在地</td><td>台北市測試{self._mod(key >> 7, 9)}區'
                f"範例路{self._mod(key >> 11, 200) + 1}號 電子地圖 地址所屬公司家數: 3</td></tr>"
                f'<tr><td class="txt_td">登記機關</td><td>測試市政府 客服專線：0800-000-000</td></tr>'
                f'<tr><td class="txt_td">資本總額(元)</td><td>1,000,000</td></tr>'
                f'<tr><td class="txt_td">最後核准變更日期</td><td>114年03月05日</td></tr>'
                f'<tr><td class="txt_td">所營事業資料</td><td>F102030 餐館業 F203010 食品什貨</td></tr>'
            )
            html = (
                f"<html><body><div id='tabCmpyContent'>{rows}</div>"
                f"<div class='seals'>{figs}</div>"
                f"<p>category:{category}</p></body></html>"
            )
        else:
            rows = (
                f"<tr><td>統一編號</td><td>{entity_id}</td></tr>"
                f"<tr><td>公司名稱</td><td>{entity_name}</td></tr>"
                f"<tr><td>公司所在地</td><td>{self._dirty_address(key)}</td></tr>"
                f"<tr><td>核准變更日期</td><td>114年03月05日</td></tr>"
                f"<tr><td>所營事業資料</td><td>F102030 餐館業 F203010 食品什貨</td></tr>"
            )
            html = (
                f"<html><body><div id='tabCmpyContent'><table>{rows}</table></div>"
                f"<div id='tabShareHolderContent'><table></table>"
                f"<table><tbody>{self._shareholder_rows(key)}</tbody></table></div>"
                f"<div id='tabMgrContent'><table><tbody>{self._manager_rows(key)}"
                f"</tbody></table></div>"
                f"<div class='seals'>{figs}</div>"
                f"<p>category:{category}</p></body></html>"
            )
        pad = max(0, 1200 - len(html.encode("utf-8")))  # clear the 1000-byte gate
        return (html + "<!--" + "x" * pad + "-->").encode("utf-8")

    def _search_page(self, url: str) -> bytes:
        """Search-results page (DetailCrawler.php:371-430 shape): an
        eslist-table with ≥7-td rows, one per historical revision of the
        entity, each with a detail href and a 核准變更日期 cell. The engine
        must pick the LATEST date's href (X3). Dates are distinct by
        construction (no arsort tie ambiguity)."""
        u = urlsplit(url)
        entity_id = parse_qs(u.query).get("qryCond", ["00000000"])[0]
        key = spark_xxhash64(url)
        n_cand = 2 + self._mod(key >> 4, 3)  # 2-4 revisions
        latest = self._mod(key >> 12, n_cand)
        rows = []
        for v in range(n_cand):
            yy = 100 + self._mod(key >> (16 + v), 14)
            mm = 1 + self._mod(key >> (20 + v), 12)
            dd = 1 + self._mod(key >> (24 + v), 28)
            # force the `latest` candidate to carry the maximum date
            if v == latest:
                yy += 20
            href = f"https://{(u.hostname or '').lower()}/detail?id={entity_id}&v={v}"
            tds = "".join(f"<td>c{j}</td>" for j in range(5))
            rows.append(
                f"<tr>{tds}<td><a href='{href}'>{entity_id}</a></td>"
                f"<td data-title='核准變更日期'>{yy}年{mm}月{dd}日</td></tr>"
            )
        html = (
            "<html><body><table id='eslist-table'>" + "".join(rows)
            + "</table></body></html>"
        )
        pad = max(0, 1200 - len(html.encode("utf-8")))
        return (html + "<!--" + "x" * pad + "-->").encode("utf-8")

    def latest_detail_url(self, search_url: str) -> str:
        """Golden truth: the detail URL the latest-by-date pick must select."""
        from biz_crawlers_spark.extract.pages import parse_search_results, pick_latest

        return pick_latest(parse_search_results(self._search_page(search_url)))

    def _school_page(self, page: int) -> bytes:
        """School pages carry the same comment padding as detail/search pages:
        a real empty list page is a normal full-sized response (pagination
        ends on zero ROWS, not on the junk gate — SchoolCrawler.php:24-27),
        and content pages must clear MIN_PAGE_BYTES with margin so a small
        row-count change can't silently flip the whole crawl to junk."""
        rows = []
        if page <= self.school_pages:
            for i in range(self.rows_per_school_page):
                n = (page - 1) * self.rows_per_school_page + i
                cls = "td_style01" if i % 2 == 0 else "td_style02"
                rows.append(
                    f"<tr class='{cls}'><td>{n}</td><td>大專校院</td>"
                    f"<td>{(30000000 + n):08d}</td><td>學校{n:03d}</td></tr>"
                )
        html = "<html><body><table summary='訊息列表'>" + "".join(rows) + "</table></body></html>"
        pad = max(0, 1200 - len(html.encode("utf-8")))
        return (html + "<!--" + "x" * pad + "-->").encode("utf-8")

    # ---------- fetch ----------

    def fetch(
        self, url: str, attempt: int = 0, method: str = "GET",
        payload: str | None = None,
    ) -> dict:
        """Returns {status, body}; status ∈ ok|throttled|not_found|junk.

        S4 validation: /search requires the reference's POST form spec
        (method=POST, payload qryType=cmpyType&qryCond={id} —
        DetailCrawler.php:141-152); anything else gets an error page, so an
        engine that forgets the request spec fails the parity suite."""
        u = urlsplit(url)
        if u.path.endswith("/search"):
            entity_id = parse_qs(u.query).get("qryCond", [""])[0]
            expected = f"qryType=cmpyType&qryCond={entity_id}"
            if method != "POST" or payload != expected:
                return {"status": "error",
                        "body": b"<html><body>405 method not allowed</body></html>"}
        if u.path == "/robots.txt":
            body = self.robots_txt((u.hostname or "").lower())
            if body is None:
                return {"status": "not_found", "body": b""}
            return {"status": "ok", "body": body}
        if u.path.endswith("/school_list"):
            page = int(parse_qs(u.query).get("pages", ["1"])[0])
            return {"status": "ok", "body": self._school_page(page)}
        if u.path.endswith("/search"):
            cls = self.classify(url)
            if cls == "not_found":
                return {
                    "status": "not_found",
                    "body": f"<html><body>{NOT_FOUND_SENTINEL}</body></html>".encode("utf-8"),
                }
            if cls == "junk":
                return {"status": "junk", "body": b"<html><body>oops</body></html>"}
            if cls == "throttle_once" and attempt == 0:
                return {
                    "status": "throttled",
                    "body": f"<html><body>{THROTTLE_SENTINEL}</body></html>".encode("utf-8"),
                }
            return {"status": "ok", "body": self._search_page(url)}
        cls = self.classify(url)
        if cls == "not_found":
            return {
                "status": "not_found",
                "body": f"<html><body>{NOT_FOUND_SENTINEL}</body></html>".encode("utf-8"),
            }
        if cls == "junk":
            return {"status": "junk", "body": b"<html><body>oops</body></html>"}
        if cls == "throttle_once" and attempt == 0:
            return {
                "status": "throttled",
                "body": f"<html><body>{THROTTLE_SENTINEL}</body></html>".encode("utf-8"),
            }
        return {"status": "ok", "body": self._detail_page(url)}
