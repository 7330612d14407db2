"""General-HTML extraction (X2/X4-X7 over arbitrary markup).

The hot-path extractors in extract/pages.py are compiled regex grammars —
the right tool inside a vectorized UDF for a KNOWN page shape. This module
is the general path: a tiny DOM built on stdlib ``html.parser`` (the sandbox
has no lxml), mirroring how the reference actually parses
(DOMDocument::getElementById / getElementsByTagName / nodeValue —
DetailCrawler.php:448-704). It tolerates what regexes cannot: arbitrary
attribute order and quoting, interleaved tags inside cells, HTML entities,
unclosed <br>, whitespace-mangled markup.

``build_entity_record_dom`` produces EXACTLY the same record dict as
extract.pages.build_entity_record — property: equal output on every fixture
page (tests/test_dom.py) — while also handling markup the grammar path
would reject.
"""

from __future__ import annotations

from html.parser import HTMLParser

from biz_crawlers_spark.extract.pages import (
    _AMOUNT_RE,
    _QUERY_CMPY_RE,
    _ROC_DATE_RE,
    _sanitize_leaf,
    clean_address,
    parse_business_items,
    parse_business_items_simple,
    parse_detail_fallback,
    parse_names,
    parse_roc_date,
)

_VOID_TAGS = {"br", "img", "hr", "meta", "link", "input", "source", "area", "base",
              "col", "embed", "track", "wbr"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Node or str
        self.parent = parent

    # ---- traversal ----

    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter()

    def find_all(self, tag: str, direct: bool = False) -> list["Node"]:
        if direct:
            return [c for c in self.children if isinstance(c, Node) and c.tag == tag]
        return [n for n in self.iter() if n is not self and n.tag == tag]

    def by_id(self, node_id: str) -> "Node | None":
        for n in self.iter():
            if n.attrs.get("id") == node_id:
                return n
        return None

    def text(self) -> str:
        """Recursive text content — the analog of PHP's nodeValue. <br>
        contributes a newline (the reference's multi-name pages rely on
        line splits)."""
        parts: list[str] = []

        def walk(n: Node) -> None:
            for c in n.children:
                if isinstance(c, str):
                    parts.append(c)
                elif c.tag == "br":
                    parts.append("\n")
                else:
                    walk(c)

        walk(self)
        return "".join(parts)

    def html(self) -> str:
        """Approximate serialization (enough for attribute-level regexes
        like the queryCmpy legal-entity link)."""
        out: list[str] = []

        def walk(n: Node) -> None:
            attrs = "".join(f' {k}="{v}"' for k, v in n.attrs.items())
            out.append(f"<{n.tag}{attrs}>")
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)
            if n.tag not in _VOID_TAGS:
                out.append(f"</{n.tag}>")

        walk(self)
        return "".join(out)


class _Builder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # tolerate mis-nesting: pop to the nearest matching ancestor
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def parse_html(body: bytes | str) -> Node:
    text = body.decode("utf-8", errors="replace") if isinstance(body, bytes) else body
    b = _Builder()
    b.feed(text)
    b.close()
    return b.root


# ---------- X2: CSS-ish extraction with warn-and-null semantics ----------

def select_text(root: Node, node_id: str) -> str | None:
    """BaseCrawler.php:152-161 extractText analog: missing element → None,
    never an exception."""
    n = root.by_id(node_id)
    return n.text().strip() if n is not None else None


def select_attr(root: Node, node_id: str, attr: str) -> str | None:
    n = root.by_id(node_id)
    return n.attrs.get(attr) if n is not None else None


def _rows(table: Node) -> list[Node]:
    tbody = table.find_all("tbody")
    scope = tbody[0] if tbody else table
    return scope.find_all("tr")


def _kv_of(div: Node) -> dict[str, str]:
    tables = div.find_all("table")
    if not tables:
        return {}
    out: dict[str, str] = {}
    for tr in _rows(tables[0]):
        tds = tr.find_all("td", direct=True)
        if len(tds) < 2:
            continue
        key = tds[0].text().strip()
        if key and key not in out:
            # plain-text value (nodeValue); nested tables handled separately
            out[key] = tds[1].text().strip()
    return out


def parse_shareholders_dom(root: Node) -> list[dict]:
    div = root.by_id("tabShareHolderContent")
    if div is None:
        return []
    tables = div.find_all("table")
    table = tables[1] if len(tables) > 1 else (tables[0] if tables else None)
    if table is None:
        return []
    out = []
    for tr in _rows(table):
        tds = tr.find_all("td", direct=True)
        if len(tds) != 5:
            continue
        legal_html = tds[3].html()
        lm = _QUERY_CMPY_RE.search(legal_html)
        if lm:
            legal_name, legal_id = lm.group(1), lm.group(2)
        else:
            legal_name, legal_id = tds[3].text().strip(), None
        out.append(
            {"seq": tds[0].text().strip(), "title": tds[1].text().strip(),
             "name": tds[2].text().strip(), "legal_id": legal_id,
             "legal_name": legal_name, "stake": tds[4].text().strip()}
        )
    return out


def parse_managers_dom(root: Node) -> list[dict]:
    div = root.by_id("tabMgrContent")
    if div is None:
        return []
    tables = div.find_all("table")
    if not tables:
        return []
    out = []
    for tr in _rows(tables[0]):
        tds = tr.find_all("td", direct=True)
        if len(tds) != 3:
            continue
        dm = _ROC_DATE_RE.search(tds[2].text())
        date = (
            {"year": 1911 + int(dm.group(1)), "month": int(dm.group(2)),
             "day": int(dm.group(3))}
            if dm
            else None
        )
        out.append({"seq": tds[0].text().strip(), "name": tds[1].text().strip(),
                    "date": date})
    return out


def _busm_capital(div: Node) -> tuple[str | None, list]:
    person_last, amounts = None, []
    for tr in div.find_all("tr"):
        tds = tr.find_all("td", direct=True)
        if len(tds) < 2 or tds[0].text().strip() != "負責人姓名":
            continue
        inner_tables = tds[1].find_all("table")
        if not inner_tables:
            continue
        inner_rows = _rows(inner_tables[0])
        if not inner_rows:
            continue
        inner_tds = inner_rows[0].find_all("td", direct=True)
        if len(inner_tds) < 2:
            continue
        person = inner_tds[0].text().strip()
        am = _AMOUNT_RE.search(inner_tds[1].text())
        amount = int(am.group(1)) if am else 0
        if person:
            person_last = person
            amounts.append({"name": person, "amount": amount})
    return person_last, amounts


def build_entity_record_dom(body: bytes) -> dict | None:
    """DOM-path record builder: identical output contract to
    extract.pages.build_entity_record (equivalence property-tested on every
    fixture page), but driven by the html.parser DOM — correct on arbitrary
    attribute order/quoting, entities, and tag nesting."""
    import json as _json

    root = parse_html(body)
    cmpy = root.by_id("tabCmpyContent")
    busm = root.by_id("tabBusmContent")

    rec: dict | None = None
    if cmpy is not None and "統一編號" in _kv_of(cmpy):
        fields = _kv_of(cmpy)
        names = parse_names(fields.get("公司名稱", ""))
        roc = parse_roc_date(fields.get("核准變更日期", ""))
        raw_items = fields.get("所營事業資料", "")
        items = parse_business_items(raw_items, strip_sort_number=False)
        if not items and raw_items.strip():
            items = [ln.strip() for ln in raw_items.split("\n") if ln.strip()]
        rec = {
            "entity_id": fields["統一編號"].rjust(8, "0"),
            "names": names,
            "address": clean_address(fields["公司所在地"])
            if "公司所在地" in fields
            else None,
            "change_date": roc,
            "biz_items": items,
            "shareholders": parse_shareholders_dom(root),
            "managers": parse_managers_dom(root),
            "capital": [],
            "parse_mode": "dom",
        }
    elif busm is not None and "商業統一編號" in _kv_of(busm):
        fields = _kv_of(busm)
        names = parse_names(fields.get("商業名稱", ""))
        roc = parse_roc_date(fields.get("核准變更日期", ""))
        items = parse_business_items(fields.get("營業項目", ""), strip_sort_number=True)
        person, capital = _busm_capital(busm)
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
        fb = parse_detail_fallback(body)  # X8: same fallback branch
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
            "shareholders": [],
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
