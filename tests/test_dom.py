"""X2 general-HTML extraction (extract/dom.py): the html.parser DOM path
must (a) produce BYTE-IDENTICAL records to the compiled-grammar fast path on
every fixture page, and (b) keep working on markup the grammar path cannot
parse (attribute reorder, single quotes, entities, interleaved tags)."""

from __future__ import annotations

import json

from biz_crawlers_spark.extract.dom import (
    build_entity_record_dom,
    parse_html,
    parse_shareholders_dom,
    select_attr,
    select_text,
)
from biz_crawlers_spark.extract.pages import build_entity_record
from biz_crawlers_spark.fixtures.web import FixtureWeb, business_seed, company_seed, search_seed


def _ok_pages():
    web = FixtureWeb(seed=42, n_hosts=4)
    pages = []
    for s in company_seed(114, 3) + business_seed(114, 3):
        res = web.fetch(s.url, attempt=1)
        if res["status"] == "ok":
            pages.append(res["body"])
    for s in search_seed(10):
        du = web.latest_detail_url(s.url)
        if du:
            res = web.fetch(du, attempt=1)
            if res["status"] == "ok":
                pages.append(res["body"])
    return pages


def test_dom_equals_grammar_on_every_fixture_page():
    pages = _ok_pages()
    assert len(pages) > 80
    checked = 0
    for body in pages:
        a = build_entity_record(body)
        b = build_entity_record_dom(body)
        assert a == b, f"divergence:\n{a}\n{b}"
        if a is not None:
            checked += 1
    assert checked > 80


MESSY = """
<HTML><body>
<div class='x' id="tabCmpyContent"><table><tbody>
<tr ><td class="a">統一編號</td ><td>1234567</td></tr>
<tr><td>公司名稱</td><td><b>測試&amp;公司</b><br/>Second Name Co</td></tr>
<tr><td>公司所在地</td><td>台北市 信義區&nbsp;路1號\r尾巴</td></tr>
<tr><td>核准變更日期</td><td><span>114年3月5日</span></td></tr>
<tr><td>所營事業資料</td><td>F102030 餐館業</td></tr>
</tbody></table></div>
<div id='tabShareHolderContent'><table></table><table><tbody>
<tr><td>1</td><td>董事</td><td>王五</td>
    <td><a onclick="queryCmpy('法人乙','87654321',1)" href="#">法人乙</a></td>
    <td>999</td></tr>
</tbody></table></div>
<div id='tabMgrContent'><table><tbody>
<tr><td>1</td><td>經理丙</td><td>100年1月2日</td></tr>
</tbody></table></div>
</body></HTML>
"""


def test_dom_handles_messy_markup_grammar_cannot():
    body = MESSY.encode("utf-8")
    # the compiled grammar path fails (attrs on td, tags inside values) and
    # falls through to the fallback whitelist, which finds no txt_td cells
    assert build_entity_record(body) is None
    rec = build_entity_record_dom(body)
    assert rec is not None and rec["parse_mode"] == "dom"
    assert rec["entity_id"] == "01234567"
    names = json.loads(rec["entity_names"])
    assert names == ["測試&公司", "Second Name Co"]  # entity + <br> split
    assert rec["address"] == "台北市信義區路1號"  # nbsp + CR truncation
    assert rec["change_date"] == "2025-03-05"
    shs = json.loads(rec["shareholders"])
    assert shs == [{"seq": "1", "title": "董事", "name": "王五",
                    "legal_id": "87654321", "legal_name": "法人乙",
                    "stake": "999"}]
    mgrs = json.loads(rec["managers"])
    assert mgrs[0]["date"] == {"year": 2011, "month": 1, "day": 2}


def test_x2_warn_and_null_selectors():
    root = parse_html("<div id='a' data-x='1'>hi <b>there</b></div>")
    assert select_text(root, "a") == "hi there"
    assert select_attr(root, "a", "data-x") == "1"
    assert select_text(root, "missing") is None  # warn-and-null, no raise
    assert select_attr(root, "a", "nope") is None
    assert parse_shareholders_dom(root) == []


def test_dom_tolerates_misnesting_and_void_tags():
    root = parse_html("<table><tr><td>a<br><img src='x'></td><td>b</td></table>")
    trs = root.find_all("tr")
    assert len(trs) == 1
    tds = trs[0].find_all("td", direct=True)
    assert [t.text().strip() for t in tds] == ["a", "b"]
