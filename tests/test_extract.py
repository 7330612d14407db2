"""Unit tests for the X-series extraction surface (no Spark needed):
X5 shareholders, X6 managers, X7 nested capital, X8 regex fallback,
X10 business-item variants, X12 cleaning battery, X13 sanitization.
Semantics mirror crawlers/DetailCrawler.php (cited per function under test).
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from biz_crawlers_spark.extract.pages import (
    build_entity_record,
    clean_address,
    clean_field_value,
    parse_business_items,
    parse_business_items_simple,
    parse_capital_contributions,
    parse_detail_fallback,
    parse_managers,
    parse_shareholders,
    sanitize_json_string,
    trim_key_field,
)

SH_PAGE = b"""
<html><body><div id='tabShareHolderContent'><table></table><table><tbody>
<tr><td>1</td><td>\xe8\x91\xa3\xe4\xba\x8b\xe9\x95\xb7</td><td>\xe7\x8e\x8b\xe5\xb0\x8f\xe6\x98\x8e</td><td><a href="#" onclick="queryCmpy('\xe6\xb3\x95\xe4\xba\xba\xe7\x94\xb2','12345678',1)">\xe6\xb3\x95\xe4\xba\xba\xe7\x94\xb2</a></td><td>1000</td></tr>
<tr><td>2</td><td>\xe7\x9b\xa3\xe5\xaf\x9f\xe4\xba\xba</td><td>\xe6\x9d\x8e\xe5\xa4\xa7\xe5\x90\x8c</td><td>\xe5\x80\x8b\xe4\xba\xba</td><td>2000</td></tr>
<tr><td>3</td><td>\xe8\x91\xa3\xe4\xba\x8b</td><td>\xe5\xbc\xb5\xe4\xb8\x89</td><td></td><td>3000</td></tr>
<tr><td>bad</td><td>only-two-tds</td></tr>
</tbody></table></div></body></html>
"""


def test_parse_shareholders_union_type():
    """X5 (DetailCrawler.php:604-653): exactly-5-td rows; legal-entity union
    (queryCmpy link → id+name, plain string → name only, empty → empty)."""
    out = parse_shareholders(SH_PAGE)
    assert len(out) == 3
    assert out[0]["legal_id"] == "12345678" and out[0]["legal_name"] == "法人甲"
    assert out[0]["title"] == "董事長" and out[0]["name"] == "王小明"
    assert out[0]["stake"] == "1000"
    assert out[1]["legal_id"] is None and out[1]["legal_name"] == "個人"
    assert out[2]["legal_id"] is None and out[2]["legal_name"] == ""


def test_parse_shareholders_skips_first_spacer_table():
    """The reference skips the first (empty) table and parses the second."""
    one_table = SH_PAGE.replace(b"<table></table>", b"")
    assert len(parse_shareholders(one_table)) == 3  # falls back to table 0


def test_parse_managers_roc_dates():
    """X6 (DetailCrawler.php:656-695): 3-td rows, 就任日期 ROC year +1911."""
    page = (
        "<html><body><div id='tabMgrContent'><table><tbody>"
        "<tr><td>1</td><td>經理甲</td><td>111年05月01日</td></tr>"
        "<tr><td>2</td><td>經理乙</td><td>待定</td></tr>"
        "<tr><td>x</td><td>four</td><td>tds</td><td>ignored</td></tr>"
        "</tbody></table></div></body></html>"
    ).encode("utf-8")
    out = parse_managers(page)
    assert len(out) == 2
    assert out[0] == {"seq": "1", "name": "經理甲",
                      "date": {"year": 2022, "month": 5, "day": 1}}
    assert out[1]["date"] is None


def test_parse_capital_contributions():
    """X7 (DetailCrawler.php:783-829): inner-table first row per 負責人姓名
    cell; amounts accumulate, the person field is last-writer-wins."""
    busm = (
        "<tr><td>負責人姓名</td><td><table><tr><td>合夥人甲</td>"
        "<td>出資額(元):10000</td></tr></table></td></tr>"
        "<tr><td>負責人姓名</td><td><table><tr><td>合夥人乙</td>"
        "<td>出資額(元):20000</td></tr></table></td></tr>"
    )
    person, amounts = parse_capital_contributions(busm)
    assert person == "合夥人乙"
    assert amounts == [{"name": "合夥人甲", "amount": 10000},
                       {"name": "合夥人乙", "amount": 20000}]


def test_parse_detail_fallback_whitelist_and_cleaning():
    """X8 (DetailCrawler.php:1078-1153): txt_td grammar, 10-label whitelist,
    X12 cleaning battery applied to every value."""
    page = (
        "<html><body><div id='tabCmpyContent'><table>"
        '<tr><td class="txt_td">統一編號</td><td>123</td></tr>'
        '<tr><td class="txt_td">公司名稱</td><td>測試公司   訂閱</td></tr>'
        '<tr><td class="txt_td">登記機關</td><td>市政府 客服專線：0800</td></tr>'
        '<tr><td class="txt_td">不在白名單</td><td>dropped</td></tr>'
        "</table></div></body></html>"
    ).encode("utf-8")
    out = parse_detail_fallback(page)
    assert out["統一編號"] == "123"
    assert out["公司名稱"] == "測試公司"
    assert out["登記機關"] == "市政府"
    assert "不在白名單" not in out


def test_clean_field_value_battery():
    """X12 (DetailCrawler.php:978-1007): the 11 boilerplate patterns."""
    assert clean_field_value("公司名\r\n\t訂閱") == "公司名"
    assert clean_field_value("名字 Google搜尋 後綴") == "名字後綴"
    assert clean_field_value("地址 電子地圖") == "地址"
    assert clean_field_value("路1號 地址所屬公司家數: 42 尾") == "路1號尾"
    assert clean_field_value("前「查詢最新營業狀況請至某處」後") == "前後"
    assert clean_field_value("本項查詢服務很長\n的說明關閉尾巴") == "尾巴"
    assert clean_field_value("機關 客服專線：123-456") == "機關"
    assert clean_field_value("值 已了解，開始查詢剩餘") == "值"
    assert clean_field_value("值 關閉") == "值"
    assert clean_field_value("  a \t b  ") == "a b"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_clean_field_value_idempotent(s):
    once = clean_field_value(s)
    assert clean_field_value(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_sanitize_idempotent(s):
    once = sanitize_json_string(s)
    assert sanitize_json_string(once) == once


def test_sanitize_json_string():
    """X13 (DetailCrawler.php:1064-1076): strip exactly the JSON-breaking
    control chars; \\t \\n \\r and CJK survive (then trim)."""
    assert sanitize_json_string("公\x00司\x1f名\x7f") == "公司名"
    assert sanitize_json_string(" a\tb\nc ") == "a\tb\nc"


def test_clean_address():
    """X4 address branch (DetailCrawler.php:533-545): truncate at CR, strip
    all whitespace and &nbsp;."""
    assert clean_address("台北市 信義區&nbsp;路1號\r更多資訊") == "台北市信義區路1號"
    assert clean_address("  台中市\t西區　路2號  ") == "台中市西區路2號"


def test_business_items_variants():
    """X10: company keeps raw descriptions (DetailCrawler.php:548-584);
    business strips trailing sort numbers (:857); the fallback uses the
    simple [A-Z]\\d{6} split (:1009-1037)."""
    s = "F102030 餐館業 2 F203010 食品什貨 15"
    assert parse_business_items(s, strip_sort_number=False) == [
        ("F102030", "餐館業 2"), ("F203010", "食品什貨 15")]
    assert parse_business_items(s, strip_sort_number=True) == [
        ("F102030", "餐館業"), ("F203010", "食品什貨")]
    assert parse_business_items_simple("F102030 餐館業 F203010 食品什貨") == [
        ("F102030", "餐館業"), ("F203010", "食品什貨")]
    assert trim_key_field("  a   b ") == "a b"


def _fixture_pages():
    from biz_crawlers_spark.fixtures.web import FixtureWeb, business_seed, company_seed

    web = FixtureWeb(seed=42, n_hosts=4)
    pages = {"company": [], "business": [], "fallback": []}
    for s in company_seed(114, 3) + business_seed(114, 3):
        res = web.fetch(s.url, attempt=1)
        if res["status"] != "ok":
            continue
        body = res["body"]
        if b"tabBusmContent" in body:
            pages["business"].append(body)
        elif b"txt_td" in body:
            pages["fallback"].append(body)
        else:
            pages["company"].append(body)
    return pages


def test_build_entity_record_company():
    pages = _fixture_pages()
    assert len(pages["company"]) >= 10
    for body in pages["company"]:
        rec = build_entity_record(body)
        assert rec["parse_mode"] == "dom"
        assert len(rec["entity_id"]) == 8
        assert rec["address"] and "\r" not in rec["address"]
        assert json.loads(rec["biz_items"]) == [
            ["F102030", "餐館業"], ["F203010", "食品什貨"]]
        for sh in json.loads(rec["shareholders"]):
            assert set(sh) == {"seq", "title", "name", "legal_id", "legal_name", "stake"}
        for m in json.loads(rec["managers"]):
            assert m["date"] is None or m["date"]["year"] >= 2011
        assert "\x01" not in rec["entity_name"]  # X13 applied


def test_build_entity_record_business_and_fallback():
    pages = _fixture_pages()
    assert len(pages["business"]) >= 10 and len(pages["fallback"]) >= 1
    for body in pages["business"]:
        rec = build_entity_record(body)
        assert rec["parse_mode"] == "dom"
        caps = json.loads(rec["capital"])
        assert caps and all(isinstance(c["amount"], int) for c in caps)
        # X10 business rule: trailing sort numbers stripped
        assert json.loads(rec["biz_items"]) == [
            ["F102030", "餐館業"], ["F203010", "食品什貨"]]
    for body in pages["fallback"]:
        rec = build_entity_record(body)
        assert rec["parse_mode"] == "regex"
        assert rec["shareholders"] == "[]" and rec["managers"] == "[]"
        assert rec["entity_name"] and "訂閱" not in rec["entity_name"]  # X12
        assert rec["change_date"] == "2025-03-05"
