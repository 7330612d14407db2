from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from biz_crawlers_spark.frontier.canonical import canonicalize, url_host, url_key


def test_basic_rules():
    assert canonicalize("HTTP://Fixture.TEST:80/a?b=2&a=1#frag") == "http://fixture.test/a?a=1&b=2"
    assert canonicalize("https://h.test:443/") == "https://h.test/"
    assert canonicalize("https://h.test:8443/x") == "https://h.test:8443/x"
    assert canonicalize("http://h.test") == "http://h.test/"
    assert canonicalize("http://h.test/p?") == "http://h.test/p"


def test_query_sort_stable():
    a = canonicalize("http://h.test/p?z=1&a=2&a=1")
    b = canonicalize("http://h.test/p?a=2&a=1&z=1")
    assert a == b == "http://h.test/p?a=1&a=2&z=1"


url_st = st.builds(
    lambda scheme, host, path, q: f"{scheme}://{host}/{path}?{q}",
    st.sampled_from(["http", "https", "HTTP"]),
    st.from_regex(r"[a-zA-Z][a-zA-Z0-9.-]{0,20}", fullmatch=True),
    st.from_regex(r"[a-z0-9/._-]{0,30}", fullmatch=True),
    st.from_regex(r"([a-z]{1,5}=[a-z0-9]{0,8}&?){0,4}", fullmatch=True),
)


@given(url_st)
@settings(max_examples=300, deadline=None)
def test_idempotent(u):
    c = canonicalize(u)
    assert canonicalize(c) == c


def test_key_and_host():
    u = "https://findbiz.nat.gov.tw/fts/query/QueryBar/queryInit.do"
    assert url_host(u) == "findbiz.nat.gov.tw"
    assert url_key(u) == url_key("HTTPS://FINDBIZ.NAT.GOV.TW:443/fts/query/QueryBar/queryInit.do")
    assert url_key(u) != url_key(u + "x")
