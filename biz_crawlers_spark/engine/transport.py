"""Transport seam — the pluggable boundary between the crawl engine and
"the web" (VERDICT r2 "What's missing" #3).

Every fetch the engine performs — page fetches inside the mapInPandas stage,
robots.txt resolution in the distributed robots pre-pass — goes through a
Transport built by :func:`make_transport` from a plain picklable params dict,
so workers reconstruct it at task start (no live connection objects cross
the driver/worker boundary). A transport implements exactly one method::

    fetch(url, attempt=0, method="GET", payload=None) -> {"status": str,
                                                           "body": bytes}

``status`` is the transport-level outcome ("ok" | "not_found" | "throttled" |
"junk" | "error" — the engine re-classifies via extract.pages.classify_page);
``body`` is raw bytes. A production HTTP client (the slot-in for the
reference's Goutte/cURL stack, BaseCrawler.php:79-150) implements the same
method; all politeness/session/retry semantics live in the ENGINE
(engine/stage.py + politeness/budget.py), never in the transport, so the
schedule-parity guarantees hold for any transport.

Selection: ``params["transport"]`` names the implementation (default
"fixture"); the remaining keys are its constructor kwargs.
"""

from __future__ import annotations


class DictTransport:
    """A dict-backed transport: proof the engine is not welded to FixtureWeb.

    ``responses``: url → list of (status, body) indexed by ``attempt``
    (clamped to the last entry — so ``[("throttled", ...), ("ok", ...)]``
    scripts a throttle-once host). ``specs``: url → (method, payload)
    request-spec validation, mirroring FixtureWeb's S4 check (a wrong
    method/payload yields an error page). Unknown URLs are not_found.
    """

    def __init__(self, responses: dict, specs: dict | None = None):
        self.responses = {
            u: [
                (s, b.encode("utf-8") if isinstance(b, str) else bytes(b))
                for s, b in rs
            ]
            for u, rs in responses.items()
        }
        self.specs = {u: tuple(sp) for u, sp in (specs or {}).items()}

    def fetch(
        self, url: str, attempt: int = 0, method: str = "GET",
        payload: str | None = None,
    ) -> dict:
        spec = self.specs.get(url)
        if spec is not None and (method, payload) != spec:
            return {
                "status": "error",
                "body": b"<html><body>405 method not allowed</body></html>",
            }
        rs = self.responses.get(url)
        if not rs:
            return {"status": "not_found", "body": b""}
        status, body = rs[min(attempt, len(rs) - 1)]
        return {"status": status, "body": body}


class HTTPTransport:
    """A real HTTP client on the seam — the slot-in for the reference's
    Goutte/cURL stack (BaseCrawler.php:79-150, DetailCrawler.php:34-103).

    One request per ``fetch`` call; ALL retry/backoff/politeness logic stays
    in the engine (the transport's ``attempt`` arg is accepted and ignored —
    a real server derives retry state from its own traffic, which is exactly
    what the loopback fixture server does). Bodies are returned as raw bytes
    (binary downloads, S2 — never text-decoded here).

    ``base_addr`` ("127.0.0.1:8043") reroutes every request to that loopback
    address over plain http, carrying the ORIGINAL host in the Host /
    X-Forwarded-Host headers — the standard reverse-proxy shape, and what
    lets the offline parity suite exercise this transport against a local
    ``http.server`` serving the fixture web. ``base_addr=None`` requests the
    URL as-is (the production path).

    Status mapping (transport-level; the engine re-classifies from the body
    via extract.pages.classify_page, so sentinel pages served with 200 still
    classify correctly):  2xx → ok · 404/410 → not_found · 429/503 →
    throttled · other codes and transport errors (DNS, refused, timeout) →
    error (the engine's retry path, mirroring BaseCrawler.php:100-106's
    catch-sleep-retry).
    """

    RETRYABLE = {429: "throttled", 503: "throttled", 404: "not_found", 410: "not_found"}

    def __init__(self, base_addr: str | None = None, timeout: float = 10.0):
        self.base_addr = base_addr
        self.timeout = timeout

    def _target(self, url: str) -> tuple[str, dict]:
        from urllib.parse import urlsplit

        if self.base_addr is None:
            return url, {}
        u = urlsplit(url)
        q = f"?{u.query}" if u.query else ""
        host = (u.hostname or "").lower()
        return (
            f"http://{self.base_addr}{u.path}{q}",
            {"Host": host, "X-Forwarded-Host": host},
        )

    def fetch(
        self, url: str, attempt: int = 0, method: str = "GET",
        payload: str | None = None,
    ) -> dict:
        import urllib.error
        import urllib.request

        target, headers = self._target(url)
        data = None
        if payload is not None:
            data = payload.encode("utf-8")
            headers["Content-Type"] = "application/x-www-form-urlencoded"
        req = urllib.request.Request(target, data=data, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return {"status": "ok", "body": resp.read()}
        except urllib.error.HTTPError as err:
            body = b""
            try:
                body = err.read()
            except Exception:
                pass
            return {"status": self.RETRYABLE.get(err.code, "error"), "body": body}
        except (urllib.error.URLError, TimeoutError, OSError):
            return {"status": "error", "body": b""}


def make_transport(params: dict | None):
    """Build a transport from a picklable params dict (see module docstring)."""
    p = dict(params or {})
    kind = p.pop("transport", "fixture")
    if kind == "fixture":
        from biz_crawlers_spark.fixtures.web import FixtureWeb

        return FixtureWeb(**p)
    if kind == "dict":
        return DictTransport(**p)
    if kind == "http":
        return HTTPTransport(**p)
    raise ValueError(f"unknown transport {kind!r}")


def snapshot_transport(web, urls: list[str], max_attempts: int = 4) -> dict:
    """Materialize any transport's behavior over ``urls`` into DictTransport
    params: per-attempt response lists plus the engine's request spec per URL
    (so S4 POST validation carries over). Used by the seam-swap parity test —
    a crawl driven by the snapshot must produce the identical schedule."""
    from biz_crawlers_spark.engine.stage import request_spec

    responses: dict[str, list] = {}
    specs: dict[str, tuple] = {}
    for url in urls:
        method, payload = request_spec(url)
        if method != "GET" or payload is not None:
            specs[url] = (method, payload)
        responses[url] = [
            (r["status"], r["body"])
            for r in (
                web.fetch(url, attempt=a, method=method, payload=payload)
                for a in range(max_attempts)
            )
        ]
    return {"transport": "dict", "responses": responses, "specs": specs}
