"""Pure-Python reference simulator — the crawl-parity oracle (SURVEY.md §5.2.2).

A faithful reimplementation of the reference's *control flow* — strictly
sequential iteration in seed insertion order (crawl-details.php:305-348,
GCISCrawler.php:46-66), seen-check before fetch (D2), in-place
throttle/junk retry with backoff (P4/P5: DetailCrawler.php:162-168,
BaseCrawler.php:84-106), sentinel handling (X20), figure extraction and
decode — with no Spark, no JVM, no parallelism.

The engine must match it on:
  - per-host crawl order (sequence of url_keys): the reference's single
    global sequence restricted to one host equals the engine's per-host
    order; the engine's global interleaving across hosts is the
    parallelism (SURVEY.md §7)
  - the final URL-seen set
  - per-image decoded pixels (exact — both decode the same bytes) and
    caption equality; PSNR ≥ 40 dB vs the pre-encode golden pixels for
    lossy formats (BASELINE.json input_hint)
  - lineage totals (fetched / deduped / failed / retried / robots_denied)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

import numpy as np

from biz_crawlers_spark import codecs
from biz_crawlers_spark.extract.pages import (
    build_entity_record,
    classify_page,
    extract_figures,
    parse_school_rows,
    parse_search_results,
    pick_latest,
)
from biz_crawlers_spark.fixtures.web import FixtureWeb, SeedURL
from biz_crawlers_spark.frontier.canonical import canonicalize, url_key
from biz_crawlers_spark.politeness.budget import PolitenessBudget
from biz_crawlers_spark.politeness.robots import is_allowed, parse_robots


@dataclass
class SimResult:
    per_host_order: dict[str, list[int]] = field(default_factory=dict)
    detail_order: dict[str, list[int]] = field(default_factory=dict)  # two-hop details
    seen: set[int] = field(default_factory=set)
    images: dict[str, dict] = field(default_factory=dict)  # image_id → record
    records: dict[str, dict] = field(default_factory=dict)
    counters: dict[str, int] = field(default_factory=dict)
    statuses: dict[int, str] = field(default_factory=dict)  # url_key → terminal status
    # the politeness VIRTUAL CLOCK after each fetch completes (P1-P6 + S3
    # warmups), keyed by url_key — the engine's staging scheduled_at must
    # equal this exactly (schedule parity, strict mode)
    schedule: dict[int, float] = field(default_factory=dict)


class ReferenceSimulator:
    def __init__(self, web: FixtureWeb, budget: PolitenessBudget):
        self.web = web
        self.budget = budget

    def run(self, seeds: list[SeedURL]) -> SimResult:
        r = SimResult(
            counters={
                "fetched": 0, "ok": 0, "deduped": 0, "failed": 0, "retried": 0,
                "robots_denied": 0, "not_found": 0, "images": 0, "discovered": 0,
            }
        )
        robots: dict[str, list[str]] = {}
        queue: list[SeedURL] = list(seeds)
        batch_seen: set[int] = set()
        clock: dict[str, float] = {}  # per-host virtual politeness clock
        warmed: set[str] = set()
        i = 0
        while i < len(queue):
            s = queue[i]
            i += 1
            cu = canonicalize(s.url)
            key = url_key(s.url)
            if key in r.seen or key in batch_seen:
                r.counters["deduped"] += 1
                continue
            batch_seen.add(key)
            host = s.host
            if host not in robots:
                res = self.web.fetch(f"https://{host}/robots.txt")
                robots[host] = parse_robots(res["body"] if res["status"] == "ok" else None)
            if not is_allowed(cu, robots[host]):
                r.counters["robots_denied"] += 1
                r.per_host_order.setdefault(host, []).append(key)
                r.statuses[key] = "robots_denied"
                continue
            if self.budget.warmup_requests and host not in warmed:
                clock[host] = clock.get(host, 0.0) + self.budget.warmup_s  # S3
                warmed.add(host)
            status, body = self._fetch_retrying(r, cu, host, clock)
            r.schedule[key] = clock[host]
            r.per_host_order.setdefault(host, []).append(key)
            r.statuses[key] = status
            if status == "not_found":
                r.counters["not_found"] += 1
                r.seen.add(key)
                continue
            if status != "ok":
                r.counters["failed"] += 1
                continue
            r.counters["ok"] += 1
            r.seen.add(key)
            # two-hop: search page → latest-by-date detail fetched
            # immediately in the same iteration (DetailCrawler.php:105-236)
            if "/search" in cu:
                detail_url = pick_latest(parse_search_results(body))
                if detail_url:
                    d_key = url_key(detail_url)
                    d_status, d_body = self._fetch_retrying(r, detail_url, host, clock)
                    r.schedule[d_key] = clock[host]
                    r.detail_order.setdefault(host, []).append(d_key)
                    r.statuses[d_key] = d_status
                    if d_status == "not_found":
                        r.counters["not_found"] += 1
                        r.seen.add(d_key)
                    elif d_status != "ok":
                        r.counters["failed"] += 1
                    else:
                        r.counters["ok"] += 1
                        r.seen.add(d_key)
                        self._ingest_payload(r, d_body, d_key)
                continue
            self._ingest_payload(r, body, key)
            # pagination discovery (F4): append next page to the END of the
            # queue — matches the engine's next-epoch scheduling
            if "/school_list" in cu and parse_school_rows(body):
                from urllib.parse import parse_qs, urlsplit

                page = int(parse_qs(urlsplit(cu).query).get("pages", ["1"])[0])
                nxt = f"https://{host}/school_list?pages={page + 1}"
                queue.append(SeedURL(nxt, 0, 0, page + 1, 0, host))
                r.counters["discovered"] += 1
        return r

    def _fetch_retrying(
        self, r: SimResult, url: str, host: str, clock: dict[str, float]
    ) -> tuple[str, bytes]:
        """In-place retry loop mirroring P4-P6 + the S4 request spec and the
        P6 session-reset warmup charge; counts fetched/retried and advances
        the host's virtual clock exactly like engine/stage.py."""
        from biz_crawlers_spark.engine.stage import request_spec

        status, body = "error", b""
        t = clock.get(host, 0.0)
        method, payload = request_spec(url)
        for attempt in range(self.budget.max_retries + 1):
            if self.budget.resets_session(attempt):
                t += self.budget.warmup_s  # P6 session reinit
            t += self.budget.per_request_s
            res = self.web.fetch(url, attempt=attempt, method=method, payload=payload)
            status = classify_page(res["status"], res["body"])
            body = res["body"]
            if attempt > 0:
                r.counters["retried"] += 1
            if status in ("ok", "not_found"):
                break
            t += self.budget.retry_wait_s(attempt)
        clock[host] = t
        r.counters["fetched"] += 1
        return status, body

    def _ingest_payload(self, r: SimResult, body: bytes, key: int) -> None:
        """Figures → decoded images; detail/school fields → records."""
        for fig in extract_figures(body):
            try:
                pixels = codecs.decode(fig["bytes"], fig["fmt"])
            except Exception:
                continue
            image_id = hashlib.sha256(fig["bytes"]).hexdigest()[:16]
            r.images[image_id] = {
                "pixels": pixels,
                "caption": fig["caption"],
                "fmt": fig["fmt"],
                "bytes": fig["bytes"],
                "phash": codecs.phash64(pixels),
                "url_key": key,
            }
            r.counters["images"] += 1
        rec = build_entity_record(body)  # full X4-X8/X12/X13/X19 surface
        if rec is not None:
            r.records[rec.pop("entity_id")] = rec
        for cat, tax_id, name in parse_school_rows(body):
            r.records[tax_id.rjust(8, "0")] = {
                "entity_name": name,
                "entity_names": json.dumps([name], ensure_ascii=False),
                "address": None, "change_date": None, "biz_items": "[]",
                "shareholders": "[]", "managers": "[]", "capital": "[]",
                "parse_mode": "dom",
            }


def psnr_vs_golden(web: FixtureWeb, url: str, sim: SimResult) -> list[tuple[str, float]]:
    """PSNR of each of ``url``'s decoded sim images vs the pre-encode golden
    pixels (np.inf for lossless round-trips)."""
    out = []
    for g in web.images_for(url):
        rec = sim.images.get(g["image_id"])
        if rec is None:
            continue
        out.append((g["image_id"], codecs.psnr(g["pixels"], rec["pixels"])))
    return out
