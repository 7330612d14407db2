"""Unified crawl CLI — the engine-facing analog of the reference's entry
points (`crawl.php:53-215` command dispatch + config overlay,
`crawl-details.php` ID sourcing/slicing), mapped onto CrawlEngine:

    python tools/crawl_cli.py gcis   --company  --year 114 --month 3
    python tools/crawl_cli.py gcis   --business --year 114 --month 3
    python tools/crawl_cli.py school
    python tools/crawl_cli.py detail --ids 12345678,87654321
    python tools/crawl_cli.py detail --file ids.txt --offset 100 --limit 50

Common flags: --workdir DIR (default ./crawl_work), --safe (the reference's
safe-mode budget: crawl.php:72-79), --cpus N, --real-pacing (wall-clock
politeness instead of virtual time), --max-epochs, --archive-pages (D9),
--ttl-epochs (D7), --maintain-every (vacuum cadence).

The fetcher here is the deterministic fixture web (the sandbox has no
network); a production deployment passes web_params={"transport": ...} for
any registered Transport (engine/transport.py — the seam a real HTTP client
implements; see DictTransport for the swap-in proof).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="crawl_cli", description=__doc__)
    p.add_argument("command", choices=["gcis", "school", "detail"])
    p.add_argument("--company", action="store_true")
    p.add_argument("--business", action="store_true")
    p.add_argument("--year", type=int, default=114)
    p.add_argument("--month", type=int, default=1)
    p.add_argument("--ids", type=str, default=None, help="comma-separated 8-digit ids")
    p.add_argument("--file", type=str, default=None, help="one id per line")
    p.add_argument("--offset", type=int, default=0)  # crawl-details.php:236-243
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--safe", action="store_true")  # crawl.php:72-79
    p.add_argument("--real-pacing", action="store_true")
    p.add_argument("--workdir", type=str, default="./crawl_work")
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--archive-pages", action="store_true")
    p.add_argument("--ttl-epochs", type=int, default=None)
    p.add_argument("--maintain-every", type=int, default=0)
    p.add_argument("--web-seed", type=int, default=42)
    return p


def seeds_for(args) -> list:
    from biz_crawlers_spark.fixtures.web import (
        business_seed,
        company_seed,
        school_seed,
        search_seed,
    )
    from biz_crawlers_spark.fixtures.web import SeedURL, host_for

    if args.command == "gcis":
        out = []
        if args.company or not args.business:
            out += company_seed(args.year, args.month)
        if args.business:
            out += business_seed(args.year, args.month, base_priority=100)
        return out
    if args.command == "school":
        return school_seed()
    # detail: ID sourcing exactly like crawl-details.php — --ids, --file,
    # sorted (crawl-details.php:199), then offset/limit sliced (:236-243)
    ids: list[str] = []
    if args.ids:
        ids += [i.strip() for i in args.ids.split(",") if i.strip()]
    if args.file:
        with open(args.file) as f:
            ids += [ln.strip() for ln in f if ln.strip()]
    if not ids:
        raise SystemExit("detail requires --ids or --file")
    bad = [i for i in ids if not (i.isdigit() and len(i) <= 8)]
    if bad:
        raise SystemExit(f"invalid ids (X15 gate): {bad[:5]}")
    ids = sorted(i.rjust(8, "0") for i in ids)
    ids = ids[args.offset : (args.offset + args.limit) if args.limit else None]
    out = []
    for i, eid in enumerate(ids):
        host = host_for(f"search{eid}")
        out.append(
            SeedURL(f"https://{host}/search?qryCond={eid}", 0, 0, 0, i, host)
        )
    return out


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    from biz_crawlers_spark.engine.crawl import CrawlEngine
    from biz_crawlers_spark.politeness.budget import DEFAULT_BUDGET, SAFE_BUDGET
    from biz_crawlers_spark.session import get_spark

    budget = SAFE_BUDGET if args.safe else DEFAULT_BUDGET
    if args.real_pacing:
        from dataclasses import replace

        budget = replace(budget, time_scale=1.0)
    spark = get_spark(cores=args.cpus, app=f"crawl-{args.command}")
    eng = CrawlEngine(
        spark,
        args.workdir,
        web_params={"seed": args.web_seed, "n_hosts": 4},
        budget=budget,
        archive_pages=args.archive_pages,
        ttl_epochs=args.ttl_epochs,
    )
    eng.resume()  # crash recovery is always safe (no-op on clean state)
    eng.seed_from_urls(seeds_for(args))
    stats = eng.run(max_epochs=args.max_epochs, maintain_every=args.maintain_every)
    summary = {
        "command": args.command,
        "epochs": len(stats),
        "fetched": sum(s["fetched"] for s in stats),
        "ok": sum(s["ok"] for s in stats),
        "failed": sum(s["failed"] for s in stats),
        "deduped": sum(s["deduped"] for s in stats),
        "images": sum(s["images"] for s in stats),
        "cache_hits": sum(s.get("cache_hits", 0) for s in stats),
        "drained": stats[-1]["drained"] if stats else True,
        "workdir": os.path.abspath(args.workdir),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
