"""Hardware-ceiling companion to bench_scaling.py.

Runs the engine's EXACT per-URL worker payload (fixture page synthesis →
classify → figure decode/phash → record extraction → pandas framing) under
plain ``multiprocessing`` — no Spark, no Arrow, no parquet, no shuffle — at
the same two parallelism levels. The resulting N→4N ratio is this box's own
parallel-scaling ceiling for the workload (single-node memory bandwidth);
the engine's fetch-stage ratio is read against it in BENCH/BASELINE.md.

Usage: python tools/hw_ceiling.py [n_urls]   (default 100000; runs 8 and 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(args: tuple[int, int]) -> int:
    lo, hi = args
    from biz_crawlers_spark.engine.stage import (
        _blank_row,
        _decode_figures,
        _extract_record,
        _to_frame,
    )
    from biz_crawlers_spark.extract.pages import classify_page, parse_search_results
    from biz_crawlers_spark.fixtures.web import FixtureWeb

    web = FixtureWeb(seed=42, n_hosts=256, max_images_per_page=1, image_sizes=(16, 32))
    out = []
    for i in range(lo, hi):
        u = (
            f"https://h0.fixture.test/report?fileName={10001 + i // 42:05d}"
            f"O{i % 14:02d}est.pdf&subPath={10001 + i // 42:05d}"
        )
        res = web.fetch(u, attempt=1)
        st = classify_page(res["status"], res["body"])
        out.append(
            _blank_row(row_type="status", url_key=1, host="h0", status=st,
                       attempts=1, n_payload=0, scheduled_at=0.0)
        )
        if st != "ok":
            continue
        body = res["body"]
        out.extend(_decode_figures(body, 1, "h0"))
        out.extend(_extract_record(body, 1, "h0"))
        parse_search_results(body)
    _to_frame(out)
    return hi - lo


def run_level(workers: int, n: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(workers), str(n)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{workers - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    return json.loads(
        [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    )


def worker_main(workers: int, n: int) -> None:
    chunks = [(i * n // workers, (i + 1) * n // workers) for i in range(workers)]
    t0 = time.time()
    with mp.Pool(workers) as p:
        tot = sum(p.map(work, chunks))
    dt = time.time() - t0
    print(json.dumps({"workers": workers, "n": tot, "sec": round(dt, 2),
                      "urls_per_sec": round(tot / dt, 1)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker_main(int(sys.argv[2]), int(sys.argv[3]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    lo = run_level(8, n)
    hi = run_level(32, n)
    ratio = hi["urls_per_sec"] / lo["urls_per_sec"]
    result = {"mp_8": lo, "mp_32": hi, "ratio_8_to_32": round(ratio, 3),
              "ceiling_efficiency": round(ratio / 4, 3)}
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/hw_ceiling.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
