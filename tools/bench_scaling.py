"""Two-parallelism-level scaling evidence (BASELINE.json north_rule).

A real N→4N executor cluster is unavailable in the sandbox; per the driver's
instruction the criterion is evidenced by running the SAME crawl job on the
SAME input at local[8] (N) and local[32] (4N) in fresh JVMs, reporting
frontier-URLs/s + images/s at both and the scaling efficiency

    eff = (throughput@4N / throughput@N) / 4 .

The seed uses 256 hosts so per-host politeness (honored in virtual time)
does not serialize the fetch stage — scaling measures the engine, which is
how a real crawl scales (across hosts), not against robots.

Usage:
  python tools/bench_scaling.py                 # both levels + BENCH/BASELINE.md update
  python tools/bench_scaling.py --worker 8 50000  # one level, print JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# >= 10^6 rows per the sandbox measurement protocol (BENCH/BASELINE.md):
# scheduling/commit overhead must amortize for the ratio to measure the engine
N_URLS = int(os.environ.get("SPARK_GRAFT_SCALING_URLS", "1000000"))
N_HOSTS = 256
# the N and 4N parallelism levels (cores); see BENCH/BASELINE.md for why the
# default pair sits below this box's memory-bandwidth wall
LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "8,32").split(",")
)


def worker(cpus: int, n_urls: int) -> None:
    from biz_crawlers_spark.engine.crawl import CrawlEngine
    from biz_crawlers_spark.frontier.seed import synthetic_seed_df
    from biz_crawlers_spark.politeness.budget import PolitenessBudget
    from biz_crawlers_spark.session import get_spark

    spark = get_spark(cores=cpus, shuffle_partitions=cpus, app=f"scaling-{cpus}")
    wd = tempfile.mkdtemp(prefix=f"scaling{cpus}_")
    eng = CrawlEngine(
        spark, wd,
        web_params={
            "seed": 42, "n_hosts": N_HOSTS, "max_images_per_page": 1,
            # small images: the scaling criterion measures the ENGINE; big
            # payloads just measure the sandbox's single local disk, which a
            # real cluster scales with nodes (see BENCH/BASELINE.md)
            "image_sizes": (16, 32),
        },
        budget=PolitenessBudget(time_scale=0.0),
        per_host_budget=10**9,
        bloom_shards=32, bloom_bits=1 << 23, table_buckets=32,
        fetch_partitions=cpus,
        fetch_salting=cpus,
    )
    seed = synthetic_seed_df(spark, n_urls, n_hosts=N_HOSTS)
    eng.add_seed_df(seed)
    t0 = time.time()
    stats = eng.run_epoch()
    dt = time.time() - t0
    processed = stats["fetched"] + stats["robots_denied"] + stats["deduped"]
    print(json.dumps({
        "cpus": cpus, "n_urls": n_urls, "epoch_sec": round(dt, 2),
        "processed": processed, "images": stats["images"],
        "urls_per_sec": round(processed / dt, 1),
        "images_per_sec": round(stats["images"] / dt, 1),
    }))


def run_level(cpus: int, n_urls: int) -> dict:
    # pin the run to exactly `cpus` physical cores: local[N] spawns N JVM
    # task threads PLUS N Python workers, so without pinning the "N" level
    # silently borrows idle cores and the comparison is not N vs 4N
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), str(n_urls)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    lo, hi = LEVELS
    r8 = run_level(lo, N_URLS)
    print(f"local[{lo}] :", r8)
    r32 = run_level(hi, N_URLS)
    print(f"local[{hi}]:", r32)
    factor = hi / lo
    eff_urls = (r32["urls_per_sec"] / r8["urls_per_sec"]) / factor
    eff_imgs = (r32["images_per_sec"] / r8["images_per_sec"]) / factor
    result = {"N": r8, "4N": r32, "factor": factor,
              "scaling_efficiency_urls": round(eff_urls, 3),
              "scaling_efficiency_images": round(eff_imgs, 3)}
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    # MERGE into the consolidated file: every run is appended under "runs"
    # (never clobber earlier pairs/configs — the report tables all of them)
    path = "BENCH/scaling_result.json"
    doc = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except ValueError:
            doc = {}
    doc.setdefault("runs", []).append(
        {"levels": f"{lo}->{hi}", "n_urls": N_URLS, **result}
    )
    doc["latest"] = result
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


if __name__ == "__main__":
    main()
