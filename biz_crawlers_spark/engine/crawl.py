"""CrawlEngine — the epoch scheduler (the engine's only "planner").

Each epoch is a micro-batch over the frontier (the Structured-Streaming-style
loop of the north_rule; a bounded-epoch loop keeps every commit an explicit
snapshot, which IS the checkpoint — K8 analog of the reference's periodic
git-commit durability, crawl-details.php:245-291):

  1. pending = frontier rows eligible this epoch (state/pending + not_before)
  2. per-host top-K budget selection (salted two-phase — engine/budget.py)
  3. dedup: batch dropDuplicates (D1) → Bloom prefilter (no false negatives)
     → exact anti-join against the seen table on Bloom-positives only (D2)
  4. mark selected in_flight (frontier MERGE) — crash between here and commit
     restores them to pending on resume()
  5. fetch+extract: repartition BY HOST → fused mapInPandas stage
     (politeness + ordering live there — engine/stage.py)
  6. commits, in order: images MERGE, records MERGE, discovered URLs MERGE
     (insert-only), seen append + Bloom add, frontier state MERGE,
     lineage append, epoch pointer bump
  7. epoch ends; repeat until the frontier drains (early termination, §4.1)

Exactly two shuffles touch the wide path per epoch: the budget selection and
the by-host repartition; image bytes are shuffled once more only as the MERGE
write into the images table (the sink itself).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from biz_crawlers_spark.engine.budget import select_per_host_topk
from biz_crawlers_spark.engine.stage import STAGE_DDL, make_stage
from biz_crawlers_spark.filters.bloom import BloomShards
from biz_crawlers_spark.fixtures.web import FixtureWeb, SeedURL
from biz_crawlers_spark.frontier.canonical import canonicalize, url_host
from biz_crawlers_spark.frontier.seed import (
    FRONTIER_DDL,
    IMAGES_DDL,
    LINEAGE_DDL,
    RECORDS_DDL,
    SEEN_DDL,
    seed_df,
)
from biz_crawlers_spark.politeness.budget import DEFAULT_BUDGET, PolitenessBudget
from biz_crawlers_spark.politeness.robots import parse_robots
from biz_crawlers_spark.tables.snaptable import SnapTable

UNBOUNDED_BUDGET = 10**8  # budgets at/above this skip top-K selection


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        web_params: dict | None = None,
        budget: PolitenessBudget = DEFAULT_BUDGET,
        per_host_budget: int = 100_000,
        bloom_shards: int = 16,
        bloom_bits: int = 1 << 22,
        bloom_k: int = 7,
        table_buckets: int = 16,
        fetch_partitions: int | None = None,
        fetch_salting: int = 0,
        keep_staging: bool = False,
    ):
        """``fetch_salting``: 0 (default, strict mode) partitions the fetch
        stage by host only — per-host politeness pacing is globally correct,
        the right mode for real crawling (where per-host throughput is
        politeness-bound by design, so the hot host's serialization is the
        budget, not a bottleneck). >0 (throughput mode, virtual-time benches)
        additionally salts by pmod(url_key, S): the 80%-one-host skew spreads
        over S lanes so CPU scaling measures the engine, not one task. Crawl
        ORDER is unaffected either way — it is defined by the deterministic
        sort key and derived by window, not by worker arrival (see
        run_epoch's order_log)."""
        self.spark = spark
        self.workdir = workdir.rstrip("/")
        self.web_params = web_params or {}
        self.budget = budget
        self.per_host_budget = per_host_budget
        self.fetch_partitions = fetch_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        self.fetch_salting = fetch_salting
        self.keep_staging = keep_staging
        os.makedirs(self.workdir, exist_ok=True)

        def tbl(name: str, ddl: str, keys: list[str]) -> SnapTable:
            p = os.path.join(self.workdir, name)
            return (
                SnapTable(spark, p)
                if SnapTable.exists(p)
                else SnapTable.create(spark, p, ddl, keys, n_buckets=table_buckets)
            )

        self.frontier = tbl("frontier", FRONTIER_DDL, ["url_key"])
        self.seen = tbl("seen", SEEN_DDL, ["url_key"])
        self.images = tbl("images", IMAGES_DDL, ["image_id"])
        self.records = tbl("records", RECORDS_DDL, ["entity_id"])
        self.lineage = tbl("lineage", LINEAGE_DDL, ["epoch", "partition_id", "host"])
        self.order_log = tbl(
            "order_log",
            "url_key long, host string, epoch int, host_seq long, status string, attempts int",
            ["url_key"],
        )
        bp = os.path.join(self.workdir, "bloom")
        self.bloom = (
            BloomShards(bp)
            if os.path.exists(os.path.join(bp, "_meta.json"))
            else BloomShards.create(bp, n_shards=bloom_shards, m_bits=bloom_bits, k=bloom_k)
        )
        self._robots_cache: dict[str, list[str]] | None = None

    # ---------- state ----------

    def _state_path(self) -> str:
        return os.path.join(self.workdir, "_crawl_state.json")

    def current_epoch(self) -> int:
        if not os.path.exists(self._state_path()):
            return 0
        with open(self._state_path()) as f:
            return json.load(f)["epoch"]

    def _bump_epoch(self, epoch: int) -> None:
        SnapTable._atomic_write(self._state_path(), json.dumps({"epoch": epoch + 1}))

    # ---------- seeding / resume ----------

    def seed_from_urls(self, seeds: list[SeedURL]) -> None:
        self.add_seed_df(seed_df(self.spark, seeds, epoch=self.current_epoch()))

    def add_seed_df(self, df: DataFrame) -> None:
        """MERGE seeds insert-only: re-seeding never resets done/failed rows
        (the reference's cross-run dedup-before-fetch, D2)."""
        self.frontier.merge(df, prefer="old", summary={"op": "seed"})

    def resume(self) -> int:
        """Crash recovery: any in_flight rows (epoch died mid-fetch) go back
        to pending. Snapshot commits are atomic, so tables are consistent."""
        fr = self.frontier.read()
        stuck = fr.filter(F.col("state") == "in_flight")
        n = stuck.count()
        if n:
            self.frontier.merge(
                stuck.withColumn("state", F.lit("pending")),
                summary={"op": "resume", "restored": n},
            )
        return n

    # ---------- robots ----------

    def _robots_for(self, hosts: list[str]) -> dict[str, list[str]]:
        """Robots cache (P8): fetched once per host per run, persisted to the
        workdir; a real deployment would add TTL re-fetch."""
        path = os.path.join(self.workdir, "robots_cache.json")
        if self._robots_cache is None:
            if os.path.exists(path):
                with open(path) as f:
                    self._robots_cache = json.load(f)
            else:
                self._robots_cache = {}
        web = FixtureWeb(**self.web_params)
        missing = [h for h in hosts if h not in self._robots_cache]
        for h in missing:
            res = web.fetch(f"https://{h}/robots.txt")
            body = res["body"] if res["status"] == "ok" else None
            self._robots_cache[h] = parse_robots(body)
        if missing:
            SnapTable._atomic_write(path, json.dumps(self._robots_cache))
        return self._robots_cache

    # ---------- the epoch ----------

    def run_epoch(self) -> dict:
        epoch = self.current_epoch()
        fr = self.frontier.read()
        pending = fr.filter((F.col("state") == "pending") & (F.col("not_before") <= epoch))
        if self.per_host_budget >= UNBOUNDED_BUDGET:
            # fast path: an unbindable budget makes top-K a no-op — skip the
            # two-phase selection (frontier is already key-unique)
            selected = pending
        else:
            selected = select_per_host_topk(pending, self.per_host_budget).dropDuplicates(
                ["url_key"]
            )

        # dedup: Bloom prefilter, exact anti-join only on positives (§4.1)
        checked = self.bloom.prefilter_spark(selected, "url_key").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_selected = checked.count()
        negatives = checked.filter(~F.col("maybe_seen")).drop("maybe_seen")
        positives = checked.filter(F.col("maybe_seen")).drop("maybe_seen")
        survivors = positives.join(self.seen.read(), on="url_key", how="left_anti")
        batch = negatives.unionByName(survivors)
        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        n_batch = batch.count()
        checked.unpersist()
        n_deduped = n_selected - n_batch
        if n_batch == 0:
            batch.unpersist()
            stats = {"epoch": epoch, "selected": n_selected, "deduped": n_deduped,
                     "fetched": 0, "ok": 0, "failed": 0, "robots_denied": 0,
                     "not_found": 0, "images": 0, "retried": 0, "discovered": 0,
                     "drained": pending.limit(1).count() == 0}
            if n_deduped:
                # mark the all-dup batch done so it leaves the pending set
                self.frontier.merge(
                    selected.withColumn("state", F.lit("done")),
                    summary={"op": "dedup_skip", "epoch": epoch},
                )
                self._bump_epoch(epoch)
                stats["drained"] = False
            return stats

        # Crash-safety needs no in_flight marking: selected rows keep
        # state='pending' until the epoch-end commit, so a crash mid-fetch
        # simply re-selects them on restart (commits are atomic snapshots).
        # resume() still repairs legacy/externally-set in_flight rows.
        hosts = [r["host"] for r in batch.select("host").distinct().collect()]
        robots = self._robots_for(hosts)

        # fetch+extract — strict mode: partitioned BY HOST (global politeness
        # pacing); throughput mode: salted lanes kill the hot-host skew.
        # The fused output lands in a staging PARQUET (not .persist()): the
        # epoch then reads it several times (statuses/images/records/
        # discovered/lineage) and columnar staging means every scan except
        # the images MERGE prunes the bytes column away — a row-format cache
        # would deserialize the payload bytes on every scan. The staging dir
        # doubles as the raw-results archive of the epoch (K5 analog).
        stage = make_stage(self.web_params, self.budget, robots)
        if self.fetch_salting > 0:
            # many more salt lanes than partitions: S salts hashed into P
            # partitions need S >> P or balls-in-bins collisions leave some
            # partitions with 2-4x the mean load (the slowest lane sets the
            # stage wall time)
            salts = self.fetch_salting * 8
            part_cols = [F.col("host"), F.pmod(F.col("url_key"), F.lit(salts))]
        else:
            part_cols = [F.col("host")]
        staging = os.path.join(self.workdir, "staging", f"epoch={epoch}")
        (
            batch.repartition(self.fetch_partitions, *part_cols)
            .mapInPandas(stage, STAGE_DDL)
            .write.mode("overwrite")
            .parquet(staging)
        )
        fetched = self.spark.read.parquet(staging)

        statuses = fetched.filter(F.col("row_type") == "status")
        images = fetched.filter(F.col("row_type") == "image")
        records = fetched.filter(F.col("row_type") == "record")
        discovered = fetched.filter(F.col("row_type") == "discovered")

        # --- commits ---
        img_rows = images.select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "url_key", F.col("image_seq").alias("seq"), F.lit(epoch).alias("epoch"),
        )
        self.images.merge(img_rows, summary={"epoch": epoch})

        rec_rows = records.select(
            "entity_id", "entity_name", "entity_names", "change_date", "biz_items",
            "category", "url_key", F.lit(epoch).alias("epoch"),
        ).dropDuplicates(["entity_id"])
        self.records.merge(rec_rows, summary={"epoch": epoch})

        n_discovered = 0
        disc = discovered.select("discovered_url", "priority").distinct().collect()
        if disc:
            new_seeds = [
                SeedURL(r["discovered_url"], 0, 0, _page_of(r["discovered_url"]),
                        r["priority"] or 0, url_host(r["discovered_url"]))
                for r in disc
            ]
            from biz_crawlers_spark.frontier.canonical import url_key as _ukey

            rows = [
                (_ukey(s.url), canonicalize(s.url), s.host, s.org_idx, s.type_idx,
                 s.page, s.priority, "pending", 0, epoch + 1, epoch + 1)
                for s in new_seeds
            ]
            ndf = self.spark.createDataFrame(rows, FRONTIER_DDL)
            self.frontier.merge(ndf, prefer="old", summary={"op": "discover", "epoch": epoch})
            n_discovered = len(rows)

        term_ok = statuses.filter(F.col("status").isin("ok", "not_found"))
        seen_rows = term_ok.select("url_key", F.lit(epoch).alias("seen_epoch"))
        self.seen.append(seen_rows, summary={"epoch": epoch})
        self.bloom.add_spark(term_ok.select("url_key"), "url_key")

        # frontier state transitions apply to FRONTIER rows only; two-hop
        # detail fetches (parent_key set) are derived requests — they are
        # seen-tracked and lineage-counted but never join the frontier
        state_upd = statuses.filter(F.col("parent_key").isNull()).select(
            "url_key",
            F.when(F.col("status").isin("ok", "not_found"), "done")
            .when(F.col("status") == "robots_denied", "denied")
            .otherwise("failed")
            .alias("state"),
            F.col("attempts").alias("retries"),
        )
        self.frontier.merge(state_upd, summary={"op": "epoch_end", "epoch": epoch})

        # crawl-order evidence: per-host sequence of url_keys. host_seq is
        # DERIVED from the deterministic order key (window row_number), not
        # from worker arrival — identical in strict and salted modes, and
        # equal to the reference's sequential order per host (SURVEY.md §7)
        from pyspark.sql import Window

        order_cols = ["priority", "org_idx", "type_idx", "page", "url_key"]
        w = Window.partitionBy("host").orderBy(*[F.col(c).asc() for c in order_cols])
        ordered = (
            batch.select("url_key", "host", *order_cols[:-1])
            .join(statuses.select("url_key", "status", "attempts"), "url_key")
            .withColumn("host_seq", F.row_number().over(w).cast("long") - 1)
        )
        self.order_log.append(
            ordered.select(
                "url_key", "host", F.lit(epoch).alias("epoch"), "host_seq",
                "status", "attempts",
            ),
            summary={"epoch": epoch},
            bucketize=False,  # append-only evidence table, never MERGEd
        )

        lineage_rows = statuses.groupBy(
            F.lit(epoch).alias("epoch"), "partition_id", "host"
        ).agg(
            F.sum((F.col("status") != "robots_denied").cast("long")).alias("fetched"),
            F.sum((F.col("status") == "ok").cast("long")).alias("ok"),
            F.lit(0).cast("long").alias("deduped"),
            F.sum(
                (~F.col("status").isin("ok", "not_found", "robots_denied")).cast("long")
            ).alias("failed"),
            F.sum(F.greatest(F.col("attempts") - 1, F.lit(0)).cast("long")).alias("retried"),
            F.sum((F.col("status") == "robots_denied").cast("long")).alias("robots_denied"),
            F.sum((F.col("status") == "not_found").cast("long")).alias("not_found"),
            F.lit(0).cast("long").alias("images"),
        )
        img_counts = images.groupBy("host").agg(F.count("*").alias("_imgs"))
        lineage_rows = (
            lineage_rows.join(img_counts, on="host", how="left")
            .withColumn("images", F.coalesce(F.col("_imgs"), F.lit(0)))
            .drop("_imgs")
            .select(*self.lineage._cols())
        )
        self.lineage.append(lineage_rows, summary={"epoch": epoch}, bucketize=False)

        agg = statuses.groupBy().agg(
            F.sum((F.col("status") != "robots_denied").cast("long")).alias("fetched"),
            F.sum((F.col("status") == "ok").cast("long")).alias("ok"),
            F.sum(
                (~F.col("status").isin("ok", "not_found", "robots_denied")).cast("long")
            ).alias("failed"),
            F.sum((F.col("status") == "robots_denied").cast("long")).alias("robots_denied"),
            F.sum((F.col("status") == "not_found").cast("long")).alias("not_found"),
            F.sum(F.greatest(F.col("attempts") - 1, F.lit(0)).cast("long")).alias("retried"),
        ).collect()[0]
        n_images = images.count()

        batch.unpersist()
        if not self.keep_staging:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
        self._bump_epoch(epoch)
        return {
            "epoch": epoch, "selected": n_selected, "deduped": n_deduped,
            "fetched": agg["fetched"] or 0, "ok": agg["ok"] or 0,
            "failed": agg["failed"] or 0, "robots_denied": agg["robots_denied"] or 0,
            "not_found": agg["not_found"] or 0, "retried": agg["retried"] or 0,
            "images": n_images, "discovered": n_discovered, "drained": False,
        }

    def run(self, max_epochs: int = 100) -> list[dict]:
        out = []
        for _ in range(max_epochs):
            stats = self.run_epoch()
            out.append(stats)
            if stats["drained"]:
                break
        return out


def _page_of(url: str) -> int:
    from urllib.parse import parse_qs, urlsplit

    q = parse_qs(urlsplit(url).query)
    try:
        return int(q.get("pages", ["0"])[0])
    except ValueError:
        return 0
