"""CrawlEngine — the epoch scheduler (the engine's only "planner").

Each epoch is a micro-batch over the frontier (the Structured-Streaming-style
loop of the north_rule; a bounded-epoch loop keeps every commit an explicit
snapshot, which IS the checkpoint — K8 analog of the reference's periodic
git-commit durability, crawl-details.php:245-291):

  1. pending = frontier rows eligible this epoch (state/pending + not_before)
  2. per-host top-K budget selection (salted two-phase — engine/budget.py)
  3. dedup: batch dropDuplicates (D1) → Bloom prefilter (no false negatives)
     → exact anti-join against the seen table on Bloom-positives only (D2);
     TTL mode (D7) keeps only in-window keys as duplicates
  4. D9 routing: archived keys split off to a parse-only lane (no fetch)
  5. fetch+extract: repartition BY HOST → fused mapInPandas stage
     (politeness + ordering live there — engine/stage.py) unioned with the
     parse-only lane → ONE staging write
  6. commits: images MERGE, records MERGE, pages MERGE, seen append + Bloom
     (+cuckoo mirror) add, fused frontier MERGE (state transitions +
     dedup-done + discovered inserts), order_log append, lineage append —
     then the STATE RECORD, which makes the whole group atomic (resume()
     rolls back any table that is ahead of the record)
  7. epoch ends; repeat until the frontier drains (early termination, §4.1)

Exactly two shuffles touch the wide path per epoch: the budget selection and
the by-host repartition; image bytes are shuffled once more only as the MERGE
write into the images table (the sink itself). Per-epoch driver-sequenced
jobs are consolidated: ONE stats pass over staging yields the lineage rows
AND the epoch totals; merges persist their update plans so staging is never
re-scanned twice per commit.

Round-5 sustained-campaign design (VERDICT r4 #1/#2/#4/#7 — per-epoch cost
must be O(batch), never O(accumulated tables), or a long campaign decays):

- frontier files are partitioned by (bucket, STATE); epoch-end merges
  declare ``source_parts=["pending"]`` (their matched keys are all
  currently-pending by construction), so the done/denied/failed history is
  carried over untouched — c_frontier is flat across epochs
- payload commits are ZERO-COPY when the batch is key-distinct: staging's
  row_type partitions are adopted by rename, with cross-epoch matched keys
  (if any) riding the same commit as an equality-delete entry (merge-on-
  read); in-batch duplicate keys (id collisions) fall back to an O(batch)
  MoR append. The whole-table copy-on-write rewrite never happens, and the
  MoR read tax is folded by the vacuum compaction cadence
- the order log derives from the sequence the fetch stage itself emits
  (rows arrive sorted per range-contiguous lane) + per-(partition, host)
  offsets from the stats pass — a narrow scan and an append, no extra
  shuffle
- the Bloom filter tracks per-shard fill in version metadata and rebuilds
  itself into a larger bit space from the seen table when saturation would
  degrade the D2 prefilter (filters/bloom.py saturation policy)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from biz_crawlers_spark.engine.budget import select_per_host_topk
from biz_crawlers_spark.engine.stage import (
    STAGE_DDL,
    make_parse_stage,
    make_robots_stage,
    make_stage,
)
from biz_crawlers_spark.filters.bloom import BloomShards
from biz_crawlers_spark.filters.cuckoo import CuckooShards
from biz_crawlers_spark.fixtures.web import SeedURL
from biz_crawlers_spark.frontier.seed import (
    FRONTIER_DDL,
    IMAGES_DDL,
    LINEAGE_DDL,
    PAGES_DDL,
    RECORDS_CORRUPT_EXPR,
    RECORDS_DDL,
    SEEN_DDL,
    seed_df,
)
from biz_crawlers_spark.politeness.budget import DEFAULT_BUDGET, PolitenessBudget
from biz_crawlers_spark.tables.snaptable import SnapTable

UNBOUNDED_BUDGET = 10**8  # budgets at/above this skip top-K selection

# P8 robots cache table: rules is the JSON list politeness.robots.parse_robots
# produces; fetched_epoch drives TTL re-fetch (robots_ttl_epochs)
ROBOTS_DDL = "host string, rules string, fetched_epoch int"


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
        ttl_epochs: int | None = None,
        archive_pages: bool = False,
        robots_ttl_epochs: int | None = None,
        ranking_window_rows: int = 100_000,
        bloom_rebuild_fill: float = 0.5,
        payload_key_gate: str = "bloom",
        payload_patch: bool = True,
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
        # D7 (DetailCrawler.php:125-129, :1172-1210): None = permanent seen
        # set (report crawls); an int makes seen rows EXPIRE after that many
        # epochs (the 24 h recency window, epoch-denominated in virtual
        # time), and corrupted records (invalid biz_items JSON) force
        # re-crawl regardless — the reference's delete-corrupted-JSON branch.
        self.ttl_epochs = ttl_epochs
        # D9/K5: archive raw page bodies in the pages table; frontier rows
        # whose key is archived route to a parse-only stage (no fetch)
        self.archive_pages = archive_pages
        # P8: robots rules older than this many epochs re-fetch (None = once
        # per host, ever — the robots SnapTable is the durable cache)
        self.robots_ttl_epochs = robots_ttl_epochs
        # order-log ranking switches from one plain window to the two-phase
        # skew-free computation above this batch size (VERDICT r3 #1a: below
        # ~10^5 rows one sort task is cheaper than range sampling + counts +
        # a mapInPandas pass; the fixed job count dominates small epochs)
        self.ranking_window_rows = ranking_window_rows
        # D2 at 10^10 keys: max shard fill above this triggers a Bloom
        # rebuild into a larger bit space at epoch commit (filters/bloom.py
        # saturation policy); 0.5 keeps FPR ≈ 0.5^k ≈ 0.8% worst-case
        self.bloom_rebuild_fill = bloom_rebuild_fill
        os.makedirs(self.workdir, exist_ok=True)

        def tbl(name: str, ddl: str, keys: list[str], **extra) -> SnapTable:
            p = os.path.join(self.workdir, name)
            if SnapTable.exists(p):
                t = SnapTable(spark, p)
                # resume on a workdir created by an OLDER engine version:
                # migrate the stored meta to the current schema (added
                # columns read as NULL from legacy files; derived columns
                # are healed on read — snaptable.ensure_meta / ADVICE r3)
                t.ensure_meta(
                    ddl,
                    derived=extra.get("derived"),
                    stat_cols=extra.get("stat_cols"),
                    part_col=extra.get("part_col"),
                )
                return t
            return SnapTable.create(spark, p, ddl, keys, n_buckets=table_buckets, **extra)

        # state-partitioned storage (VERDICT r4 #7): frontier files are laid
        # out by (bucket, state), so the epoch-end merge — whose matched keys
        # are all currently-pending by construction — rewrites ONLY pending
        # files; the accumulated done/denied/failed history is carried over
        # untouched and c_frontier stays O(batch) over a long campaign
        self.frontier = tbl("frontier", FRONTIER_DDL, ["url_key"], part_col="state")
        self.seen = tbl("seen", SEEN_DDL, ["url_key"])
        self.pages = tbl("pages", PAGES_DDL, ["url_key"])
        self.images = tbl("images", IMAGES_DDL, ["image_id"])
        # D7: corrupt is generated at every write; its per-file stats make
        # the TTL probe free when no corrupt rows exist anywhere
        self.records = tbl(
            "records", RECORDS_DDL, ["entity_id"],
            derived={"corrupt": RECORDS_CORRUPT_EXPR}, stat_cols=["corrupt"],
        )
        self.lineage = tbl("lineage", LINEAGE_DDL, ["epoch", "partition_id", "host"])
        self.order_log = tbl(
            "order_log",
            "url_key long, host string, epoch int, host_seq long, status string, "
            "attempts int, n_payload int",
            ["url_key"],
        )
        self.robots = tbl("robots", ROBOTS_DDL, ["host"])
        bp = os.path.join(self.workdir, "bloom")
        self.bloom = (
            BloomShards(bp)
            if os.path.exists(os.path.join(bp, "_meta.json"))
            else BloomShards.create(bp, n_shards=bloom_shards, m_bits=bloom_bits, k=bloom_k)
        )
        # Payload-key Blooms gate the zero-copy adopt's matched-key check:
        # probing the batch keys against a maintained Bloom is O(batch),
        # where the raw-key scan it replaces reads the key column of EVERY
        # table file each epoch (the one remaining O(table) term the
        # sustained campaign measured — c_images/c_records stepping from
        # 4/10 s on an empty store to ~19 s at 10^7 rows). Safety argument:
        # a FALSE POSITIVE "matched" key merely lands in the equality-delete
        # entry — every delete key comes from the batch, so its new row
        # (file seq == delete seq) always survives, and with no older row
        # the delete is a no-op. FALSE NEGATIVES cannot occur because every
        # key ever committed to the table is added to the Bloom in the same
        # commit member (and Blooms have no false negatives); keys from
        # rolled-back epochs linger as harmless extra positives. String keys
        # probe via xxhash64 — a 64-bit hash collision is just another
        # conservative positive. ``payload_key_gate="scan"`` keeps the
        # exact raw-key-scan gate (equivalence-tested).
        if payload_key_gate not in ("bloom", "scan"):
            raise ValueError(f"payload_key_gate must be 'bloom' or 'scan', got {payload_key_gate!r}")
        self.payload_key_gate = payload_key_gate
        # ``payload_patch``: a batch with a handful of in-batch duplicate
        # keys still takes the zero-copy adopt — the duplicated keys' rows
        # (alone) are re-written as a tiny merge-on-read PATCH commit whose
        # higher-seq equality-delete entry supersedes the adopted copies.
        # False restores the full-batch MoR fallback (A/B attribution).
        self.payload_patch = payload_patch
        self._payload_keyblooms: dict[str, BloomShards] = {}
        for part, table, key in (
            ("image", self.images, "image_id"),
            ("record", self.records, "entity_id"),
        ):
            kp = os.path.join(self.workdir, f"keys_bloom_{part}")
            if os.path.exists(os.path.join(kp, "_meta.json")):
                kb = BloomShards(kp)
            else:
                kb = BloomShards.create(
                    kp, n_shards=bloom_shards, m_bits=bloom_bits, k=bloom_k
                )
                if payload_key_gate == "bloom" and not table.is_empty():
                    # legacy workdir (pre-keybloom engine): one-time rebuild
                    # from the stored raw keys (superset incl. superseded —
                    # extra positives are harmless, see above)
                    kb.rebuild_spark(
                        table.read_keys_raw().select(
                            F.xxhash64(F.col(key)).alias("_kh")
                        ),
                        "_kh",
                        m_bits_new=bloom_bits,
                    )
            self._payload_keyblooms[part] = kb
        if not os.path.exists(self._state_path()):
            self._record_state(0)

    # ---------- state ----------
    #
    # The epoch commit is a GROUP of per-table snapshot commits; the state
    # record makes the group atomic: after every successful epoch (and after
    # every out-of-band mutation — seeding, repair) the record captures each
    # table's snapshot id + the Bloom version. resume() rolls any table that
    # is AHEAD of the record back to it, so a crash between two table commits
    # can never leave (e.g.) url_keys marked seen without their order_log /
    # lineage evidence rows (the epoch simply re-runs in full).

    TABLE_NAMES = (
        "frontier", "seen", "pages", "images", "records", "lineage", "order_log",
        "robots",
    )

    def _state_path(self) -> str:
        return os.path.join(self.workdir, "_crawl_state.json")

    def _read_state(self) -> dict:
        if not os.path.exists(self._state_path()):
            return {"epoch": 0}
        with open(self._state_path()) as f:
            return json.load(f)

    def current_epoch(self) -> int:
        return self._read_state()["epoch"]

    def _seen_cuckoo(self) -> CuckooShards | None:
        """The deletable seen-set mirror, if the repair job has built it
        (engine/repair.py cuckoo_mirror). Kept in sync per epoch commit."""
        p = os.path.join(self.workdir, "seen_cuckoo")
        return CuckooShards(p) if CuckooShards.exists(p) else None

    def _maybe_rebuild_keybloom(
        self, keybloom: "BloomShards", table: SnapTable, key: str
    ) -> None:
        """Saturation policy for a payload-key Bloom (same contract as the
        seen-set Bloom): when the max shard fill crosses the threshold,
        rebuild into a larger bit space from the table's durable raw keys —
        the rare amortized O(table) pass that keeps the per-epoch probe
        O(batch) forever. Superseded keys in the raw superset are harmless
        extra positives."""
        if keybloom.fill_ratio() > self.bloom_rebuild_fill:
            keybloom.rebuild_spark(
                table.read_keys_raw().select(F.xxhash64(F.col(key)).alias("_kh")),
                "_kh",
            )

    def _record_state(self, epoch: int) -> None:
        state = {
            "epoch": epoch,
            "snapshots": {
                n: getattr(self, n).current_snapshot_id() for n in self.TABLE_NAMES
            },
            "bloom_version": self.bloom.current_version(),
            # informational: payload-key Blooms never roll back (extra keys
            # are conservative positives; deletions never happen)
            "payload_keybloom_versions": {
                n: kb.current_version()
                for n, kb in self._payload_keyblooms.items()
            },
        }
        cf = self._seen_cuckoo()
        if cf is not None:
            state["cuckoo_version"] = cf.current_version()
        SnapTable._atomic_write(self._state_path(), json.dumps(state))

    # ---------- seeding / resume ----------

    def seed_from_urls(self, seeds: list[SeedURL]) -> None:
        self.add_seed_df(seed_df(self.spark, seeds, epoch=self.current_epoch()))

    def add_seed_df(self, df: DataFrame) -> None:
        """MERGE seeds insert-only: re-seeding never resets done/failed rows
        (the reference's cross-run dedup-before-fetch, D2). ``mostly_new``:
        fresh seeds (the long-campaign steady state) take the pure-append
        path — O(seeds) WRITES plus one narrow O(table-files) key-column
        scan for matched-key discovery (seeds may match any frontier state,
        so no source_parts pruning applies; ADVICE r5 — the earlier
        'never O(frontier history)' claim overstated this)."""
        self.frontier.merge(
            df, prefer="old", summary={"op": "seed"}, mostly_new=True
        )
        self._record_state(self.current_epoch())

    def reseed_from_urls(self, seeds: list[SeedURL]) -> None:
        """Re-enumeration pass (the reference re-runs the same seed list on
        the next crawl invocation): inserts unknown URLs AND reopens known
        ones to pending, so the dedup layer — not frontier state — decides
        what actually re-fetches (everything inside the TTL window dedups to
        done, D7)."""
        df = seed_df(self.spark, seeds, epoch=self.current_epoch())
        self.frontier.merge(
            df, prefer="old", summary={"op": "reseed"}, mostly_new=True
        )
        self.frontier.merge(
            df.select(
                "url_key",
                F.lit("pending").alias("state"),
                F.lit(self.current_epoch()).alias("not_before"),
            ),
            summary={"op": "reseed_reopen"},
        )
        self._record_state(self.current_epoch())

    def resume(self) -> int:
        """Crash recovery. (1) Epoch atomicity: any table whose current
        snapshot is ahead of the last recorded state (a crash landed between
        the epoch's table commits) is rolled back to the record, so the
        interrupted epoch re-runs in full — no half-committed epoch can leave
        seen rows without their order_log/lineage evidence. (2) Legacy:
        in_flight rows go back to pending. Returns rollbacks + restored."""
        state = self._read_state()
        n_actions = 0
        for name, recorded in state.get("snapshots", {}).items():
            t = getattr(self, name)
            if t.current_snapshot_id() > recorded:
                t.rollback(recorded)
                n_actions += 1
        bv = state.get("bloom_version")
        if bv is not None and self.bloom.current_version() > bv:
            self.bloom._write_pointer(self.bloom.path, bv)
            n_actions += 1
        cf = self._seen_cuckoo()
        cv = state.get("cuckoo_version")
        if cf is not None and cv is not None and cf.current_version() > cv:
            cf._write_pointer(cf.path, cv)
            n_actions += 1
        fr = self.frontier.read()
        stuck = fr.filter(F.col("state") == "in_flight")
        n = stuck.count()
        if n:
            self.frontier.merge(
                stuck.withColumn("state", F.lit("pending")),
                summary={"op": "resume", "restored": n},
            )
            self._record_state(state["epoch"])
        return n + n_actions

    # ---------- robots ----------

    def _known_robots_hosts(self, epoch: int) -> DataFrame:
        """Hosts whose robots rules are cached AND inside the TTL window."""
        known = self.robots.read()
        if self.robots_ttl_epochs is not None:
            known = known.filter(
                F.col("fetched_epoch") > epoch - self.robots_ttl_epochs
            )
        return known.select("host")

    def _resolve_robots(self, batch: DataFrame, epoch: int) -> None:
        """P8 at crawl scale: robots.txt resolution is a DISTRIBUTED
        pre-pass. The batch's distinct hosts are anti-joined against the
        robots SnapTable (TTL-filtered when robots_ttl_epochs is set); the
        missing hosts fan out to a mapInPandas stage that fetches+parses
        robots.txt in the workers (engine/stage.py make_robots_stage), and
        the result MERGEs into the robots table. The driver does O(1) work
        per epoch — submit one job — regardless of host count (the round-2
        driver loop was O(hosts) serialized fetches). The robots table is in
        the epoch's atomic commit group (TABLE_NAMES), so a crash re-fetches
        cleanly.

        Only called when the fused select_dedup aggregate already proved at
        least one host is missing (VERDICT r3 #1b/#6): the steady state —
        every host cached — plans ZERO robots jobs. The merge itself persists
        the updates plan, so the fetch stage runs exactly once."""
        missing = (
            batch.select("host")
            .dropDuplicates(["host"])
            .join(self._known_robots_hosts(epoch), "host", "left_anti")
        )
        fetched = missing.repartition(self.fetch_partitions, "host").mapInPandas(
            make_robots_stage(self.web_params), "host string, rules string"
        )
        self.robots.merge(
            fetched.withColumn("fetched_epoch", F.lit(epoch)),
            summary={"op": "robots", "epoch": epoch},
            dedupe=False,  # hosts are distinct by construction
            # anti-joined against the TTL-filtered known set → (nearly) all
            # keys are new; expired re-fetches still overlay via the
            # matched-key discovery pass (r06: shaves the join overlay)
            mostly_new=True,
        )

    # ---------- the epoch ----------

    def run_epoch(self) -> dict:
        import time as _time

        phase_sec: dict[str, float] = {}
        _t0 = _time.monotonic()

        def _mark(name: str) -> None:
            nonlocal _t0
            now = _time.monotonic()
            phase_sec[name] = round(phase_sec.get(name, 0.0) + (now - _t0), 3)
            _t0 = now

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

        # dedup: Bloom prefilter, exact anti-join only on positives (§4.1).
        # Empty-seen fast path (r06): on a fresh workdir's first epoch the
        # seen set is empty, so NOTHING can be a duplicate — the Bloom probe
        # (a shard shuffle over the whole selection) is skipped and every
        # row is declared a negative. Identical semantics even when the
        # Bloom carries lingering rolled-back keys: those positives would
        # anti-join an EMPTY seen table straight back into the batch anyway
        # (and in TTL mode _last_seen is null → not fresh → survivor).
        seen_df = self.seen.read()
        if self.seen.is_empty():
            checked = selected.withColumn("maybe_seen", F.lit(False)).persist(
                StorageLevel.MEMORY_AND_DISK
            )
        else:
            checked = self.bloom.prefilter_spark(selected, "url_key").persist(
                StorageLevel.MEMORY_AND_DISK
            )
        n_selected = checked.count()
        negatives = checked.filter(~F.col("maybe_seen")).drop("maybe_seen")
        positives = checked.filter(F.col("maybe_seen")).drop("maybe_seen")
        if self.ttl_epochs is None:
            survivors = positives.join(seen_df, on="url_key", how="left_anti")
            dup_keys = positives.join(seen_df, "url_key", "left_semi")
        else:
            # D7 TTL mode: a key is a duplicate only while its LATEST seen
            # epoch is inside the recency window — stale keys re-fetch (the
            # reference's 24 h skip); corrupted records bypass the window
            # entirely (isRecentlyCrawled's delete-and-recrawl branch).
            # Corruption is the GENERATED ``corrupt`` column (recomputed at
            # every records write) read through manifest-stats pruning: when
            # no data file can contain a corrupt row — the steady state —
            # the probe costs zero scans and the join branch is not planned
            # at all (the round-2 version try_parse_json-scanned the whole
            # records table every TTL epoch).
            last_seen = seen_df.groupBy("url_key").agg(
                F.max("seen_epoch").alias("_last_seen")
            )
            corrupt_src = self.records.read_stats_pruned("corrupt")
            j = positives.join(last_seen, "url_key", "left")
            fresh = F.col("_last_seen").isNotNull() & (
                F.lit(epoch) - F.col("_last_seen") < F.lit(self.ttl_epochs)
            )
            drop_cols = ["_last_seen"]
            if corrupt_src is not None:
                corrupt = (
                    corrupt_src.filter(F.col("corrupt"))
                    .select("url_key")
                    .withColumn("_corrupt", F.lit(True))
                )
                j = j.join(corrupt, "url_key", "left")
                fresh = fresh & F.col("_corrupt").isNull()
                drop_cols.append("_corrupt")
            survivors = j.filter(~fresh).drop(*drop_cols)
            dup_keys = j.filter(fresh).drop(*drop_cols)
        batch = negatives.unionByName(survivors).persist(StorageLevel.MEMORY_AND_DISK)
        # ONE job materializes the batch into the persist, counts it, AND
        # counts the hosts missing from the robots cache (VERDICT r3 #1b/#6):
        # the per-host partial agg keeps the extra shuffle O(hosts ×
        # partitions), and an epoch where every host is already cached — the
        # steady state — plans zero robots jobs afterwards.
        known_hosts = self._known_robots_hosts(epoch).withColumn("_rk", F.lit(True))
        agg = (
            batch.groupBy("host")
            .agg(F.count(F.lit(1)).alias("_n"))
            .join(known_hosts, "host", "left")
            .agg(
                F.sum("_n").alias("n"),
                F.count(F.when(F.col("_rk").isNull(), True)).alias("miss"),
            )
            .collect()[0]
        )
        n_batch = int(agg["n"] or 0)
        n_missing_hosts = int(agg["miss"] or 0)
        n_deduped = n_selected - n_batch
        _mark("select_dedup")
        # already-seen rows must leave the pending set THIS epoch (not linger
        # to be re-selected and re-deduped every remaining epoch)
        dup_done = dup_keys.select("url_key", F.lit("done").alias("state"))
        if n_batch == 0:
            stats = {"epoch": epoch, "selected": n_selected, "deduped": n_deduped,
                     "fetched": 0, "ok": 0, "failed": 0, "robots_denied": 0,
                     "not_found": 0, "images": 0, "retried": 0, "discovered": 0,
                     "cache_hits": 0, "drained": pending.limit(1).count() == 0}
            if n_deduped:
                # mark the all-dup batch done so it leaves the pending set
                self.frontier.merge(
                    dup_done, summary={"op": "dedup_skip", "epoch": epoch},
                    dedupe=False,
                    source_parts=["pending"],  # dup keys were selected from pending
                )
                self._record_state(epoch + 1)
                stats["drained"] = False
            checked.unpersist()
            batch.unpersist()
            return stats

        # Crash-safety needs no in_flight marking: selected rows keep
        # state='pending' until the epoch-end commit, so a crash mid-fetch
        # simply re-selects them on restart (commits are atomic snapshots,
        # and the epoch GROUP is atomic via the state record + resume()).
        if n_missing_hosts:
            # tagged with a job group so tests can listener-assert that a
            # steady-state epoch submits zero robots jobs (VERDICT r3 #6)
            sc = self.spark.sparkContext
            sc.setJobGroup("robots", f"robots epoch {epoch}")
            try:
                self._resolve_robots(batch, epoch)
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)
                sc.setLocalProperty("spark.job.description", None)
        rules_df = self.robots.read().select("host", "rules")
        _mark("robots")

        # fetch+extract — strict mode: partitioned BY HOST (global politeness
        # pacing); throughput mode: salted lanes kill the hot-host skew.
        # The fused output lands in a staging PARQUET (not .persist()): the
        # epoch then reads it several times (statuses/images/records/
        # discovered/lineage) and columnar staging means every scan except
        # the images MERGE prunes the bytes column away — a row-format cache
        # would deserialize the payload bytes on every scan. The staging dir
        # doubles as the raw-results archive of the epoch (K5 analog).
        stage = make_stage(
            self.web_params, self.budget, self.archive_pages, epoch=epoch
        )
        # D9 routing join: batch rows whose key is in the raw-page archive
        # go to a PARSE-ONLY stage (re-parse without re-fetch,
        # DetailCrawler.php:105-123); search pages always fetch (the
        # reference caches detail pages, and the two-hop child fetch cannot
        # run from cache). The fetch and parse lanes are one union, one
        # staging write — a single job.
        to_fetch = batch
        staged = None
        if self.archive_pages and not self.pages.is_empty():
            arch = self.pages.read().filter(F.col("status") == "ok").select(
                "url_key", "body"
            )
            cached = (
                batch.filter(~F.col("canonical_url").contains("/search"))
                .join(arch, "url_key")
                .select("url_key", "canonical_url", "host", "body")
            )
            to_fetch = batch.join(cached.select("url_key"), "url_key", "left_anti")
            staged = cached.repartition(self.fetch_partitions, "url_key").mapInPandas(
                make_parse_stage(epoch), STAGE_DDL
            )
        # rules ride along as a column (constant per host, parsed once per
        # host per partition in-stage): a broadcast join for small robots
        # tables, a host-hash shuffle join at 10^6-host scale — never a
        # driver-side dict
        to_fetch = to_fetch.join(rules_df, "host", "left")
        # Lane layout (round-5 rework — VERDICT r4 #2): throughput mode uses
        # RANGE lanes on (host, order key) instead of hash-salted lanes.
        # Range partitioning (a) balances the 80%-skew host by SAMPLED row
        # counts — no S>>P oversampling against balls-in-bins collisions —
        # and (b) makes each host's lanes CONTIGUOUS in order-key space, so
        # the per-partition host_seq the stage already emits composes into
        # the global per-host crawl order with nothing but per-(partition,
        # host) offsets, which the epoch's ONE stats pass collects anyway.
        # _c_order_log then degenerates to a narrow staging scan + broadcast
        # offsets join — no batch re-join, no extra shuffle, no sort job.
        # Strict mode keeps hash-by-host (politeness pacing globally
        # correct); there a host never straddles partitions, so its offset
        # is just 0. Both modes sort within partitions so the stage's
        # arrival order IS the deterministic order key (crawl ORDER is
        # unchanged — order-parity tests pin this).
        from biz_crawlers_spark.frontier.seed import ORDER_COLS

        if self.fetch_salting > 0:
            lanes = to_fetch.repartitionByRange(
                self.fetch_partitions, "host", *ORDER_COLS
            )
        else:
            lanes = to_fetch.repartition(self.fetch_partitions, "host")
        fetched_df = lanes.sortWithinPartitions("host", *ORDER_COLS).mapInPandas(
            stage, STAGE_DDL
        )
        if staged is not None:
            fetched_df = fetched_df.unionByName(staged)
        staging = os.path.join(self.workdir, "staging", f"epoch={epoch}")
        # staging is PARTITIONED BY row_type: (a) every downstream read
        # filters on row_type, which becomes partition pruning — the commit
        # jobs never even open each other's files (this is also what makes
        # the zero-copy adopt safe under concurrent commits); (b) the
        # image/record partitions are pure payload files the payload tables
        # ADOPT by rename — the epoch's bytes are written exactly once
        fetched_df.write.mode("overwrite").partitionBy("row_type").parquet(staging)
        fetched = self.spark.read.parquet(staging)
        _mark("fetch_stage")

        statuses = fetched.filter(F.col("row_type") == "status")
        images = fetched.filter(F.col("row_type") == "image")
        records = fetched.filter(F.col("row_type") == "record")
        discovered = fetched.filter(F.col("row_type") == "discovered")

        # ONE stats pass over staging — run FIRST: the collected group rows
        # (O(hosts × partitions), tiny) yield the lineage table rows, the
        # epoch totals, AND the counts that let the commit section skip
        # whole plan branches (no discovery → no frontier anti-join; no
        # duplicates → no dedup-done union) — replacing the round-1 fan-out
        # of separate lineage-agg, image-count-join, global-agg, and
        # discovery-count jobs (4 staging scans → 1).
        is_status = F.col("row_type") == "status"
        st = F.when(is_status, F.col("status"))
        groups = (
            fetched.groupBy("host", "partition_id")
            .agg(
                F.sum(
                    (is_status & ~st.isin("robots_denied", "cached")).cast("long")
                ).alias("fetched"),
                F.sum((st == "ok").cast("long")).alias("ok"),
                F.sum(
                    (is_status & ~st.isin("ok", "not_found", "robots_denied")).cast("long")
                ).alias("failed"),
                F.sum(
                    F.when(is_status, F.greatest(F.col("attempts") - 1, F.lit(0)))
                    .otherwise(0)
                    .cast("long")
                ).alias("retried"),
                F.sum((st == "robots_denied").cast("long")).alias("robots_denied"),
                F.sum((st == "not_found").cast("long")).alias("not_found"),
                F.sum((F.col("row_type") == "image").cast("long")).alias("images"),
                F.sum((F.col("row_type") == "record").cast("long")).alias("recs"),
                F.sum((F.col("row_type") == "discovered").cast("long")).alias("disc"),
                F.sum((st == "cached").cast("long")).alias("cache_hits"),
                # rows the fetch stage NUMBERED (status rows with a
                # partition-local host_seq): their per-(host, partition)
                # counts are exactly the offsets that turn the stage's local
                # sequence into the global per-host crawl order (see
                # _c_order_log) — collected for free in this same pass
                F.sum(
                    (is_status & F.col("host_seq").isNotNull()).cast("long")
                ).alias("n_ord"),
            )
            .collect()
        )
        _mark("stats_pass")
        totals = {
            k: int(sum(r[k] for r in groups))
            for k in ("fetched", "ok", "failed", "retried", "robots_denied",
                      "not_found", "images", "recs", "disc", "cache_hits")
        }
        n_discovered = totals["disc"]
        n_images = totals["images"]

        # --- commits ---
        # Per-table commits are atomic; the GROUP is made atomic by the state
        # record written at the end (resume() rolls back any table that is
        # ahead of the record, so a crash anywhere in this sequence re-runs
        # the epoch in full — no seen rows without evidence rows, ADVICE r1).
        # The commits are INDEPENDENT (distinct tables/dirs, all reading the
        # immutable staging output), so they are submitted CONCURRENTLY from
        # driver threads — Spark schedules the jobs in parallel and the
        # epoch's commit tail collapses from a sum of job latencies to their
        # max. Any failure aborts the epoch before the state record, so the
        # group stays atomic.
        img_rows = images.select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "url_key", "seq", "epoch",
        ).dropDuplicates(["image_id"])  # same bytes on two pages in one epoch

        rec_rows = records.select(
            "entity_id", "entity_name", "entity_names", "address", "change_date",
            "biz_items", "shareholders", "managers", "capital", "parse_mode",
            "category", "url_key", "epoch", "corrupt",
        ).dropDuplicates(["entity_id"])

        term_ok = statuses.filter(F.col("status").isin("ok", "not_found", "cached"))
        seen_rows = term_ok.select("url_key", F.lit(epoch).alias("seen_epoch"))

        def _hint(n_rows: int, table: SnapTable) -> str | None:
            # With n uniformly-hashed update keys over B buckets,
            # P(some bucket untouched) <= B * (1 - 1/B)^n < B * e^(-n/B);
            # at n >= 32·B that is < B·e^-32 ≈ never. Declaring every bucket
            # touched lets the merge skip the touched-bucket discovery job
            # AND the updates persist (the plan is consumed exactly once) —
            # part of the VERDICT r3 #1 fixed-overhead cut. A false "all"
            # only rewrites an unchanged bucket; never incorrect.
            return "all" if n_rows >= 32 * table.n_buckets else None

        # payload tables are INSERT-HEAVY (VERDICT r4 #7 / sustained-crawl
        # fix): at steady state nearly every image_id/entity_id is brand
        # new. The FAST path is ZERO-COPY ADOPT (VERDICT r4 #2): the
        # staging write already produced pure image/record parquet files
        # (row_type partitions, table column names, epoch + corrupt
        # stamped in-stage), so after two narrow key jobs prove the batch
        # is key-distinct AND disjoint from the table, the commit just
        # RENAMES those files in (SnapTable.adopt_files) — the payload
        # bytes are written exactly once per epoch and the commit cost is
        # O(files) metadata, independent of both batch and table size.
        # Any key collision (re-crawled image on another page, TTL
        # re-crawls) falls back to the mostly_new merge, which pays the
        # overlay only for genuinely matched buckets.
        payload_paths: dict[str, str] = {}

        def _payload_commit(
            table: SnapTable, part_dir: str, df_rows, key: str, n_rows: int
        ) -> None:
            keybloom = self._payload_keyblooms.get(part_dir)
            use_bloom = keybloom is not None and self.payload_key_gate == "bloom"
            src = os.path.join(staging, f"row_type={part_dir}")
            can_adopt = (not self.keep_staging) and n_rows > 0 and os.path.isdir(src)
            if can_adopt:
                # ONE narrow key job yields the distinct count AND the
                # in-batch duplicate keys (the old path computed only the
                # distinct count from the same shuffle).
                cnt = (
                    fetched.filter(F.col("row_type") == part_dir)
                    .groupBy(key)
                    .agg(F.count(F.lit(1)).alias("_n"))
                )
                if use_bloom:
                    cnt = cnt.withColumn("_kh", F.xxhash64(F.col(key)))
                # adopt RENAMES the staging files this plan reads, so every
                # post-adopt use (dup keys, the Bloom add) must come from
                # the cache — persist is materialized by the agg below
                cnt = cnt.persist(StorageLevel.MEMORY_AND_DISK)
                patch_rows = None
                try:
                    agg = cnt.agg(
                        F.count(F.lit(1)).alias("_nd"),
                        F.coalesce(
                            F.sum((F.col("_n") > 1).cast("long")), F.lit(0)
                        ).alias("_ndup"),
                    ).first()
                    n_dist, n_dup = int(agg["_nd"]), int(agg["_ndup"])
                    if n_dist < n_rows and self.payload_patch:
                        # ADOPT + PATCH: a few in-batch duplicate keys must
                        # not force a full-batch byte rewrite (the sustained
                        # campaign measured the MoR fallback at 2-3x the
                        # adopt commit: it re-writes the whole image payload
                        # because ~100 of ~10^6 keys collided). Materialize
                        # the duplicated keys' rows — already key-distinct
                        # via df_rows' dropDuplicates — BEFORE the rename;
                        # after the adopt they become a tiny MoR commit
                        # whose higher-seq equality-delete entry supersedes
                        # every adopted copy of those keys. Payload written:
                        # O(n_dup) instead of O(batch); the dead adopted
                        # copies fold out at the vacuum/compaction cadence.
                        dup_keys = cnt.filter(F.col("_n") > 1).select(key)
                        patch_rows = df_rows.join(
                            F.broadcast(dup_keys), key, "left_semi"
                        ).persist(StorageLevel.MEMORY_AND_DISK)
                        patch_rows.count()  # materialize before the rename
                    if n_dist == n_rows or patch_rows is not None:
                        # zero-copy adopt regardless of cross-epoch matches:
                        # matched keys become an equality-delete entry riding
                        # the same commit. Gate "bloom" (default) finds them
                        # by probing the batch keys against the maintained
                        # payload-key Bloom — O(batch), conservative superset
                        # (false positives are harmless no-op deletes, see
                        # __init__); gate "scan" is the exact raw-key-column
                        # scan, which reads O(table files) every epoch.
                        files = [
                            os.path.join(src, fn)
                            for fn in os.listdir(src)
                            if fn.endswith(".parquet")
                        ]
                        matched = None
                        gate = None
                        n_matched = 0
                        if use_bloom:
                            # FUSED probe+insert: one shard shuffle yields
                            # the matched-key membership test AND the Bloom
                            # add that used to be a second full-batch
                            # shuffle after the adopt. The add landing even
                            # if a later step aborts the epoch is the
                            # documented harmless-lingering-positive case.
                            gate = keybloom.check_add_spark(cnt, "_kh")
                            if not table.is_empty():
                                matched = gate.filter(
                                    F.col("maybe_seen")
                                ).select(key)
                                n_matched = matched.count()
                        elif not table.is_empty():
                            matched = cnt.select(key).join(
                                table.read_keys_raw(), key, "left_semi"
                            ).persist(StorageLevel.MEMORY_AND_DISK)
                            n_matched = matched.count()
                        try:
                            table.adopt_files(
                                files,
                                summary={
                                    "epoch": epoch, "adopted": True,
                                    "matched": n_matched, "patched": n_dup,
                                },
                                delete_keys_df=matched if n_matched else None,
                            )
                        finally:
                            if gate is not None:
                                gate.unpersist()
                            elif matched is not None:
                                matched.unpersist()
                        if patch_rows is not None:
                            table.merge(
                                patch_rows,
                                summary={
                                    "epoch": epoch, "mor": True, "patch": True,
                                },
                                dedupe=False, mor=True, insert_direct=True,
                            )
                        if use_bloom:
                            self._maybe_rebuild_keybloom(keybloom, table, key)
                        elif keybloom is not None:
                            # scan-mode epochs must still MAINTAIN the Bloom
                            # (ADVICE r5): a later reopen with the default
                            # 'bloom' gate loads this file, and a key the
                            # scan-mode commit skipped would be a false
                            # negative — breaking the no-FN safety argument
                            keybloom.add_spark(
                                cnt.select(
                                    F.xxhash64(F.col(key)).alias("_kh")
                                ),
                                "_kh",
                            )
                        payload_paths[part_dir] = (
                            "adopt" if patch_rows is None else "adopt_patch"
                        )
                        return
                finally:
                    cnt.unpersist()
                    if patch_rows is not None:
                        patch_rows.unpersist()
            # fallback (payload_patch=False, keep_staging, or empty batch):
            # in-batch duplicate keys take the full-batch MERGE-ON-READ
            # upsert — append O(batch) + an equality-delete entry; never an
            # O(table) rewrite (refresh crawls re-crawl whole epochs). The
            # read tax is folded back by the vacuum compaction cadence.
            table.merge(
                df_rows, summary={"epoch": epoch, "mor": True}, dedupe=False,
                mor=True, insert_direct=True,
            )
            # the Bloom is maintained in BOTH gate modes (ADVICE r5): scan
            # mode merely doesn't probe it, but it must stay a superset of
            # committed keys for any later bloom-gated epoch
            if keybloom is not None and n_rows > 0:
                keybloom.add_spark(
                    df_rows.select(F.xxhash64(F.col(key)).alias("_kh")), "_kh"
                )
                if use_bloom:
                    self._maybe_rebuild_keybloom(keybloom, table, key)
            payload_paths[part_dir] = "mor"

        def _c_images() -> None:
            _payload_commit(
                self.images, "image", img_rows, "image_id", totals["images"]
            )

        def _c_records() -> None:
            _payload_commit(
                self.records, "record", rec_rows, "entity_id", totals["recs"]
            )

        def _c_pages() -> None:
            page_rows = (
                fetched.filter(F.col("row_type") == "page")
                .select(
                    "url_key", "status", F.col("bytes").alias("body"),
                    F.lit(epoch).alias("epoch"),
                )
                .dropDuplicates(["url_key"])
            )
            # MoR upsert: re-archived bodies (TTL re-crawls) supersede by
            # key at read time — O(batch) write, never an O(table) rewrite
            self.pages.merge(
                page_rows, summary={"epoch": epoch}, dedupe=False, mor=True,
                insert_direct=True,
            )

        # seen table, Bloom shards, and cuckoo mirror are INDEPENDENT
        # structures (distinct directories, all reading immutable staging);
        # lockstep is guaranteed by the state record, not by sequencing —
        # so they commit concurrently like every other table (round-2 ran
        # them as one serial chain inside a single commit thread)
        def _c_seen() -> None:
            self.seen.append(seen_rows, summary={"epoch": epoch})

        def _c_bloom() -> None:
            self.bloom.add_spark(term_ok.select("url_key"), "url_key")
            # saturation policy (VERDICT r4 #4): when the max shard fill
            # crosses the threshold (O(1) vmeta read), rebuild into a larger
            # bit space from the durable seen set — this epoch's terminal
            # keys plus the epoch-start seen snapshot (deterministic
            # regardless of the concurrent _c_seen commit's timing). The
            # rebuild is its own version; rollback via the state record
            # still lands on intact older versions.
            if self.bloom.fill_ratio() > self.bloom_rebuild_fill:
                self.bloom.rebuild_spark(
                    seen_df.select("url_key").unionByName(
                        seen_rows.select("url_key")
                    ),
                    "url_key",
                )

        def _c_cuckoo() -> None:
            cf = self._seen_cuckoo()
            if cf is not None:  # keep the deletable mirror in lockstep (D6)
                cf.add_spark(term_ok.select("url_key"), "url_key")

        # frontier: ONE fused merge — fetched-state transitions + dedup-done
        # marks + discovered inserts. State transitions apply to FRONTIER
        # rows only; two-hop detail fetches (parent_key set) are derived
        # requests — seen-tracked and lineage-counted but never frontier rows.
        state_upd = statuses.filter(F.col("parent_key").isNull()).select(
            "url_key",
            F.when(F.col("status").isin("ok", "not_found", "cached"), "done")
            .when(F.col("status") == "robots_denied", "denied")
            .otherwise("failed")
            .alias("state"),
            F.col("attempts").alias("retries"),
        )
        frontier_updates = state_upd
        if n_discovered:
            # F4 discoveries stay distributed: url_key/host/page derived with
            # column expressions from the (already canonical) discovered_url —
            # no driver collect, no createDataFrame round-trip
            ndf = (
                discovered.select(
                    F.xxhash64("discovered_url").alias("url_key"),
                    F.col("discovered_url").alias("canonical_url"),
                    F.lower(F.parse_url("discovered_url", F.lit("HOST"))).alias("host"),
                    F.lit(0).alias("org_idx"),
                    F.lit(0).alias("type_idx"),
                    F.coalesce(
                        F.nullif(
                            F.regexp_extract("discovered_url", r"[?&]pages=(\d+)", 1),
                            F.lit(""),
                        ).cast("int"),
                        F.lit(0),
                    ).alias("page"),
                    F.coalesce(F.col("priority"), F.lit(0)).alias("priority"),
                    F.lit("pending").alias("state"),
                    F.lit(0).alias("retries"),
                    F.lit(epoch + 1).alias("not_before"),
                    F.lit(epoch + 1).alias("discovered_epoch"),
                )
                .dropDuplicates(["url_key"])
                # re-discovered URLs never reset existing rows (insert-only)
                .join(fr.select("url_key"), "url_key", "left_anti")
            )
            frontier_updates = ndf.unionByName(
                frontier_updates, allowMissingColumns=True
            )
        if n_deduped:
            frontier_updates = frontier_updates.unionByName(
                dup_done, allowMissingColumns=True
            )

        def _c_frontier() -> None:
            # source_parts contract: every MATCHED key is currently-pending
            # (transitions + dup marks come from this epoch's pending
            # selection; discovered rows are anti-joined new keys) — so only
            # pending-part files rewrite; the done history carries over
            self.frontier.merge(
                frontier_updates, summary={"op": "epoch_end", "epoch": epoch},
                dedupe=False,  # all sources are key-unique by construction
                touched_hint=_hint(
                    n_batch + n_discovered + n_deduped, self.frontier
                ),
                source_parts=["pending"],
                # cogroup overlay: pending rows move through ONE exchange
                # (bucket-aligned) instead of join + writer repartition;
                # frontier qualifies (url_key is its only 64-bit column and
                # never null) — see SnapTable.merge docstring
                strategy="cogroup",
            )

        def _c_order_log() -> None:
            # crawl-order evidence: per-host sequence of url_keys. host_seq
            # is DERIVED from the deterministic order key, not from worker
            # arrival — identical in strict and salted modes, and equal to
            # the reference's sequential order per host (SURVEY.md §7).
            #
            # STAGED-RANKING fast path (round 5 — VERDICT r4 #2): the fetch
            # stage receives rows sorted by (host, order key) within
            # range-contiguous lanes, so the partition-local host_seq it
            # already emits IS the per-host rank up to a per-(partition,
            # host) offset — and those offsets are the n_ord counts the
            # epoch's single stats pass collected. The order-log commit is
            # then ONE narrow column-pruned staging scan, a broadcast join
            # against the tiny offsets table (empty in strict mode: a host
            # never straddles partitions there), and the append — no batch
            # re-join, no range-sampling job, no sort, no persist. The
            # offsets side is O(host-partition pairs that straddle a lane
            # boundary); at 10^6 hosts it stays O(hosts) rows — driver-built
            # but broadcast once per executor, never captured per task.
            # Excluded only in archive mode: parse-lane 'cached' statuses
            # carry no stage sequence, so that mode keeps the derived
            # ranking below (bit-identical output, test-pinned).
            if not self.archive_pages:
                per_host: dict[str, list] = {}
                for r in groups:
                    if r["n_ord"]:
                        per_host.setdefault(r["host"], []).append(
                            (r["partition_id"], r["n_ord"])
                        )
                off_rows = []
                for h, lst in per_host.items():
                    acc = 0
                    for pid, c in sorted(lst):
                        if acc:
                            off_rows.append((h, pid, acc))
                        acc += c
                ranked = statuses.filter(F.col("host_seq").isNotNull())
                if off_rows:
                    off_df = self.spark.createDataFrame(
                        off_rows, "host string, partition_id int, _off long"
                    )
                    seq = (
                        F.coalesce(F.col("_off"), F.lit(0)) + F.col("host_seq")
                    ).cast("long")
                    ranked = ranked.join(
                        F.broadcast(off_df), ["host", "partition_id"], "left"
                    )
                else:
                    seq = F.col("host_seq").cast("long")
                self.order_log.append(
                    ranked.select(
                        "url_key", "host", F.lit(epoch).alias("epoch"),
                        seq.alias("host_seq"), "status", "attempts", "n_payload",
                    ),
                    summary={"epoch": epoch},
                    bucketize=False,
                )
                return
            # ADAPTIVE ranking (VERDICT r3 #1a): below ranking_window_rows a
            # plain row_number window is cheaper — one sort task even for the
            # 80%-skew host beats repartitionByRange sampling + a count
            # groupBy + a mapInPandas pass. Above it, ranking is the
            # two-phase SKEW-FREE computation: range-partition on (host,
            # order key) — the hot host spans many partitions — local sort,
            # then per-(partition, host) counts give each partition its
            # global offset; a narrow mapInPandas assigns offset + local
            # position. Both paths are bit-identical: the rank is defined by
            # the sort key, not by row placement.
            import pandas as pd

            order_cols = ["priority", "org_idx", "type_idx", "page", "url_key"]
            out_ddl = (
                "url_key long, host string, epoch int, host_seq long, "
                "status string, attempts int, n_payload int"
            )
            joined = batch.select("url_key", "host", *order_cols[:-1]).join(
                statuses.select("url_key", "status", "attempts", "n_payload"),
                "url_key",
            )
            if n_batch <= self.ranking_window_rows:
                from pyspark.sql import Window

                w = Window.partitionBy("host").orderBy(*order_cols)
                ranked = joined.select(
                    "url_key",
                    "host",
                    F.lit(epoch).alias("epoch"),
                    (F.row_number().over(w) - 1).cast("long").alias("host_seq"),
                    "status",
                    "attempts",
                    "n_payload",
                )
                self.order_log.append(
                    ranked, summary={"epoch": epoch}, bucketize=False
                )
                return
            rng = (
                joined.repartitionByRange(self.fetch_partitions, "host", *order_cols)
                .sortWithinPartitions("host", *order_cols)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                cnt_rows = (
                    rng.withColumn("_pid", F.spark_partition_id())
                    .groupBy("_pid", "host")
                    .count()
                    .collect()
                )  # O(partitions + hosts straddling boundaries) driver rows
                per_host: dict[str, list] = {}
                for r in cnt_rows:
                    per_host.setdefault(r["host"], []).append((r["_pid"], r["count"]))
                offsets: dict[tuple[int, str], int] = {}
                for h, lst in per_host.items():
                    acc = 0
                    for pid, c in sorted(lst):
                        offsets[(pid, h)] = acc
                        acc += c
                ep = epoch
                # the offsets map is O(distinct (partition, host) pairs) —
                # broadcast it instead of shipping it inside every task
                # closure (at 10^6 hosts a closure-captured dict re-uploads
                # multi-MB per task; a broadcast ships once per executor)
                bc_offsets = self.spark.sparkContext.broadcast(offsets)

                def assign(it):
                    from pyspark import TaskContext

                    offs = bc_offsets.value
                    pid = TaskContext.get().partitionId()
                    done_h: dict[str, int] = {}  # rows emitted per host so far
                    for pdf in it:
                        counts = pdf["host"].value_counts()
                        # dict-backed Series.map (C hash lookups), built per
                        # batch over the few distinct hosts — no per-row lambda
                        base_by_host = {
                            h: offs.get((pid, h), 0) + done_h.get(h, 0)
                            for h in counts.index
                        }
                        seq = pdf["host"].map(base_by_host) + pdf.groupby(
                            "host"
                        ).cumcount()
                        for h, c in counts.items():
                            done_h[h] = done_h.get(h, 0) + int(c)
                        yield pd.DataFrame(
                            {
                                "url_key": pdf["url_key"],
                                "host": pdf["host"],
                                "epoch": ep,
                                "host_seq": seq.astype("int64"),
                                "status": pdf["status"],
                                "attempts": pdf["attempts"],
                                "n_payload": pdf["n_payload"],
                            }
                        )

                ranked = rng.mapInPandas(assign, out_ddl)
                try:
                    self.order_log.append(
                        ranked,
                        summary={"epoch": epoch},
                        bucketize=False,  # append-only evidence table, never MERGEd
                    )
                finally:
                    bc_offsets.unpersist()
            finally:
                rng.unpersist()

        def _c_lineage() -> None:
            lineage_rows = self.spark.createDataFrame(
                [
                    (epoch, r["partition_id"], r["host"], r["fetched"], r["ok"], 0,
                     r["failed"], r["retried"], r["robots_denied"], r["not_found"],
                     r["images"], r["cache_hits"])
                    for r in groups
                ],
                LINEAGE_DDL,
            )
            self.lineage.append(lineage_rows, summary={"epoch": epoch}, bucketize=False)

        from concurrent.futures import ThreadPoolExecutor

        commits = [_c_images, _c_records, _c_seen, _c_bloom, _c_cuckoo,
                   _c_frontier, _c_order_log, _c_lineage]
        if self.archive_pages:
            commits.append(_c_pages)
        commit_sec: dict[str, float] = {}

        def _timed(c):
            t0 = _time.monotonic()
            c()
            commit_sec[c.__name__.lstrip("_")] = round(_time.monotonic() - t0, 3)

        if os.environ.get("SPARK_GRAFT_SERIAL_COMMITS") == "1":
            # diagnostic mode: serialized commits give TRUE per-commit cost
            # (concurrent wall times include slot contention and mostly
            # measure the last finisher) — used for tail attribution only
            for c in commits:
                _timed(c)
        else:
            with ThreadPoolExecutor(max_workers=len(commits)) as ex:
                futures = [ex.submit(_timed, c) for c in commits]
                for f in futures:
                    f.result()  # re-raise: a failed commit aborts the epoch
                    # BEFORE the state record — resume() then rolls back the
                    # tables that did land, keeping the group atomic

        checked.unpersist()
        batch.unpersist()
        if not self.keep_staging:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
        self._record_state(epoch + 1)
        _mark("commits")
        phase_sec["commit_breakdown"] = commit_sec
        return {
            "epoch": epoch, "selected": n_selected, "deduped": n_deduped,
            "fetched": totals["fetched"], "ok": totals["ok"],
            "failed": totals["failed"], "robots_denied": totals["robots_denied"],
            "not_found": totals["not_found"], "retried": totals["retried"],
            "images": n_images, "discovered": n_discovered,
            "cache_hits": totals["cache_hits"], "drained": False,
            "phase_sec": phase_sec,
            "payload_paths": payload_paths,
        }

    def run(self, max_epochs: int = 100, maintain_every: int = 0) -> list[dict]:
        """Epoch loop; ``maintain_every`` > 0 runs vacuum() every N epochs
        (the long-crawl storage-maintenance cadence)."""
        out = []
        for i in range(max_epochs):
            stats = self.run_epoch()
            out.append(stats)
            if stats["drained"]:
                break
            if maintain_every and (i + 1) % maintain_every == 0:
                self.vacuum()
        return out

    def vacuum(self, keep_last: int = 2, compact_deletes_after: int = 6) -> dict:
        """Storage maintenance for long crawls: fold merge-on-read deletes
        (tables carrying ≥ ``compact_deletes_after`` equality-delete entries
        are compacted — the MoR read tax is bounded by THIS cadence, the
        Iceberg maintenance contract), expire old table snapshots (SnapTable
        copy-on-write history is the dominant storage cost at 10^10 rows),
        prune Bloom/cuckoo filter version directories, and drop staging dirs
        older than the current epoch when they are not being kept as the
        archive. Retention ≥ 2 keeps the resume() rollback window intact
        (the state record never points more than one snapshot back); time
        travel remains available inside the window."""
        keep_last = max(keep_last, 2)
        stats: dict = {}
        compacted = []
        for name in self.TABLE_NAMES:
            t = getattr(self, name)
            sid = t.current_snapshot_id()
            if sid >= 0 and len(
                t._load_manifest(sid).get("deletes", [])
            ) >= compact_deletes_after:
                t.compact(summary={"op": "vacuum_mor_fold"})
                compacted.append(name)
        if compacted:
            stats["mor_compacted"] = compacted
            self._record_state(self.current_epoch())
        for name in self.TABLE_NAMES:
            stats[name] = getattr(self, name).expire_snapshots(keep_last=keep_last)
        stats["bloom_versions_removed"] = self.bloom.expire_versions(keep_last)
        # payload-key Blooms version per touched epoch like the seen Bloom
        # but were never expired (ADVICE r5) — unbounded keys_bloom_* growth
        # over a sustained campaign. They never roll back (extra positives
        # are conservative), so the rollback-window floor is not needed;
        # keep_last is still honored for uniform time-travel debugging.
        stats["payload_keybloom_versions_removed"] = {
            part: kb.expire_versions(keep_last)
            for part, kb in self._payload_keyblooms.items()
        }
        cf = self._seen_cuckoo()
        if cf is not None:
            stats["cuckoo_versions_removed"] = cf.expire_versions(keep_last)
        if not self.keep_staging:
            import shutil

            sdir = os.path.join(self.workdir, "staging")
            if os.path.isdir(sdir):
                epoch = self.current_epoch()
                for d in os.listdir(sdir):
                    if d.startswith("epoch=") and int(d.split("=")[1]) < epoch:
                        shutil.rmtree(os.path.join(sdir, d), ignore_errors=True)
        return stats


