"""Round-5 upgrades (VERDICT r4 "Next round" + ADVICE r4):

- SnapTable ``part_col``/``source_parts``: the frontier's done history is
  never rewritten by epoch-end merges (flat c_frontier over a campaign)
- SnapTable ``mostly_new``: insert-heavy merges (images/records at steady
  state) take a pure-append path — O(batch), not O(table) — and still
  overlay genuinely matched keys correctly
- ensure_meta config-downgrade guard (ADVICE r4 #1) + parsed-schema prefix
  comparison robust to comma-bearing types (ADVICE r4 #2)
- Bloom saturation policy (VERDICT r4 #4): fill tracking in version
  metadata, automatic re-size/rebuild past the threshold, prefilter
  hit-rate restored, engine-wired and rollback-safe
- sustained-epoch invariants: multi-epoch crawl into one workdir keeps
  order-log ranks dense per (host, epoch) and frontier keys unique
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from biz_crawlers_spark.engine.crawl import CrawlEngine
from biz_crawlers_spark.filters.bloom import BloomShards
from biz_crawlers_spark.frontier.seed import synthetic_seed_df
from biz_crawlers_spark.politeness.budget import PolitenessBudget
from biz_crawlers_spark.tables.snaptable import SnapTable


def _engine(spark, wd, **kw):
    kw.setdefault("per_host_budget", 10_000)
    kw.setdefault("bloom_shards", 4)
    kw.setdefault("bloom_bits", 1 << 16)
    return CrawlEngine(
        spark, str(wd), web_params={"seed": 42, "n_hosts": 8, "max_images_per_page": 1},
        budget=PolitenessBudget(time_scale=0), table_buckets=4,
        fetch_partitions=4, **kw,
    )


# ---------- part_col / source_parts ----------


def _mk_state_table(spark, path):
    t = SnapTable.create(
        spark, str(path), "k long, state string, v int", ["k"],
        n_buckets=4, part_col="state",
    )
    rows = [(i, "pending", 1) for i in range(100)]
    t.overwrite(spark.createDataFrame(rows, "k long, state string, v int"))
    return t


def test_part_col_files_carry_part_values(spark, tmp_path):
    t = _mk_state_table(spark, tmp_path / "pc")
    files = t._load_manifest(t.current_snapshot_id())["files"]
    assert files and all(f.get("part") == "pending" for f in files)
    assert all("_part=pending" in f["path"] for f in files)
    assert t.read().count() == 100


def test_source_parts_merge_never_rewrites_done_files(spark, tmp_path):
    t = _mk_state_table(spark, tmp_path / "sp")
    # transition 0..49 → done (matched keys all pending: the contract)
    upd = spark.createDataFrame(
        [(i, "done", 2) for i in range(50)], "k long, state string, v int"
    )
    t.merge(upd, dedupe=False, source_parts=["pending"])
    m1 = t._load_manifest(t.current_snapshot_id())["files"]
    done_files_1 = sorted(f["path"] for f in m1 if f.get("part") == "done")
    assert done_files_1, "done rows must land in done-part files"
    got = {r["k"]: (r["state"], r["v"]) for r in t.read().collect()}
    assert len(got) == 100
    assert all(got[i] == ("done", 2) for i in range(50))
    assert all(got[i] == ("pending", 1) for i in range(50, 100))

    # second epoch: transition 50..99 → done, insert 100..149 pending.
    # The done files from step 1 must be CARRIED OVER byte-identical
    # (same manifest paths — no copy-on-write of the done history).
    upd2 = spark.createDataFrame(
        [(i, "done", 3) for i in range(50, 100)]
        + [(i, "pending", 1) for i in range(100, 150)],
        "k long, state string, v int",
    )
    t.merge(upd2, dedupe=False, source_parts=["pending"], touched_hint="all")
    m2 = t._load_manifest(t.current_snapshot_id())["files"]
    done_files_2 = sorted(f["path"] for f in m2 if f.get("part") == "done")
    assert set(done_files_1) <= set(done_files_2), (
        "prior done files must be carried, not rewritten"
    )
    got = {r["k"]: (r["state"], r["v"]) for r in t.read().collect()}
    assert len(got) == 150
    assert all(got[i] == ("done", 2) for i in range(50))
    assert all(got[i] == ("done", 3) for i in range(50, 100))
    assert all(got[i] == ("pending", 1) for i in range(100, 150))


def test_source_parts_delete_scopes_to_parts(spark, tmp_path):
    t = _mk_state_table(spark, tmp_path / "spd")
    t.merge(
        spark.createDataFrame([(i, "done", 2) for i in range(40)],
                              "k long, state string, v int"),
        dedupe=False, source_parts=["pending"],
    )
    # delete pending keys 40..59 — done files untouched
    before_done = sorted(
        f["path"]
        for f in t._load_manifest(t.current_snapshot_id())["files"]
        if f.get("part") == "done"
    )
    t.merge(
        spark.createDataFrame([(i,) for i in range(40, 60)], "k long"),
        delete=True, dedupe=False, source_parts=["pending"],
    )
    after = t._load_manifest(t.current_snapshot_id())["files"]
    assert before_done and set(before_done) <= {f["path"] for f in after}
    ks = {r["k"] for r in t.read().collect()}
    assert ks == set(range(40)) | set(range(60, 100))


# ---------- mostly_new ----------


def test_mostly_new_pure_append_when_no_matches(spark, tmp_path):
    t = SnapTable.create(spark, str(tmp_path / "mn"), "k long, v int", ["k"], n_buckets=4)
    t.overwrite(spark.createDataFrame([(i, 1) for i in range(100)], "k long, v int"))
    prev = {f["path"] for f in t._load_manifest(t.current_snapshot_id())["files"]}
    t.merge(
        spark.createDataFrame([(i, 2) for i in range(100, 200)], "k long, v int"),
        dedupe=False, mostly_new=True,
    )
    now = t._load_manifest(t.current_snapshot_id())["files"]
    assert prev <= {f["path"] for f in now}, "no-match merge must be a pure append"
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 200
    assert got[5] == 1 and got[150] == 2


def test_mostly_new_overlay_on_real_matches(spark, tmp_path):
    t = SnapTable.create(spark, str(tmp_path / "mn2"), "k long, v int, w string", ["k"], n_buckets=4)
    t.overwrite(
        spark.createDataFrame([(i, 1, f"w{i}") for i in range(100)], "k long, v int, w string")
    )
    # one matched key (overlay: NULL w keeps old value) + new keys
    upd = spark.createDataFrame(
        [(50, 9, None)] + [(i, 2, f"w{i}") for i in range(200, 210)],
        "k long, v int, w string",
    )
    t.merge(upd, dedupe=False, mostly_new=True)
    got = {r["k"]: (r["v"], r["w"]) for r in t.read().collect()}
    assert len(got) == 110
    assert got[50] == (9, "w50"), "matched key: new v wins, absent w keeps old"
    assert got[205] == (2, "w205")
    assert got[49] == (1, "w49")
    # untouched buckets' files carried over
    files = t._load_manifest(t.current_snapshot_id())["files"]
    assert len({f["bucket"] for f in files}) == 4


def test_cogroup_strategy_identical_to_join(spark, tmp_path):
    """merge(strategy='cogroup') must produce the same table content as the
    default join strategy — overlay semantics (new wins per non-null
    column), inserts, carried rows, part placement — on a frontier-shaped
    table (nullable int columns, non-null long key)."""
    ddl = "k long, host string, n int, v double, state string"
    results = {}
    for strat in ("join", "cogroup"):
        t = SnapTable.create(
            spark, str(tmp_path / f"cg_{strat}"), ddl, ["k"],
            n_buckets=4, part_col="state",
        )
        t.overwrite(
            spark.createDataFrame(
                [(i, f"h{i % 3}", i, float(i), "pending") for i in range(200)], ddl
            )
        )
        upd = spark.createDataFrame(
            # matched transitions (n absent → keeps old), plus inserts
            [(i, None, None, 9.5, "done") for i in range(0, 150)]
            + [(i, f"h{i % 3}", i, 0.5, "pending") for i in range(300, 340)],
            ddl,
        )
        t.merge(upd, dedupe=False, source_parts=["pending"], strategy=strat)
        results[strat] = sorted(
            (r["k"], r["host"], r["n"], r["v"], r["state"])
            for r in t.read().collect()
        )
        if strat == "cogroup":
            files = t._load_manifest(t.current_snapshot_id())["files"]
            assert all("part" in f for f in files)
    assert results["join"] == results["cogroup"]
    assert len(results["join"]) == 240


def test_mor_upsert_append(spark, tmp_path):
    """merge(mor=True): appends the batch + an equality-delete entry; reads
    resolve newest-sequence rows (Iceberg MoR shape). Matched keys get the
    NEW values, unmatched old rows survive, write cost never rewrites old
    files, and compact() folds the deletes away."""
    t = SnapTable.create(spark, str(tmp_path / "mor"), "k long, v int", ["k"], n_buckets=4)
    t.overwrite(spark.createDataFrame([(i, 1) for i in range(100)], "k long, v int"))
    files_before = {
        f["path"] for f in t._load_manifest(t.current_snapshot_id())["files"]
    }
    t.merge(
        spark.createDataFrame(
            [(i, 2) for i in range(50, 120)], "k long, v int"
        ),
        dedupe=False, mor=True,
    )
    m = t._load_manifest(t.current_snapshot_id())
    assert m.get("deletes"), "MoR merge must record an equality-delete entry"
    assert files_before <= {f["path"] for f in m["files"]}, "old files never rewritten"
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(got) == 120
    assert got[10] == 1 and got[60] == 2 and got[110] == 2
    # second MoR layer stacks correctly
    t.merge(spark.createDataFrame([(60, 3)], "k long, v int"), dedupe=False, mor=True)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[60] == 3 and got[55] == 2 and got[10] == 1 and len(got) == 120
    # read_stats_pruned-style merge interplay: classic merge on a MoR table
    # must not resurrect superseded rows
    t.merge(spark.createDataFrame([(10, 9)], "k long, v int"), dedupe=False)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[10] == 9 and got[60] == 3 and len(got) == 120
    # compaction folds deletes to zero and preserves content
    t.compact()
    m2 = t._load_manifest(t.current_snapshot_id())
    assert not m2.get("deletes")
    got2 = {r["k"]: r["v"] for r in t.read().collect()}
    assert got2 == got
    # expire keeps only referenced delete dirs; reads stay correct
    t.expire_snapshots(keep_last=2)
    assert {r["k"]: r["v"] for r in t.read().collect()} == got


def test_adopt_with_matched_delete_entry(spark, tmp_path):
    """Engine-level: an epoch whose payload keys PARTIALLY recur must still
    take the zero-copy adopt path, recording the matched keys as an
    equality-delete entry — the new rows win, old unmatched rows survive,
    and no data file is rewritten. Simulated by re-seeding the SAME URL
    range after clearing the seen set (forced re-crawl → identical
    image_ids)."""
    eng = _engine(spark, tmp_path / "adm", per_host_budget=10**9, fetch_salting=2)
    eng.add_seed_df(synthetic_seed_df(spark, 400, n_hosts=8))
    eng.run_epoch()
    n1 = eng.images.read().count()
    m1 = eng.images._load_manifest(eng.images.current_snapshot_id())
    files1 = {f["path"] for f in m1["files"]}
    # force a re-crawl of the same URLs: wipe the seen set and reopen (the
    # Bloom positives then pass the exact anti-join against the empty seen)
    eng.seen.merge(eng.seen.read().select("url_key"), delete=True, dedupe=False)
    fr = eng.frontier.read().filter(F.col("state") == "done")
    eng.frontier.merge(fr.withColumn("state", F.lit("pending")))
    st = eng.run_epoch()
    assert st["fetched"] > 0 and st["deduped"] == 0
    assert st["payload_paths"].get("image") == "adopt"
    m2 = eng.images._load_manifest(eng.images.current_snapshot_id())
    assert files1 <= {f["path"] for f in m2["files"]}, "old files never rewritten"
    assert m2.get("deletes"), "matched re-crawl keys must land as a delete entry"
    assert int(m2["summary"].get("matched", 0)) > 0
    imgs = eng.images.read()
    assert imgs.count() == n1, "MoR resolution: one row per image_id"
    assert imgs.select("image_id").distinct().count() == n1
    # the surviving rows are the NEW epoch's (epoch column advanced)
    assert imgs.agg(F.min("epoch")).collect()[0][0] >= 1
    # vacuum folds the delete entries once past the threshold
    eng.vacuum(compact_deletes_after=1)
    m3 = eng.images._load_manifest(eng.images.current_snapshot_id())
    assert not m3.get("deletes")
    assert eng.images.read().count() == n1


def test_mor_rollback_window(spark, tmp_path):
    """Rolling back past a MoR merge restores the pre-merge view (deletes
    are manifest-scoped)."""
    t = SnapTable.create(spark, str(tmp_path / "morrb"), "k long, v int", ["k"], n_buckets=2)
    t.overwrite(spark.createDataFrame([(1, 1), (2, 1)], "k long, v int"))
    sid = t.current_snapshot_id()
    t.merge(spark.createDataFrame([(2, 9), (3, 9)], "k long, v int"), dedupe=False, mor=True)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: 1, 2: 9, 3: 9}
    t.rollback(sid)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: 1, 2: 1}


# ---------- ensure_meta guards (ADVICE r4 #1/#2) ----------


def test_ensure_meta_downgrade_raises(spark, tmp_path):
    t = SnapTable.create(
        spark, str(tmp_path / "em"), "k long, v int, flag boolean", ["k"],
        n_buckets=2, derived={"flag": "v > 0"}, stat_cols=["flag"],
    )
    with pytest.raises(ValueError, match="downgrade"):
        t.ensure_meta("k long, v int, flag boolean")  # strips derived+stats
    with pytest.raises(ValueError, match="downgrade"):
        t.ensure_meta(
            "k long, v int, flag boolean", derived={"flag": "v > 1"},
            stat_cols=["flag"],
        )  # redefinition
    with pytest.raises(ValueError, match="downgrade"):
        t.ensure_meta(
            "k long, v int, flag boolean", derived={"flag": "v > 0"},
        )  # stat_cols stripped
    # unchanged full config is a no-op
    assert t.ensure_meta(
        "k long, v int, flag boolean", derived={"flag": "v > 0"}, stat_cols=["flag"]
    ) is False
    # part_col cannot be changed once set
    t2 = SnapTable.create(
        spark, str(tmp_path / "em2"), "k long, s string", ["k"], part_col="s"
    )
    with pytest.raises(ValueError, match="downgrade"):
        t2.ensure_meta("k long, s string")


def test_ensure_meta_comma_bearing_types(spark, tmp_path):
    ddl = "k long, m map<string,string>, d decimal(10,2)"
    t = SnapTable.create(spark, str(tmp_path / "emc"), ddl, ["k"], n_buckets=2)
    # append-compatible evolution with comma-bearing types parses correctly
    assert t.ensure_meta(ddl + ", extra string") is True
    assert t.schema_ddl.endswith("extra string")
    # a non-prefix evolution still fails loudly
    with pytest.raises(ValueError, match="not a prefix"):
        t.ensure_meta("k long, m map<string,int>, d decimal(10,2), extra string")


# ---------- Bloom saturation policy ----------


def test_bloom_saturation_rebuild_restores_fpr(spark, tmp_path):
    bf = BloomShards.create(str(tmp_path / "bl"), n_shards=4, m_bits=1 << 10, k=7)
    keys = spark.range(2000).select(F.xxhash64("id").alias("url_key"))
    bf.add_spark(keys, "url_key")
    assert bf.fill_ratio() > 0.5, "2000 keys into 4x1024 bits must saturate"
    est = bf.estimated_keys()
    # fill-based estimate is order-of-magnitude sane even near saturation
    assert est > 500
    old_m = bf.m_bits_of()
    bf.rebuild_spark(keys, "url_key")
    assert bf.m_bits_of() > old_m
    assert bf.fill_ratio() < 0.30
    # no false negatives ever
    kv = np.array([r["url_key"] for r in keys.collect()], dtype=np.int64)
    assert bf.contains(kv).all()
    # false-positive rate on fresh keys restored to useful levels
    fresh = np.array(
        [r["url_key"] for r in spark.range(10_000, 12_000)
         .select(F.xxhash64("id").alias("url_key")).collect()],
        dtype=np.int64,
    )
    assert bf.contains(fresh).mean() < 0.05
    # versioned sizing: the PRE-rebuild version still reads with its own
    # m_bits (rollback safety)
    ver = bf.current_version()
    bf._write_pointer(bf.path, ver - 1)
    assert bf.m_bits_of() == old_m
    assert bf.contains(kv).all()
    bf._write_pointer(bf.path, ver)


def test_engine_bloom_rebuild_in_epoch(spark, tmp_path):
    """A deliberately undersized filter saturates during the epoch commit;
    the engine rebuilds it from the seen set inside the same commit group.
    The rebuilt filter must keep zero false negatives (D2 exactness) and
    regain a real prefilter hit-rate; the state record tracks the new
    version so resume() stays consistent."""
    eng = _engine(
        spark, tmp_path / "blsat", per_host_budget=10**9,
        bloom_shards=4, bloom_bits=1 << 10,
    )
    eng.add_seed_df(synthetic_seed_df(spark, 1500, n_hosts=8))
    eng.run_epoch()
    assert eng.bloom.m_bits_of() > 1 << 10, "epoch commit must have rebuilt"
    assert eng.bloom.fill_ratio() < 0.5
    seen_keys = np.array(
        [r["url_key"] for r in eng.seen.read().select("url_key").collect()],
        dtype=np.int64,
    )
    assert len(seen_keys) > 0 and eng.bloom.contains(seen_keys).all()
    state = eng._read_state()
    assert state["bloom_version"] == eng.bloom.current_version()
    # a fresh batch of unseen URLs mostly passes the prefilter as negatives
    fresh = np.array(
        [r["url_key"] for r in spark.range(50_000, 52_000)
         .select(F.xxhash64("id").alias("url_key")).collect()],
        dtype=np.int64,
    )
    assert eng.bloom.contains(fresh).mean() < 0.05


# ---------- sustained multi-epoch invariants ----------


def test_sustained_epochs_keep_invariants(spark, tmp_path):
    """Three consecutive epochs of FRESH URLs into one workdir: frontier
    keys stay unique across the state-partitioned layout, order-log ranks
    stay dense per (host, epoch), seen grows by exactly the terminal rows,
    and the frontier's done files from epoch N survive epoch N+1 untouched."""
    eng = _engine(spark, tmp_path / "sus", per_host_budget=10**9, fetch_salting=4)
    done_paths_prev: set = set()
    for e in range(3):
        eng.add_seed_df(synthetic_seed_df(spark, 500, n_hosts=8, start_id=e * 500))
        stats = eng.run_epoch()
        assert stats["deduped"] == 0, "fresh URLs must never dedup"
        m = eng.frontier._load_manifest(eng.frontier.current_snapshot_id())["files"]
        done_now = {f["path"] for f in m if f.get("part") == "done"}
        assert done_paths_prev <= done_now
        done_paths_prev = done_now
    fr = eng.frontier.read()
    assert fr.count() == 1500
    assert fr.select("url_key").distinct().count() == 1500
    assert eng.seen.read().count() == eng.seen.read().select("url_key").distinct().count()
    ol = eng.order_log.read().toPandas()
    assert len(ol) == 1500
    for (_h, _e), g in ol.groupby(["host", "epoch"]):
        assert sorted(g["host_seq"]) == list(range(len(g)))


# ---------- streaming boundary probe (VERDICT r4 #8, stretch) ----------


def test_availablenow_processingtime_timeout_boundary(spark, tmp_path):
    """Executable probe of the documented Spark 4.1.2 boundary
    (streaming/pipeline.py stream_sessionize): ProcessingTimeTimeout under
    Trigger.AvailableNow has been seen to hit an internal planner NPE in
    some session states. The probe RUNS the combination: if it raises, the
    failure must carry the documented planner signature (the workaround
    comment stays); if it completes, gap-closed sessions must still be
    correct — either way the boundary is pinned by execution, not prose.
    When a Spark upgrade makes this pass consistently, the docstring's
    caution can be narrowed."""
    import datetime as dt

    from biz_crawlers_spark.streaming.pipeline import (
        EVENTS_DDL,
        read_event_stream,
        stream_sessionize,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = tmp_path / "npe_src"
    src.mkdir()
    rows = [(0, base, 1, "a", 1.0), (1, base + dt.timedelta(minutes=5), 1, "a", 2.0),
            (2, base + dt.timedelta(hours=3), 1, "a", 4.0)]
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("overwrite").parquet(
        str(src)
    )
    try:
        q = (
            stream_sessionize(read_event_stream(spark, str(src)), use_timeout=True)
            .writeStream.format("memory")
            .queryName("r5_npe_probe")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_npe"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    except Exception as e:  # the documented boundary fired
        msg = str(e)
        assert (
            "NullPointerException" in msg or "SparkPlan" in msg or "session" in msg
        ), f"unexpected failure shape for the availableNow+timeout probe: {msg[:400]}"
        return
    got = spark.sql(
        "SELECT * FROM r5_npe_probe ORDER BY session_start"
    ).collect()
    # the 2-event session closed by the 3h gap must be emitted correctly
    closed = [r for r in got if r["n_events"] == 2]
    assert len(closed) == 1 and closed[0]["total_value"] == 3.0


# ---------- payload-key Bloom gate (round-5 follow-up: the last O(table)
# term in the epoch commit — the adopt gate's raw-key scan — replaced by an
# O(batch) Bloom probe whose false positives are provably harmless) ----------


def _force_recrawl(eng):
    """Wipe the seen set and mark done frontier rows pending again — the
    engine then re-fetches the same URLs (identical image_ids/entity_ids)."""
    eng.seen.merge(eng.seen.read().select("url_key"), delete=True, dedupe=False)
    fr = eng.frontier.read().filter(F.col("state") == "done")
    eng.frontier.merge(fr.withColumn("state", F.lit("pending")))


def test_payload_key_gate_bloom_scan_equivalent(spark, tmp_path):
    """The Bloom gate and the exact raw-scan gate produce identical table
    contents through a fresh epoch + a full forced re-crawl."""
    results = {}
    for gate in ("bloom", "scan"):
        eng = _engine(
            spark, tmp_path / f"eq_{gate}", per_host_budget=10**9,
            fetch_salting=2, payload_key_gate=gate,
        )
        eng.add_seed_df(synthetic_seed_df(spark, 300, n_hosts=8))
        eng.run_epoch()
        _force_recrawl(eng)
        st = eng.run_epoch()
        assert st["payload_paths"].get("image") == "adopt"
        m = eng.images._load_manifest(eng.images.current_snapshot_id())
        assert int(m["summary"].get("matched", 0)) > 0, gate
        results[gate] = {
            "images": sorted(
                (r["image_id"], r["epoch"], r["phash"])
                for r in eng.images.read().collect()
            ),
            "records": sorted(
                (r["entity_id"], r["epoch"])
                for r in eng.records.read().collect()
            ),
        }
    assert results["bloom"] == results["scan"]


def test_keybloom_false_positives_harmless(spark, tmp_path):
    """A saturated (tiny) payload-key Bloom marks nearly every NEW key as
    'matched' — the spurious equality-delete keys must be no-ops: reads
    stay exact across epochs of disjoint URLs."""
    eng = _engine(
        spark, tmp_path / "fp", per_host_budget=10**9, fetch_salting=2,
        bloom_bits=1 << 7,           # saturates after the first epoch
        bloom_rebuild_fill=1.01,     # never rebuild: keep the FPR high
    )
    eng.add_seed_df(synthetic_seed_df(spark, 300, n_hosts=8))
    eng.run_epoch()
    n1 = eng.images.read().count()
    kb = eng._payload_keyblooms["image"]
    assert kb.fill_ratio() > 0.5, "test premise: the keybloom must be saturated"
    eng.add_seed_df(synthetic_seed_df(spark, 300, n_hosts=8, start_id=300))
    st = eng.run_epoch()
    assert st["fetched"] > 0
    m = eng.images._load_manifest(eng.images.current_snapshot_id())
    if st["payload_paths"].get("image") == "adopt":
        # disjoint batch, saturated Bloom: matches are (almost) all FPs
        assert int(m["summary"].get("matched", 0)) > 0
    imgs = eng.images.read()
    n2 = imgs.count()
    assert n2 > n1, "second epoch's rows must all survive the spurious deletes"
    assert imgs.select("image_id").distinct().count() == n2


def test_keybloom_legacy_workdir_rebuilds(spark, tmp_path):
    """Opening a pre-keybloom workdir (tables populated, no keys_bloom_*
    dirs) rebuilds the Blooms from the stored raw keys — a forced re-crawl
    then still detects its matches and reads stay duplicate-free."""
    import shutil

    wd = tmp_path / "legacy"
    eng = _engine(spark, wd, per_host_budget=10**9, fetch_salting=2)
    eng.add_seed_df(synthetic_seed_df(spark, 300, n_hosts=8))
    eng.run_epoch()
    n1 = eng.images.read().count()
    for part in ("image", "record"):
        shutil.rmtree(os.path.join(str(wd), f"keys_bloom_{part}"))
    eng2 = _engine(spark, wd, per_host_budget=10**9, fetch_salting=2)
    assert eng2._payload_keyblooms["image"].fill_ratio() > 0, "rebuilt from table"
    _force_recrawl(eng2)
    st = eng2.run_epoch()
    assert st["payload_paths"].get("image") == "adopt"
    m = eng2.images._load_manifest(eng2.images.current_snapshot_id())
    assert int(m["summary"].get("matched", 0)) > 0, (
        "a missed match here would mean a false negative -> duplicate rows"
    )
    imgs = eng2.images.read()
    assert imgs.count() == n1
    assert imgs.select("image_id").distinct().count() == n1


def test_keybloom_saturation_rebuild_engine_wired(spark, tmp_path):
    """Past the fill threshold the payload-key Bloom re-sizes itself from
    the table's durable keys at the epoch commit (same contract as the
    seen-set Bloom), and match detection stays exact afterwards."""
    eng = _engine(
        spark, tmp_path / "sat", per_host_budget=10**9, fetch_salting=2,
        bloom_bits=1 << 9,
    )
    eng.add_seed_df(synthetic_seed_df(spark, 300, n_hosts=8))
    eng.run_epoch()
    kb = eng._payload_keyblooms["image"]
    v = kb.current_version()
    assert kb.m_bits_of(v) > (1 << 9), "rebuild must have grown the bit space"
    assert kb.fill_ratio() <= 0.5
    n1 = eng.images.read().count()
    _force_recrawl(eng)
    st = eng.run_epoch()
    assert st["payload_paths"].get("image") == "adopt"
    imgs = eng.images.read()
    assert imgs.count() == n1
    assert imgs.select("image_id").distinct().count() == n1


# ---------- adopt+patch (round-5 follow-up: a handful of in-batch
# duplicate keys must not force a full-batch MoR byte rewrite — Campaign B3
# measured the image-MoR epochs at 2-3x the adopt commit wall) ----------

# Synthetic-grammar ids whose URLs are distinct but share entity_id
# 67474880 (found by deterministic driver-side search over the same
# grammar; verified in-test) — the smallest reproducible in-batch
# duplicate-key batch.
_COLLIDING_IDS = (14519, 30421)


def _collision_seed(spark):
    df = synthetic_seed_df(spark, 200, n_hosts=8)
    for i in _COLLIDING_IDS:
        df = df.unionByName(synthetic_seed_df(spark, 1, n_hosts=8, start_id=i))
    return df


def test_adopt_patch_table_contract(spark, tmp_path):
    """adopt_files with in-batch duplicate keys + the follow-up MoR patch
    commit reads key-distinct with the patch row winning; rolling back to
    the pre-adopt snapshot restores the original table exactly."""
    t = SnapTable.create(
        spark, str(tmp_path / "ap"), "k long, v int", ["k"], n_buckets=2
    )
    t.overwrite(spark.createDataFrame([(1, 0)], "k long, v int"))
    sid0 = t.current_snapshot_id()
    stage = str(tmp_path / "ap_stage")
    spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (3, 30)], "k long, v int"
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    files = [
        os.path.join(stage, f) for f in os.listdir(stage) if f.endswith(".parquet")
    ]
    # key 1 matches the stored table (cross-epoch delete entry); key 2 is
    # the in-batch duplicate the patch supersedes
    t.adopt_files(
        files, summary={"patched": 1},
        delete_keys_df=spark.createDataFrame([(1,)], "k long"),
    )
    t.merge(
        spark.createDataFrame([(2, 21)], "k long, v int"),
        dedupe=False, mor=True, insert_direct=True,
    )
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: 10, 2: 21, 3: 30}
    assert t.read().count() == 3
    t.rollback(sid0)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: 0}


def test_adopt_patch_engine_equivalence(spark, tmp_path):
    """payload_patch=True (adopt + O(dup) patch commit) and =False (full
    MoR fallback) produce identical record tables on a batch with one
    in-batch duplicate entity_id."""
    from biz_crawlers_spark.fixtures.web import FixtureWeb

    web = FixtureWeb(seed=42, n_hosts=8, max_images_per_page=1)
    urls = [
        synthetic_seed_df(spark, 1, n_hosts=8, start_id=i).first()["canonical_url"]
        for i in _COLLIDING_IDS
    ]
    assert urls[0] != urls[1]
    assert web.entity_for(urls[0])[0] == web.entity_for(urls[1])[0]
    assert all(web.classify(u) == "ok" for u in urls)

    results = {}
    for patch in (True, False):
        eng = _engine(
            spark, tmp_path / f"ap_{patch}", per_host_budget=10**9,
            fetch_salting=2, payload_patch=patch,
        )
        eng.add_seed_df(_collision_seed(spark))
        st = eng.run_epoch()
        assert st["payload_paths"]["record"] == (
            "adopt_patch" if patch else "mor"
        )
        recs = eng.records.read()
        n = recs.count()
        assert recs.select("entity_id").distinct().count() == n
        if patch:
            # the adopt commit precedes the patch commit; its summary
            # counts the duplicated keys
            m = eng.records._load_manifest(eng.records.current_snapshot_id() - 1)
            assert int(m["summary"].get("patched", 0)) >= 1
        results[patch] = sorted(
            (r["entity_id"], r["epoch"]) for r in recs.collect()
        )
    assert results[True] == results[False]


def test_adopt_patch_with_recrawl_matches(spark, tmp_path):
    """A forced full re-crawl of a duplicate-bearing batch exercises the
    patch path and the cross-epoch matched-delete entry in ONE commit:
    reads stay key-distinct, every key's winner is the re-crawled row."""
    eng = _engine(
        spark, tmp_path / "apm", per_host_budget=10**9, fetch_salting=2
    )
    eng.add_seed_df(_collision_seed(spark))
    st0 = eng.run_epoch()
    assert st0["payload_paths"]["record"] == "adopt_patch"
    n1 = eng.records.read().count()
    _force_recrawl(eng)
    st = eng.run_epoch()
    assert st["payload_paths"]["record"] == "adopt_patch"
    recs = eng.records.read()
    assert recs.count() == n1
    assert recs.select("entity_id").distinct().count() == n1
    e_max = recs.agg(F.max("epoch")).first()[0]
    assert recs.filter(F.col("epoch") == e_max).count() == n1


def test_check_add_spark_equivalent(spark, tmp_path):
    """check_add_spark == prefilter_spark (membership before insert) +
    add_spark (final bit state, fills, version) in ONE pass."""
    a = BloomShards.create(str(tmp_path / "ba"), n_shards=4, m_bits=1 << 14, k=5)
    b = BloomShards.create(str(tmp_path / "bb"), n_shards=4, m_bits=1 << 14, k=5)
    base = spark.createDataFrame([(k,) for k in range(100, 200)], "url_key long")
    a.add_spark(base)
    b.add_spark(base)
    probe = spark.createDataFrame([(k,) for k in range(150, 250)], "url_key long")
    exp = {r["url_key"]: r["maybe_seen"] for r in a.prefilter_spark(probe).collect()}
    a.add_spark(probe)
    gate = b.check_add_spark(probe)
    got = {r["url_key"]: r["maybe_seen"] for r in gate.collect()}
    gate.unpersist()
    assert got == exp
    assert a.current_version() == b.current_version()
    all_keys = np.arange(100, 250)
    assert bool(a.contains(all_keys).all()) and bool(b.contains(all_keys).all())
    assert abs(a.fill_ratio() - b.fill_ratio()) < 1e-12
