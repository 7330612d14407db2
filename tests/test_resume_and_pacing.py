"""Resumability across engine instances (SURVEY.md §5.2.5) + real wall-clock
politeness pacing + export sinks."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from biz_crawlers_spark.engine.crawl import CrawlEngine
from biz_crawlers_spark.fixtures.web import company_seed, school_seed
from biz_crawlers_spark.politeness.budget import PolitenessBudget

WEB = {"seed": 42, "n_hosts": 4}


def _engine(spark, wd, budget=None, **kw):
    return CrawlEngine(
        spark, wd, web_params=WEB, budget=budget or PolitenessBudget(time_scale=0),
        per_host_budget=kw.pop("per_host_budget", 12), bloom_shards=4,
        bloom_bits=1 << 16, table_buckets=4, fetch_partitions=4, **kw,
    )


def _tables_snapshot(eng):
    images = sorted(r["image_id"] for r in eng.images.read().collect())
    seen = sorted(r["url_key"] for r in eng.seen.read().collect())
    order = sorted(
        (r["host"], r["epoch"], r["host_seq"], r["url_key"])
        for r in eng.order_log.read().collect()
    )
    return images, seen, order


def test_restart_between_epochs_equals_uninterrupted(spark, tmp_path):
    """Kill-and-restart: run k epochs, abandon the engine OBJECT, open a new
    engine on the same workdir (state only from disk), finish. Result tables
    must equal an uninterrupted run — the snapshot commits ARE the
    checkpoint (K8 analog)."""
    seeds = company_seed(114, 3) + school_seed(base_priority=1000)

    a = _engine(spark, str(tmp_path / "uninterrupted"))
    a.seed_from_urls(seeds)
    stats_a = a.run(max_epochs=30)
    assert stats_a[-1]["drained"]

    b1 = _engine(spark, str(tmp_path / "resumed"))
    b1.seed_from_urls(seeds)
    for _ in range(3):
        b1.run_epoch()
    del b1  # crash: the object is gone; only disk state remains
    b2 = _engine(spark, str(tmp_path / "resumed"))
    assert b2.current_epoch() == 3  # epoch pointer persisted
    b2.resume()  # no-op here (no in_flight rows), must be safe
    stats_b = b2.run(max_epochs=30)
    assert stats_b[-1]["drained"]

    assert _tables_snapshot(_engine(spark, str(tmp_path / "uninterrupted"))) == \
        _tables_snapshot(_engine(spark, str(tmp_path / "resumed")))


def test_real_pacing_enforced(spark, tmp_path):
    """time_scale > 0 actually waits: 6 URLs on one host with a scaled
    budget must take at least ~6 × scaled per-request time of wall clock."""
    scale = 0.05  # 4 s budget → 0.2 s wall per request
    budget = PolitenessBudget(time_scale=scale)
    eng = _engine(spark, str(tmp_path / "p"), budget=budget, per_host_budget=1000)
    seeds = [s for s in company_seed(114, 3) if s.host == "h0.fixture.test"][:6]
    assert len(seeds) == 6
    eng.seed_from_urls(seeds)
    t0 = time.time()
    stats = eng.run_epoch()
    wall = time.time() - t0
    min_wall = 6 * budget.per_request_s * scale
    assert stats["fetched"] >= 5
    assert wall >= min_wall, f"politeness not enforced: {wall:.2f}s < {min_wall:.2f}s"


def test_export_sinks(spark, tmp_path):
    from biz_crawlers_spark.sinks import export_csv, read_id_list, write_id_list

    df = spark.createDataFrame([(f"{i:08d}",) for i in (3, 1, 2)], "id string")
    dest = str(tmp_path / "ids")
    assert write_id_list(df, "id", dest)
    back = read_id_list(spark, dest).collect()
    assert sorted(r["id"] for r in back) == ["00000001", "00000002", "00000003"]
    # BaseCrawler semantics: empty input → no write
    empty = spark.createDataFrame([], "id string")
    assert not write_id_list(empty, "id", str(tmp_path / "none"))
    # GCIS semantics: always write
    assert write_id_list(empty, "id", str(tmp_path / "always"), write_if_empty=True)
    csv_dest = export_csv(df, str(tmp_path / "csv"))
    got = spark.read.option("header", True).csv(csv_dest).collect()
    assert len(got) == 3


def test_entity_json_compat_writer(spark, tmp_path):
    """K1 (DetailCrawler.php:888-949): one JSON doc per entity, first-digit
    dirs, UTF-8 unescaped; docs byte-equal to the simulator-derived golden
    docs built from the same record surface."""
    import json
    import os

    from biz_crawlers_spark.fixtures.web import FixtureWeb, business_seed
    from biz_crawlers_spark.politeness.budget import PolitenessBudget
    from biz_crawlers_spark.simulator.reference_sim import ReferenceSimulator
    from biz_crawlers_spark.sinks import entity_doc, write_entity_json

    seeds = company_seed(114, 3) + business_seed(114, 3, base_priority=100)
    eng = _engine(spark, str(tmp_path / "k1"), per_host_budget=10_000)
    eng.seed_from_urls(seeds)
    eng.run(max_epochs=10)
    dest = str(tmp_path / "docs")
    n = write_entity_json(eng.records.read(), dest)
    assert n == eng.records.read().count() and n > 20

    sim = ReferenceSimulator(FixtureWeb(**WEB), PolitenessBudget(time_scale=0)).run(seeds)
    assert len(sim.records) == n
    for eid, sr in sim.records.items():
        path = os.path.join(dest, eid[0], f"{eid}.json")
        assert os.path.exists(path), f"missing doc {path}"
        golden = json.dumps(entity_doc({"entity_id": eid, **sr, "category": None,
                                        "parse_mode": sr["parse_mode"]}),
                            ensure_ascii=False, indent=4)
        written = open(path, encoding="utf-8").read()
        wd = json.loads(written)
        gd = json.loads(golden)
        gd.pop("category", None); wd.pop("category", None)
        assert wd == gd, f"{eid}: doc mismatch"
        assert "\\u" not in written.split('"id"')[0]  # UNESCAPED_UNICODE


def test_partial_epoch_commit_rolls_back_on_resume(spark, tmp_path):
    """Epoch-group atomicity: a crash BETWEEN two table commits leaves some
    tables ahead of the state record; resume() must roll them back so the
    interrupted epoch re-runs in full and the final tables equal an
    uninterrupted run (no seen keys without order/lineage evidence)."""
    seeds = company_seed(114, 3)
    eng = _engine(spark, str(tmp_path / "atomic"), per_host_budget=10_000)
    eng.seed_from_urls(seeds)
    eng.run(max_epochs=10)
    golden = _tables_snapshot(eng)
    state_epoch = eng.current_epoch()

    # simulate a crash mid-commit-group: seen + images advanced, the state
    # record (and the other tables) did not
    from pyspark.sql import functions as F2

    eng.seen.append(
        spark.createDataFrame([(12345, 99)], "url_key long, seen_epoch int")
    )
    eng.images.merge(
        eng.images.read().limit(1).withColumn("caption", F2.lit("torn-write")),
    )
    assert {r["url_key"] for r in eng.seen.read().collect()} != set(golden[1])

    fresh = _engine(spark, str(tmp_path / "atomic"), per_host_budget=10_000)
    n_actions = fresh.resume()
    assert n_actions >= 2  # both tables rolled back
    assert fresh.current_epoch() == state_epoch
    assert _tables_snapshot(fresh) == golden
    assert not fresh.images.read().filter(F2.col("caption") == "torn-write").count()


def test_report_to_detail_pipeline_handoff(spark, tmp_path):
    """The reference's primary workflow chained end-to-end (§3.1 → §3.2):
    a gcis report crawl produces entity IDs; the ID-list text file is the
    hand-off artifact (K3, BaseCrawler.php:267-291); a detail crawl consumes
    it (crawl-details.php:163 --file), sorted + sliced, and two-hops
    search → latest detail for each."""
    from pyspark.sql import functions as F

    from biz_crawlers_spark.sinks import read_id_list, write_id_list

    # stage 1: report crawl
    a = _engine(spark, str(tmp_path / "stage1"), per_host_budget=10_000)
    a.seed_from_urls(company_seed(114, 3))
    a.run(max_epochs=10)
    ids = a.records.read().select(F.col("entity_id").alias("id"))
    n_ids = ids.count()
    assert n_ids > 20
    dest = str(tmp_path / "ids")
    assert write_id_list(ids, "id", dest)

    # stage 2: detail crawl seeded from the hand-off file (CLI path)
    import sys

    sys.path.insert(0, "tools")
    import crawl_cli

    back = read_id_list(spark, dest)
    assert back.count() == n_ids
    idfile = str(tmp_path / "ids.txt")
    with open(idfile, "w") as f:
        for r in back.orderBy("id").collect():
            f.write(r["id"] + "\n")
    s = crawl_cli.main(["detail", "--file", idfile, "--limit", "10",
                        "--workdir", str(tmp_path / "stage2"), "--cpus", "4"])
    assert s["fetched"] >= 10  # 10 searches + their two-hop details
    b = type(a)(spark, str(tmp_path / "stage2"),
                web_params={"seed": 42, "n_hosts": 4})
    # detail records exist for the searched ids that resolved
    assert b.records.read().count() > 0
