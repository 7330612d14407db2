"""S11 — dataset-catalog JSON walk (crawl-others.php:89-126)."""

from __future__ import annotations

import json

from biz_crawlers_spark.sources.catalog import catalog_seeds, pick_csv_distribution


def _catalog(*dists) -> bytes:
    return json.dumps({"result": {"distribution": list(dists)}}).encode("utf-8")


def test_pick_first_csv_distribution():
    doc = _catalog(
        {"resourceFormat": "JSON", "resourceDownloadUrl": "https://d.test/a.json"},
        {"resourceFormat": "CSV", "resourceDownloadUrl": "https://d.test/b.csv"},
        {"resourceFormat": "CSV", "resourceDownloadUrl": "https://d.test/c.csv"},
    )
    assert pick_csv_distribution(doc) == "https://d.test/b.csv"  # FIRST csv


def test_pick_csv_by_url_suffix_and_alt_keys():
    doc = _catalog({"format": "", "downloadURL": "https://d.test/x.CSV?v=1"})
    assert pick_csv_distribution(doc) == "https://d.test/x.CSV?v=1"


def test_no_csv_or_malformed():
    assert pick_csv_distribution(_catalog({"resourceFormat": "XML",
                                           "resourceDownloadUrl": "https://d.test/a.xml"})) is None
    assert pick_csv_distribution(b"{not json") is None
    assert pick_csv_distribution(json.dumps({"result": {}}).encode()) is None


def test_catalog_seeds_order_and_skip():
    cats = [
        ("ds1", _catalog({"resourceFormat": "CSV",
                          "resourceDownloadUrl": "https://h0.test/one.csv"})),
        ("ds2", _catalog({"resourceFormat": "PDF",
                          "resourceDownloadUrl": "https://h0.test/two.pdf"})),
        ("ds3", _catalog({"resourceFormat": "CSV",
                          "resourceDownloadUrl": "https://h1.test/three.csv"})),
    ]
    seeds = catalog_seeds(cats, base_priority=50)
    assert [s.url for s in seeds] == ["https://h0.test/one.csv", "https://h1.test/three.csv"]
    assert [s.priority for s in seeds] == [50, 52]  # catalog order preserved
    assert seeds[1].host == "h1.test"


def test_r12_load_existing_read_through(spark):
    from biz_crawlers_spark.sinks import load_existing

    records = spark.createDataFrame(
        [("00000001", "a"), ("00000002", "b")], "entity_id string, entity_name string"
    )
    wanted = spark.createDataFrame(
        [("00000002",), ("00000003",), ("00000003",)], "entity_id string"
    )
    hits, missing = load_existing(records, wanted)
    assert [r["entity_id"] for r in hits.collect()] == ["00000002"]
    assert [r["entity_id"] for r in missing.collect()] == ["00000003"]


def test_crawl_cli_gcis_and_detail(spark, tmp_path, capsys):
    """CLI parity surface (crawl.php dispatch, crawl-details.php ID slicing):
    gcis company crawl drains; detail with --ids sorts, offsets, validates."""
    import sys

    sys.path.insert(0, "tools")
    import crawl_cli

    s = crawl_cli.main(["gcis", "--company", "--year", "114", "--month", "3",
                        "--workdir", str(tmp_path / "cli"), "--cpus", "4"])
    assert s["drained"] and s["ok"] > 20 and s["images"] > 20

    ids = "00000123,99999999,00000042"
    s2 = crawl_cli.main(["detail", "--ids", ids, "--offset", "1", "--limit", "2",
                         "--workdir", str(tmp_path / "cli2"), "--cpus", "4"])
    assert s2["fetched"] >= 2  # 2 search fetches (+ two-hop details)

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        crawl_cli.main(["detail", "--ids", "not-a-number",
                        "--workdir", str(tmp_path / "cli3")])


def test_pyfiles_zip_is_self_contained(tmp_path):
    """north_rule packaging: the --py-files archive alone (repo dir NOT
    importable) must run a full crawl epoch — executors included (zipimport
    on worker side). Guards against modules missing from the archive."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable, os.path.join(root, "tools", "make_pyfiles.py")],
                   check=True, capture_output=True)
    zip_path = os.path.join(root, "dist", "biz_crawlers_spark.zip")
    prog = (
        "import sys, tempfile\n"
        "assert all(p != %r for p in sys.path)\n"
        "import biz_crawlers_spark\n"
        "assert 'biz_crawlers_spark.zip' in biz_crawlers_spark.__file__\n"
        "from biz_crawlers_spark.session import get_spark\n"
        "from biz_crawlers_spark.engine.crawl import CrawlEngine\n"
        "from biz_crawlers_spark.fixtures.web import company_seed\n"
        "from biz_crawlers_spark.politeness.budget import PolitenessBudget\n"
        "spark = get_spark(cores=2, shuffle_partitions=2, app='zipsmoke')\n"
        "eng = CrawlEngine(spark, tempfile.mkdtemp(), web_params={'seed':42,'n_hosts':4},\n"
        "    budget=PolitenessBudget(time_scale=0), per_host_budget=10_000,\n"
        "    bloom_shards=2, bloom_bits=1<<16, table_buckets=2, fetch_partitions=2)\n"
        "eng.seed_from_urls(company_seed(114, 3))\n"
        "stats = eng.run(max_epochs=5)\n"
        "assert stats[-1]['drained'] and sum(s['ok'] for s in stats) > 20\n"
        "print('ZIP_OK')\n"
    ) % root
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = zip_path
    out = subprocess.run([sys.executable, "-c", prog], cwd=str(tmp_path),
                         env=env, capture_output=True, text=True, timeout=400)
    assert "ZIP_OK" in out.stdout, out.stderr[-2000:]
