"""Structured Streaming: file-source windowed agg equals the batch query;
applyInPandasWithState sessionization; foreachBatch snapshot ingest."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from biz_crawlers_spark.streaming.pipeline import (
    EVENTS_DDL,
    read_event_stream,
    stream_events_tumbling,
    stream_ingest_foreachBatch,
    stream_sessionize,
)


def _mk_events(spark, tmp_path, n_files: int = 3, per_file: int = 40):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = tmp_path / "events_src"
    src.mkdir()
    all_rows = []
    eid = 0
    for f in range(n_files):
        rows = []
        for i in range(per_file):
            ts = base + dt.timedelta(minutes=7 * (eid % 50) + f * 3, hours=eid % 5)
            rows.append((eid, ts, eid % 7, f"t{eid % 3}", float(eid % 11)))
            eid += 1
        spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        all_rows.extend(rows)
    return str(src), all_rows


def test_stream_tumbling_equals_batch(spark, tmp_path):
    src, rows = _mk_events(spark, tmp_path)
    stream = stream_events_tumbling(read_event_stream(spark, src))
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = spark.createDataFrame(rows, EVENTS_DDL)
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    # append-mode emits only watermark-closed windows; with availableNow all
    # but the max-event-time windows close. Every emitted window must match
    # the batch result, and most windows must have been emitted.
    assert got, "stream produced no windows"
    for k, v in got.items():
        assert expect[k] == v
    # windows within (watermark + one window length) = 2 h of max event time
    # stay open: up to 2 windows × 3 event types withheld
    assert len(got) >= len(expect) - 6


def test_sessionize_stateful(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = tmp_path / "sess_src"
    src.mkdir()
    rows = []
    # user 1: two sessions separated by a 2 h gap; user 2: one session
    for m in (0, 5, 10):
        rows.append((m, base + dt.timedelta(minutes=m), 1, "a", 1.0))
    for m in (180, 185):
        rows.append((100 + m, base + dt.timedelta(minutes=m), 1, "a", 2.0))
    for m in (0, 3):
        rows.append((200 + m, base + dt.timedelta(minutes=m), 2, "b", 5.0))
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("overwrite").parquet(str(src))
    q = (
        stream_sessionize(read_event_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out ORDER BY user_id, session_start").collect()
    # closed-by-gap session for user 1 must be emitted (the open sessions
    # stay in state until timeout — availableNow ends before that)
    u1 = [r for r in got if r["user_id"] == 1]
    assert len(u1) == 1
    assert u1[0]["n_events"] == 3 and u1[0]["total_value"] == 3.0
    assert u1[0]["session_start"] == base and u1[0]["session_end"] == base + dt.timedelta(
        minutes=10
    )


def test_foreachBatch_snapshot_ingest(spark, tmp_path):
    from biz_crawlers_spark.tables.snaptable import SnapTable

    src, rows = _mk_events(spark, tmp_path)
    tbl = SnapTable.create(spark, str(tmp_path / "t"), EVENTS_DDL, ["event_id"], n_buckets=4)
    q = stream_ingest_foreachBatch(
        read_event_stream(spark, src), tbl, str(tmp_path / "ck3")
    )
    q.awaitTermination(120)
    assert tbl.read().count() == len(rows)
    assert len(tbl.snapshots()) >= 1  # each micro-batch an atomic commit

def test_streaming_crawl_driver_equals_batch_loop(spark, tmp_path):
    """run_crawl_streaming (rate source + foreachBatch epochs) must produce
    byte-equal tables to the bounded driver loop on the same seeds."""
    from biz_crawlers_spark.engine.crawl import CrawlEngine
    from biz_crawlers_spark.fixtures.web import company_seed, school_seed
    from biz_crawlers_spark.politeness.budget import PolitenessBudget
    from biz_crawlers_spark.streaming.pipeline import run_crawl_streaming

    def _engine(wd):
        return CrawlEngine(
            spark, str(wd), web_params={"seed": 42, "n_hosts": 4},
            budget=PolitenessBudget(time_scale=0), per_host_budget=10_000,
            bloom_shards=4, bloom_bits=1 << 16, table_buckets=4,
            fetch_partitions=4,
        )

    seeds = company_seed(114, 3) + school_seed(base_priority=1000)

    a = _engine(tmp_path / "batch")
    a.seed_from_urls(seeds)
    a.run(max_epochs=30)

    b = _engine(tmp_path / "stream")
    b.seed_from_urls(seeds)
    stats = run_crawl_streaming(b, max_epochs=30)
    assert stats[-1]["drained"]

    def snap(eng):
        seen = sorted(r["url_key"] for r in eng.seen.read().collect())
        imgs = sorted(r["image_id"] for r in eng.images.read().collect())
        order = sorted(
            (r["host"], r["epoch"], r["host_seq"], r["url_key"])
            for r in eng.order_log.read().collect()
        )
        return seen, imgs, order

    assert snap(a) == snap(b)
