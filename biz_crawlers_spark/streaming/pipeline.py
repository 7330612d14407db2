"""Structured Streaming surface.

The reference's only stream is a cooperative generator yielding 10k-row CSV
batches (TaxCrawler.php:149-161); its distributed analog is a real
Structured Streaming pipeline. Three shapes:

- ``stream_events_tumbling``: file-source readStream → event-time watermark
  → tumbling-window aggregation (the streaming twin of
  queries.events_tumbling_window — same logical plan, incremental exec).
- ``stream_sessionize``: custom stateful operator via
  ``applyInPandasWithState`` — gap-based sessionization per user (the
  canonical "operator Spark lacks" example; GroupState timeout closes idle
  sessions).
- ``stream_ingest_foreachBatch``: micro-batch MERGE into a SnapTable —
  exactly the engine's epoch commit discipline driven by a stream (the
  generator-consumer loop of crawl-tax.php:80-103 re-expressed).

All run with ``Trigger.AvailableNow`` in tests (bounded drain, same code
path as continuous operation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"

SESSION_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
SESSION_STATE_DDL = "start long, end long, n int, total double"

SESSION_GAP_S = 30 * 60


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_DDL).parquet(src_dir)


def stream_events_tumbling(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window counts with late-data handling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, use_timeout: bool = False
) -> Iterator[pd.DataFrame]:
    """Gap-based session assembly for one user. State = the open session;
    emits a session row whenever a gap > SESSION_GAP_S closes it, and (when
    ``use_timeout``) on state timeout (idle user)."""
    (user_id,) = key
    if use_timeout and state.hasTimedOut:
        if state.exists:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id,
                  "session_start": pd.Timestamp(start, unit="s"),
                  "session_end": pd.Timestamp(end, unit="s"),
                  "n_events": n, "total_value": total}]
            )
        return
    ts_all, val_all = [], []
    for pdf in pdfs:
        ts_all.extend(pdf["ts"].astype("int64") // 10**9)
        val_all.extend(pdf["value"])
    order = sorted(range(len(ts_all)), key=lambda i: ts_all[i])
    out = []
    if state.exists:
        start, end, n, total = state.get
    else:
        start = end = None
        n, total = 0, 0.0
    for i in order:
        t, v = int(ts_all[i]), float(val_all[i])
        if start is None:
            start = end = t
            n, total = 1, v
        elif t - end <= SESSION_GAP_S:
            end = max(end, t)
            n += 1
            total += v
        else:
            out.append((start, end, n, total))
            start = end = t
            n, total = 1, v
    state.update((start, end, n, total))
    if use_timeout:
        state.setTimeoutDuration(SESSION_GAP_S * 1000)
    if out:
        yield pd.DataFrame(
            [{"user_id": user_id,
              "session_start": pd.Timestamp(s, unit="s"),
              "session_end": pd.Timestamp(e, unit="s"),
              "n_events": c, "total_value": round(t_, 2)} for s, e, c, t_ in out]
        )


def stream_sessionize(events: DataFrame, use_timeout: bool = False) -> DataFrame:
    """Custom stateful operator: per-user gap sessionization.

    ``use_timeout=False`` (default): NoTimeout — only gap-closed sessions are
    emitted; open sessions stay in state (right shape for AvailableNow
    drains). ``use_timeout=True`` additionally flushes idle sessions via
    ProcessingTimeTimeout — NOTE: on Spark 4.1.2 that mode can hit an
    internal planner NPE (SparkPlan.session() null) under availableNow in a
    fresh session; continuous triggers are unaffected."""

    def fn(key, pdfs, state):
        yield from _sessionize_fn(key, pdfs, state, use_timeout=use_timeout)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_DDL,
            stateStructType=SESSION_STATE_DDL,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def stream_ingest_foreachBatch(events: DataFrame, table, checkpoint: str):
    """Micro-batch MERGE into a SnapTable — each batch is one atomic
    snapshot commit (the engine's epoch discipline on a stream)."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = batch_df.select(
            F.col("event_id").cast("long").alias("event_id"), "ts", "user_id",
            "event_type", "value",
        )
        table.merge(rows, summary={"stream_batch": batch_id})

    return (
        events.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_crawl_streaming(engine, trigger_seconds: float = 0.1, max_epochs: int = 100):
    """The crawl loop as a literal Structured Streaming query (the
    north_rule's "each crawl epoch is a Structured-Streaming-style
    micro-batch", made non-figurative): a rate source ticks micro-batches
    and ``foreachBatch`` runs one frontier epoch per tick — identical
    commits, identical snapshots, identical crawl-order evidence as the
    driver loop (engine.run), because foreachBatch IS the epoch scheduler
    here. The query self-stops when the frontier drains.

    Why both exist: the bounded driver loop gives the bench deterministic
    timing; this wrapper is the deployment shape for a continuous crawl
    (trigger cadence = re-poll interval once the frontier is empty).
    Returns the per-epoch stats list, like engine.run().
    """
    stats: list[dict] = []
    done = {"flag": False}

    def one_epoch(_batch_df, _batch_id: int) -> None:
        if done["flag"]:
            return
        s = engine.run_epoch()
        stats.append(s)
        if s["drained"] or len(stats) >= max_epochs:
            done["flag"] = True

    q = (
        engine.spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.foreachBatch(one_epoch)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .option(
            "checkpointLocation",
            f"{engine.workdir}/_stream_checkpoint",
        )
        .start()
    )
    try:
        import time as _time

        while not done["flag"]:
            if q.exception() is not None:
                raise q.exception()
            _time.sleep(0.05)
    finally:
        q.stop()
    return stats
