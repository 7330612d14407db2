"""Checkpoint-repair job (D6) — the reason the engine carries a *deletable*
seen-set variant.

The reference's repair: when a crawl yields zero IDs, scan tracking entries
for the target month whose .txt payload is missing, drop them from the seen
set, and retry once (GCISCrawler.php:82-90, :534-603). Distributed analog:

    inconsistent = seen ⟕anti images.url_key ⟕anti records.url_key
                   restricted to url_keys whose terminal status was 'ok'
                   (an ok fetch that committed no payload = lost payload)

Those keys are (1) deleted from the seen table, (2) deleted from a cuckoo
filter mirror (a Bloom filter cannot delete — Fan et al. CoNEXT'14), and
(3) their frontier rows are re-opened (state='pending'), so the next epoch
re-fetches them. Bounded single retry = the reference's `_retry` guard.

The cuckoo mirror is maintained lazily: built from the seen table when the
repair job first runs, then kept in sync by repair deletions and epoch adds.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from biz_crawlers_spark.filters.cuckoo import CuckooFilter


def repair_lost_payloads(engine) -> dict:
    """Run one repair pass against a CrawlEngine. Returns counters."""
    seen = engine.seen.read()
    images = engine.images.read().select("url_key").distinct()
    records = engine.records.read().select("url_key").distinct()
    ok_keys = (
        engine.order_log.read()
        .filter(F.col("status") == "ok")
        .select("url_key")
        .distinct()
    )
    lost = (
        seen.join(ok_keys, "url_key", "left_semi")
        .join(images, "url_key", "left_anti")
        .join(records, "url_key", "left_anti")
        .select("url_key")
    )
    lost_keys = [r["url_key"] for r in lost.collect()]
    if not lost_keys:
        return {"lost": 0, "unseen": 0, "reopened": 0}

    # (1) exact seen-table delete
    engine.seen.merge(lost, delete=True, summary={"op": "repair", "n": len(lost_keys)})

    # (2) cuckoo mirror delete (the Bloom filter keeps its false positives —
    # harmless: the exact anti-join after the Bloom prefilter still admits
    # the re-opened keys, because the seen TABLE no longer contains them)
    cf = cuckoo_mirror(engine)
    removed = cf.delete(np.array(lost_keys, dtype=np.int64))
    cf.save(_cuckoo_path(engine))

    # (3) reopen frontier rows for a bounded retry
    reopened = (
        engine.frontier.read()
        .join(lost, "url_key", "left_semi")
        .withColumn("state", F.lit("pending"))
        .withColumn("not_before", F.lit(engine.current_epoch()))
    )
    n_reopened = reopened.count()
    engine.frontier.merge(reopened, summary={"op": "repair_reopen"})
    return {"lost": len(lost_keys), "unseen": removed, "reopened": n_reopened}


def _cuckoo_path(engine) -> str:
    return os.path.join(engine.workdir, "seen_cuckoo.npy")


def cuckoo_mirror(engine, n_buckets: int = 1 << 16) -> CuckooFilter:
    """Load (or build from the seen table) the deletable seen-set mirror."""
    p = _cuckoo_path(engine)
    if os.path.exists(p):
        return CuckooFilter.load(p)
    cf = CuckooFilter(n_buckets=n_buckets)
    keys = np.array(
        [r["url_key"] for r in engine.seen.read().select("url_key").collect()],
        dtype=np.int64,
    )
    if len(keys):
        cf.add(keys)
    cf.save(p)
    return cf
