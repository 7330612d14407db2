"""Vectorized per-host wait scheduling (P1/P2/P3, SURVEY.md §2.4).

The reference sleeps per request inside sequential loops
(BaseCrawler.php:88-90, DetailCrawler.php:93-103). Inside a vectorized fetch
worker the schedule for a host's requests is computed in closed form for the
whole batch — the recurrence s_i = max(not_before_i, s_{i-1} + interval)
rewrites to a cumulative max (no per-row Python):

    s_i = I·i + cummax_j≤i ( max(not_before_j, t0) − I·j )

Only the gaps are slept (scaled by the budget's time_scale), so ordering —
which is what crawl-order parity checks — is identical whether or not real
waiting happens.
"""

from __future__ import annotations

import numpy as np


def host_schedule(t0: float, not_before: np.ndarray, interval: float) -> np.ndarray:
    """Scheduled dispatch times for one host's requests in frontier order."""
    nb = np.maximum(np.asarray(not_before, dtype=np.float64), t0)
    if interval <= 0:
        return np.maximum.accumulate(nb)
    idx = np.arange(len(nb), dtype=np.float64)
    return interval * idx + np.maximum.accumulate(nb - interval * idx)
