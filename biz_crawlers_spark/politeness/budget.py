"""Politeness budget — the reference's hardcoded delay constants made data.

Defaults mirror the reference:
- min_interval_s = 2.0  (global 2 s rate limiter, DetailCrawler.php:19,25,93-103)
- extra_delay_s  = 2.0  (mandatory post-search delay, DetailCrawler.php:29,159)
- max_retries    = 3, backoff 2^n (BaseCrawler.php:29,105)
- safe mode: min_interval 0.5, extra 5.0, retry_delay 10, retries 3
  (crawl.php:72-79, crawl-details.php:84-91)

``time_scale`` maps budget seconds to wall seconds inside the fetch workers:
1.0 = real sleeping (live crawling), 0.0 = virtual time (tests/bench — the
schedule and therefore the crawl ORDER are identical; only the waiting is
skipped). Ordering parity with the reference depends on the schedule, not on
actually sleeping.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PolitenessBudget:
    min_interval_s: float = 2.0
    extra_delay_s: float = 2.0
    max_retries: int = 3
    backoff: str = "exp"  # "exp": 2^attempt (BaseCrawler.php:105); "linear": base+n (DetailCrawler.php:218-227)
    retry_delay_s: float = 3.0
    time_scale: float = 0.0
    # S3 session model (DetailCrawler.php:34-91): a fresh session costs a
    # 2-request warmup (GET base, delay, GET query page) charged to the host
    # clock before the first real request; 0 disables the session model.
    warmup_requests: int = 0
    # P6 (DetailCrawler.php:218-231): the session is closed and re-warmed
    # every OTHER retry ("if ($retry % 2 === 0)").
    session_reset_every: int = 2

    def retry_wait_s(self, attempt: int) -> float:
        if self.backoff == "exp":
            return float(2**attempt)
        return self.retry_delay_s + attempt

    @property
    def per_request_s(self) -> float:
        return self.min_interval_s + self.extra_delay_s

    @property
    def warmup_s(self) -> float:
        """Virtual-clock cost of a session (re)initialization."""
        return self.warmup_requests * self.min_interval_s

    def resets_session(self, attempt: int) -> bool:
        """True when attempt (1-based retry) follows a session reset: the
        reference reinitializes after failed attempt r when r % 2 == 0."""
        return (
            self.warmup_requests > 0
            and attempt >= 1
            and (attempt - 1) % self.session_reset_every == 0
        )


DEFAULT_BUDGET = PolitenessBudget()
SAFE_BUDGET = PolitenessBudget(
    min_interval_s=0.5, extra_delay_s=5.0, max_retries=3, backoff="linear", retry_delay_s=10.0
)
