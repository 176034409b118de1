"""GitHub API rate limiting (reference: `github-rate-limiter.ts:28-150`).

Header-driven throttling: watch X-RateLimit-* headers, start spacing
requests when `remaining` drops to the threshold, sleep until the reset
timestamp when exhausted. Clock and sleep are injectable so behavior is
unit-testable without a network (this container has none).

Scale shape: ONE limiter per fetch partition — `fetch_repo_files` fans the
file list out via mapInPandas, and each worker paces its own partition
against its own token budget (the reference serializes every fetch on one
event loop; here N executors each run an independent paced stream).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, NamedTuple


class RateLimitInfo(NamedTuple):
    limit: int
    remaining: int
    reset: int  # unix timestamp
    used: int


@dataclass
class GitHubRateLimiter:
    throttle_threshold: int = 10
    throttle_delay: float = 1.0
    wait_on_reset: bool = True
    sleep_fn: Callable[[float], None] = time.sleep
    now_fn: Callable[[], float] = time.time
    on_warning: Callable[[RateLimitInfo], None] | None = None
    on_throttle_start: Callable[[RateLimitInfo], None] | None = None
    on_waiting_for_reset: Callable[[float], None] | None = None

    def __post_init__(self):
        self.info: RateLimitInfo | None = None
        self._throttling = False

    @staticmethod
    def extract(headers: dict) -> RateLimitInfo | None:
        """X-RateLimit-* headers (case-insensitive) → RateLimitInfo."""
        h = {k.lower(): v for k, v in headers.items()}
        limit = h.get("x-ratelimit-limit")
        remaining = h.get("x-ratelimit-remaining")
        reset = h.get("x-ratelimit-reset")
        if limit is None or remaining is None or reset is None:
            return None
        return RateLimitInfo(
            int(limit), int(remaining), int(reset), int(h.get("x-ratelimit-used", 0))
        )

    def update_from_headers(self, headers: dict) -> None:
        info = self.extract(headers)
        if info is None:
            return
        self.info = info
        if info.remaining <= self.throttle_threshold and not self._throttling:
            self._throttling = True
            if self.on_throttle_start:
                self.on_throttle_start(info)
        if info.remaining <= self.throttle_threshold * 2 and self.on_warning:
            self.on_warning(info)

    def check_and_wait(self) -> None:
        """Call before each request: wait for reset when exhausted, else
        space requests by throttle_delay while throttling."""
        if self.info is None:
            return
        if self.info.remaining == 0 and self.wait_on_reset:
            wait = self.info.reset - self.now_fn()
            if wait > 0:
                if self.on_waiting_for_reset:
                    self.on_waiting_for_reset(self.info.reset)
                self.sleep_fn(wait)
                self._throttling = False
        elif self._throttling:
            self.sleep_fn(self.throttle_delay)

    def is_throttling(self) -> bool:
        return self._throttling

    def reset_throttling(self) -> None:
        self._throttling = False

    @staticmethod
    def format_info(info: RateLimitInfo) -> str:
        pct = (info.remaining / info.limit) * 100 if info.limit else 0.0
        return f"Rate Limit: {info.remaining}/{info.limit} ({pct:.1f}%) - resets at {info.reset}"


def rate_limited(fetch_fn: Callable[[str], object], limiter: GitHubRateLimiter):
    """Wrap a fetch function with pacing. ``fetch_fn`` may return either
    plain content or a (content, headers) tuple — headers feed the limiter."""

    def _fetch(path: str):
        limiter.check_and_wait()
        out = fetch_fn(path)
        if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], dict):
            content, headers = out
            limiter.update_from_headers(headers)
            return content
        return out

    return _fetch
