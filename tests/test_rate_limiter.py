"""GitHub rate limiter (`github-rate-limiter.ts:28-150`) with a fake clock."""

from __future__ import annotations

from gistdex_spark.sources.rate_limiter import (
    GitHubRateLimiter,
    RateLimitInfo,
    rate_limited,
)


def _limiter(**kw):
    sleeps: list[float] = []
    lim = GitHubRateLimiter(
        sleep_fn=sleeps.append, now_fn=lambda: 1000.0, **kw
    )
    return lim, sleeps


HEADERS = {
    "X-RateLimit-Limit": "60",
    "X-RateLimit-Remaining": "50",
    "X-RateLimit-Reset": "1030",
    "X-RateLimit-Used": "10",
}


def test_extract_headers_case_insensitive():
    info = GitHubRateLimiter.extract({k.lower(): v for k, v in HEADERS.items()})
    assert info == RateLimitInfo(60, 50, 1030, 10)
    assert GitHubRateLimiter.extract({"other": "1"}) is None


def test_no_wait_when_plenty_remaining():
    lim, sleeps = _limiter()
    lim.update_from_headers(HEADERS)
    lim.check_and_wait()
    assert sleeps == []
    assert not lim.is_throttling()


def test_throttle_kicks_in_at_threshold():
    events = []
    lim, sleeps = _limiter()
    lim.on_throttle_start = events.append
    lim.update_from_headers({**HEADERS, "X-RateLimit-Remaining": "10"})
    assert lim.is_throttling()
    assert events[0].remaining == 10
    lim.check_and_wait()
    assert sleeps == [1.0]  # spaced by throttle_delay


def test_warning_below_double_threshold():
    warned = []
    lim, _ = _limiter()
    lim.on_warning = warned.append
    lim.update_from_headers({**HEADERS, "X-RateLimit-Remaining": "20"})
    assert warned and warned[0].remaining == 20
    assert not lim.is_throttling()


def test_exhausted_waits_until_reset_then_clears():
    waits = []
    lim, sleeps = _limiter()
    lim.on_waiting_for_reset = waits.append
    lim.update_from_headers({**HEADERS, "X-RateLimit-Remaining": "0"})
    lim.check_and_wait()
    assert sleeps == [30.0]  # reset 1030 - now 1000
    assert waits == [1030]
    assert not lim.is_throttling()  # cleared after the reset wait


def test_wait_on_reset_disabled():
    lim, sleeps = _limiter(wait_on_reset=False)
    lim.update_from_headers({**HEADERS, "X-RateLimit-Remaining": "0"})
    lim.check_and_wait()
    assert sleeps == [1.0]  # falls back to throttle spacing only


def test_rate_limited_wrapper_updates_from_tuple_result():
    lim, sleeps = _limiter()
    calls = []

    def fetch(path):
        calls.append(path)
        return f"content:{path}", {**HEADERS, "X-RateLimit-Remaining": "5"}

    wrapped = rate_limited(fetch, lim)
    assert wrapped("a.md") == "content:a.md"
    assert lim.is_throttling()  # headers from the tuple fed the limiter
    wrapped("b.md")
    assert sleeps == [1.0]  # second call paid the throttle delay
    assert calls == ["a.md", "b.md"]


def test_rate_limited_wrapper_passthrough_plain_content():
    lim, _ = _limiter()
    wrapped = rate_limited(lambda p: "x", lim)
    assert wrapped("a") == "x"
    assert lim.info is None
