"""GitHub PR comment seam — mirrors the reference's
post-github-comment-standalone.test.ts and github-integration.ts
contracts with a recorded transport. Zero sockets anywhere."""

from __future__ import annotations

import json

import pytest

from gistdex_spark.operators.ci_github import (
    build_comment_request,
    detect_github_context,
    post_to_github_pr,
)

PR_ENV = {
    "GITHUB_ACTIONS": "true",
    "GITHUB_EVENT_NAME": "pull_request",
    "GITHUB_REF": "refs/pull/123/merge",
    "GITHUB_BASE_REF": "main",
    "GITHUB_REPOSITORY": "owner/repo",
    "GITHUB_TOKEN": "test-token",
}


class RecordingTransport:
    def __init__(self, responses):
        self.responses = list(responses)
        self.requests = []

    def __call__(self, request):
        self.requests.append(request)
        return self.responses.pop(0)


def test_detect_context_outside_actions():
    assert detect_github_context({}) == {"is_pr": False}


def test_detect_context_pr():
    ctx = detect_github_context(PR_ENV)
    assert ctx["is_pr"] is True
    assert ctx["pr_number"] == 123
    assert ctx["base_branch"] == "main"
    assert ctx["owner"] == "owner" and ctx["repo"] == "repo"
    assert ctx["token"] == "test-token"


def test_detect_context_invalid_repository_format():
    env = dict(PR_ENV, GITHUB_REPOSITORY="invalid-format")
    ctx = detect_github_context(env)
    assert ctx["owner"] == "invalid-format"
    assert ctx["repo"] is None


def test_always_creates_new_comment_single_post():
    t = RecordingTransport([{"ok": True, "status": 201,
                             "json": {"id": 999, "body": "New comment"}}])
    resp = post_to_github_pr("hello PR", env=PR_ENV, transport=t)
    assert resp["ok"] is True
    # exactly ONE request, a POST to the create endpoint — never a
    # GET-existing-comments pass (the standalone contract)
    assert len(t.requests) == 1
    req = t.requests[0]
    assert req["method"] == "POST"
    assert req["url"] == (
        "https://api.github.com/repos/owner/repo/issues/123/comments"
    )
    assert req["headers"]["Authorization"] == "Bearer test-token"
    assert req["headers"]["Accept"] == "application/vnd.github.v3+json"
    assert json.loads(req["body"]) == {"body": "hello PR"}


def test_api_error_message_matches_reference():
    t = RecordingTransport(
        [{"ok": False, "status": 403, "status_text": "Forbidden",
          "json": {"message": "API rate limit exceeded"}}]
    )
    with pytest.raises(
        RuntimeError, match=r"Failed to create comment: 403 Forbidden"
    ):
        post_to_github_pr("test comment", env=PR_ENV, transport=t)
    assert len(t.requests) == 1  # 403 is not retryable — no second POST


def test_retryable_status_retries_then_succeeds():
    t = RecordingTransport(
        [
            {"ok": False, "status": 502, "status_text": "Bad Gateway"},
            {"ok": False, "status": 429, "status_text": "Too Many Requests"},
            {"ok": True, "status": 201, "json": {"id": 1}},
        ]
    )
    sleeps = []
    resp = post_to_github_pr(
        "retry me", env=PR_ENV, transport=t, sleep=sleeps.append
    )
    assert resp["ok"] is True
    assert len(t.requests) == 3
    assert sleeps == [1.0, 2.0]  # exponential backoff between attempts


def test_retries_exhausted_raises():
    t = RecordingTransport(
        [{"ok": False, "status": 500, "status_text": "Internal"}] * 3
    )
    with pytest.raises(RuntimeError, match="500 Internal"):
        post_to_github_pr(
            "x", env=PR_ENV, transport=t, max_retries=2, sleep=lambda s: None
        )
    assert len(t.requests) == 3


def test_transport_exception_wrapped():
    def boom(request):
        raise ConnectionError("socket closed")

    with pytest.raises(
        RuntimeError, match=r"Failed to post to GitHub PR: socket closed"
    ):
        post_to_github_pr("x", env=PR_ENV, transport=boom)


def test_context_validation_errors_match_reference():
    with pytest.raises(ValueError, match="Not running in a GitHub PR context"):
        post_to_github_pr("x", env={}, transport=lambda r: {"ok": True})
    env = dict(PR_ENV, GITHUB_REF="refs/heads/main")
    with pytest.raises(ValueError, match="Could not determine PR number"):
        post_to_github_pr("x", env=env, transport=lambda r: {"ok": True})
    env = dict(PR_ENV)
    del env["GITHUB_REPOSITORY"]
    with pytest.raises(ValueError, match="Could not determine repository"):
        post_to_github_pr("x", env=env, transport=lambda r: {"ok": True})
    env = dict(PR_ENV)
    del env["GITHUB_TOKEN"]
    with pytest.raises(ValueError, match="GITHUB_TOKEN is not set"):
        post_to_github_pr("x", env=env, transport=lambda r: {"ok": True})


def test_posts_even_no_impact_comment():
    # the reference posts unconditionally — no "no impact detected" skip
    comment = (
        "## \U0001f4da Documentation Impact Analysis\n\n"
        "✅ **No documentation impact detected**\n\n"
        "All documentation appears to be unaffected by the code changes."
    )
    t = RecordingTransport([{"ok": True, "status": 201}])
    post_to_github_pr(comment, env=PR_ENV, transport=t)
    assert len(t.requests) == 1
    assert "No documentation impact detected" in json.loads(
        t.requests[0]["body"]
    )["body"]


def test_default_transport_never_opens_sockets():
    with pytest.raises(RuntimeError, match="No transport configured"):
        post_to_github_pr("x", env=PR_ENV)


def test_build_request_pull_request_target():
    env = dict(PR_ENV, GITHUB_EVENT_NAME="pull_request_target")
    ctx = detect_github_context(env)
    assert ctx["is_pr"] is True
    req = build_comment_request("c", ctx)
    assert req["url"].endswith("/issues/123/comments")
