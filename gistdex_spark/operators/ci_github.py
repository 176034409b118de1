"""GitHub PR comment posting with an injected transport (no network).

Mirrors `/root/reference/src/core/ci/github-integration.ts:15-97`
(GitHub-Actions context detection + post, with its exact error messages)
and the REST contract pinned by
`/root/reference/tests/integration/ci/post-github-comment-standalone.test.ts`:
always CREATE a new comment (one POST to
/repos/{owner}/{repo}/issues/{n}/comments — never a GET-existing pass),
Bearer-token headers, `Failed to create comment: {status} {statusText}`
on a non-ok response.

Network egress is out of scope for this engine, so the HTTP hop is a
SEAM: ``transport`` is any callable ``request -> response`` and the
default refuses to open sockets. CI wires a real HTTP client in one
line; tests wire a recorder. Retry semantics live here (not in the
transport): retryable statuses back off and re-POST, client errors
abort immediately — so every transport gets the same delivery contract.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Mapping

GITHUB_API = "https://api.github.com"
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


def detect_github_context(env: Mapping[str, str] | None = None) -> dict:
    """The reference's detectGitHubContext (`github-integration.ts:15-55`):
    GitHub-Actions env sniffing. ``env`` is injectable so CI shapes are
    testable without mutating process state."""
    if env is None:
        import os  # noqa: PLC0415

        env = os.environ
    context: dict[str, Any] = {"is_pr": False}
    if not env.get("GITHUB_ACTIONS"):
        return context
    event = env.get("GITHUB_EVENT_NAME")
    if event in ("pull_request", "pull_request_target"):
        context["is_pr"] = True
        ref = env.get("GITHUB_REF") or ""
        m = re.search(r"pull/(\d+)", ref)
        if m:
            context["pr_number"] = int(m.group(1))
        context["base_branch"] = env.get("GITHUB_BASE_REF")
    repository = env.get("GITHUB_REPOSITORY")
    if repository:
        owner, _, repo = repository.partition("/")
        context["owner"] = owner or None
        context["repo"] = repo or None
    context["token"] = env.get("GITHUB_TOKEN")
    return context


def build_comment_request(content: str, context: Mapping[str, Any]) -> dict:
    """Assemble the create-comment POST exactly as the standalone test
    pins it: URL, method, Bearer/Accept/Content-Type headers, JSON body."""
    owner, repo = context["owner"], context["repo"]
    number = context["pr_number"]
    return {
        "url": f"{GITHUB_API}/repos/{owner}/{repo}/issues/{number}/comments",
        "method": "POST",
        "headers": {
            "Authorization": f"Bearer {context['token']}",
            "Accept": "application/vnd.github.v3+json",
            "Content-Type": "application/json",
        },
        "body": json.dumps({"body": content}),
    }


def _no_network_transport(request: dict) -> dict:
    raise RuntimeError(
        "No transport configured: ci_github never opens sockets itself. "
        "Pass transport= (request -> {'ok', 'status', 'status_text', ...})."
    )


def post_to_github_pr(
    content: str,
    env: Mapping[str, str] | None = None,
    transport: Callable[[dict], dict] | None = None,
    max_retries: int = 2,
    sleep: Callable[[float], None] | None = None,
    backoff_s: float = 1.0,
) -> dict:
    """postToGitHubPR (`github-integration.ts:60-97`) over the seam.

    Validation order and messages match the reference; delivery is one
    POST per attempt (always a NEW comment — the standalone contract),
    with retry-on-retryable-status (429/5xx, exponential backoff via the
    injectable ``sleep``) and immediate abort on other client errors.
    Returns the transport's final response. Raises ValueError for
    context problems and RuntimeError (message prefixed
    'Failed to post to GitHub PR:') for delivery failures.
    """
    context = detect_github_context(env)
    if not context["is_pr"]:
        raise ValueError("Not running in a GitHub PR context")
    if not context.get("pr_number"):
        raise ValueError("Could not determine PR number")
    if not context.get("owner") or not context.get("repo"):
        raise ValueError("Could not determine repository info")
    if not context.get("token"):
        raise ValueError(
            "GITHUB_TOKEN is not set. Please set the GITHUB_TOKEN "
            "environment variable"
        )
    send = transport if transport is not None else _no_network_transport
    do_sleep = sleep if sleep is not None else _default_sleep
    request = build_comment_request(content, context)
    attempt = 0
    while True:
        try:
            response = send(request)
        except Exception as e:  # noqa: BLE001 — mirror the reference's wrap
            raise RuntimeError(f"Failed to post to GitHub PR: {e}") from e
        if response.get("ok"):
            return response
        status = response.get("status")
        if status in RETRYABLE_STATUSES and attempt < max_retries:
            do_sleep(backoff_s * (2**attempt))
            attempt += 1
            continue
        raise RuntimeError(
            "Failed to post to GitHub PR: Failed to create comment: "
            f"{status} {response.get('status_text')}"
        )


def _default_sleep(seconds: float) -> None:
    import time  # noqa: PLC0415

    time.sleep(seconds)
