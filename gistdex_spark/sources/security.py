"""Ingestion-seam security validation.

Reference semantics: `src/core/security/security.ts:8-348` — path-traversal
and system-directory gates on file ingestion, HTTPS + domain-allowlist
gates on external URLs, and GitHub repo/gist URL shape validation
(mirrored by `src/core/search/security.test.ts`).

Scale note: these are DRIVER-SIDE argument checks that run once per ingest
call, never per row — the reference validates each glob match one file at
a time (`indexer.ts:213`); here Spark's reader can only emit files under
the glob's static prefix, so validating that prefix (after symlink
resolution) gives the same guarantee with O(1) work at any corpus size.
"""

from __future__ import annotations

import os
import re
from urllib.parse import unquote, urlsplit


class SecurityError(ValueError):
    """Validation failure with a stable machine-readable code.

    Subclasses ValueError so pre-existing callers that caught ValueError
    on bad URLs keep working.
    """

    def __init__(self, message: str, code: str):
        super().__init__(message)
        self.code = code


ALLOWED_DOMAINS = (
    "gist.github.com",
    "api.github.com",
    "github.com",
    "raw.githubusercontent.com",
)

DEFAULT_SAFE_BASE_PATHS = (".", "./docs", "./src", "./content", "./data")

_SYSTEM_PREFIXES = ("/etc", "/root", "/home", "/var", "/usr/local", "/sys", "/proc")

_NAME_RE = re.compile(r"^[A-Za-z0-9._-]+$")
_GIST_PATH_RE = re.compile(r"/[\w-]+/([a-f0-9]+)")


def validate_file_path(
    file_path: str,
    base_dir: str | None = None,
    allowed_base_paths: tuple[str, ...] = DEFAULT_SAFE_BASE_PATHS,
) -> str:
    """Validate a file path against traversal/system-dir/containment rules.

    Returns the resolved real path; raises SecurityError otherwise.
    """
    if not file_path or not isinstance(file_path, str):
        raise SecurityError("Invalid file path provided", "INVALID_PATH")

    decoded = unquote(file_path)
    normalized = os.path.normpath(decoded)

    if ".." in normalized:
        raise SecurityError(
            'Path traversal detected: ".." not allowed', "PATH_TRAVERSAL"
        )

    if os.path.isabs(normalized) and any(
        normalized == p or normalized.startswith(p + os.sep)
        for p in _SYSTEM_PREFIXES
    ):
        raise SecurityError(
            "Access to system directories is not allowed", "SYSTEM_PATH_ACCESS"
        )

    real_base = os.path.realpath(base_dir if base_dir is not None else os.getcwd())
    candidate = (
        normalized
        if os.path.isabs(normalized)
        else os.path.join(real_base, normalized)
    )
    # realpath resolves symlinks BEFORE the containment check, so a link
    # pointing outside the allowed bases is rejected by where it lands.
    real_path = os.path.realpath(candidate)

    for allowed in allowed_base_paths:
        real_allowed = os.path.realpath(os.path.join(real_base, allowed))
        rel = os.path.relpath(real_path, real_allowed)
        if rel == "." or not rel.startswith(".."):
            return real_path

    raise SecurityError(
        f"File path {file_path!r} is outside allowed directories "
        f"(allowed: {', '.join(allowed_base_paths)})",
        "PATH_NOT_ALLOWED",
    )


def create_safe_path_validator(
    base_dir: str | None = None,
    allowed_base_paths: tuple[str, ...] = DEFAULT_SAFE_BASE_PATHS,
):
    """Bind a base directory + allowlist into a reusable path validator."""
    resolved = os.path.realpath(base_dir if base_dir is not None else os.getcwd())

    def _validate(file_path: str) -> str:
        return validate_file_path(file_path, resolved, allowed_base_paths)

    return _validate


def _parse_url(url: str):
    if not url or not isinstance(url, str):
        raise SecurityError("Invalid URL provided", "INVALID_URL")
    try:
        parsed = urlsplit(url)
    except ValueError:
        raise SecurityError("Invalid URL format", "INVALID_URL_FORMAT") from None
    if not parsed.scheme or not parsed.hostname:
        raise SecurityError("Invalid URL format", "INVALID_URL_FORMAT")
    return parsed


def validate_external_url(url: str) -> None:
    """HTTPS-only + domain allowlist for any external resource fetch."""
    parsed = _parse_url(url)
    if parsed.scheme != "https":
        raise SecurityError(
            "Only HTTPS URLs are allowed for external resources", "NON_HTTPS_URL"
        )
    host = parsed.hostname.lower()
    if not any(host == d or host.endswith("." + d) for d in ALLOWED_DOMAINS):
        raise SecurityError(
            f"Domain {parsed.hostname!r} is not allowed "
            f"(allowed: {', '.join(ALLOWED_DOMAINS)})",
            "DOMAIN_NOT_ALLOWED",
        )


def validate_github_repo_url(url: str) -> dict:
    """GitHub repo URL → {owner, repo}; raises SecurityError otherwise."""
    validate_external_url(url)
    parsed = _parse_url(url)
    if not parsed.hostname.lower().endswith("github.com"):
        raise SecurityError("URL must be a GitHub repository URL", "NOT_GITHUB_URL")
    parts = [p for p in parsed.path.split("/") if p]
    if len(parts) < 2:
        raise SecurityError(
            "Invalid GitHub repository URL format", "INVALID_GITHUB_URL"
        )
    owner, repo = parts[0], parts[1]
    if not _NAME_RE.match(owner) or not _NAME_RE.match(repo):
        raise SecurityError(
            "Invalid characters in owner or repository name", "INVALID_GITHUB_NAME"
        )
    return {"owner": owner, "repo": re.sub(r"\.git$", "", repo)}


def validate_gist_url(url: str) -> str:
    """Gist URL → gist id (lowercase hex); raises SecurityError otherwise."""
    validate_external_url(url)
    parsed = _parse_url(url)
    if parsed.hostname.lower() != "gist.github.com":
        raise SecurityError("URL must be a GitHub Gist URL", "NOT_GIST_URL")
    m = _GIST_PATH_RE.search(parsed.path)
    if not m:
        raise SecurityError("Invalid Gist URL format", "INVALID_GIST_URL")
    return m.group(1)
