"""GitHub/Gist connector surface (SURVEY.md S4/S5, F5/F6, X25).

The reference fetches gists and repo trees over HTTPS with a token-bucket
rate limiter (`indexer.ts:284-487`, `github-tree-fetcher.ts`,
`github-rate-limiter.ts`) then indexes each text file. Network I/O is a
driver-side connector concern; everything around it — URL parsing, tree
filtering (glob + text-file whitelist), URL building with line anchors,
and the fan-out of fetched files into the chunk pipeline — is pure logic,
implemented and tested here. ``fetch_fn`` is injectable: tests pass a
fake; production passes an HTTP client. This container has no network, so
the default fetch raises a clear error.

Scale shape: listing is driver-side (a repo tree is KB-MB); per-file
*content* fetch fans out via ``mapInPandas`` over the file list so a
1M-file org sync parallelizes across executors, each worker rate-limiting
its own partition (the reference serializes everything on one event loop).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

# F5: text-file whitelist (role of `file-extensions.ts:35-84`; our own list).
TEXT_EXTENSIONS = {
    ".txt", ".md", ".mdx", ".rst", ".adoc", ".html", ".htm", ".xml",
    ".json", ".yaml", ".yml", ".toml", ".ini", ".cfg", ".csv", ".tsv",
    ".js", ".jsx", ".ts", ".tsx", ".mjs", ".cjs", ".vue", ".svelte",
    ".py", ".rb", ".go", ".rs", ".java", ".kt", ".scala", ".swift",
    ".c", ".h", ".cpp", ".hpp", ".cs", ".php", ".sh", ".bash", ".zsh",
    ".sql", ".graphql", ".proto", ".css", ".scss", ".less",
}

# X23: extension → (language, category) info (role of `getExtensionInfo`).
EXTENSION_INFO = {
    ".py": ("Python", "code"), ".ts": ("TypeScript", "code"),
    ".js": ("JavaScript", "code"), ".go": ("Go", "code"),
    ".rs": ("Rust", "code"), ".java": ("Java", "code"),
    ".rb": ("Ruby", "code"), ".c": ("C", "code"), ".cpp": ("C++", "code"),
    ".md": ("Markdown", "docs"), ".mdx": ("Markdown", "docs"),
    ".rst": ("reStructuredText", "docs"), ".txt": ("Plain text", "docs"),
    ".json": ("JSON", "config"), ".yaml": ("YAML", "config"),
    ".yml": ("YAML", "config"), ".toml": ("TOML", "config"),
    ".html": ("HTML", "markup"), ".css": ("CSS", "markup"),
    ".sql": ("SQL", "code"), ".sh": ("Shell", "code"),
}

_GIST_RE = re.compile(r"^https://gist\.github\.com/(?:([\w-]+)/)?([0-9a-f]{8,})/?$")
_REPO_RE = re.compile(
    r"^https://github\.com/([\w.-]+)/([\w.-]+?)(?:\.git)?(?:/tree/([\w./-]+))?/?$"
)


def parse_gist_url(url: str) -> dict:
    """S4: gist URL → {owner?, gist_id}; raises on anything else.

    The HTTPS + domain-allowlist gate (`security.ts:219-237`) runs first;
    the regex then pins the gist.github.com shape and hex id.
    """
    from gistdex_spark.sources.security import validate_external_url

    url = url.strip()
    validate_external_url(url)
    m = _GIST_RE.match(url)
    if not m:
        raise ValueError(f"not a gist URL: {url!r}")
    return {"owner": m.group(1), "gist_id": m.group(2)}


def parse_repo_url(url: str) -> dict:
    """S5: repo URL → {owner, repo, branch?} (tree/<branch> suffix allowed).

    Validated by the reference-parity gate (`security.ts:246-297`: HTTPS,
    domain allowlist, owner/repo charset) before branch extraction.
    """
    from gistdex_spark.sources.security import validate_github_repo_url

    url = url.strip()
    validate_github_repo_url(url)
    m = _REPO_RE.match(url)
    if not m:
        raise ValueError(f"not a GitHub repo URL: {url!r}")
    return {"owner": m.group(1), "repo": m.group(2), "branch": m.group(3)}


def is_text_file(path: str) -> bool:
    """F5: extension whitelist."""
    dot = path.rfind(".")
    return dot >= 0 and path[dot:].lower() in TEXT_EXTENSIONS


def _glob_to_re(pat: str) -> re.Pattern:
    """Minimatch-flavored glob → regex: `*`/`?` stop at `/`, `**` crosses,
    a leading `**/` also matches zero directories. (fnmatch is wrong here:
    its `*` crosses `/`, so `*.md` would match `docs/guide.md`.)"""
    out = []
    i = 0
    while i < len(pat):
        c = pat[i]
        if c == "*":
            if pat[i : i + 3] == "**/":
                out.append("(?:.*/)?")
                i += 3
                continue
            if pat[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        else:
            out.append(re.escape(c))
        i += 1
    return re.compile("".join(out) + r"\Z")


def match_globs(path: str, patterns: list[str] | None) -> bool:
    """F6 (`glob-matcher.ts:6-66`): minimatch-flavored include filter;
    node_modules is always excluded, like the reference's indexFiles."""
    if "node_modules/" in path or path.startswith("node_modules"):
        return False
    if not patterns:
        return True
    return any(_glob_to_re(p).match(path) for p in patterns)


def filter_tree(paths: list[str], patterns: list[str] | None = None) -> list[str]:
    """S5's tree filter: glob include + text whitelist, order-preserving."""
    return [p for p in paths if match_globs(p, patterns) and is_text_file(p)]


def build_github_url(
    owner: str,
    repo: str,
    branch: str,
    path: str,
    start_line: int | None = None,
    end_line: int | None = None,
) -> str:
    """X25 (`doc-service.ts:108-173`): blob URL with ?plain=1 for markdown
    and #Lx-Ly line anchors."""
    url = f"https://github.com/{owner}/{repo}/blob/{branch}/{path}"
    if path.lower().endswith((".md", ".mdx")):
        url += "?plain=1"
    if start_line is not None:
        url += f"#L{start_line}"
        if end_line is not None and end_line != start_line:
            url += f"-L{end_line}"
    return url


def _no_network_fetch(path: str) -> str:
    raise NotImplementedError(
        "network fetch is not available in this environment; inject fetch_fn"
    )


FETCHED_SCHEMA = StructType(
    [
        StructField("source_id", StringType()),
        StructField("file_path", StringType()),
        StructField("content", StringType()),
        StructField("source_type", StringType()),
        StructField("url", StringType()),
    ]
)


def fetch_repo_files(
    spark: SparkSession,
    repo_url: str,
    tree: list[str],
    patterns: list[str] | None = None,
    fetch_fn=_no_network_fetch,
    rate_limiter_factory=None,
) -> DataFrame:
    """S5 fan-out: listing (driver) → per-file fetch distributed over
    executors via mapInPandas. Each worker fetches its partition's files —
    contrast with the reference's sequential await loop.

    ``rate_limiter_factory`` (e.g. ``GitHubRateLimiter``) builds ONE
    limiter per partition; each worker paces its own fetch stream from the
    X-RateLimit headers (`github-rate-limiter.ts:28-150`). fetch_fn may
    return (content, headers) to feed the limiter."""
    info = parse_repo_url(repo_url)
    branch = info["branch"] or "main"
    files = filter_tree(tree, patterns)
    listing = spark.createDataFrame([(p,) for p in files], schema="path STRING")

    owner, repo = info["owner"], info["repo"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetch_fn
        if rate_limiter_factory is not None:
            from gistdex_spark.sources.rate_limiter import rate_limited

            fetch = rate_limited(fetch_fn, rate_limiter_factory())
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rows.append(
                    (
                        f"github:{owner}/{repo}@{branch}:{p}",
                        p,
                        fetch(p),
                        "github",
                        build_github_url(owner, repo, branch, p),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FETCHED_SCHEMA.fields]
            )

    return listing.mapInPandas(run, FETCHED_SCHEMA)
