"""Connector-surface logic (S4/S5, F5/F6, X25): URL parsing, tree
filtering, URL building, and the distributed fetch fan-out with an
injected fake fetcher."""

from __future__ import annotations

import pytest

from gistdex_spark.sources.github import (
    build_github_url,
    fetch_repo_files,
    filter_tree,
    is_text_file,
    match_globs,
    parse_gist_url,
    parse_repo_url,
)


def test_parse_gist_url():
    out = parse_gist_url("https://gist.github.com/someone/0123456789abcdef")
    assert out == {"owner": "someone", "gist_id": "0123456789abcdef"}
    assert parse_gist_url("https://gist.github.com/0123456789abcdef")["owner"] is None
    with pytest.raises(ValueError):
        parse_gist_url("https://example.com/not-a-gist")


def test_parse_repo_url():
    out = parse_repo_url("https://github.com/apache/spark")
    assert out == {"owner": "apache", "repo": "spark", "branch": None}
    out = parse_repo_url("https://github.com/apache/spark/tree/branch-4.0")
    assert out["branch"] == "branch-4.0"
    assert parse_repo_url("https://github.com/a/b.git")["repo"] == "b"
    with pytest.raises(ValueError):
        parse_repo_url("https://gitlab.com/a/b")


def test_text_whitelist():
    assert is_text_file("src/main.py")
    assert is_text_file("README.md")
    assert not is_text_file("logo.png")
    assert not is_text_file("Makefile")  # no extension → excluded


def test_glob_matching():
    assert match_globs("src/a.py", ["**/*.py"])
    assert match_globs("a.py", ["**/*.py"])  # zero-depth **
    assert not match_globs("src/a.py", ["**/*.md"])
    assert not match_globs("node_modules/x/y.js", ["**/*.js"])
    assert match_globs("anything.txt", None)  # no patterns → all


def test_filter_tree():
    tree = [
        "README.md", "src/engine.py", "src/engine.test.py", "img/logo.png",
        "node_modules/dep/index.js", "docs/guide.md",
    ]
    assert filter_tree(tree, ["**/*.py", "*.md"]) == [
        "README.md", "src/engine.py", "src/engine.test.py",
    ]
    assert filter_tree(tree) == [
        "README.md", "src/engine.py", "src/engine.test.py", "docs/guide.md",
    ]


def test_build_github_url():
    assert (
        build_github_url("o", "r", "main", "src/a.py", 10, 20)
        == "https://github.com/o/r/blob/main/src/a.py#L10-L20"
    )
    assert (
        build_github_url("o", "r", "main", "docs/g.md", 5)
        == "https://github.com/o/r/blob/main/docs/g.md?plain=1#L5"
    )
    assert build_github_url("o", "r", "v1", "a.ts") == "https://github.com/o/r/blob/v1/a.ts"
    # single-line anchor never renders a degenerate range
    assert build_github_url("o", "r", "m", "a.py", 7, 7).endswith("#L7")


def test_fetch_fan_out_with_fake(spark):
    tree = ["src/a.py", "src/b.py", "img/c.png", "node_modules/d.js"]
    fetched = fetch_repo_files(
        spark,
        "https://github.com/acme/widgets/tree/dev",
        tree,
        patterns=["**/*.py"],
        fetch_fn=lambda p: f"content of {p}",
    ).collect()
    assert {r.file_path for r in fetched} == {"src/a.py", "src/b.py"}
    by_path = {r.file_path: r for r in fetched}
    assert by_path["src/a.py"].content == "content of src/a.py"
    assert by_path["src/a.py"].source_id == "github:acme/widgets@dev:src/a.py"
    assert by_path["src/a.py"].url == "https://github.com/acme/widgets/blob/dev/src/a.py"
    assert all(r.source_type == "github" for r in fetched)


def test_fetch_without_network_raises(spark):
    df = fetch_repo_files(
        spark, "https://github.com/a/b", ["x.py"]
    )
    with pytest.raises(Exception, match="NotImplementedError|network fetch"):
        df.collect()
