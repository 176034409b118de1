"""CLI command tests — in-process dispatch with an injected session,
mirroring the reference's handler tests (`src/cli/commands/*.test.ts`
inject a service instead of spawning the binary)."""

from __future__ import annotations

import io
import json
import os

import pytest

from gistdex_spark.cli import run


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """A small indexed chunk store shared across CLI tests."""
    from gistdex_spark.api import GistdexSpark

    path = str(tmp_path_factory.mktemp("cli") / "chunks")
    eng = GistdexSpark(spark, path)
    texts = spark.createDataFrame(
        [
            ("doc-a.md", "# Alpha\n\nSpark query engines plan lazily.\n" * 8,
             "file", "Alpha"),
            ("doc-b.py", "def broadcast_join():\n    return 'small dim'\n" * 6,
             "file", "Beta"),
            ("note-1", "Columnar storage favors projection pruning.", "text",
             "Gamma"),
        ],
        schema="source_id STRING, content STRING, source_type STRING, title STRING",
    )
    eng.index_text(texts, size=200, overlap=40)
    return path


def _run(spark, argv):
    out = io.StringIO()
    rc = run(argv, spark=spark, out=out)
    return rc, out.getvalue()


def test_version_flag(spark):
    rc, out = _run(spark, ["--version"])
    assert rc == 0 and "gistdex-spark" in out


def test_query_formats_results(spark, store):
    rc, out = _run(
        spark, ["query", "--db", store, "-k", "2", "spark", "query", "engines"]
    )
    assert rc == 0
    assert 'Searching for: "spark query engines"' in out
    assert "Found 2 results" in out
    assert "1. " in out and "Score: " in out
    assert "Search Statistics:" in out and "Average Score:" in out


def test_query_type_filter(spark, store):
    rc, out = _run(
        spark,
        ["query", "--db", store, "--type", "text", "-k", "5", "columnar"],
    )
    assert rc == 0
    assert "Type: text" in out and "Type: file" not in out


def test_query_full_single(spark, store):
    # --type text narrows to the one text source, so top-1 is deterministic.
    rc, out = _run(
        spark,
        [
            "query", "--db", store, "-k", "1", "--full", "--type", "text",
            "columnar", "storage",
        ],
    )
    assert rc == 0
    # Full single-result mode prints the reconstructed original verbatim.
    assert "Columnar storage favors projection pruning." in out


def test_query_full_and_section_conflict(spark, store):
    rc, out = _run(spark, ["query", "--db", store, "--full", "--section", "x"])
    assert rc == 1 and "Cannot use both" in out


def test_list_census(spark, store):
    rc, out = _run(spark, ["list", "--db", store])
    assert rc == 0
    assert "Total chunks:" in out
    assert "Unique sources: 3" in out
    assert "file:" in out and "text:" in out
    assert "=== Sources Summary ===" in out


def test_list_by_extension(spark, store):
    rc, out = _run(spark, ["list", "--db", store, "--by-extension", "--stats"])
    # --stats short-circuits before extension grouping, like the reference.
    assert rc == 0 and "Extension Statistics" not in out
    rc, out = _run(spark, ["list", "--db", store, "--by-extension"])
    assert rc == 0
    assert ".md: " in out and ".py: " in out


def test_index_text_roundtrip(spark, tmp_path):
    db = str(tmp_path / "chunks")
    rc, out = _run(
        spark,
        ["index", "--db", db, "--text", "hello spark " * 50, "--title", "T"],
    )
    assert rc == 0 and "Indexed" in out
    rc, out = _run(spark, ["list", "--db", db, "--stats"])
    assert rc == 0 and "Unique sources: 1" in out


def test_index_files_glob(spark, tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "a.py").write_text("def f():\n    return 1\n" * 10)
    (d / "b.py").write_text("def g():\n    return 2\n" * 10)
    db = str(tmp_path / "chunks")
    rc, out = _run(
        spark,
        ["index", "--db", db, "--files", f"{d}/*.py", "--base-dir", str(d)],
    )
    assert rc == 0 and "Indexed" in out
    rc, out = _run(spark, ["list", "--db", db, "--stats"])
    assert "Unique sources: 2" in out


def test_index_nothing(spark, tmp_path):
    rc, out = _run(spark, ["index", "--db", str(tmp_path / "c")])
    assert rc == 1 and "Nothing to index" in out


def test_index_github_offline_fails_cleanly(spark, tmp_path):
    rc, out = _run(
        spark,
        [
            "index", "--db", str(tmp_path / "c"),
            "--github", "https://github.com/o/r/tree/main",
        ],
    )
    assert rc == 1 and "Fetch failed" in out


def test_info(spark):
    rc, out = _run(spark, ["info"])
    assert rc == 0
    assert "Provider: parquet" in out
    assert "parquet" in out and "orc" in out


def test_init_writes_config(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc, out = _run(spark, ["init", "--db", "mydb"])
    assert rc == 0
    cfg = json.loads((tmp_path / "gistdex.config.json").read_text())
    assert cfg["vectorDB"]["options"]["path"] == "mydb"
    rc, out = _run(spark, ["init"])
    assert rc == 1 and "already exists" in out


def test_ci_doc(spark, store, tmp_path):
    diff = tmp_path / "change.diff"
    diff.write_text(
        "diff --git a/doc-a.md b/doc-a.md\n"
        "--- a/doc-a.md\n"
        "+++ b/doc-a.md\n"
        "@@ -1,3 +1,4 @@\n"
        " # Alpha\n"
        "+Spark query engines plan lazily.\n"
    )
    rc, out = _run(
        spark,
        ["ci-doc", "--db", store, "--diff", str(diff), "--threshold", "0.2"],
    )
    assert rc == 0
    assert "impacted document" in out or "No impacted" in out


def test_module_entrypoint_exists():
    # `python -m gistdex_spark` must resolve (reference ships a bin).
    assert os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "gistdex_spark", "__main__.py")
    )
