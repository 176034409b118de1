"""ci:doc pipeline pieces: diff parsing, symbol extraction, query
generation, and the end-to-end doc-impact similarity join."""

from __future__ import annotations

from gistdex_spark.operators.cidoc import (
    doc_impact,
    extract_hunks,
    extract_symbols,
    generate_queries,
    split_identifier,
)

DIFF = """\
diff --git a/src/search/ranking.ts b/src/search/ranking.ts
index 111..222 100644
--- a/src/search/ranking.ts
+++ b/src/search/ranking.ts
@@ -1,5 +1,8 @@
+export function rankResults(items) {
+  return items.sort()
+}
-function oldRank(items) {
@@ -20,3 +23,4 @@
+const scoreBoost = 0.1
diff --git a/docs/guide.md b/docs/guide.md
--- a/docs/guide.md
+++ b/docs/guide.md
@@ -1 +1,2 @@
+New ranking documentation line
"""


def test_extract_hunks():
    hunks = extract_hunks(DIFF)
    assert [h["file_path"] for h in hunks] == ["src/search/ranking.ts", "docs/guide.md"]
    assert any("rankResults" in l for l in hunks[0]["added"])
    assert any("oldRank" in l for l in hunks[0]["removed"])


def test_extract_symbols():
    syms = extract_symbols("export function rankResults(x) {}\nconst scoreBoost = 1\ndef py_fn():")
    assert "rankResults" in syms
    assert "scoreBoost" in syms
    assert "py_fn" in syms


def test_split_identifier():
    assert split_identifier("rankResults") == "rank results"
    assert split_identifier("score_boost_v2") == "score boost v2"
    assert split_identifier("kebab-case-name") == "kebab case name"


def test_generate_queries_dedup_and_cap():
    hunks = extract_hunks(DIFF)
    qs = generate_queries(hunks)
    texts = [q["query"] for q in qs]
    assert len(texts) == len(set(texts)), "queries must be distinct"
    assert len(texts) <= 30
    assert "ranking" in texts  # path component
    assert "rank results" in texts  # symbol variant
    assert [q["query_id"] for q in qs] == list(range(len(qs)))


def test_doc_impact_end_to_end(spark):
    """Queries embedded → ONE similarity join → per-doc best match."""
    from gistdex_spark.functions.embedder import embed_text
    from gistdex_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = generate_queries(extract_hunks(DIFF))[:5]
    out = doc_impact(
        spark,
        queries,
        emb,
        threshold=0.01,
        k_per_query=5,
        embed=embed_text,
        doc_col="vec_id",
    ).collect()
    assert out, "no doc impact rows at a permissive threshold"
    for r in out:
        assert r.best_sim >= 0.01
        assert r.match_count >= 1
        assert r.best_query in {q["query_id"] for q in queries}
        assert sorted(r.matched_queries) == list(r.matched_queries)


def test_doc_path_coalesce_and_relativize(spark):
    """F10: coalesce(filePath, path) + absolute→relative normalization."""
    from gistdex_spark.operators.cidoc import doc_path

    df = spark.createDataFrame(
        [
            ("/repo/docs/a.md", "ignored", 1),
            (None, "docs/b.md", 2),
            (None, None, 3),
        ],
        schema="file_path STRING, path STRING, id INT",
    )
    got = {
        r.id: r.p
        for r in df.select("id", doc_path(repo_root="/repo").alias("p")).collect()
    }
    assert got == {1: "docs/a.md", 2: "docs/b.md", 3: None}
