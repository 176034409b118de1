"""Query-cache write path + structured-knowledge store round-trips
(reference: `query-cache.ts:65-129`, `structured-knowledge.ts:5-67`)."""

from __future__ import annotations

from gistdex_spark.sources.cache_store import (
    CACHE_VERSION,
    append_knowledge,
    append_query_cache,
    knowledge_current,
    knowledge_markdown,
    query_cache_current,
    result_summary,
)


def _results(n=5):
    return [
        {"score": 0.9 - i * 0.1, "metadata": {"title": f"docs/guide{i}.md"}}
        for i in range(n)
    ]


def test_result_summary_top3_sources():
    s = result_summary(_results())
    assert s == "guide0.md (0.900), guide1.md (0.800), guide2.md (0.700)"


def test_result_summary_fallbacks():
    rows = [
        {"score": 0.5, "metadata": {"filePath": "a/b/c.py"}},
        {"score": 0.4, "metadata": {"sourceType": "gist"}},
        {"score": 0.3, "metadata": {}},
    ]
    assert result_summary(rows) == "c.py (0.500), gist (0.400), unknown (0.300)"


def test_query_cache_upsert_and_eviction(spark, tmp_path):
    store = str(tmp_path / "qcache")
    for i in range(5):
        append_query_cache(
            spark, store, f"query {i}", "hybrid", _results(), f"t{i}", seq=i
        )
    # upsert: same (query, strategy) replaces, doesn't duplicate
    append_query_cache(
        spark, store, "query 0", "hybrid", _results(2), "t9", seq=9
    )
    # same query, DIFFERENT strategy is a distinct key
    append_query_cache(
        spark, store, "query 0", "semantic", _results(1), "t10", seq=10
    )
    log = spark.read.parquet(store)
    cur = query_cache_current(log).orderBy("seq").collect()
    assert len(cur) == 6  # 5 keys + the semantic variant; no dup for upsert
    by_key = {(r.query, r.strategy): r for r in cur}
    assert by_key[("query 0", "hybrid")].results_count == 2  # latest write won
    assert by_key[("query 0", "hybrid")].timestamp == "t9"
    assert by_key[("query 0", "semantic")].results_count == 1

    # capacity eviction keeps the most recently written keys
    top2 = query_cache_current(log, capacity=2).collect()
    assert {(r.query, r.strategy) for r in top2} == {
        ("query 0", "hybrid"),
        ("query 0", "semantic"),
    }


def test_query_cache_version_filter(spark, tmp_path):
    store = str(tmp_path / "qcache2")
    append_query_cache(spark, store, "q", "hybrid", _results(), "t0", seq=0)
    bad = spark.createDataFrame(
        [("0.0.1", "old", "hybrid", None, None, "t1", 1, 0, "")],
        schema=spark.read.parquet(store).schema,
    )
    bad.write.mode("append").parquet(store)
    cur = query_cache_current(spark.read.parquet(store)).collect()
    assert [r.query for r in cur] == ["q"]  # version-mismatched rows dropped
    assert cur[0].version if hasattr(cur[0], "version") else CACHE_VERSION


def test_knowledge_latest_wins(spark, tmp_path):
    store = str(tmp_path / "knowledge")
    append_knowledge(spark, store, "spark tuning", "v1", "{}", "2024-01-01", seq=0)
    append_knowledge(spark, store, "spark tuning", "v2", "{}", "2024-01-02", seq=1)
    append_knowledge(spark, store, "other", "x", "{}", "2024-01-03", seq=2)
    cur = knowledge_current(spark.read.parquet(store)).collect()
    by_topic = {r.topic: r for r in cur}
    # whitespace → underscore sanitization, like the reference's filename
    assert set(by_topic) == {"spark_tuning", "other"}
    assert by_topic["spark_tuning"].content == "v2"


def test_knowledge_markdown_format():
    md = knowledge_markdown(
        "t",
        "Body text",
        {"tags": ["a", "b"], "nested": {"k": 1}, "plain": "v"},
        "2024-06-01",
    )
    assert md.splitlines()[0] == "Body text"
    assert "## Metadata" in md
    assert "Last Updated: 2024-06-01" in md
    assert "Tags: a, b" in md
    assert 'Nested: {"k": 1}' in md
    assert "Plain: v" in md


def test_compaction_preserves_current_view(spark, tmp_path):
    from gistdex_spark.sources.cache_store import compact_query_cache

    store = str(tmp_path / "qcache3")
    for i in range(7):
        append_query_cache(
            spark, store, f"q{i % 4}", "hybrid", _results(i % 3), f"t{i}", seq=i
        )
    before = {
        (r.query, r.seq)
        for r in query_cache_current(spark.read.parquet(store)).collect()
    }
    n = compact_query_cache(spark, store)
    assert n == 4  # 4 distinct keys survive
    after_log = spark.read.parquet(store)
    assert after_log.count() == 4  # log physically shrank (was 7 appends)
    after = {
        (r.query, r.seq) for r in query_cache_current(after_log).collect()
    }
    assert after == before
    # compacted store still accepts appends + reads as a log
    append_query_cache(spark, store, "q9", "hybrid", _results(), "t9", seq=9)
    assert query_cache_current(spark.read.parquet(store)).count() == 5
