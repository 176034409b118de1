"""Reconstruction fold (W7/X15) + chain dedup (W4) — Python invariants plus
a Spark end-to-end over the real chunk pipeline."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gistdex_spark.operators.chunking import chunk_spans
from gistdex_spark.operators.reconstruct import fold_chunks

WORDS = st.lists(
    st.text(alphabet=st.characters(codec="ascii", min_codepoint=97, max_codepoint=122), min_size=1, max_size=8),
    min_size=1,
    max_size=120,
)


@given(WORDS, st.integers(12, 80))
@settings(max_examples=80, deadline=None)
def test_fold_inverts_overlapping_chunks(words, size):
    """Un-trimmed fixed chunks fold back to the exact original text."""
    text = " ".join(words)
    overlap = size // 3
    chunks = [text[s:e] for s, e in chunk_spans(text, size, overlap)]
    assert fold_chunks(chunks, probe=max(overlap, 1)) == text


def test_fold_joins_non_overlapping_with_newline():
    assert fold_chunks(["abc", "def"]) == "abc\ndef"


def test_fold_prefers_longest_overlap():
    # "ababX": tail "abab", next chunk "abX" — longest suffix-prefix is "ab"
    assert fold_chunks(["abab", "abX"]) == "ababX"


def test_fold_empty_and_single():
    assert fold_chunks([]) == ""
    assert fold_chunks(["only"]) == "only"


def test_spark_end_to_end_reconstruction(spark):
    """index → chunk store → original_content == source text."""
    from pyspark.sql import functions as F

    from gistdex_spark.operators.chunking import chunk_documents
    from gistdex_spark.operators.reconstruct import original_content

    # non-repetitive text: the overlap heuristic is only well-defined when
    # the overlap region is locally unique (periodic text over-merges — a
    # property shared with the reference's suffix-match reconstruction)
    texts = [
        ("s1", " ".join(f"alpha{i:04d}" for i in range(160))),
        ("s2", " ".join(f"tok{i:05d}x" for i in range(200))),
        ("s3", "short one"),
    ]
    src = spark.createDataFrame(texts, schema="source_id STRING, content STRING")
    chunks = chunk_documents(src, strategy="fixed", size=120, overlap=30)
    rec = original_content(chunks).withColumnRenamed("content", "rebuilt")
    joined = {r["source_id"]: r["rebuilt"] for r in rec.collect()}
    for sid, text in texts:
        # fixed chunker trims each piece; the fold re-joins on the overlap,
        # so interior content must survive verbatim
        assert joined[sid].replace("\n", " ").split() == text.split(), sid


def test_chain_dedup_keeps_max(spark):
    from gistdex_spark.operators.reconstruct import chain_dedup

    a = spark.createDataFrame([(1, 0, 0.9), (2, 0, 0.5)], "source_id INT, chunk_index INT, score DOUBLE")
    b = spark.createDataFrame([(1, 0, 0.7), (3, 1, 0.6)], "source_id INT, chunk_index INT, score DOUBLE")
    out = {(r.source_id, r.chunk_index): r.score for r in chain_dedup([a, b]).collect()}
    assert out == {(1, 0): 0.9, (2, 0): 0.5, (3, 1): 0.6}


def test_chunk0_stored_content_wins(spark):
    """`search.ts:150-175`: when chunk 0 carries the stored original, it is
    returned verbatim — here trimming makes the fold differ (the chunks
    lost a double space), so only the fast path gives the true original."""
    from gistdex_spark.operators.reconstruct import original_content

    original = "alpha beta  gamma"  # double space chunking won't preserve
    rows = [
        ("s1", 0, "alpha beta", original),
        ("s1", 1, "gamma", None),
        ("s2", 0, "plain", None),  # no stored original → fold fallback
        ("s2", 1, "text", None),
    ]
    chunks = spark.createDataFrame(
        rows,
        schema="source_id STRING, chunk_index INT, content STRING, "
        "original_content STRING",
    )
    out = {r.source_id: r.content for r in original_content(chunks).collect()}
    assert out["s1"] == original
    folded = "alpha beta\ngamma"
    assert out["s1"] != folded  # the fold alone would have been wrong
    assert out["s2"] == "plain\ntext"


def test_no_original_column_keeps_old_behavior(spark):
    from gistdex_spark.operators.reconstruct import original_content

    chunks = spark.createDataFrame(
        [("s", 0, "ab"), ("s", 1, "cd")],
        schema="source_id STRING, chunk_index INT, content STRING",
    )
    assert original_content(chunks).collect()[0].content == "ab\ncd"
