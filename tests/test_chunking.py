"""Chunking invariants (reference test model: SURVEY.md §5 — round-trip
coverage, overlap correctness, boundary structure). Pure Python — no Spark
session needed; the distributed path is covered by the oracle-parity suite
(chunk_fixed / reconstruct_roundtrip / chunk_markdown_census)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gistdex_spark.operators.chunking import (
    chunk_code,
    chunk_markdown,
    chunk_spans,
    chunk_text,
    optimal_chunk_settings,
    parse_code_boundaries,
    parse_markdown_sections,
    split_oversized,
)

TEXTS = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=("Cc",)) | st.just("\n") | st.just(" "),
    max_size=2000,
)


@given(TEXTS, st.integers(10, 400), st.integers(0, 9))
@settings(max_examples=120, deadline=None)
def test_spans_cover_everything(text, size, overlap_frac):
    overlap = min(overlap_frac * size // 10, size - 1)
    spans = chunk_spans(text, size, overlap)
    if not text:
        assert spans == []
        return
    # full coverage, in order, no gaps
    assert spans[0][0] == 0
    assert spans[-1][1] == len(text)
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert s1 <= e0, "gap between consecutive chunks"
        assert s1 > s0, "no forward progress"


@given(TEXTS, st.integers(10, 400))
@settings(max_examples=60, deadline=None)
def test_overlap_exact_without_preserve(text, size):
    overlap = size // 4
    spans = chunk_spans(text, size, overlap)
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        if e0 - s0 == size:  # full window ⇒ exact overlap
            assert e0 - s1 == overlap


def test_single_chunk_when_short():
    assert chunk_text("hello world", size=100, overlap=10) == [
        {
            "chunk_index": 0,
            "content": "hello world",
            "start_char": 0,
            "end_char": 11,
            "start_line": 1,
            "end_line": 1,
        }
    ]


def test_empty_and_whitespace_dropped():
    assert chunk_text("", 10, 2) == []
    assert chunk_text("     ", 3, 1) == []


def test_validation():
    import pytest

    with pytest.raises(ValueError):
        chunk_text("x", 0, 0)
    with pytest.raises(ValueError):
        chunk_text("x", 10, 10)


def test_preserve_words_backtracks():
    text = "alpha beta gamma delta epsilon zeta"
    chunks = chunk_text(text, size=12, overlap=3, preserve_words=True)
    # no chunk (except possibly the last) ends mid-word
    for c in chunks[:-1]:
        end = c["end_char"]
        assert text[end - 1] == " " or end == len(text)


def test_line_numbers():
    text = "l1\nl2\nl3\nl4"
    [c] = chunk_text(text, 100, 10)
    assert (c["start_line"], c["end_line"]) == (1, 4)
    chunks = chunk_text(text, 6, 2)
    assert chunks[0]["start_line"] == 1
    assert chunks[-1]["end_line"] == 4


def test_markdown_sections():
    md = (
        "# Title\nintro text\n\n"
        "## Sub\npara one\n\n"
        "```python\ncode here\n```\n"
        "- item 1\n- item 2\n\n"
        "closing para\n"
    )
    secs = parse_markdown_sections(md)
    types = [s.type for s in secs]
    assert "heading" in types
    assert "code_block" in types
    assert "list" in types
    # headings carry their title
    heads = [s for s in secs if s.type == "heading"]
    assert heads[0].title == "Title"
    # line spans are 1-based and ordered
    for s in secs:
        assert 1 <= s.start_line <= s.end_line


def test_markdown_fence_kept_whole():
    md = "```\n# not a heading\nstill code\n```"
    secs = parse_markdown_sections(md)
    assert len(secs) == 1
    assert secs[0].type == "code_block"
    assert "# not a heading" in secs[0].content


def test_split_oversized_overlap_budget():
    sec = parse_markdown_sections("\n".join(f"line {i}" for i in range(100)))[0]
    pieces = split_oversized(sec, max_size=120, overlap=30)
    assert len(pieces) > 1
    for p in pieces:
        assert len(p.content) <= 120 + 40  # budget + one line of slack
    # consecutive pieces share their overlap lines
    for a, b in zip(pieces, pieces[1:]):
        a_tail = a.content.split("\n")[-1]
        assert a_tail in b.content


def test_code_boundaries():
    code = (
        "import os\nimport sys\n\n"
        "def alpha():\n    return 1\n\n"
        "class Beta:\n    x = 2\n\n"
        "print('top level')\n"
    )
    secs = parse_code_boundaries(code)
    types = [s.type for s in secs]
    assert types[0] == "imports"
    assert "def" in types
    assert "class" in types
    names = [s.title for s in secs]
    assert "alpha" in names
    assert "Beta" in names


def test_chunkers_return_contiguous_indexes():
    md_chunks = chunk_markdown("# A\n\ntext\n\n## B\n\nmore", 50, 10)
    code_chunks = chunk_code("def f():\n    pass\n\ndef g():\n    pass", 30, 5)
    for chunks in (md_chunks, code_chunks):
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


def test_optimal_settings():
    assert optimal_chunk_settings(".py") == (650, 125)
    assert optimal_chunk_settings("notes.md") == (1250, 250)
    assert optimal_chunk_settings("a.txt") == (1750, 350)
    assert optimal_chunk_settings(".weird") == (1000, 200)


def test_chunk_udtf_matches_python_spans(spark):
    from gistdex_spark.operators.chunking import chunk_spans, register_chunk_udtf

    register_chunk_udtf(spark)
    text = "alpha beta gamma delta " * 30
    spark.createDataFrame([(1, text)], ["doc_id", "text"]).createOrReplaceTempView(
        "udtf_docs"
    )
    rows = spark.sql(
        "SELECT c.* FROM udtf_docs, LATERAL chunk_udtf(text, 200, 40) c"
        " ORDER BY c.chunk_index"
    ).collect()
    expected = [
        (i, text[s:e], s, e) for i, (s, e) in enumerate(chunk_spans(text, 200, 40))
    ]
    got = [(r.chunk_index, r.content, r.start, r.end) for r in rows]
    assert got == expected and len(got) > 1
