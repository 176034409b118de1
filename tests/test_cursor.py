"""Resumable pagination cursors (`agent-query-tool.ts:777-809, 876-960`)."""

from __future__ import annotations

import pytest

from gistdex_spark.operators.search import (
    decode_cursor,
    encode_cursor,
    paginate_with_cursor,
)


def test_cursor_roundtrip():
    c = encode_cursor(10, "find spark docs", "learn")
    assert decode_cursor(c) == {
        "offset": 10,
        "query": "find spark docs",
        "goal": "learn",
    }


def test_decode_rejects_malformed():
    assert decode_cursor("not base64!!") is None
    assert decode_cursor("") is None
    # valid base64, wrong shape
    import base64

    assert decode_cursor(base64.b64encode(b'["a"]').decode()) is None
    assert decode_cursor(base64.b64encode(b'{"offset":"x","query":"q","goal":"g"}').decode()) is None
    assert decode_cursor(base64.b64encode(b'{"offset":true,"query":"q","goal":"g"}').decode()) is None
    # negative offsets never round-trip from encode_cursor and the
    # reference's slice() gives them from-the-end semantics — malformed
    assert decode_cursor(base64.b64encode(b'{"offset":-5,"query":"q","goal":"g"}').decode()) is None


def test_negative_offset_cursor_rejected(spark):
    import base64

    rows = [(f"id{i:02d}", 1.0 - i * 0.01) for i in range(12)]
    results = spark.createDataFrame(rows, schema="vec_id STRING, score DOUBLE")
    crafted = base64.b64encode(
        b'{"offset":-5,"query":"q","goal":"g"}'
    ).decode()
    with pytest.raises(ValueError, match="Invalid cursor"):
        paginate_with_cursor(results, "q", "g", cursor=crafted)


@pytest.fixture()
def results(spark):
    rows = [(f"id{i:02d}", 1.0 - i * 0.01) for i in range(12)]
    return spark.createDataFrame(rows, schema="vec_id STRING, score DOUBLE")


def test_page_through_everything(results):
    seen, cursor = [], None
    for _ in range(10):
        page, cursor = paginate_with_cursor(
            results, "q", "g", cursor=cursor, page_size=5
        )
        seen += [r.vec_id for r in page.collect()]
        if cursor is None:
            break
    assert seen == [f"id{i:02d}" for i in range(12)]  # ordered, no dup, no gap


def test_last_partial_page_ends_cursor(results):
    page, cur = paginate_with_cursor(
        results, "q", "g", cursor=encode_cursor(10, "q", "g"), page_size=5
    )
    assert page.count() == 2
    assert cur is None


def test_cursor_context_mismatch(results):
    with pytest.raises(ValueError, match="does not match"):
        paginate_with_cursor(
            results, "other query", "g", cursor=encode_cursor(5, "q", "g")
        )
    with pytest.raises(ValueError, match="Invalid cursor"):
        paginate_with_cursor(results, "q", "g", cursor="garbage!!")
