"""Int8 code store at rest: the stored-code search must equal the
scan-form ann_int8 exactly, the shortlist pass must read only
(id, codes, scale) — never the f64 embedding — and the rerank scan,
symmetrically, must never read the codes."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from gistdex_spark.operators.similarity import ann_int8
from gistdex_spark.queries import QV_MAIN
from gistdex_spark.sources.int8_store import (
    search_stored_int8,
    write_int8_store,
)
from gistdex_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def store(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("int8") / "store")
    write_int8_store(emb, path)
    return path


def test_stored_codes_match_quantize_rule(spark, emb, store):
    """Persisted codes must equal the scan form's on-the-fly
    clamp(floor(x/scale + 0.5), ±127), including the zero-vector rule."""
    rows = spark.read.parquet(store).collect()
    assert rows
    import math

    for r in rows[:50]:
        s = max(abs(x) for x in r["embedding"]) / 127.0
        if s == 0.0:
            want = [0] * len(r["embedding"])
        else:
            want = [
                int(min(max(math.floor(x / s + 0.5), -127.0), 127.0))
                for x in r["embedding"]
            ]
        assert list(r["codes"]) == want, r["vec_id"]
        assert r["scale"] == s


def test_stored_search_matches_scan_form_exactly(spark, emb, store):
    for k, shortlist in ((10, 50), (5, 25)):
        scan_form = ann_int8(emb, QV_MAIN, k=k, shortlist=shortlist).collect()
        stored = search_stored_int8(
            spark, store, QV_MAIN, k=k, shortlist=shortlist
        ).collect()
        assert [(r["vec_id"], r["score"]) for r in scan_form] == [
            (r["vec_id"], r["score"]) for r in stored
        ], (k, shortlist)


def test_shortlist_scan_excludes_embedding(spark, store):
    """The 100 TB point of the store: the shortlist pass reads codes +
    scale (~dim + 8 bytes/row), and only the broadcast-joined rerank
    scan touches the f64 embedding."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "8192")
    try:
        df = search_stored_int8(spark, store, QV_MAIN, k=10, shortlist=50)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(schemas) >= 2, f"expected two store scans: {schemas}"
    code_scans = [s for s in schemas if "codes" in s]
    emb_scans = [s for s in schemas if "embedding" in s]
    assert code_scans, f"no code scan: {schemas}"
    assert emb_scans, f"no rerank scan: {schemas}"
    for s in code_scans:
        assert "embedding" not in s, f"shortlist scan reads embedding: {s}"
    for s in emb_scans:
        assert "codes" not in s and "scale" not in s, (
            f"rerank scan reads code columns: {s}"
        )
    assert "BroadcastHashJoin" in plan


def test_zero_vector_roundtrip(spark, tmp_path_factory):
    """A zero vector stores zero codes / zero scale and never NaN-taints
    the shortlist ordering."""
    path = str(tmp_path_factory.mktemp("int8z") / "store")
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])],
        schema="vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    write_int8_store(df, path)
    rows = {r["vec_id"]: r for r in spark.read.parquet(path).collect()}
    assert list(rows[1]["codes"]) == [0, 0] and rows[1]["scale"] == 0.0
    assert list(rows[2]["codes"]) == [64, -127]
    got = search_stored_int8(spark, path, [1.0, 0.0], k=2, shortlist=2)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids[0] == 2  # the real vector outranks the zero vector


def test_search_stored_dim_mismatch_raises(spark, store):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stored code dim"):
        search_stored_int8(spark, store, [1.0, 0.0], k=2, shortlist=2)


def test_scan_form_dim_guard_fires_both_directions(spark, emb):
    """ann_int8's in-plan guard must fail loudly when the query is
    LONGER *or* SHORTER than the embeddings — a short query would
    otherwise silently score a prefix dot product (r12 ADVICE), which
    search_stored_int8's `!=` sidecar guard already rejects."""
    dim = len(emb.select("embedding").first()[0])
    for bad in ([0.1] * (dim + 1), [0.1] * (dim - 1)):
        with pytest.raises(Exception, match="dimension mismatch"):
            ann_int8(emb, bad, k=2, shortlist=4).collect()


def test_dim_guard_sidecar_and_sampling_fallback(spark, emb, tmp_path_factory):
    """The write pass records the code dim in a _meta.json sidecar, so
    the search guard costs zero Spark jobs; a pre-sidecar store (sidecar
    deleted) must fall back to the sampling guard with the SAME
    ValueError — and valid searches must work through both paths."""
    import os

    from gistdex_spark.sources.store_meta import read_store_meta

    path = str(tmp_path_factory.mktemp("int8meta") / "store")
    write_int8_store(emb, path)
    meta = read_store_meta(path)
    dim = len(emb.select("embedding").first()[0])
    assert meta == {"dim": dim}
    ok = search_stored_int8(spark, path, [0.1] * dim, k=2, shortlist=4)
    assert len(ok.collect()) == 2
    with pytest.raises(ValueError, match="stored code dim"):
        search_stored_int8(spark, path, [0.1] * (dim + 1), k=2)
    os.remove(os.path.join(path, "_meta.json"))
    assert read_store_meta(path) is None
    ok2 = search_stored_int8(spark, path, [0.1] * dim, k=2, shortlist=4)
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, ok2.collect()))
    with pytest.raises(ValueError, match="stored code dim"):
        search_stored_int8(spark, path, [0.1] * (dim + 1), k=2)
