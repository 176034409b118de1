"""MLlib embedding path: TF-IDF embedder feeds the same search operators,
and BucketedRandomProjectionLSH finds the near-dup pairs the exact
pairwise join finds (high recall at small scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gistdex_spark.functions.mllib_embedder import TfidfEmbedder, mllib_lsh_neardup_pairs
from gistdex_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embedded(spark):
    docs = load_table(spark, SF, "documents")
    emb = TfidfEmbedder(dim=128).fit(docs)
    out = emb.transform(docs).select("doc_id", "text", "embedding")
    out.cache().count()
    return out


def test_embeddings_unit_norm(embedded):
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    rows = embedded.select(norm.alias("n")).collect()
    assert all(abs(r.n - 1.0) < 1e-9 or r.n == 0.0 for r in rows)


def test_tfidf_search_is_semantic(embedded, spark):
    """With real TF-IDF vectors, a query that reuses a document's words
    must rank that document first — true semantic behavior the hash
    embedder can't provide."""
    from gistdex_spark.queries import with_score

    target = embedded.orderBy("doc_id").first()
    qv = list(target.embedding)
    n = sum(x * x for x in qv) ** 0.5
    top = (
        with_score(embedded, qv, n)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score")
        .first()
    )
    assert top.doc_id == target.doc_id
    assert abs(top.score - 1.0) < 1e-6


def test_lsh_neardup_recall(embedded, spark):
    """LSH candidate pairs must recover ≥90% of the exact pairs at a
    moderate threshold on the small corpus."""
    from gistdex_spark.operators.dedup import embedding_neardup_pairs

    exact = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            embedded.select(F.col("doc_id").alias("vec_id"), "embedding"),
            threshold=0.35,
        ).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in mllib_lsh_neardup_pairs(
            embedded, threshold=0.35, num_hash_tables=5
        ).collect()
    }
    assert exact, "exact pass found no pairs — threshold too high for the fixture"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(exact)} exact pairs"
    # no false similarity values: approx cos must match exact formula
    for r in mllib_lsh_neardup_pairs(embedded, threshold=0.35).limit(5).collect():
        assert -1.0001 <= r.cos_sim <= 1.0001
