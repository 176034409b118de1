"""MLlib batch embedding generation: TF-IDF → L2-normalized dense vectors.

The reference calls a remote embedding API per batch of 100 texts
(`src/core/embedding/embedding.ts:17-123`). On a cluster the idiomatic
replacement is a fitted MLlib pipeline applied as one distributed
transform over the corpus — no API round-trips, no rate limits:

    Tokenizer → HashingTF(2^perm) → IDF (fit = one corpus pass) → L2 norm

The result rides in the same ``embedding ARRAY<DOUBLE>`` column as the
deterministic test embedder, so every search/dedup/ANN operator works
unchanged on either. (A production semantic model would slot into the
``embed_udf`` pandas_udf instead; this pipeline is the fully-local,
fully-deterministic scale path.)

Scale: fit() is one aggregation over the corpus (document frequencies);
transform() is a narrow map. Both stay inside the JVM.
"""

from __future__ import annotations

from pyspark.ml.feature import IDF, HashingTF, Normalizer, RegexTokenizer
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TfidfEmbedder:
    """Fit once on a corpus, then embed any DataFrame with a text column."""

    def __init__(self, dim: int = 256, min_doc_freq: int = 1):
        self.dim = dim
        self.min_doc_freq = min_doc_freq
        self._idf_model = None

    def fit(self, corpus: DataFrame, content_col: str = "text") -> "TfidfEmbedder":
        tf = self._tf_stage(corpus, content_col)
        self._idf_model = IDF(
            inputCol="__tf", outputCol="__tfidf", minDocFreq=self.min_doc_freq
        ).fit(tf)
        return self

    def _tf_stage(self, df: DataFrame, content_col: str) -> DataFrame:
        tok = RegexTokenizer(
            inputCol=content_col, outputCol="__tokens", pattern=r"\s+", toLowercase=True
        )
        htf = HashingTF(inputCol="__tokens", outputCol="__tf", numFeatures=self.dim)
        return htf.transform(tok.transform(df))

    def transform(
        self, df: DataFrame, content_col: str = "text", out_col: str = "embedding"
    ) -> DataFrame:
        """Attach a unit-normalized dense ARRAY<DOUBLE> embedding column."""
        if self._idf_model is None:
            raise RuntimeError("call fit() first")
        tf = self._tf_stage(df, content_col)
        tfidf = self._idf_model.transform(tf)
        normed = Normalizer(inputCol="__tfidf", outputCol="__vec", p=2.0).transform(
            tfidf
        )
        return normed.withColumn(out_col, vector_to_array(F.col("__vec"))).drop(
            "__tokens", "__tf", "__tfidf", "__vec"
        )


def mllib_lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup via MLlib BucketedRandomProjectionLSH.

    approxSimilarityJoin on UNIT vectors: euclidean distance d relates to
    cosine s by d² = 2(1-s), so a cosine threshold t becomes a distance
    threshold sqrt(2(1-t)). Returns (id_a, id_b, cos_sim) with a < b.

    This is the 100 TB path for `dedup_embedding_cosine` (the exact
    pairwise oracle): candidate pairs come from shared LSH buckets —
    an equality shuffle — never the O(n²) cross join.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    dist_threshold = (2.0 * (1.0 - threshold)) ** 0.5
    vec = df.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("v")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="__hashes", bucketLength=2.0,
        numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(vec)
    joined = model.approxSimilarityJoin(vec, vec, dist_threshold, distCol="dist")
    pairs = joined.select(
        F.col("datasetA.id").alias("id_a"),
        F.col("datasetB.id").alias("id_b"),
        (1.0 - F.col("dist") * F.col("dist") / 2.0).alias("cos_sim"),
    ).filter(F.col("id_a") < F.col("id_b"))
    return pairs
