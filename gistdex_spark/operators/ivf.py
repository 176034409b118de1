"""IVF coarse quantizer: trained centroids, assignment, and cell probe.

The ANN role of the reference's full-scan cosine search (`search.ts` +
`vector-db` adapters) restructured for 100 TB: k-means|| centroids
partition the corpus into cells; a query scores only its nearest
``nprobe`` cells instead of every vector.

Scale design:
- TRAIN on a sample (MLlib k-means|| is itself distributed; centroids are
  tiny and broadcast from then on).
- ASSIGN is a ZERO-shuffle per-row argmax fold over the broadcast centroid
  array — map-only, linear in corpus size.
- At rest, write the corpus partitioned by ``cluster`` so a probe is
  partition PRUNING: nprobe=2 of k=1024 cells reads ~0.2% of the data.
- Cosine geometry: vectors are L2-normalized before clustering, where
  euclidean k-means is equivalent to spherical (cosine) k-means — same
  unit-sphere conversion as the BucketedRandomProjectionLSH path
  (`functions/mllib_embedder.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gistdex_spark.functions.vectors import cosine, normalize

ROUND = 6


def train_centroids(
    emb: DataFrame,
    k: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    embedding_col: str = "embedding",
    train_sample: int = 100_000,
) -> DataFrame:
    """Trained centroids as a tiny (c_id, c_vec) frame.

    Deterministic for a fixed seed. Callers persist this frame (parquet)
    and broadcast it everywhere else — training never reruns per query.

    Same bounded-sample posture as PQ codebook training (FAISS trains
    its coarse quantizer on a sample too): ONE distributed scan collects
    a deterministic-seed sample capped at ``train_sample`` rows, then a
    seeded in-memory k-means++ fit — centroid quality saturates at
    ~1k-10k points per centroid, and a full-corpus clustering job per
    index build is superlinear cost for no recall gain. Everything
    corpus-sized (assignment, probe) stays distributed.
    """
    import numpy as np

    from gistdex_spark.operators.pq import _kmeans_np

    normed = emb.select(normalize(F.col(embedding_col)).alias("v"))
    n = normed.count()
    if n > train_sample:
        normed = normed.sample(
            fraction=min(1.0, 1.1 * train_sample / n), seed=seed
        ).limit(train_sample)
    X = np.array([r["v"] for r in normed.collect()], dtype=np.float64)
    centers = [
        (i, [float(x) for x in c])
        for i, c in enumerate(_kmeans_np(X, k, seed, max_iter))
    ]
    return emb.sparkSession.createDataFrame(
        centers, schema="c_id BIGINT, c_vec ARRAY<DOUBLE>"
    )


def first_c_centroids(
    emb: DataFrame, c: int, id_col: str = "vec_id", embedding_col: str = "embedding"
) -> DataFrame:
    """The deterministic stand-in (first C vectors) kept for the DuckDB
    oracle, which cannot train k-means."""
    return emb.filter(F.col(id_col) < c).select(
        F.col(id_col).alias("c_id"), F.col(embedding_col).alias("c_vec")
    )


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """(id, embedding, cluster): nearest centroid by cosine, ties → lowest id.

    ZERO-shuffle: the centroid set rides along as ONE broadcast array row
    (sorted by c_id so a strictly-greater fold keeps the smallest id on
    ties), and every vector folds over it. No row amplification, no
    window. Norms are hoisted out of the fold — each centroid's norm is
    computed once into the broadcast row and the vector's own norm once
    per row, so the fold does ONE dot product per centroid instead of
    three (bit-identical scores: the same expressions, evaluated fewer
    times).

    ``partitions``: optional pre-repartition of the input. At cluster
    scale the scan's natural parallelism is the right answer (this is a
    map-only op — never pay a corpus shuffle for it); locally a small
    parquet file arrives as ONE partition and would serialize the fold,
    so callers benching tiny inputs pass the core count.
    """
    if partitions is not None:
        emb = emb.repartition(partitions)
    from gistdex_spark.functions.vectors import dot, l2_norm

    cents_arr = centroids.select(
        F.struct(
            F.col("c_id"), F.col("c_vec"), l2_norm(F.col("c_vec")).alias("c_nrm")
        ).alias("c")
    ).agg(F.array_sort(F.collect_list("c")).alias("cents"))
    init = F.struct(
        F.lit(-2.0).cast("double").alias("s"), F.lit(-1).cast("bigint").alias("cid")
    )

    def _merge(acc, c):
        s = F.when(
            (F.col("__ne") == F.lit(0.0)) | (c["c_nrm"] == F.lit(0.0)), F.lit(0.0)
        ).otherwise(
            dot(F.col(embedding_col), c["c_vec"]) / (F.col("__ne") * c["c_nrm"])
        )
        return F.when(
            s > acc["s"],
            F.struct(s.alias("s"), c["c_id"].cast("bigint").alias("cid")),
        ).otherwise(acc)

    return (
        emb.withColumn("__ne", l2_norm(F.col(embedding_col)))
        .crossJoin(F.broadcast(cents_arr))
        .withColumn("best", F.aggregate("cents", init, _merge))
        .select(id_col, embedding_col, F.col("best.cid").alias("cluster"))
    )


def probe(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Top-k by exact cosine inside the query's ``nprobe`` nearest cells.

    The cell choice scores only the tiny centroid frame; the corpus join
    is an equality join on ``cluster`` (partition pruning when the store
    is partitioned by it). Result: (id, score) ordered desc.
    """
    qlit = F.lit([float(x) for x in query_vec])
    qcells = (
        centroids.withColumn("qs", cosine("c_vec", qlit))
        .orderBy(F.desc("qs"), F.asc("c_id"))
        .limit(nprobe)
        .select(F.col("c_id").alias("cluster"))
    )
    probed = assigned.join(F.broadcast(qcells), "cluster")
    return (
        probed.withColumn("score", F.round(cosine(embedding_col, qlit), ROUND))
        .select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivf_search(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 1,
    n_centroids: int = 16,
    trained: bool = True,
    seed: int = 42,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """End-to-end IVF search. ``trained=True`` uses k-means|| centroids;
    ``trained=False`` keeps the first-C stand-in (oracle-comparable)."""
    cents = (
        train_centroids(emb, k=n_centroids, seed=seed, embedding_col=embedding_col)
        if trained
        else first_c_centroids(emb, n_centroids, id_col, embedding_col)
    )
    assigned = assign_clusters(emb, cents, id_col, embedding_col)
    return probe(assigned, cents, query_vec, k, nprobe, id_col, embedding_col)
