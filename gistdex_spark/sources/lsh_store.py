"""Multi-table LSH store at rest: bucket ids as columns, probes as
partition pruning (table 0) + pushed int-column predicates (tables 1+).

operators/similarity.ann_lsh_multitable claims the 100 TB probe story —
"at rest, store the L bucket ids as tiny int columns (derivable at
write time): each table's probe is then partition/Z-order pruning, and
the union reads L × (probed buckets) instead of the corpus". This
module is that claim as exercised code:

- ``write_lsh_store`` derives the L bucket ids in the write pass (one
  map-only projection — sign arithmetic, no shuffle beyond the layout
  repartition) and hive-partitions the table by ``b0``. One partition
  key is the Spark-native layout limit (nesting all L would explode the
  directory count to 2^(L·nbits)); the remaining b1..b(L-1) land as
  plain INT columns whose parquet min/max row-group stats the pushed
  IN-filters skip by. On an engine with Z-order/liquid clustering,
  cluster by (b0, b1, b2, ...) instead — same columns, same predicates.
- ``search_stored`` rebuilds the union-of-probes candidate filter over
  the STORED columns: the b0 IN-list is a partition predicate
  (PartitionFilters — directories pruned before IO), the b1+ IN-lists
  are data predicates on int columns (PushedFilters — row-group
  skipping), and crucially the embedding column is never touched until
  the exact rerank of survivors.

``tests/test_lsh_store.py`` asserts the frame equals the scan-form
``ann_lsh_multitable`` exactly, that PartitionFilters carries the b0
IN-list, that PushedFilters carries the b1+ IN-lists, and — via
``input_file_name()`` — that a b0-only probe reads ONLY the probed
directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gistdex_spark.operators.similarity import probe_buckets, sign_bucket


def write_lsh_store(
    emb: DataFrame,
    path: str,
    nbits: int = 6,
    n_tables: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Derive the L bucket ids and write hive-partitioned by ``b0``.

    The layout repartition on ``b0`` gives each bucket directory its own
    files (without it every task writes a sliver of every bucket —
    2^nbits × tasks small files, the anti-pattern compact_store exists
    to undo).

    Raises the same dimension-vs-tables ValueError the scan forms
    enforce (r10 ADVICE): out-of-range ``vec[i]`` is NULL in Catalyst,
    so without the guard higher tables' bits would silently write as 0
    and the degenerate store would only fail at search time.
    """
    first = emb.select(embedding_col).first()
    if first is not None and n_tables * nbits > len(first[0]):
        raise ValueError(
            f"{n_tables} tables x {nbits} bits need {n_tables * nbits} "
            f"dims; embedding has {len(first[0])}"
        )
    with_buckets = emb.select(
        id_col,
        embedding_col,
        *[
            sign_bucket(embedding_col, nbits, offset=t * nbits).alias(f"b{t}")
            for t in range(n_tables)
        ],
    )
    (
        with_buckets.repartition("b0")
        .write.mode(mode)
        .partitionBy("b0")
        .parquet(path)
    )


def search_stored(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 5,
    nbits: int = 6,
    n_tables: int = 10,
    radius: int = 1,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
) -> DataFrame:
    """Multi-table probe over the stored bucket columns: identical
    candidate set (and therefore identical top-k) to the scan-form
    ``ann_lsh_multitable``, but the bucket arithmetic is PRE-PAID — the
    filter touches only the partition column and L-1 stored ints, so
    pruning happens before the embedding column is read."""
    from gistdex_spark.functions.vectors import cosine

    cond = None
    for t in range(n_tables):
        probes = probe_buckets(query_vec, nbits, radius, offset=t * nbits)
        c = F.col(f"b{t}").isin(probes)
        cond = c if cond is None else (cond | c)
    qlit = F.lit([float(x) for x in query_vec])
    scan = spark.read.parquet(path).filter(cond)
    return (
        scan.withColumn("score", F.round(cosine(embedding_col, qlit), 6))
        .select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
