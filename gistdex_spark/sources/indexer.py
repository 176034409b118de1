"""Ingestion pipeline (SURVEY.md §2.1 S1-S6, J7, S9).

Reference flow (`src/core/indexer/indexer.ts:40-282`): text → chunk →
embed → assign source_id/chunk_index → save. Re-expressed Spark-first:

    read (wholetext / literal DF)
      → chunk_documents (mapInPandas UDTF, narrow)
      → embed pandas_udf (Arrow batches — the reference's <=100-per-request
        batching becomes columnar batch inference)
      → deterministic ids (sha2(source_id || chunk_index) — testable,
        unlike the reference's randomUUID, `database-service.ts:103-119`)
      → write parquet partitioned by source_type

The writer replaces the reference's sequential per-row inserts
(`common-operations.ts:8-18`) with one bulk columnar write — the single
biggest scale win called out in SURVEY.md §4.

Incremental indexing (J7, `doc-service.ts:54-74`): files-on-disk LEFT ANTI
already-indexed file paths. Delete + source GC (S9,
`sqlite-storage-operations.ts:147-177`): anti-join rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gistdex_spark.functions.embedder import embed_udf
from gistdex_spark.operators.chunking import chunk_documents, optimal_chunk_settings

CHUNKS_TABLE = "chunks"
SOURCES_TABLE = "sources"


def index_text_df(
    texts: DataFrame,
    strategy: str = "fixed",
    size: int = 1000,
    overlap: int = 200,
    dim: int = 64,
    embedder=None,
) -> DataFrame:
    """S1: (source_id, content[, source_type, title, url]) → chunk rows with
    embeddings and deterministic ids. Pure narrow pipeline — no shuffle.

    ``embedder`` injects any UDF with the ``embed_udf`` contract
    (STRING -> ARRAY<FLOAT>, Arrow-batched) — e.g. a fitted
    ``Word2VecEmbedder.udf()`` or ``sentence_transformer_embed_udf`` —
    without touching the pipeline; default is the deterministic test
    embedder."""
    chunks = chunk_documents(texts, strategy=strategy, size=size, overlap=overlap)
    meta_cols = [c for c in ("source_type", "title", "url", "file_path") if c in texts.columns]
    # The reference stores originalContent once per source (`indexer.ts:
    # 110-112`) and surfaces it on chunk 0; same here — chunk 0 carries the
    # verbatim original so reconstruction can skip the overlap fold.
    extra = texts.select(
        F.col("source_id").cast("string").alias("source_id"),
        F.col("content").alias("original_content"),
        *meta_cols,
    )
    chunks = chunks.join(F.broadcast(extra), "source_id").withColumn(
        "original_content",
        F.when(F.col("chunk_index") == 0, F.col("original_content")),
    )
    return (
        chunks.withColumn(
            "id",
            F.sha2(F.concat_ws("#", F.col("source_id"), F.col("chunk_index")), 256),
        )
        .withColumn(
            "embedding",
            (embedder if embedder is not None else embed_udf(dim))(
                F.col("content")
            ),
        )
        .withColumn("created_at", F.current_timestamp())
    )


def index_files(
    spark: SparkSession,
    glob_path: str,
    strategy: str | None = None,
    dim: int = 64,
    base_dir: str | None = None,
    allowed_base_paths: tuple[str, ...] | None = None,
    validate: bool = True,
    size: int | None = None,
    overlap: int | None = None,
) -> DataFrame:
    """S2/S3: read whole files (Spark globs natively), chunk per-extension.

    ``input_file_name`` is the source identity; chunk settings follow the
    X13 optimizer for the glob's dominant extension when not forced.

    Security gate (`security.ts:48-183`, wired like `indexer.ts:213`): the
    glob's static prefix is validated for traversal / system dirs /
    base-path containment before any read. Spark's reader only emits files
    under that (symlink-resolved) prefix, so one driver-side check covers
    every match — no per-file validation loop at scale.
    """
    if validate:
        from gistdex_spark.sources.security import (
            DEFAULT_SAFE_BASE_PATHS,
            validate_file_path,
        )

        wild = min(
            (i for i in (glob_path.find(c) for c in "*?[") if i >= 0),
            default=-1,
        )
        prefix = glob_path if wild < 0 else os.path.dirname(glob_path[:wild])
        validate_file_path(
            prefix or ".", base_dir, allowed_base_paths or DEFAULT_SAFE_BASE_PATHS
        )
    raw = (
        spark.read.text(glob_path, wholetext=True)
        .withColumn("file_path", F.input_file_name())
        .select(
            F.col("file_path").alias("source_id"),
            "file_path",
            F.col("value").alias("content"),
            F.lit("file").alias("source_type"),
        )
    )
    ext = os.path.splitext(glob_path)[1] or ".txt"
    opt_size, opt_overlap = optimal_chunk_settings(ext)
    # explicit size/overlap win over the X13 optimizer, matching the
    # reference's option precedence (indexer.ts: user options override
    # the chunk optimizer)
    size = size if size is not None else opt_size
    overlap = overlap if overlap is not None else opt_overlap
    strat = strategy or (
        "markdown" if ext in (".md", ".mdx") else ("code" if ext in (".py", ".ts", ".js") else "fixed")
    )
    return index_text_df(raw, strategy=strat, size=size, overlap=overlap, dim=dim)


def write_chunk_store(
    chunks: DataFrame, path: str, mode: str = "append", provider: str = "parquet"
) -> None:
    """S6 sink: bulk columnar write, partitioned by source_type when present.

    ``provider`` selects a registered storage adapter (UDF-2,
    `registry.ts:23-140`): parquet default, orc/json/csv/memory built in,
    delta when the package is present.

    At 100 TB: partition by a low-cardinality routing key only; file sizing
    is left to maxPartitionBytes + AQE coalesce on the read side.
    """
    from gistdex_spark.sources.adapters import DEFAULT_REGISTRY

    DEFAULT_REGISTRY.create({"provider": provider}).write(chunks, path, mode)


def write_chunk_store_bucketed(
    chunks: DataFrame,
    table: str,
    buckets: int = 16,
    mode: str = "append",
) -> None:
    """S6 at cluster scale: a BUCKETED chunk table (hash(source_id) →
    fixed bucket files). Joins and aggregations keyed on source_id — the
    reconstruction fold, source GC, per-source stats, chunks⟕sources —
    then read co-located data and skip their shuffle entirely (plan-pinned
    by test_bucketed_join_has_no_shuffle). At 100 TB that's the difference
    between a full-corpus exchange per query and none.

    Catalog-managed (saveAsTable): Spark's native bucketing only survives
    through a table, not a bare path.
    """
    (
        chunks.write.mode(mode)
        .bucketBy(buckets, "source_id")
        .sortBy("source_id", "chunk_index")
        .format("parquet")
        .saveAsTable(table)
    )


def sources_from_chunks(chunks: DataFrame) -> DataFrame:
    """Derive the `sources` table: one row per source (the reference hoists
    originalContent out of chunk 0 — `indexer.ts:110-112`)."""
    cols = [
        F.first(c, ignorenulls=True).alias(c)
        for c in ("source_type", "title", "url", "file_path", "original_content")
        if c in chunks.columns
    ]
    return chunks.groupBy("source_id").agg(
        F.max("total_chunks").alias("total_chunks"),
        F.min("created_at").alias("created_at"),
        *cols,
    )


def incremental_filter(
    candidates: DataFrame, indexed_chunks: DataFrame, key: str = "file_path"
) -> DataFrame:
    """J7: drop candidates whose key already exists in the chunk store.

    LEFT ANTI against the distinct indexed keys; at scale the distinct is a
    cheap pre-aggregated shuffle and the anti-join broadcasts when small.
    """
    seen = indexed_chunks.select(key).distinct()
    return candidates.join(seen, key, "left_anti")


def delete_sources(chunks: DataFrame, source_ids: list[str]) -> DataFrame:
    """S9 rewrite: deletion = anti-join; source GC falls out for free since
    `sources` is derived from the surviving chunks."""
    return chunks.filter(~F.col("source_id").isin(source_ids))


def write_sorted_store(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted-on-write layout: rows are range-split on
    ``sort_col`` and sorted inside each output file, so every parquet
    footer carries DISJOINT min/max stats on that column.

    This is the zone-map play for 100 TB scans: a predicate on the sort
    column lets the reader drop whole files/row-groups from the footer
    stats alone, before any IO — the same reason time-series stores sort
    on event time. repartitionByRange samples the column to build
    balanced range bounds (one shuffle), sortWithinPartitions is a local
    sort, and no global sort ever happens.
    """
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )
