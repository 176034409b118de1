"""Streaming ingestion: a document stream indexed into the chunk store.

``foreachBatch`` is the right tool because the ingest pipeline needs two
things a pure streaming sink can't do: the incremental anti-join against
the EXISTING store (skip already-indexed sources, reference behavior J7)
and the batch writer's partitioned layout. Each micro-batch runs the
identical batch pipeline — chunk, embed, id, append — so stream ingest
and batch ingest produce byte-identical stores.

Exactly-once: the anti-join dedupes re-delivered sources against the
store itself, so a replayed micro-batch is a no-op — idempotent without
relying on sink-side transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_index(
    texts: DataFrame,
    store_path: str,
    dim: int = 64,
    strategy: str = "fixed",
    size: int = 1000,
    overlap: int = 200,
    checkpoint_dir: str | None = None,
    query_name: str = "stream_index",
):
    """Start an AvailableNow ingestion of a streaming (source_id, content
    [, source_type]) frame into the chunk store at ``store_path``.
    Returns the StreamingQuery; callers awaitTermination()."""
    from gistdex_spark.api import GistdexSpark

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        engine = GistdexSpark(batch_df.sparkSession, store_path, dim=dim)
        engine.index_text(
            batch_df,
            strategy=strategy,
            size=size,
            overlap=overlap,
            incremental=True,
        )

    writer = (
        texts.writeStream.foreachBatch(ingest_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
