"""Query-cache write path + structured-knowledge store.

Reference semantics: `src/mcp/utils/query-cache.ts:65-129`
(saveSuccessfulQuery — upsert keyed by (query, strategy), top-3 result
summary, capacity-100 eviction) and `src/mcp/utils/structured-knowledge.ts:5-67`
(topic-keyed knowledge entries rendered to markdown, latest write wins).

Spark-first: both stores are APPEND-ONLY parquet logs; "current state" is
a latest-wins view (max-struct per key) plus a recency-eviction limit —
the same MERGE-free upsert pattern as `upsert_latest_wins`. Writes are
single-row appends (no read-modify-write race like the reference's
JSON-file rewrite); the views compact on read. On a real cluster the same
log/view pair rides on Delta/Iceberg unchanged.

Eviction-order delta vs the reference, documented: the reference keeps an
in-memory list where an upsert REPLACES IN PLACE (an entry keeps its
original list position), then slices the last 100 positions. A log has no
positions; we evict by most-recent write per key — the recency semantic
the reference's "keep only the last 100 queries" comment intends, and the
standard cache behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CACHE_VERSION = "1.0.0"
CACHE_CAPACITY = 100

QUERY_CACHE_SCHEMA = StructType(
    [
        StructField("version", StringType()),
        StructField("query", StringType()),
        StructField("strategy", StringType()),
        StructField("use_section", StringType()),
        StructField("use_full", StringType()),
        StructField("timestamp", StringType()),
        StructField("seq", LongType()),
        StructField("results_count", LongType()),
        StructField("result_summary", StringType()),
    ]
)

KNOWLEDGE_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("content", StringType()),
        StructField("metadata_json", StringType()),
        StructField("last_updated", StringType()),
        StructField("seq", LongType()),
    ]
)


def result_summary(results: list[dict], top: int = 3) -> str:
    """Top-N "source (score)" summary (`query-cache.ts:77-97`): source is
    the basename of metadata title/filePath, else sourceType, else
    'unknown'; score renders at 3 dp. Runs on an already-collected top-k
    result list (driver-side, bounded)."""
    parts = []
    for r in results[:top]:
        meta = r.get("metadata") or {}
        title = meta.get("title")
        file_path = meta.get("filePath") or meta.get("file_path")
        if title:
            source = title.rsplit("/", 1)[-1] or title
        elif file_path:
            source = file_path.rsplit("/", 1)[-1] or file_path
        elif meta.get("sourceType") or meta.get("source_type"):
            source = meta.get("sourceType") or meta.get("source_type")
        else:
            source = "unknown"
        parts.append(f"{source} ({r['score']:.3f})")
    return ", ".join(parts)


def append_query_cache(
    spark: SparkSession,
    store_path: str,
    query: str,
    strategy: str,
    results: list[dict],
    timestamp: str,
    seq: int,
    use_section: bool | None = None,
    use_full: bool | None = None,
) -> None:
    """Record a successful query (`query-cache.ts:65-129`) as a log append."""
    row = (
        CACHE_VERSION,
        query,
        strategy,
        None if use_section is None else str(bool(use_section)).lower(),
        None if use_full is None else str(bool(use_full)).lower(),
        timestamp,
        seq,
        len(results),
        result_summary(results),
    )
    spark.createDataFrame([row], schema=QUERY_CACHE_SCHEMA).write.mode(
        "append"
    ).parquet(store_path)


def query_cache_current(
    log: DataFrame, capacity: int = CACHE_CAPACITY
) -> DataFrame:
    """The live cache: latest record per (query, strategy), newest
    ``capacity`` keys kept.

    Scale shape: latest-wins is a single max-struct hash aggregation (one
    shuffle, no window); eviction is orderBy().limit() — a
    TakeOrderedAndProject heap, never a global sort.
    """
    latest = (
        log.filter(F.col("version") == CACHE_VERSION)
        .groupBy("query", "strategy")
        .agg(
            F.max(
                F.struct(
                    "seq", "timestamp", "use_section", "use_full",
                    "results_count", "result_summary",
                )
            ).alias("r")
        )
        .select(
            "query", "strategy", F.col("r.seq").alias("seq"),
            F.col("r.timestamp").alias("timestamp"),
            F.col("r.use_section").alias("use_section"),
            F.col("r.use_full").alias("use_full"),
            F.col("r.results_count").alias("results_count"),
            F.col("r.result_summary").alias("result_summary"),
        )
    )
    return latest.orderBy(F.desc("seq")).limit(capacity)


def compact_query_cache(
    spark: SparkSession, store_path: str, capacity: int = CACHE_CAPACITY
) -> int:
    """Rewrite the append log as its current view (latest-wins + capacity).

    The MERGE-free upsert pattern needs periodic compaction or the log
    grows without bound; this is the batch analogue of the reference's
    whole-file rewrite on every save (`query-cache.ts:118-124`), run once
    per maintenance window instead of once per write. Returns the surviving
    row count. On a lakehouse table this becomes OPTIMIZE/rewrite."""
    current = query_cache_current(spark.read.parquet(store_path), capacity)
    # restore the full log schema so the compacted store reads like a log
    log_rows = current.select(
        F.lit(CACHE_VERSION).alias("version"),
        *[f.name for f in QUERY_CACHE_SCHEMA.fields if f.name != "version"],
    )
    rows = log_rows.collect()  # <= capacity rows by construction
    spark.createDataFrame(rows, schema=QUERY_CACHE_SCHEMA).write.mode(
        "overwrite"
    ).parquet(store_path)
    return len(rows)


def append_knowledge(
    spark: SparkSession,
    store_path: str,
    topic: str,
    content: str,
    metadata_json: str,
    last_updated: str,
    seq: int,
) -> None:
    """Append one structured-knowledge entry (`structured-knowledge.ts:16-31`);
    topics are sanitized the reference's way (whitespace → underscore)."""
    import re

    row = (re.sub(r"\s+", "_", topic), content, metadata_json, last_updated, seq)
    spark.createDataFrame([row], schema=KNOWLEDGE_SCHEMA).write.mode(
        "append"
    ).parquet(store_path)


def knowledge_current(log: DataFrame) -> DataFrame:
    """Latest entry per topic (file-overwrite semantics), one hash agg."""
    return (
        log.groupBy("topic")
        .agg(
            F.max(F.struct("seq", "last_updated", "content", "metadata_json")).alias(
                "r"
            )
        )
        .select(
            "topic",
            F.col("r.content").alias("content"),
            F.col("r.metadata_json").alias("metadata_json"),
            F.col("r.last_updated").alias("last_updated"),
        )
    )


def knowledge_markdown(
    topic: str, content: str, metadata: dict, last_updated: str
) -> str:
    """Render an entry the reference's way (`structured-knowledge.ts:43-67`):
    content, separator, metadata section with capitalized keys; lists join
    with ', ', nested objects render as JSON."""
    import json

    lines = [content, "", "---", "", "## Metadata", "", f"Last Updated: {last_updated}"]
    for key, value in metadata.items():
        fkey = key[:1].upper() + key[1:]
        if isinstance(value, list):
            lines.append(f"{fkey}: {', '.join(str(v) for v in value)}")
        elif isinstance(value, dict):
            lines.append(f"{fkey}: {json.dumps(value)}")
        else:
            lines.append(f"{fkey}: {value}")
    return "\n".join(lines)
