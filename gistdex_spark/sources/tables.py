"""Test-table loaders (driver parquet) and the chunk-store layout.

At 100 TB the same loaders point at a partitioned object-store layout; the
loaders only express the scan — Catalyst handles column pruning and filter
pushdown, so callers should ``select``/``filter`` immediately after load.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS), which Spark's reader rejects unless
        # told to surface it as LONG nanos. Set at runtime so the read works
        # on ANY session (e.g. the correctness driver's), not just ours.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # With nanosAsLong the ts column arrives as LONG nanos — truncate to
    # micros (same floor DuckDB applies).
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG corpus: documents joined 1:1 to their embeddings.

    documents.doc_id == embeddings.vec_id in the driver testdata; this is
    the analogue of the reference's documents ⋈ vec_documents join
    (`sqlite-schema.ts:118-133`), which our engine otherwise eliminates by
    storing the vector as a column of the chunk row.
    """
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    return docs.join(embs, docs.doc_id == embs.vec_id, "inner").drop("vec_id")
