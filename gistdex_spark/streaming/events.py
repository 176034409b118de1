"""Structured Streaming ingestion demo over the `events` table.

The reference is strictly batch (SURVEY.md §2.8) — this module is the
sanctioned extension: the incremental-indexing idea (J7) re-expressed as a
real stream. Batch equivalents of these aggregations live in
gistdex_spark/queries.py (events_hourly / events_sessionize) where the
DuckDB oracle checks them; the streaming forms are checked by
tests/test_streaming.py via in-memory sinks on the SAME input rows, so
batch and stream results must agree (the Dataflow-model invariant).

Scale notes: tumbling-window counts with a watermark bound state; the
dedup operator keeps only ids younger than the watermark. State store is
partitioned by group key — on a 1000-executor cluster each key's state is
local to its shuffle partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (LTZ) for watermarking.

    ``withWatermark`` rejects TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_
    TIMESTAMP_TYPE), and the driver testdata's physical type has changed
    across rounds (nanos LONG, then micros NTZ). Both conversions go
    through integer epoch micros — never a session-timezone cast — so the
    instant is the NTZ wall clock read as UTC, matching what every batch
    oracle computes."""
    from pyspark.sql.types import LongType, TimestampNTZType

    from gistdex_spark.functions.timeutil import epoch_us

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # floor division (see tables._normalize_events_ts): `div` truncates
        # toward zero and would drift 1µs from DuckDB on pre-epoch nanos
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(
                    f"({col} div 1000)"
                    f" - (case when {col} % 1000 < 0 then 1 else 0 end)"
                )
            ),
        )
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.timestamp_micros(epoch_us(col)))
    return df


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window per event_type; late rows beyond the watermark drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-event_id stream: dropDuplicates bounded by watermark."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_availablenow(stream_df: DataFrame, query_name: str, output_mode: str):
    """Drain all available input with Trigger.AvailableNow into a memory sink.

    AvailableNow processes the backlog in bounded batches then stops —
    the pattern for periodic incremental ingest jobs (vs a 24/7 cluster).
    """
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def sliding_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """SLIDING windows on the stream (1h width / 15min slide — every event
    lands in 4 windows, mirroring the batch `events_sliding_windows`).
    State is bounded by the watermark; window starts are emitted as epoch
    micros so the batch comparison is precision- and tz-proof."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark_stream(
    events: DataFrame, delay: str = "2 hours"
) -> DataFrame:
    """Spark 3.5+ dropDuplicatesWithinWatermark: unlike dropDuplicates
    (whose state for a key lives until the event-time column ages past the
    watermark), this guarantees state EVICTION once the key's first
    arrival is `delay` older than the max seen event time — the bounded-
    state contract a 24/7 dedup stream needs when duplicates always land
    within a known skew window."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str = "event_type"
) -> DataFrame:
    """Stream-static enrichment join: the static dimension broadcasts to
    every executor once per (re)plan and each micro-batch maps over it —
    no stream-side state at all (vs stream-stream joins). The standard
    shape for attaching slowly-changing reference data to a firehose."""
    return events.join(F.broadcast(dim), on, "left")
