"""Stateful streaming sessionization must agree with the oracle-checked
batch sessionization on the same input when the whole input arrives as
one micro-batch (gap logic identical; state carries across batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gistdex_spark.sources.tables import load_table
from gistdex_spark.streaming.events import as_event_time
from gistdex_spark.streaming.stateful import sessionize_stream

SF = "/root/testdata/sf0.001"


def test_stateful_sessionize_matches_batch(spark):
    batch = load_table(spark, SF, "events")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{SF}/events.parquet").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF)
    )
    stream, batch = as_event_time(stream), as_event_time(batch)

    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # latest state per user (update mode may emit multiple rows per user)
    got = {
        r.user_id: (r.n_events, r.n_sessions)
        for r in spark.sql(
            """SELECT user_id, n_events, n_sessions FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM sessions_state) WHERE rn = 1"""
        ).collect()
    }

    from gistdex_spark.queries import REGISTRY

    expected = {
        str(r.user_id): (r.n_events, r.n_sessions)
        for r in REGISTRY["events_sessionize"](spark, SF).collect()
    }
    assert got == expected
