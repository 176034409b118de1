"""Stream-stream interval join == the equivalent batch join on the same
input (Dataflow invariant). Purchases x views within a 1-hour lookback per
user, AvailableNow trigger, memory sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from gistdex_spark.sources.tables import load_table
from gistdex_spark.streaming.events import as_event_time, run_availablenow
from gistdex_spark.streaming.joins import stream_interval_join

SF = "/root/testdata/sf0.001"


def _event_stream(spark, etype):
    batch = load_table(spark, SF, "events")
    stream = (
        spark.readStream.schema(
            spark.read.parquet(f"{SF}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF)
    )
    stream, batch = as_event_time(stream), as_event_time(batch)
    pick = lambda df: df.filter(F.col("event_type") == etype).select(  # noqa: E731
        "user_id", "event_id", "ts"
    )
    return pick(stream), pick(batch)


def test_stream_interval_join_matches_batch(spark):
    p_stream, p_batch = _event_stream(spark, "purchase")
    v_stream, v_batch = _event_stream(spark, "view")

    q = run_availablenow(
        stream_interval_join(p_stream, v_stream),
        "stream_join_test",
        "append",
    )
    q.awaitTermination(180)
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM stream_join_test").collect()
    }

    l, r = p_batch.alias("l"), v_batch.alias("r")
    cond = F.expr(
        "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 1 hour"
        " AND r.ts <= l.ts"
    )
    expected = {
        (row["l_event_id"], row["r_event_id"])
        for row in l.join(r, cond, "inner")
        .select(
            F.col("l.event_id").alias("l_event_id"),
            F.col("r.event_id").alias("r_event_id"),
        )
        .collect()
    }
    assert expected, "batch join found no pairs — lookback too narrow?"
    assert got == expected
