"""Stream-stream joins with watermark-bounded state.

A purchases stream joined to a views stream on user + a time band: Spark
buffers each side's state only within the watermark horizon, so state is
bounded regardless of stream length — the streaming analogue of
operators/temporal.interval_join. Both inputs must carry event-time
watermarks or the state store would grow without bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Pair every left event with the right events of the same key whose
    timestamp falls in [left.ts - lookback, left.ts]. Emits
    (key, l_event_id, l_ts, r_event_id, r_ts).

    ``how="inner"`` drops unmatched left rows as they expire.
    ``how="leftOuter"`` emits them with NULL right columns — but only
    once the GLOBAL watermark (min of both sides') passes the row's join
    horizon, because until then a matching right row could still arrive;
    and Spark emits those expired rows in the batch AFTER the watermark
    crossing, so a drained availableNow run can leave them pending until
    the next batch (tests/test_stream_join.py drives this with clock
    ticks). State on both sides stays watermark-bounded either way."""
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = right.withWatermark(ts_col, watermark).alias("r")
    cond = F.expr(
        f"l.{on} = r.{on} AND r.{ts_col} >= l.{ts_col} - INTERVAL {lookback}"
        f" AND r.{ts_col} <= l.{ts_col}"
    )
    return lw.join(rw, cond, how).select(
        F.col(f"l.{on}").alias(on),
        F.col("l.event_id").alias("l_event_id"),
        F.col(f"l.{ts_col}").alias("l_ts"),
        F.col("r.event_id").alias("r_event_id"),
        F.col(f"r.{ts_col}").alias("r_ts"),
    )
