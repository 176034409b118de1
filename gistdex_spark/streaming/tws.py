"""Spark 4 `transformWithStateInPandas` operator: live per-user running
totals with typed ValueState.

`applyInPandasWithState` (streaming/stateful.py) is the Spark 3.x-era
arbitrary-state API; Spark 4 replaces it with StatefulProcessor +
transformWithStateInPandas — typed state handles (ValueState/ListState/
MapState), TTL support, and an Arrow-batched exchange. This module keeps
one running (count, total_value) per user, the streaming analogue of the
batch `salted_user_totals` / per-user aggregates.

Requires the RocksDB state store provider (the only provider the TWS
operator supports) AND the `google.protobuf` package (the TWS Python
driver worker's control channel is protobuf-encoded). When the real
protobuf wheel is installed it is used as-is; on clusters without it the
vendored minimal runtime in `gistdex_spark/vendor/protoshim/` (a PEP-420
`google.protobuf` namespace portion that implements just the wire
features the TWS control channel uses) un-gates the operator — so
tests/test_tws.py RUNS in this container. The applyInPandasWithState
sessionizer (stateful.py) remains the Spark 3.x-era surface.

Scale: state is keyed by user_id and lives in the shuffle partition that
owns the key — on a 1000-executor cluster each key's RocksDB instance is
local, and snapshots/changelogs go to the checkpoint location.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState(count, total) per user; emits the updated running
    totals for every user seen in the micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = 0
        total = 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        if self._totals.exists():
            prev_n, prev_total = self._totals.get()
            n += int(prev_n)
            total += float(prev_total)
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) via transformWithStateInPandas."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_tws(stream_df: DataFrame, query_name: str):
    """Start a TWS query into a memory sink with the RocksDB provider.

    The provider MUST be a session conf — Spark reads
    ``spark.sql.streaming.stateStore.providerClass`` from SQLConf only;
    a ``writeStream.option(...)`` is a sink option and is silently
    ignored. Set it here (runtime-settable) rather than asking every
    caller to remember."""
    stream_df.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
