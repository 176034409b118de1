"""Testdata schema canary.

The driver regenerates /root/testdata per round and has already changed a
physical type once (events.ts nanos → micros-NTZ, which broke round 2's
bench on the driver's session). This test pins the COLUMN SETS of all ten
tables and the normalized type of every timestamp-ish column, so the next
regeneration that moves the contract fails here with a readable diff
instead of deep inside a query.
"""

from __future__ import annotations

import pytest

from gistdex_spark.sources.tables import TABLES, load_table
from tests.conftest import SF_SMOKE

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("table", TABLES)
def test_table_columns_match_contract(spark, table):
    df = load_table(spark, SF_SMOKE, table)
    assert set(df.columns) == EXPECTED_COLUMNS[table], (
        f"{table}: testdata columns drifted — update queries/oracles, "
        f"got {sorted(df.columns)}"
    )


def test_events_ts_normalized_to_ntz(spark):
    from pyspark.sql.types import TimestampNTZType

    df = load_table(spark, SF_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType), (
        "load_table must normalize events.ts to TIMESTAMP_NTZ regardless "
        f"of the file's physical type; got {df.schema['ts'].dataType}"
    )
