"""AQE skew-join handling: a hot key must split into parallel subtasks
(SortMergeJoin(skew=true)) instead of serializing one giant partition —
the runtime defense the 100 TB design leans on for skewed group keys.
Thresholds are lowered so local-scale data crosses them; the mechanism
is identical at production sizes."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from gistdex_spark.plans.inspect import final_plan

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.join.preferSortMergeJoin": "true",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # half the left side lands on key 0 — a pathological hot key
        left = spark.range(400_000).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        j = left.join(right, "k")
        plan = final_plan(j)
        assert re.search(r"SortMergeJoin\(skew=true\)", plan), (
            "hot key did not trigger the AQE skew split"
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_plain_join(spark):
    """salted_join must be row-for-row identical to the plain equi-join."""
    from pyspark.sql import functions as F

    from gistdex_spark.operators.temporal import salted_join
    from gistdex_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    )
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_n"))
    plain = ev.join(dim, "user_id").orderBy("event_id").collect()
    salted = (
        salted_join(ev, dim, "user_id", n_salts=8).orderBy("event_id").collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]
