"""Bloom-filter semi-join pruning: the no-false-negative contract, a
measurable false-positive rate near theory, and the map-side plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from gistdex_spark.operators.bloom import (
    bloom_prefilter,
    build_bloom,
    might_contain,
)


def test_no_false_negatives(spark):
    keys = spark.createDataFrame(
        [(i * 37,) for i in range(500)], schema="k BIGINT"
    )
    fact = spark.createDataFrame(
        [(i,) for i in range(20_000)], schema="fk BIGINT"
    )
    kept = bloom_prefilter(fact, keys, "fk", "k", m_bits=4096, n_hashes=4)
    member_ids = {i * 37 for i in range(500) if i * 37 < 20_000}
    got = {r["fk"] for r in kept.collect()}
    assert member_ids <= got, "a bloom filter must never drop a member"


def test_false_positive_rate_is_bounded(spark):
    # 500 keys * 4 hashes into 4096 bits => fill ~ 0.39, theoretical fpr
    # ~ (1 - e^(-2000/4096))^4 ~ 2.3%; assert an order-of-magnitude bound
    keys = spark.createDataFrame(
        [(i,) for i in range(500)], schema="k BIGINT"
    )
    non_members = spark.createDataFrame(
        [(i,) for i in range(100_000, 120_000)], schema="fk BIGINT"
    )
    kept = bloom_prefilter(
        non_members, keys, "fk", "k", m_bits=4096, n_hashes=4
    ).count()
    assert kept / 20_000 < 0.10, f"fp rate {kept / 20_000:.3f} way over theory"
    assert kept > 0, "a 39%-full filter with 20k probes should see some fps"


def test_probe_is_mapside_no_shuffle(spark):
    keys = spark.createDataFrame([(1,), (2,)], schema="k BIGINT")
    fact = spark.createDataFrame([(i,) for i in range(100)], schema="fk BIGINT")
    bloom = build_bloom(keys, "k", m_bits=1024, n_hashes=3)
    probed = fact.crossJoin(F.broadcast(bloom)).filter(
        might_contain(F.col("bf"), F.col("fk"), 1024, 3)
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the fact side must reach the probe without any exchange
    fact_side = plan.split("BroadcastNestedLoopJoin")[1].split(
        "BroadcastExchange"
    )[0]
    assert "Exchange hashpartitioning" not in fact_side
