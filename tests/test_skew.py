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


def test_band_skew_audit_trips_and_salting_fixes(spark):
    """End-to-end wire from the band_skew_audit tripwire to the skew
    treatments (r8 verdict item 7): a viral-template corpus (40 docs
    sharing boilerplate text) makes one simhash band bucket hot; the
    audit must flag it, and the round-robin bucket_partitions treatment
    must (a) appear in the plan as a RoundRobinPartitioning exchange and
    (b) change nothing about the emitted pairs."""
    import random

    from gistdex_spark.operators.dedup import (
        band_population_stats,
        simhash_banded_keys,
        simhash_pairs,
    )

    rng = random.Random(3)
    template = " ".join(
        "".join(rng.choice("abcdefgh") for _ in range(6)) for _ in range(30)
    )
    rows = [(f"hot{i:03d}", template) for i in range(40)]
    rows += [
        (
            f"cold{i:03d}",
            " ".join(
                "".join(rng.choice("nopqrstu") for _ in range(8))
                for _ in range(25)
            ),
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, schema="doc_id STRING, text STRING")
    audit = band_population_stats(
        simhash_banded_keys(df), ["band_idx", "band_val"], "simhash",
        salt_trip=32,
    ).collect()[0]
    assert audit.salt_recommended, audit
    assert audit.max_bucket >= 40  # every template doc lands in one band
    # treatment: round-robin bucket spread — pinned in the plan...
    treated = simhash_pairs(df, bucket_partitions=8)
    from gistdex_spark.plans.inspect import executed_plan

    assert "roundrobinpartitioning" in executed_plan(treated).lower()
    # ...and row-identical to the untreated operator
    plain = simhash_pairs(df)
    key = lambda r: (r.doc_id_a, r.doc_id_b, r.hamming)  # noqa: E731
    assert sorted(map(key, treated.collect())) == sorted(
        map(key, plain.collect())
    )


def _viral_corpus(spark, n_hot=40, n_cold=10):
    import random

    rng = random.Random(3)
    template = " ".join(
        "".join(rng.choice("abcdefgh") for _ in range(6)) for _ in range(30)
    )
    rows = [(f"hot{i:03d}", template) for i in range(n_hot)]
    rows += [
        (
            f"cold{i:03d}",
            " ".join(
                "".join(rng.choice("nopqrstu") for _ in range(8))
                for _ in range(25)
            ),
        )
        for i in range(n_cold)
    ]
    return spark.createDataFrame(rows, schema="doc_id STRING, text STRING")


def test_auto_salt_takes_round_robin_path_without_manual_knob(spark):
    """r9 verdict item 2: the audit-driven treatment must be automatic —
    auto_salt=True on a viral-template corpus round-robins the bucket
    frame with NO manual bucket_partitions, for both banded families,
    without changing the emitted pairs."""
    from gistdex_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
    from gistdex_spark.plans.inspect import executed_plan

    df = _viral_corpus(spark)
    auto = simhash_pairs(df, auto_salt=True, salt_trip=32)
    assert "roundrobinpartitioning" in executed_plan(auto).lower()
    key = lambda r: (r.doc_id_a, r.doc_id_b, r.hamming)  # noqa: E731
    assert sorted(map(key, auto.collect())) == sorted(
        map(key, simhash_pairs(df).collect())
    )
    auto_mh = minhash_lsh_pairs(df, auto_salt=True, salt_trip=32)
    assert "roundrobinpartitioning" in executed_plan(auto_mh).lower()
    key_mh = lambda r: (r.doc_id_a, r.doc_id_b, r.est_jaccard)  # noqa: E731
    assert sorted(map(key_mh, auto_mh.collect())) == sorted(
        map(key_mh, minhash_lsh_pairs(df).collect())
    )


def test_auto_salt_skips_exchange_on_clean_corpus(spark):
    """A corpus with no hot band bucket must NOT pay the round-robin
    exchange — the audit returns None and the plan stays knob-free."""
    from gistdex_spark.operators.dedup import simhash_pairs
    from gistdex_spark.plans.inspect import executed_plan

    df = _viral_corpus(spark, n_hot=2, n_cold=20)
    auto = simhash_pairs(df, auto_salt=True, salt_trip=32)
    assert "roundrobinpartitioning" not in executed_plan(auto).lower()


def test_auto_salt_survives_empty_corpus(spark):
    """The audit's bounded scalar is NULL on an empty frame — the
    decision must degrade to 'no treatment', not crash."""
    from gistdex_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    df = spark.createDataFrame([], schema="doc_id STRING, text STRING")
    assert simhash_pairs(df, auto_salt=True).count() == 0
    assert minhash_lsh_pairs(df, auto_salt=True).count() == 0
