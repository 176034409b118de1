"""Misra-Gries heavy hitters: the mergeable-summary guarantee (no false
negatives above n/(k+1), lower bounds never exceed true counts) must hold
on skewed data and be independent of partitioning."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from gistdex_spark.operators.heavyhitters import misra_gries_candidates


def _skewed_rows(n: int, seed: int = 7) -> list[tuple[str]]:
    # zipf-ish: few heavy items, long tail of singletons
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            rows.append(("alpha",))
        elif r < 0.45:
            rows.append(("beta",))
        elif r < 0.55:
            rows.append(("gamma",))
        else:
            rows.append((f"tail_{i}",))
    return rows


def _check_guarantee(spark, rows, k, parts):
    df = spark.createDataFrame(rows, schema="item string").repartition(parts)
    n = len(rows)
    exact: dict[str, int] = {}
    for (it,) in rows:
        exact[it] = exact.get(it, 0) + 1
    cand = {r["item"]: r["lb"] for r in misra_gries_candidates(df, "item", k).collect()}
    thresh = n / (k + 1)
    for item, c in exact.items():
        if c > thresh:
            assert item in cand, f"{item} (count {c} > {thresh}) missed"
    for item, lb in cand.items():
        assert 1 <= lb <= exact[item], (item, lb, exact[item])


def test_mg_no_false_negatives_above_threshold(spark):
    _check_guarantee(spark, _skewed_rows(5000), k=16, parts=4)


def test_mg_guarantee_is_partition_independent(spark):
    rows = _skewed_rows(3000, seed=13)
    for parts in (1, 7):
        _check_guarantee(spark, rows, k=8, parts=parts)


def test_mg_tiny_k_forces_decrements_but_keeps_heavies(spark):
    # k=2 with three heavy items: decrements must fire constantly, yet the
    # single dominant item (50% of the stream) can never be evicted for long
    rows = [("dom",)] * 500 + [(f"x{i}",) for i in range(500)]
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame(rows, schema="item string").repartition(2)
    cand = {
        r["item"]: r["lb"]
        for r in misra_gries_candidates(df, "item", k=2).collect()
    }
    assert "dom" in cand  # 500 > 1000/3
    assert cand["dom"] <= 500


def test_mg_summary_is_bounded_per_partition(spark):
    # every partition emits <= k rows before the merge agg — on data where
    # counters SURVIVE (heavy repeats + tail), so the bound is exercised
    # non-vacuously; all-singleton data would evict everything and pass
    # with 0 rows no matter how broken the operator
    rows = [(f"h{i % 40}",) for i in range(4_000)] + [
        (f"u{i}",) for i in range(6_000)
    ]
    df = spark.createDataFrame(rows, schema="item string").repartition(5)
    n = misra_gries_candidates(df, "item", k=32).count()
    assert 0 < n <= 5 * 32
