"""Sketch surface: Spark's built-in Datasketches HLL aggregate. No DuckDB
oracle is possible (sketch bytes are engine-specific), so the gate is an
error-bound assertion against the exact distinct count — the same
contract a 100 TB deployment relies on when it unions per-partition
sketches instead of shuffling raw ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from gistdex_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_hll_estimate_within_bound(spark):
    ev = load_table(spark, SF_CORRECTNESS, "events")
    row = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) <= max(1, 0.05 * row.exact)


def test_hll_sketches_merge_across_partitions(spark):
    """Sketches built per event_type union to the global estimate —
    the map-side-combinable property that replaces a global distinct."""
    ev = load_table(spark, SF_CORRECTNESS, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx")
    ).first()
    exact = ev.select("user_id").distinct().count()
    assert abs(merged.approx - exact) <= max(1, 0.05 * exact)


def test_count_min_estimate_never_undercounts(spark):
    """CMS one-sided error: estimate >= exact for EVERY key, and the
    sketch is bounded by d * width rows regardless of input size."""
    from gistdex_spark.operators.heavyhitters import (
        CMS_SEEDS,
        count_min_cells,
        count_min_estimate,
    )

    ev = load_table(spark, SF_CORRECTNESS, "events")
    cells = count_min_cells(ev, "user_id", width=64)
    assert cells.count() <= len(CMS_SEEDS) * 64
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = count_min_estimate(cells, exact.select("user_id"), "user_id")
    bad = (
        exact.join(est, "user_id")
        .filter(F.col("cms_estimate") < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_count_min_sketches_merge_cellwise(spark):
    """Sketches of disjoint shards SUM cell-wise to the whole-stream
    sketch — the property that lets 1000 executors sketch locally and
    merge 256 numbers instead of shuffling raw keys."""
    from gistdex_spark.operators.heavyhitters import count_min_cells

    ev = load_table(spark, SF_CORRECTNESS, "events")
    whole = {
        (r.j, r.cell): r.cnt
        for r in count_min_cells(ev, "user_id").collect()
    }
    lo = count_min_cells(ev.filter("event_id % 2 = 0"), "user_id")
    hi = count_min_cells(ev.filter("event_id % 2 = 1"), "user_id")
    merged: dict = {}
    for r in lo.collect() + hi.collect():
        merged[(r.j, r.cell)] = merged.get((r.j, r.cell), 0) + r.cnt
    assert merged == whole


def test_count_min_probe_join_broadcasts_sketch(spark):
    from gistdex_spark.operators.heavyhitters import (
        count_min_cells,
        count_min_estimate,
    )

    ev = load_table(spark, SF_CORRECTNESS, "events")
    cells = count_min_cells(ev, "user_id")
    est = count_min_estimate(cells, ev.select("user_id").distinct(), "user_id")
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
