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
