"""Per-tag checkpoint-registry contract (queries._ckpt, r9 verdict item
6): the old single-global-copy bookkeeping meant building ANY second
checkpointing query invalidated the first query's still-unconsumed
frame — a harness-shaped contract. Per-tag scoping must let two
registry frames coexist and be consumed out of order, while same-tag
rebuilds and the LRU bound still release blocks (the memory guarantee
the global contract provided)."""

from __future__ import annotations

from tests.conftest import SF_CORRECTNESS


def test_two_registry_frames_consumable_out_of_order(spark):
    """Build A (checkpointing), build B (checkpointing), THEN consume A —
    under the old global contract A's blocks were freed when B was built
    and this count() died with a missing-block error."""
    from gistdex_spark.queries import REGISTRY

    a = REGISTRY["hybrid_rrf"](spark, SF_CORRECTNESS)
    b = REGISTRY["prf_expanded_search"](spark, SF_CORRECTNESS)
    assert a.count() > 0  # A consumed after B's build
    assert b.count() > 0
    # and re-consumable until a same-tag rebuild or LRU eviction
    assert a.count() == a.count()


def test_same_tag_rebuild_releases_previous_blocks(spark):
    """Rebuilding the SAME query must replace (not accumulate) its live
    checkpoint blocks — the leak the bookkeeping exists to stop."""
    from gistdex_spark.queries import _CKPT_LOCK, _LIVE_CKPTS, REGISTRY

    a1 = REGISTRY["hybrid_rrf"](spark, SF_CORRECTNESS)
    a1.count()
    with _CKPT_LOCK:
        first_ids = set(_LIVE_CKPTS.get("hybrid_rrf", []))
    assert first_ids, "hybrid_rrf must register its checkpoint blocks"
    a2 = REGISTRY["hybrid_rrf"](spark, SF_CORRECTNESS)
    with _CKPT_LOCK:
        second_ids = set(_LIVE_CKPTS.get("hybrid_rrf", []))
    assert second_ids and second_ids.isdisjoint(first_ids)
    # the replaced RDDs are gone from executor storage
    live = {r.id() for r in spark.sparkContext._jsc.getPersistentRDDs().values()}
    assert first_ids.isdisjoint(live)
    assert a2.count() > 0


def test_lru_bound_caps_live_tags(spark):
    """More than _MAX_LIVE_TAGS distinct checkpointing tags evict the
    least-recently-built tag, keeping full-registry sweeps bounded."""
    from pyspark.sql import functions as F

    from gistdex_spark.queries import _CKPT_LOCK, _LIVE_CKPTS, _MAX_LIVE_TAGS, _ckpt

    base = spark.range(10).withColumn("x", F.col("id") * 2)
    for i in range(_MAX_LIVE_TAGS + 2):
        _ckpt(base, f"lru_probe_{i}")
    with _CKPT_LOCK:
        tags = [t for t in _LIVE_CKPTS if t.startswith("lru_probe_")]
        n_live = len(_LIVE_CKPTS)
    assert n_live <= _MAX_LIVE_TAGS
    assert f"lru_probe_{_MAX_LIVE_TAGS + 1}" in tags
    assert "lru_probe_0" not in tags
