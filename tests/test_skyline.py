"""Skyline operator: the sort/running-max form must reproduce the
textbook NOT-EXISTS dominance semantics exactly, ties included — the
registry query (skyline_parts) cross-checks against DuckDB's quadratic
form at sf0.01/sf0.1; these tests pin the tie/duplicate edges and the
non-broadcast path on crafted frames where the brute force is readable.
"""

from __future__ import annotations

from gistdex_spark.operators.skyline import skyline


def _brute_skyline(rows):
    """Quadratic reference: (id, group, cost, benefit) rows not
    dominated within their group."""
    out = []
    for r in rows:
        dominated = any(
            o[1] == r[1]
            and o[2] <= r[2]
            and o[3] >= r[3]
            and (o[2] < r[2] or o[3] > r[3])
            for o in rows
        )
        if not dominated:
            out.append(r)
    return sorted(out)


ROWS = [
    # group g1: classic staircase + tie edges
    (1, "g1", 10.0, 5),   # frontier
    (2, "g1", 10.0, 5),   # exact duplicate of 1 — BOTH survive (no strict)
    (3, "g1", 10.0, 4),   # same cost, lower benefit — dominated by 1
    (4, "g1", 12.0, 5),   # pricier, equal benefit — dominated by 1
    (5, "g1", 12.0, 7),   # frontier (pricier but better)
    (6, "g1", 15.0, 7),   # equal benefit to strictly-cheaper 5 — dominated
    (7, "g1", 15.0, 9),   # frontier
    # group g2: single row + anti-correlated pair
    (8, "g2", 1.0, 1),    # frontier
    (9, "g2", 2.0, 2),    # frontier (not dominated: costlier but better)
]


def _run(spark, broadcast_frontier):
    df = spark.createDataFrame(ROWS, ["id", "grp", "cost", "benefit"])
    got = skyline(
        df, "cost", "benefit", by="grp", broadcast_frontier=broadcast_frontier
    )
    return sorted(
        (r.id, r.grp, r.cost, r.benefit)
        for r in got.select("id", "grp", "cost", "benefit").collect()
    )


def test_skyline_matches_brute_force_with_ties(spark):
    assert _run(spark, True) == _brute_skyline(ROWS)


def test_skyline_non_broadcast_path_identical(spark):
    assert _run(spark, False) == _brute_skyline(ROWS)


def test_skyline_global_no_group(spark):
    rows = [(i, "x", float(c), b) for i, (c, b) in enumerate(
        [(1, 1), (1, 3), (2, 3), (2, 5), (3, 2), (3, 5), (4, 6), (5, 6)]
    )]
    df = spark.createDataFrame(rows, ["id", "grp", "cost", "benefit"])
    got = sorted(
        r.id for r in skyline(df, "cost", "benefit").select("id").collect()
    )
    want = sorted(r[0] for r in _brute_skyline(rows))
    assert got == want


def test_skyline_frontier_join_broadcasts(spark):
    """The default path's join against the frontier must be a broadcast
    join — the frontier is the skyline itself, small by construction."""
    df = spark.createDataFrame(ROWS, ["id", "grp", "cost", "benefit"])
    plan = skyline(df, "cost", "benefit", by="grp")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_skyline_randomized_against_brute_force(spark):
    """20 seeded random datasets (heavy tie mass: costs/benefits drawn
    from 6 values each, so duplicates and partial ties are everywhere)
    checked against the quadratic reference in ONE Spark pass — the
    dataset id doubles as the skyline's grouping key."""
    import random

    rng = random.Random(42)
    rows = []
    rid = 0
    for ds in range(20):
        for _ in range(rng.randint(1, 30)):
            rows.append(
                (rid, f"d{ds}", float(rng.randint(0, 5)), rng.randint(0, 5))
            )
            rid += 1
    df = spark.createDataFrame(rows, ["id", "grp", "cost", "benefit"])
    got = sorted(
        (r.id, r.grp, r.cost, r.benefit)
        for r in skyline(df, "cost", "benefit", by="grp")
        .select("id", "grp", "cost", "benefit")
        .collect()
    )
    assert got == _brute_skyline(rows)
