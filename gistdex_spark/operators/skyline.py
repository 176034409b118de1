"""Pareto-frontier (skyline) operator, beyond the reference surface.

A skyline query keeps the rows no other row dominates, where
dominance is ``other.cost <= row.cost AND other.benefit >=
row.benefit`` with at least one strict inequality (Borzsony/
Kossmann/Stocker, "The Skyline Operator", ICDE 2001). The textbook
form is an all-pairs NOT EXISTS — quadratic, and deliberately kept
as the DuckDB oracle so the two engines cross-check genuinely
different formulations. This implementation is the sort/running-max
reformulation that stays equality-keyed at any scale:

1. collapse to one row per (group, cost) carrying that cost's max
   benefit — a hash agg with map-side combine;
2. per group, order the collapsed rows by cost and take the running
   max benefit over STRICTLY cheaper rows. The collapsed frame has
   one row per distinct cost, so a rows-frame ending at 1 PRECEDING
   is exactly the strict-inequality set — no range-frame epsilon
   games on double costs;
3. a (group, cost) survives iff its max benefit beats every strictly
   cheaper row's benefit, and an input row survives iff it carries
   its surviving (group, cost)'s max benefit.

Tie semantics match the NOT EXISTS form exactly: equal (cost,
benefit) rows do not dominate each other (no strict inequality), so
all of them survive; a same-cost row below the cost group's max is
dominated by the max row; an equal-benefit strictly-cheaper row
dominates (strict in cost).

Scale: the window runs over the COLLAPSED frame (|distinct costs
per group| rows, not |rows|), and the join back to the input is an
equality join on (group, cost) against the frontier — which is the
skyline itself, tiny for any realistically distributed data
(O(log n) expected per group for independent dimensions), hence
broadcast by default. Worst case (perfectly anti-correlated data)
the frontier is O(n); callers with such data pass
``broadcast_frontier=False`` and get a plain shuffled equality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline(
    df: DataFrame,
    cost_col: str,
    benefit_col: str,
    by: str | None = None,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier minimizing ``cost_col``
    and maximizing ``benefit_col``, independently within each ``by``
    group (global skyline when ``by`` is None — note the global form's
    window is single-partition over the collapsed frame; prefer a
    grouping key at scale)."""
    keys = ([by] if by is not None else []) + [cost_col]
    gmax = df.groupBy(*keys).agg(F.max(benefit_col).alias("__gmax"))
    w = (
        Window.partitionBy(*([by] if by is not None else []))
        .orderBy(F.col(cost_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        gmax.withColumn("__prev", F.max("__gmax").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__gmax") > F.col("__prev")))
        .select(*keys, "__gmax")
    )
    if broadcast_frontier:
        frontier = F.broadcast(frontier)
    return (
        df.join(frontier, on=keys, how="inner")
        .filter(F.col(benefit_col) == F.col("__gmax"))
        .drop("__gmax")
    )
