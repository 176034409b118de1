"""Misra-Gries heavy hitters — the frequent-items member of the
mergeable-sketch family (with HLL++ distinct counts and Greenwald-Khanna
quantiles): bounded-memory per-partition summaries whose merge preserves
the deterministic no-false-negative guarantee.

Why not exact top-k alone: at 100 TB the exact token census is one giant
shuffle keyed by token. The MG summary is map-side only — each partition
emits at most ``k`` (item, lower-bound) rows regardless of partition size,
so the merge aggregate moves kilobytes. The price is approximation, but of
a useful one-sided kind (Misra & Gries 1982; mergeability per Agarwal et
al. 2012, "Mergeable Summaries"):

- each per-partition summary underestimates a local count by at most
  ``n_p / (k + 1)`` (every decrement event removes >= k+1 units);
- summing matched lower bounds across partitions (missing partitions
  contribute 0 >= c_p - n_p/(k+1)) gives a merged bound
  ``LB(i) >= c(i) - n/(k+1)``;
- therefore ANY item with global count > n/(k+1) survives with LB > 0 —
  no false negatives above the threshold, deterministically, independent
  of partitioning and arrival order.

The audit query (queries.heavy_hitters_audit) states exactly that
contract as oracle-checkable booleans next to the exact counts.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, item_col: str = "item", k: int = 64
) -> DataFrame:
    """Heavy-hitter candidates: per-partition batched Misra-Gries via
    mapInPandas (Arrow batches; counting is vectorized ``value_counts``,
    the counter merge touches at most k + batch-distinct entries), then
    one hash aggregate over the tiny candidate stream summing the local
    lower bounds. Output: (item, lb) with lb >= true_count - n/(k+1).

    The batch decrement subtracts the minimum counter from ALL counters
    while more than k survive — each subtracted unit hits >= k+1 counters,
    which is the exact invariant the classic one-at-a-time form maintains,
    so the error bound is unchanged.
    """

    def mg(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, cnt in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            while len(counters) > k:
                dec = min(counters.values())
                counters = {
                    i: c - dec for i, c in counters.items() if c > dec
                }
        yield pd.DataFrame(
            {"item": list(counters.keys()), "lb": list(counters.values())}
        )

    local = df.select(F.col(item_col).alias(item_col)).mapInPandas(
        mg, schema="item string, lb long"
    )
    return local.groupBy("item").agg(F.sum("lb").alias("lb"))
