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


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
# summary: the count-min sketch and its applications", J. Algorithms 2005).
# Deterministic 2-universal hashes h_j(k) = ((a_j * k + b_j) mod p) mod w
# over the Mersenne prime p = 2^31 - 1, with literal (a_j, b_j) so the
# DuckDB oracle computes the IDENTICAL cells in plain BIGINT arithmetic
# (k mod p < 2^31 and a_j < 2^31, so a_j * (k mod p) < 2^62 — no overflow
# in either engine).
# --------------------------------------------------------------------------

CMS_P = 2147483647  # 2^31 - 1
CMS_SEEDS: list[tuple[int, int]] = [
    (1000003, 12345),
    (999983, 54321),
    (1000033, 98765),
    (999979, 13579),
]


def _cms_cell_sql(key: str, a: int, b: int, width: int) -> str:
    return (
        f"pmod(pmod({a}L * pmod(cast({key} as bigint), {CMS_P}L) + {b}L, "
        f"{CMS_P}L), {width}L)"
    )


def count_min_cells(
    df: DataFrame,
    key_col: str,
    width: int = 64,
    seeds: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Build the count-min table over an integer key column: one row per
    (hash row j, cell) with its counter. Map-only cell computation (the
    d cells ride one generated array per input row) into a hash agg with
    map-side combine; the result is bounded by d * width rows no matter
    the input size — the entire point of sketching a 100 TB stream.
    Mergeable by construction: sketches of shards SUM cell-wise."""
    seeds = CMS_SEEDS if seeds is None else seeds
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.expr(_cms_cell_sql(key_col, a, b, width)).alias("cell"),
            )
            for j, (a, b) in enumerate(seeds)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.j", "c.cell")
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 64,
    seeds: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: estimate =
    min over the d rows of the key's cell counters. The sketch is at
    most d * width rows, so the probe join broadcasts it; missing cells
    (possible only when probing keys absent from the build input)
    count as 0 via the left join + coalesce."""
    seeds = CMS_SEEDS if seeds is None else seeds
    probe_cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.expr(_cms_cell_sql(key_col, a, b, width)).alias("cell"),
            )
            for j, (a, b) in enumerate(seeds)
        ]
    )
    probes = keys.select(
        F.col(key_col), F.explode(probe_cells).alias("c")
    ).select(key_col, "c.j", "c.cell")
    return (
        probes.join(F.broadcast(cells), ["j", "cell"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
