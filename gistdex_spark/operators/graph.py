"""Iterative graph operators beyond connected components: PageRank.

Near-dup pair graphs have a second read beyond "which docs are dupes"
(dedup.connected_components): HOW CENTRAL a document is in its duplicate
neighborhood. A boilerplate template that hundreds of pages embed scores
high; a one-off near-miss scores low — centrality ranks which exemplar
to KEEP (or which template to strip) better than min-id. Power-iteration
PageRank is the standard centrality for that, and it exercises the same
scale pattern as CC: one distributed join+agg per round, driver pulls
back nothing but loop control, lineage truncated every round.

Scale: each iteration is edges ⋈ ranks (shuffle on node id) + one
hash-agg. Rank and degree frames are node-sized, edges dominate; at
10^11 edges the join inherits the pair frame's partitioning. Fixed
iteration count (bounded latency) is the production norm — power
iteration converges geometrically at rate = damping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND = 6


def pagerank(
    pairs: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations over the symmetrized
    pair graph, ranks rounded to 6 dp.

    The pair stream is symmetrized in ONE explode pass (both directions
    from a single upstream evaluation — same rationale as
    dedup.connected_components). In the symmetric graph every node has
    in- and out-degree >= 1, so there is no dangling-mass term and the
    per-round update is exactly
    ``rank'(v) = (1-d)/N + d * sum(rank(u)/deg(u) : u~v)``.
    Deterministic for a fixed iteration count — DuckDB computes the same
    value by unrolling the iterations as chained CTEs (aggregation is
    not allowed in a recursive term), so the oracle is value-exact.
    """
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    if n == 0:
        return sym.select(
            F.col("src").alias("node"), F.lit(0.0).alias("rank")
        )
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (
            sym.join(deg, "src")
            .join(ranks, sym.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        ranks = contribs.groupBy("node").agg(
            (F.lit(base) + F.lit(damping) * F.sum("c")).alias("rank")
        )
        # Lineage cut per round — same analyzer-blowup guard as CC; on a
        # cluster swap for checkpoint() + reliable storage.
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", ROUND).alias("rank"))
