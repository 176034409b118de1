"""Temporal joins Spark lacks as built-ins, expressed as shuffle-lean
DataFrame compositions.

``asof_join`` implements the classic as-of (most-recent-prior) join via
union + tagged sort + carry-forward: both sides shuffle ONCE on the key,
then a single partitioned window propagates the latest right-side row
forward. No range-join explosion, no per-key collect — the pattern holds
at any key cardinality and is the standard scalable as-of shape on Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts_col`` <= the left row's (per ``on`` key) — DuckDB/kdb ASOF LEFT
    JOIN semantics, ties included.

    Right-side columns come back prefixed (``r_ts``, ...), NULL when no
    prior right row exists. At equal timestamps the right row is eligible
    (sorts before the left row). If several right rows share one exact
    timestamp, which one's payload carries is unspecified — pass data
    with a deterministic tiebreak baked into ``ts_col`` ordering if that
    matters downstream.
    """
    rcols = [c for c in right.columns if c != on]
    r_tagged = right.select(
        on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    struct_t = r_tagged.schema["__r"].dataType
    lcols = [c for c in left.columns if c != on]
    l_tagged = left.select(
        on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_t).alias("__r"),
        *lcols,
    )
    u = l_tagged.unionByName(
        r_tagged, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: Column = F.last("__r", ignorenulls=True).over(w)
    return (
        u.withColumn("__carry", carried)
        .filter(F.col("__side") == 1)
        .select(
            on,
            *lcols,
            *[
                F.col(f"__carry.{c}").alias(f"{right_prefix}{c}")
                for c in rcols
            ],
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    grid: int,
) -> DataFrame:
    """Point-in-interval join via grid bucketing — the scale path for a
    non-equi temporal join (a naive range join is a cross product).

    All three bound columns are BIGINTs on a shared clock (epoch micros
    here; any monotone integer works). Each point maps to exactly ONE
    grid cell; each interval explodes to its covering cells; the join is
    then a plain equi-join on cell with the BETWEEN residual — so every
    qualifying (point, interval) pair meets exactly once and needs no
    dedup. Both sides shuffle once, on the cell key.

    ``grid`` tunes fanout: pick it near the median interval length so
    intervals explode to O(1) cells while cells stay small enough to
    hash-join. Inclusive bounds on both ends (BETWEEN semantics).
    """
    # Integer `div`, not float `/`: a 1-ulp rounding slip on a cell
    # boundary would silently drop a qualifying pair.
    p = points.withColumn("__cell", F.expr(f"{point_ts} div {grid}"))
    i = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {grid}"),
                F.expr(f"{end_col} div {grid}"),
            )
        ),
    )
    return p.join(i, "__cell").filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    ).drop("__cell")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side's key, replicate the small
    side across every salt, join on (key, salt).

    AQE's skew-join split handles most skew adaptively (pinned in
    tests/test_skew.py), but it only splits at shuffle-block granularity
    and only for sort-merge joins; when ONE key dominates a 100 TB join,
    explicit salting spreads that key over ``n_salts`` reducers. The
    replicate side multiplies by n_salts — use for dimension-sized right
    sides only. Row-level semantics are identical to the plain join for
    inner/left joins (every (big, small) key match meets exactly once,
    under exactly one salt value); right/full outer are rejected — an
    unmatched small-side row exists once per salt replica and would
    surface n_salts times.

    The salt is round-robin over the physical row position
    (``monotonically_increasing_id``), NOT a hash of row values: value
    hashing collapses to one salt when the hot key's rows are identical
    (which defeats the whole point), while the join RESULT is
    salt-value-invariant, so a partition-dependent salt is safe.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "outer small-side rows would duplicate once per salt"
        )
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    small_s = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(small_s, [on, "__salt"], how)
    return joined.drop("__salt")
