"""Z-order (Morton) interleaving for multi-dimensional data layout.

The reference indexes one dimension at a time (B-tree indexes on
`source_type` / `created_at`, `src/core/vector-db/adapters/sqlite-schema.ts:38-48`);
at 100 TB the equivalent lever is FILE layout: sorting the write by a
Morton code interleaving two clustering keys gives every parquet footer a
tight min/max range on BOTH dimensions, so a 2-dim box predicate prunes
row groups before any IO — the same trick Delta/Iceberg `ZORDER BY`
applies, expressed here as plain repartitionByRange + sortWithinPartitions.

The bit-spread arithmetic is generated ONCE as a SQL string and evaluated
by Spark (`F.expr`) and the DuckDB oracle verbatim, so the code a query
groups on is bit-identical across engines: integer shifts and masks only,
no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_spread_bits(expr: str, bits: int, stride: int = 2) -> str:
    """SQL for spreading the low ``bits`` bits of ``expr`` so consecutive
    source bits land ``stride`` positions apart (bit i -> position i*stride).

    Division-free integer arithmetic (a modulo bit-test selecting disjoint
    powers of two — addition IS bitwise-or here because the spread targets
    never collide), spelled identically in Spark SQL and DuckDB: `%`,
    comparison, CASE, `+`, integer literals. No `&`/`<<`/`//`, whose
    spellings differ between the engines.
    """
    terms = [
        f"(CASE WHEN (({expr}) % {1 << (i + 1)}) >= {1 << i}"
        f" THEN {1 << (i * stride)} ELSE 0 END)"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def sql_morton2(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """SQL for the 2-dim Morton code of two already-bucketed non-negative
    ints (each clamped by the caller to ``bits`` bits): x bits land on even
    positions, y bits on odd."""
    sx = sql_spread_bits(x_expr, bits)
    sy = sql_spread_bits(y_expr, bits)
    return f"({sx} + 2 * {sy})"


def morton2(x_expr: str, y_expr: str, bits: int = 8) -> Column:
    """The same Morton code as a Spark column (evaluated via F.expr so the
    arithmetic is literally the oracle's)."""
    return F.expr(sql_morton2(x_expr, y_expr, bits)).cast("bigint")
