"""Z-ordered write layout: 2-dimensional file skipping from parquet footers.

`write_sorted_store` (sources/indexer.py) gives disjoint footer ranges on
ONE column — the single-dimension zone map the reference approximates with
its B-tree indexes (`sqlite-schema.ts:38-48`). A query that boxes BOTH a
user dimension and a time dimension gets nothing from a single-column
sort: every file still spans the full range of the second column.

Z-ordering interleaves the bits of both (bucketed) keys into one Morton
code (`functions/zorder.py`) and range-sorts the write on it. Each output
file then covers a compact square-ish region of the 2-d grid, so its
footer min/max on BOTH raw bucket columns is tight and a 2-d box
predicate prunes most files before IO — the `ZORDER BY` of Delta/Iceberg,
expressed as plain repartitionByRange + sortWithinPartitions (one shuffle,
local sorts, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gistdex_spark.functions.zorder import morton2


def write_zorder_store(
    df: DataFrame,
    path: str,
    x_bucket_expr: str,
    y_bucket_expr: str,
    bits: int = 8,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-ordered on two bucketed dimensions.

    ``x_bucket_expr`` / ``y_bucket_expr`` are SQL expressions producing
    non-negative ints < 2**bits (the caller chooses bucket width — e.g.
    ``user_id % 256`` or an epoch-hour). The Morton column is dropped
    before the write; the layout, not the schema, carries the structure.
    """
    zcol = "__z"
    (
        df.withColumn(zcol, morton2(x_bucket_expr, y_bucket_expr, bits))
        .repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode(mode)
        .parquet(path)
    )
