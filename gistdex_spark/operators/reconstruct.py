"""Content reconstruction (SURVEY.md W7/X15) and query chains (W4).

Reference semantics:
- `getOriginalContent` (`search.ts:150-235`): order a source's chunks by
  chunk_index, concatenate with overlap trimming — take the last 200 chars
  of the accumulator; if the next chunk starts with that suffix's tail,
  append only the remainder, else append "\\n" + chunk.
- `getSectionContent` (`search.ts:240-318`): same fold, restricted to the
  chunks sharing the hit's boundary (section).
- query chain (`query-chain.ts:51-119`): union of per-stage results, dedup
  keep-max-score per (source_id, chunk_index), global re-sort.

Spark shape: Window.partitionBy(source).orderBy(chunk_index) →
collect_list → one pandas_udf fold per source. The fold is sequential by
nature (each append depends on the accumulated tail) — the per-source
GROUP is the parallel unit, which is exactly how a 100 TB corpus spreads:
millions of sources, each folding a bounded chunk list.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

OVERLAP_PROBE = 200


def fold_chunks(chunks: list[str], probe: int = OVERLAP_PROBE) -> str:
    """X15: sequential overlap-trimmed concatenation."""
    acc = ""
    for c in chunks:
        if not acc:
            acc = c
            continue
        tail = acc[-probe:]
        joined = False
        # longest suffix of `tail` that prefixes `c`
        for k in range(min(len(tail), len(c)), 0, -1):
            if tail[-k:] == c[:k]:
                acc += c[k:]
                joined = True
                break
        if not joined:
            acc += "\n" + c
    return acc


@F.pandas_udf(StringType())
def _fold_udf(chunk_lists: pd.Series) -> pd.Series:
    return chunk_lists.map(lambda lst: fold_chunks(list(lst)))


def original_content(
    chunks: DataFrame,
    source_col: str = "source_id",
    index_col: str = "chunk_index",
    content_col: str = "content",
    original_col: str = "original_content",
) -> DataFrame:
    """W7: (source_id, content) — each source's chunks folded back together.

    Chunk-0 fast path (`search.ts:150-175`): when the frame carries a
    stored-original column and chunk 0 has it, that value is returned
    verbatim — overlap folding is only the fallback, because trimming can
    drop whitespace the original had. Sources WITH stored content never
    enter the Arrow fold at all (union split; the grouped exchange is
    shared between branches via ReuseExchange).

    sort_array(collect_list(struct(idx, content))) keeps ordering inside
    the aggregation (no global sort); the fold UDF runs once per source row.
    """
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(index_col).alias("i"), F.col(content_col).alias("c")))
    )
    if original_col not in chunks.columns:
        return (
            chunks.groupBy(source_col)
            .agg(ordered.getField("c").alias("parts"))
            .select(source_col, _fold_udf(F.col("parts")).alias("content"))
        )
    stored = F.max(
        F.when(F.col(index_col) == 0, F.col(original_col))
    ).alias("stored")
    agged = chunks.groupBy(source_col).agg(
        ordered.getField("c").alias("parts"), stored
    )
    fast = agged.filter(F.col("stored").isNotNull()).select(
        source_col, F.col("stored").alias("content")
    )
    folded = agged.filter(F.col("stored").isNull()).select(
        source_col, _fold_udf(F.col("parts")).alias("content")
    )
    return fast.unionByName(folded)


def section_content(
    chunks: DataFrame,
    source_id: str,
    boundary_title: str,
    source_col: str = "source_id",
    title_col: str = "boundary_title",
) -> DataFrame:
    """getSectionContent: the same fold over one source's one section."""
    sec = chunks.filter(
        (F.col(source_col) == source_id) & (F.col(title_col) == boundary_title)
    )
    return original_content(sec, source_col)


def chain_dedup(
    stages: list[DataFrame],
    key_cols: tuple[str, ...] = ("source_id", "chunk_index"),
    score_col: str = "score",
) -> DataFrame:
    """W4: union stage results, keep max-score row per key, re-sort.

    unionByName → one window shuffle on the dedup key. Ties break by stage
    order via the `stage_rank` column the caller may attach; otherwise by
    score only (deterministic after 6-dp rounding + key ordering).
    """
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), stages)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(score_col), *[F.asc(k) for k in key_cols])
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy(F.desc(score_col), *[F.asc(k) for k in key_cols])
    )
