"""Table maintenance: small-file compaction and copy-on-write merge.

The reference mutates rows in place through its adapters —
`update(id, partial)` is a per-row read-modify-write
(`src/core/vector-db/adapters/base-adapter.ts:104-128`) and SQLite hides
file layout entirely. On a parquet lake both concerns become FILE
REWRITES, and both are daily-operations requirements at 100 TB:

- **Compaction**: streaming ingest (`streaming/ingest.py`, the
  chunk_jsonl landing zone) accretes many small files; scans then pay
  per-file open/footer costs and lose split parallelism. `compact_store`
  rewrites a directory to ~target-sized files — the OPTIMIZE of
  Delta/Iceberg, expressed as read → repartition → atomic swap.
- **Merge**: `merge_upsert` is the MERGE INTO ... WHEN MATCHED UPDATE /
  WHEN NOT MATCHED INSERT plan shape: updates ∪ (base ⟕̸ updates) — one
  anti-join, one rewrite, last-writer-wins. At lake scale the rewrite is
  scoped to the partitions the update keys touch (partition-prune the
  base read first); here the store is one directory, so the whole thing
  rewrites — same plan, smaller blast radius.

Both swaps are write-temp-then-rename: readers racing the swap see the
old directory or the new one, never a half-written mix. (A table format
with a transaction log — Delta/Iceberg — makes the swap a metadata
commit; the physical rewrite below is identical.)
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _parquet_files(path: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    return out


def _atomic_swap(df: DataFrame, path: str) -> None:
    """Materialize ``df`` beside ``path`` and rename over it."""
    tmp = f"{path}.__tmp-{uuid.uuid4().hex[:8]}"
    bak = f"{path}.__bak-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)


def compact_store(
    spark: SparkSession, path: str, target_mb: int = 128
) -> dict[str, int]:
    """Rewrite ``path`` into ~``target_mb``-sized parquet files.

    Returns {files_before, files_after, bytes} for observability. The
    repartition is round-robin — compaction has no ordering contract; to
    keep a zone-map layout, recompact through ``write_sorted_store`` /
    ``write_zorder_store`` instead.
    """
    files_before = len(_parquet_files(path))
    total = _dir_bytes(path)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    _atomic_swap(df.repartition(n), path)
    return {
        "files_before": files_before,
        "files_after": len(_parquet_files(path)),
        "bytes": total,
    }


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
) -> None:
    """Copy-on-write MERGE: rows of ``updates`` replace base rows with the
    same ``key``; unmatched update rows insert. Idempotent — re-merging
    the same updates frame is a no-op on the final state.

    ``updates`` must carry the base schema and at most one row per key
    (enforce upstream with a latest-wins window when folding a CDC
    stream — `queries.upsert_latest_wins` is that operator).
    """
    base = spark.read.parquet(path)
    survivors = base.join(updates.select(key), on=key, how="left_anti")
    merged = survivors.unionByName(updates)
    _atomic_swap(merged, path)
