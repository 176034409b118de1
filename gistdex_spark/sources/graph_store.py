"""kNN graph at rest with incremental maintenance: daily ingest probes
stored buckets and merges into the stored edge list — old-vs-old is
NEVER rescored.

``operators/dedup.knn_graph_multitable`` is the batch graph; this module
is its at-rest counterpart, the graph-family sibling of ``band_store``
(SimHash near-dup state) and ``lsh_store`` (ANN probe state):

- ``write_graph_store`` persists two tables under ``path``:
  ``members/`` — (id, embedding, b0..b{L-1}) via ``write_lsh_store``'s
  exact layout (hive-partitioned by ``b0``; probes prune partitions on
  table 0 and push int predicates on tables 1+), and ``edges/`` — the
  multitable graph (src_id, nbr_id, sim, rk).
- ``incremental_graph_stored`` computes the merged graph over
  (stored ∪ new batch) by scoring ONLY new×old (via the stored bucket
  columns, prefiltered to the batch's observed bucket values) and
  new×new (one batch-local :func:`knn_graph_multitable`), then merging
  with the STORED edge list and re-ranking with one window. The
  old×old work a naive rebuild would redo — the overwhelming mass of a
  100 TB corpus — is replaced by a read of ~n·k stored edge rows.
- ``update_graph_store`` applies a batch: appends the new members and
  overwrites ``edges/`` with the merged graph.

Exactness (pinned in tests/test_graph_store.py): the merged frame
equals ``knn_graph_multitable(old ∪ new)``. The stored edges are the
per-src top-k of the old×old candidate mass; any old×old candidate they
dropped had ≥ k strictly-better same-bucket candidates for that src, so
it can never re-enter the merged top-k (the same a-fortiori argument
that makes the kernel's task-local cut lossless). new×old pairs are
enumerated completely (per-table probe union + first-agreeing-table
dedup, the band_store discipline), scored by the Catalyst cosine fold —
bit-identical to the numpy kernel by the shared accumulation-order
discipline (tests/test_pair_kernels.py proves the two forms equal) —
and emitted in both directions. new×new comes from the batch graph,
top-k'd per src, lossless for the union a fortiori.

Caller contract: ids are unique across store ∪ batch (re-ingesting an
existing id is an upsert the caller must route through delete first,
as with the other stores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gistdex_spark.operators.dedup import _knn_rank, knn_graph_multitable
from gistdex_spark.sources.lsh_store import write_lsh_store

# Same role as band_store._PREFILTER_CAP: past this many collected
# bucket values the IN-list prefilter stops paying for itself; the
# equality join alone is still exact (and still new×old only).
_PREFILTER_CAP = 4096


def write_graph_store(
    emb: DataFrame,
    path: str,
    k: int = 5,
    nbits: int = 6,
    n_tables: int = 10,
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Members (lsh_store layout, partitioned by b0) + the batch
    multitable edge list."""
    write_lsh_store(
        emb, f"{path}/members", nbits=nbits, n_tables=n_tables,
        id_col=id_col, mode=mode,
    )
    edges = knn_graph_multitable(
        emb, k=k, nbits=nbits, n_tables=n_tables, id_col=id_col
    )
    edges.write.mode(mode).parquet(f"{path}/edges")


def _new_old_pairs(
    spark: SparkSession,
    path: str,
    new_sig: DataFrame,
    nbits: int,
    n_tables: int,
    id_col: str,
) -> DataFrame:
    """All (new_id, old_id, sim) pairs agreeing on ANY table, each
    scored exactly once (first-agreeing-table dedup), with the members
    scan prefiltered to the batch's observed per-table bucket values —
    b0's IN-list prunes partitions, b1+'s push to parquet row groups.

    A pair's first-agreeing table t has equal bucket values there, so
    the stored row's b_t is in the batch's table-t set and branch t
    emits exactly that posting; postings a branch drops could never
    have joined. Past the cap, fall back to one unfiltered exploded
    members scan — still new×old only.
    """
    sets_row = new_sig.select(
        *[
            F.collect_set(F.col("bn").getItem(t)).alias(f"s{t}")
            for t in range(n_tables)
        ]
    ).first()
    table_sets = [sorted(sets_row[f"s{t}"]) for t in range(n_tables)]

    bo = F.array(*[F.col(f"b{t}") for t in range(n_tables)])
    if sum(len(s) for s in table_sets) <= _PREFILTER_CAP:
        branches = []
        for t, vals in enumerate(table_sets):
            if not vals:
                continue
            branches.append(
                spark.read.parquet(f"{path}/members")
                .filter(F.col(f"b{t}").isin(vals))
                .select(
                    F.col(id_col).alias("old_id"),
                    F.col("embedding").alias("emb_o"),
                    bo.alias("bo"),
                    F.lit(t).cast("int").alias("t"),
                    F.col(f"b{t}").cast("int").alias("bval"),
                )
            )
        if not branches:
            # Empty batch: an empty pair frame with the right id types.
            branches = [
                spark.read.parquet(f"{path}/members")
                .limit(0)
                .select(
                    F.col(id_col).alias("old_id"),
                    F.col("embedding").alias("emb_o"),
                    bo.alias("bo"),
                    F.lit(0).cast("int").alias("t"),
                    F.lit(0).cast("int").alias("bval"),
                )
            ]
        from functools import reduce

        o = reduce(lambda a, c: a.unionByName(c), branches)
    else:
        o = spark.read.parquet(f"{path}/members").select(
            F.col(id_col).alias("old_id"),
            F.col("embedding").alias("emb_o"),
            bo.alias("bo"),
            F.posexplode(bo).alias("t", "bval"),
        )

    n = new_sig.select(
        F.col("new_id"),
        F.col("emb_n"),
        F.col("bn"),
        F.posexplode("bn").alias("t", "bval"),
    )
    # First-agreeing-table dedup (band_store's first_band, on bucket
    # arrays): a pair exits the join exactly once.
    first_table = F.expr(
        "t = 0 or not exists(sequence(0, t - 1), u -> bn[u] = bo[u])"
    )
    from gistdex_spark.functions.vectors import cosine

    return (
        n.join(o, ["t", "bval"])
        .filter(first_table)
        .select(
            "new_id",
            "old_id",
            cosine("emb_n", "emb_o").alias("sim"),
        )
    )


def incremental_graph_stored(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    k: int = 5,
    nbits: int = 6,
    n_tables: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """The merged multitable kNN graph over (stored corpus ∪ ``new``) —
    value-equal to ``knn_graph_multitable`` on the union, with old×old
    replaced by the stored edge read. Three disjoint candidate parts
    (old×old from ``edges/``, new×old scored both directions, new×new
    from the batch graph — each pair appears in exactly one part, so no
    dedup exchange is needed) into one global window."""
    from gistdex_spark.operators.similarity import sign_bucket

    bn = F.array(
        *[
            sign_bucket("embedding", nbits, offset=t * nbits)
            for t in range(n_tables)
        ]
    )
    # Lineage-cut: the batch signatures feed the IN-list collect, the
    # probe join, and the batch-local graph — one materialization, the
    # band_store discipline.
    new_sig = new.select(
        F.col(id_col).alias("new_id"),
        F.col("embedding").alias("emb_n"),
        bn.alias("bn"),
    ).localCheckpoint(eager=True)

    no = _new_old_pairs(spark, path, new_sig, nbits, n_tables, id_col)
    both_dirs = no.select(
        F.col("new_id").alias("src"), F.col("old_id").alias("nbr"), "sim"
    ).unionByName(
        no.select(
            F.col("old_id").alias("src"), F.col("new_id").alias("nbr"), "sim"
        )
    )
    nn = knn_graph_multitable(
        new_sig.select(F.col("new_id").alias(id_col), F.col("emb_n").alias("embedding")),
        k=k, nbits=nbits, n_tables=n_tables, id_col=id_col,
    ).select(
        F.col("src_id").alias("src"), F.col("nbr_id").alias("nbr"), "sim"
    )
    # ReadSchema pin (tests): the edges scan reads only (src,nbr,sim).
    oo = spark.read.parquet(f"{path}/edges").select(
        F.col("src_id").alias("src"), F.col("nbr_id").alias("nbr"), "sim"
    )
    # Stored and batch-graph sims are already 6-dp rounded; the probe
    # part is raw. _knn_rank's round is idempotent on the former and
    # aligns the latter, so ordering matches the batch build exactly.
    return _knn_rank(both_dirs.unionByName(nn).unionByName(oo), k)


def update_graph_store(
    spark: SparkSession,
    path: str,
    new: DataFrame,
    k: int = 5,
    nbits: int = 6,
    n_tables: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Apply a daily batch: merge the graph incrementally, append the
    new members, replace ``edges/`` with the merged graph via the
    maintenance module's write-beside-and-rename swap — a plain
    ``mode("overwrite")`` deletes the old edge list before the new one
    is durable, so a mid-write crash would lose the graph. The merged
    frame is materialized (localCheckpoint) BEFORE the swap so the
    write never reads from the path it is replacing. Returns the merged
    edge frame."""
    from gistdex_spark.sources.maintenance import _atomic_swap  # noqa: PLC0415

    # Align the batch to the STORED member schema before both the merge
    # and the append (a driver-side footer read, no job): appending a
    # batch whose embedding arrived as array<double> into a members
    # table written as array<float> leaves mixed parquet file schemas —
    # later reads fail or flake on whichever footer the merge samples.
    # The cast is lossless when the batch really carries the store's
    # precision (the caller contract); the scoring kernels promote to
    # f64 either way, so merge values are unchanged.
    target = {
        f.name: f.dataType
        for f in spark.read.parquet(f"{path}/members").schema.fields
    }
    new = new.select(
        F.col(id_col).cast(target[id_col]).alias(id_col),
        F.col("embedding").cast(target["embedding"]).alias("embedding"),
    )
    merged = incremental_graph_stored(
        spark, path, new, k=k, nbits=nbits, n_tables=n_tables, id_col=id_col
    ).localCheckpoint(eager=True)
    write_lsh_store(
        new, f"{path}/members", nbits=nbits, n_tables=n_tables,
        id_col=id_col, mode="append",
    )
    _atomic_swap(merged, f"{path}/edges")
    return merged
