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

Durability (round 13): the store is a two-table state (members +
edges) that must change ATOMICALLY — r12's layout appended members and
then swapped ``edges/``, so a crash between the two left members whose
neighborhoods were silently missing from the next incremental merge
(r12 verdict item 1 / ADVICE medium). The layout is now VERSIONED:

    path/
      _current          # text pointer: name of the live version dir
      v-00000001-ab12cd34/
        members/        # lsh_store layout (+ _meta.json sidecar)
        edges/

A batch writes a complete new version directory — old member files are
HARDLINKED in (metadata-only, O(#files), the local-FS analog of a
table-format snapshot reusing data files by manifest reference), the
batch appends its member rows, the merged edges write fresh — and then
ONE ``os.replace`` flips ``_current``. A crash anywhere before the
flip leaves the old version fully live; orphaned version dirs are
swept by the next WRITER (readers never mutate). On an object store
the same commit is an Iceberg/Delta snapshot — the pointer file is the
transaction log reduced to its essence. Pre-r13 flat stores
(``path/members`` + ``path/edges`` at top level) are read
transparently and migrated to the versioned layout by their first
update.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gistdex_spark.operators.dedup import _knn_rank, knn_graph_multitable
from gistdex_spark.sources.lsh_store import write_lsh_store

# Same role as band_store._PREFILTER_CAP: past this many collected
# bucket values the IN-list prefilter stops paying for itself; the
# equality join alone is still exact (and still new×old only).
_PREFILTER_CAP = 4096

_CURRENT = "_current"
_VPREFIX = "v-"


def resolve_store_root(path: str) -> str | None:
    """The directory whose ``members/`` and ``edges/`` are live: the
    ``_current``-named version dir, or ``path`` itself for a pre-r13
    flat store (running maintenance recovery on both tables first —
    r12 ADVICE: a crash inside a legacy single-table swap otherwise
    leaves the store unreadable until a maintenance entry point
    happens to run), or None when uninitialized. Read-only — orphan
    sweeping is writer-side (:func:`_sweep_orphans`), so a reader can
    never delete a concurrent writer's in-progress version."""
    cur = os.path.join(path, _CURRENT)
    if os.path.exists(cur):
        with open(cur) as f:
            return os.path.join(path, f.read().strip())
    from gistdex_spark.sources.maintenance import _recover_store

    members, edges = os.path.join(path, "members"), os.path.join(path, "edges")
    _recover_store(members)
    _recover_store(edges)
    if os.path.isdir(members) and os.path.isdir(edges):
        return path
    return None


def members_path(path: str) -> str:
    root = resolve_store_root(path)
    if root is None:
        raise FileNotFoundError(f"graph store at {path} is uninitialized")
    return os.path.join(root, "members")


def edges_path(path: str) -> str:
    root = resolve_store_root(path)
    if root is None:
        raise FileNotFoundError(f"graph store at {path} is uninitialized")
    return os.path.join(root, "edges")


def _sweep_orphans(path: str) -> None:
    """Writer-side GC: version dirs not named by ``_current`` are
    either crash leftovers (flip never happened — their content is a
    superseded attempt) or superseded versions a crashed GC missed."""
    cur = os.path.join(path, _CURRENT)
    live = None
    if os.path.exists(cur):
        with open(cur) as f:
            live = f.read().strip()
    for d in _glob.glob(os.path.join(path, _VPREFIX + "*")):
        if os.path.basename(d) != live:
            shutil.rmtree(d, ignore_errors=True)


def _next_version_name(path: str) -> str:
    seq = 0
    cur = os.path.join(path, _CURRENT)
    if os.path.exists(cur):
        with open(cur) as f:
            name = f.read().strip()
        try:
            seq = int(name.split("-")[1])
        except (IndexError, ValueError):
            seq = 0
    return f"{_VPREFIX}{seq + 1:08d}-{uuid.uuid4().hex[:8]}"


def _flip_current(path: str, version_name: str) -> None:
    """The commit: one atomic pointer replace."""
    tmp = os.path.join(path, f"{_CURRENT}.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(version_name)
    os.replace(tmp, os.path.join(path, _CURRENT))


def _link_tree(src: str, dst: str) -> None:
    """Recreate ``src``'s directory tree under ``dst``, hardlinking the
    immutable parquet files (copy fallback for cross-device) and
    COPYING everything else — sidecars like ``_meta.json`` are
    rewritten in place by later appends, and a hardlinked sidecar
    would couple that mutation back into the old version."""
    for dirpath, _dirs, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for fname in files:
            s, d = os.path.join(dirpath, fname), os.path.join(out, fname)
            if fname.endswith(".parquet"):
                try:
                    os.link(s, d)
                    continue
                except OSError:
                    pass
            shutil.copy2(s, d)


def _write_edges(edges: DataFrame, path: str) -> None:
    edges.write.mode("overwrite").parquet(path)


def write_graph_store(
    emb: DataFrame,
    path: str,
    k: int = 5,
    nbits: int = 6,
    n_tables: int = 10,
    id_col: str = "vec_id",
) -> None:
    """Bootstrap: members (lsh_store layout, partitioned by b0) + the
    batch multitable edge list, written under a fresh version dir and
    committed by the pointer flip — a crash mid-bootstrap leaves the
    store uninitialized (never half-written), so a streaming replay
    simply bootstraps again."""
    os.makedirs(path, exist_ok=True)
    _sweep_orphans(path)
    vname = _next_version_name(path)
    vroot = os.path.join(path, vname)
    write_lsh_store(
        emb, os.path.join(vroot, "members"), nbits=nbits,
        n_tables=n_tables, id_col=id_col,
    )
    edges = knn_graph_multitable(
        emb, k=k, nbits=nbits, n_tables=n_tables, id_col=id_col
    )
    _write_edges(edges, os.path.join(vroot, "edges"))
    # Store-level sidecar: k is part of the stored state's meaning (the
    # edge list is top-k-truncated), so updates must replay with the
    # same k — the members sidecar already records nbits/n_tables.
    from gistdex_spark.sources.store_meta import write_store_meta

    write_store_meta(path, k=k)
    _flip_current(path, vname)


def _new_old_pairs(
    spark: SparkSession,
    members: str,
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
                spark.read.parquet(members)
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
                spark.read.parquet(members)
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
        o = spark.read.parquet(members).select(
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

    root = resolve_store_root(path)
    if root is None:
        raise FileNotFoundError(f"graph store at {path} is uninitialized")

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

    no = _new_old_pairs(
        spark, os.path.join(root, "members"), new_sig, nbits, n_tables, id_col
    )
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
    oo = spark.read.parquet(os.path.join(root, "edges")).select(
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
    """Apply a daily batch: merge the graph incrementally, then commit
    members-append + edges-replace as ONE atomic version flip (module
    docstring) — r12's append-then-swap had a crash window that left
    members whose neighborhoods were silently missing from every later
    merge. The merged frame is materialized (localCheckpoint) BEFORE
    any write so nothing reads from a path being replaced. Returns the
    merged edge frame. A pre-r13 flat store is migrated to the
    versioned layout by this call."""
    root = resolve_store_root(path)
    if root is None:
        raise FileNotFoundError(f"graph store at {path} is uninitialized")
    _sweep_orphans(path)
    members_src = os.path.join(root, "members")

    # Geometry guard (r12 ADVICE): the members sidecar records the
    # nbits/n_tables the store was written with; a mismatched call
    # would append members with incompatible bucket columns and merge
    # against wrong probes. Pre-sidecar stores fall back to the
    # caller's values (the only record there is).
    from gistdex_spark.sources.store_meta import read_store_meta

    meta = read_store_meta(members_src)
    if meta is not None and (
        meta.get("nbits") != nbits or meta.get("n_tables") != n_tables
    ):
        raise ValueError(
            f"graph store geometry mismatch: store has nbits="
            f"{meta.get('nbits')}, n_tables={meta.get('n_tables')}; "
            f"caller passed nbits={nbits}, n_tables={n_tables}"
        )
    root_meta = read_store_meta(path)
    if root_meta is not None and root_meta.get("k") != k:
        raise ValueError(
            f"graph store k mismatch: stored edges are top-"
            f"{root_meta.get('k')} truncated; caller passed k={k}"
        )

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
        for f in spark.read.parquet(members_src).schema.fields
    }
    new = new.select(
        F.col(id_col).cast(target[id_col]).alias(id_col),
        F.col("embedding").cast(target["embedding"]).alias("embedding"),
    )
    merged = incremental_graph_stored(
        spark, path, new, k=k, nbits=nbits, n_tables=n_tables, id_col=id_col
    ).localCheckpoint(eager=True)

    # Build the new version: hardlink the old member files (metadata-
    # only), append the batch's member rows, write the merged edges —
    # then commit with one pointer replace. Any crash before the flip
    # leaves the old version live and the next writer sweeps the
    # orphan; a replayed batch then redoes the whole merge against
    # unchanged state, which is exactly the batch build again.
    vname = _next_version_name(path)
    vroot = os.path.join(path, vname)
    _link_tree(members_src, os.path.join(vroot, "members"))
    write_lsh_store(
        new, os.path.join(vroot, "members"), nbits=nbits,
        n_tables=n_tables, id_col=id_col, mode="append",
    )
    _write_edges(merged, os.path.join(vroot, "edges"))
    _flip_current(path, vname)
    # GC the superseded state: the old version dir, or — when this call
    # migrated a flat store — the legacy top-level tables.
    if root == path:
        shutil.rmtree(members_src, ignore_errors=True)
        shutil.rmtree(os.path.join(path, "edges"), ignore_errors=True)
    else:
        shutil.rmtree(root, ignore_errors=True)
    return merged
