"""Graph store at rest: the incrementally merged kNN graph must equal
the batch multitable rebuild on (old ∪ new) exactly, the members probe
must prune partitions (b0) and push int predicates (b1+), the stored
edge scan must read only (src_id, nbr_id, sim), and the prefilter cap
must only ever disable an optimization, never change values."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from gistdex_spark.operators.dedup import knn_graph_multitable
from gistdex_spark.sources import graph_store
from gistdex_spark.sources.graph_store import (
    incremental_graph_stored,
    update_graph_store,
    write_graph_store,
)
from gistdex_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS

K, NBITS, NT = 3, 4, 3


@pytest.fixture(scope="module")
def split(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings").select(
        "vec_id", "embedding"
    )
    new = emb.filter(F.col("vec_id") % 10 == 7)
    old = emb.filter(F.col("vec_id") % 10 != 7)
    return new, old


@pytest.fixture(scope="module")
def store_path(spark, split, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("graph") / "store")
    write_graph_store(split[1], path, k=K, nbits=NBITS, n_tables=NT)
    return path


def _frame(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_merge_equals_batch_rebuild(spark, split, store_path):
    new, old = split
    want = _frame(
        knn_graph_multitable(
            old.unionByName(new), k=K, nbits=NBITS, n_tables=NT
        )
    )
    got = _frame(
        incremental_graph_stored(
            spark, store_path, new, k=K, nbits=NBITS, n_tables=NT
        )
    )
    assert got == want
    assert len(got) > 0


def test_members_probe_prunes_and_edges_scan_is_narrow(spark, split, store_path):
    new, _ = split
    df = incremental_graph_stored(
        spark, store_path, new, k=K, nbits=NBITS, n_tables=NT
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # b0's IN-list is a partition predicate; b1+'s are pushed filters.
    assert re.search(r"PartitionFilters: \[b0#\d+ INSET", plan)
    for t in range(1, NT):
        assert f"In(b{t}" in plan
    # The stored-edge scan must read only the three edge columns — the
    # old×old mass is a narrow read, never a rescore.
    m = re.search(
        r"ReadSchema: struct<src_id[^>]*>", plan
    )
    assert m and "embedding" not in m.group(0)


def test_prefilter_cap_disables_not_corrupts(spark, split, store_path, monkeypatch):
    new, old = split
    want = _frame(
        knn_graph_multitable(
            old.unionByName(new), k=K, nbits=NBITS, n_tables=NT
        )
    )
    monkeypatch.setattr(graph_store, "_PREFILTER_CAP", 0)
    got = _frame(
        incremental_graph_stored(
            spark, store_path, new, k=K, nbits=NBITS, n_tables=NT
        )
    )
    assert got == want


def test_update_applies_batch_and_next_increment_sees_it(
    spark, split, tmp_path_factory
):
    """Two consecutive daily batches: after update_graph_store applies
    batch 1, the stored state (members + edges) must serve batch 2's
    increment such that the final graph equals one batch rebuild over
    all three corpus slices."""
    new, old = split
    b1 = new.filter(F.col("vec_id") < 500)
    b2 = new.filter(F.col("vec_id") >= 500)
    path = str(tmp_path_factory.mktemp("graph_upd") / "store")
    write_graph_store(old, path, k=K, nbits=NBITS, n_tables=NT)
    update_graph_store(spark, path, b1, k=K, nbits=NBITS, n_tables=NT)
    got = _frame(
        incremental_graph_stored(
            spark, path, b2, k=K, nbits=NBITS, n_tables=NT
        )
    )
    want = _frame(
        knn_graph_multitable(
            old.unionByName(b1).unionByName(b2), k=K, nbits=NBITS, n_tables=NT
        )
    )
    assert got == want


def test_stream_graph_update_matches_batch_rebuild(spark, split, tmp_path):
    """Streaming admission mirror (test_stream_ingest.py discipline):
    micro-batches merged through stream_graph_update must leave the
    stored graph equal to one batch rebuild over everything seen."""
    import json as _json
    import os

    from gistdex_spark.streaming.ingest import stream_graph_update

    new, old = split
    path = str(tmp_path / "gstore")
    write_graph_store(old, path, k=K, nbits=NBITS, n_tables=NT)

    src = str(tmp_path / "emb_src")
    os.makedirs(src, exist_ok=True)
    rows = new.collect()
    # two micro-batch files
    for i, chunk in enumerate([rows[: len(rows) // 2], rows[len(rows) // 2 :]]):
        with open(f"{src}/b{i}.json", "w") as f:
            for r in chunk:
                f.write(
                    _json.dumps(
                        {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
        # one file per micro-batch: the availableNow run really exercises
        # TWO consecutive merges, not one coalesced batch
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = stream_graph_update(
        stream, path, k=K, nbits=NBITS, n_tables=NT,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = _frame(
        spark.read.parquet(f"{path}/edges").select(
            "src_id", "nbr_id", "sim", "rk"
        )
    )
    want = _frame(
        knn_graph_multitable(
            old.unionByName(new), k=K, nbits=NBITS, n_tables=NT
        )
    )
    assert got == want


def test_members_compaction_preserves_layout_and_increments(
    spark, split, tmp_path_factory
):
    """After several appended batches, compact_partitioned_store must
    shrink the members file count WITHOUT destroying the b0 hive layout
    (partition directories + sidecar survive) — and the next increment
    must still equal the batch rebuild."""
    import os

    from gistdex_spark.sources.maintenance import compact_partitioned_store

    new, old = split
    b1 = new.filter(F.col("vec_id") < 500)
    b2 = new.filter(F.col("vec_id") >= 500)
    path = str(tmp_path_factory.mktemp("graph_cmp") / "store")
    write_graph_store(old, path, k=K, nbits=NBITS, n_tables=NT)
    update_graph_store(spark, path, b1, k=K, nbits=NBITS, n_tables=NT)

    members = f"{path}/members"
    stats = compact_partitioned_store(spark, members, "b0")
    assert stats["files_after"] <= stats["files_before"]
    # layout: hive directories still present, sidecar preserved
    assert any(d.startswith("b0=") for d in os.listdir(members))
    assert os.path.exists(f"{members}/_meta.json")
    # pruning still applies on the compacted store
    probe = spark.read.parquet(members).filter(F.col("b0") == 0)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(b0" in plan or "b0#" in plan

    got = _frame(
        incremental_graph_stored(
            spark, path, b2, k=K, nbits=NBITS, n_tables=NT
        )
    )
    want = _frame(
        knn_graph_multitable(
            old.unionByName(b1).unionByName(b2), k=K, nbits=NBITS, n_tables=NT
        )
    )
    assert got == want
