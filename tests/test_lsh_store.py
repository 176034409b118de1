"""Multi-table LSH store at rest: the union-of-probes search over the
stored bucket columns must equal the scan-form operator exactly, table
0's probe must be partition pruning (measured from the files actually
read), and the other tables' probes must reach the parquet scan as
pushed int predicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gistdex_spark.operators.similarity import ann_lsh_multitable, probe_buckets
from gistdex_spark.queries import QV_MAIN
from gistdex_spark.sources.lsh_store import search_stored, write_lsh_store
from gistdex_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"
NBITS, NT, RADIUS = 6, 10, 1


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def store(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh") / "store")
    write_lsh_store(emb, path, nbits=NBITS, n_tables=NT)
    return path


def test_layout_is_partitioned_by_table0_bucket(store):
    import os

    dirs = {d for d in os.listdir(store) if d.startswith("b0=")}
    assert len(dirs) >= 2  # the corpus spans multiple table-0 buckets


def test_stored_search_matches_scan_form_exactly(spark, emb, store):
    scan_form = ann_lsh_multitable(
        emb, QV_MAIN, k=5, nbits=NBITS, n_tables=NT, radius=RADIUS
    ).collect()
    stored = search_stored(
        spark, store, QV_MAIN, k=5, nbits=NBITS, n_tables=NT, radius=RADIUS
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in scan_form] == [
        (r["vec_id"], r["score"]) for r in stored
    ]


def test_table0_probe_is_partition_pruned(spark, store):
    """A single-table (b0) probe must read ONLY the probed bucket
    directories — the partition-pruning half of the at-rest claim."""
    probes = probe_buckets(QV_MAIN, NBITS, RADIUS, offset=0)
    scan = spark.read.parquet(store).filter(F.col("b0").isin(probes))
    files = {
        r["f"]
        for r in scan.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert files, "probe read no files"
    for f in files:
        assert any(f"b0={b}/" in f for b in probes), f
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "b0" in plan.split("PartitionFilters", 1)[1][:300]


def test_other_table_probes_are_pushed_filters(spark, store):
    """The full union filter must reach the scan: b0's disjunct as a
    partition candidate, b1+ as pushed parquet predicates on stored int
    columns (row-group skipping) — and the bucket arithmetic itself must
    NOT be in the plan (it was pre-paid at write time)."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "8192")
    try:
        probes1 = probe_buckets(QV_MAIN, NBITS, RADIUS, offset=NBITS)
        scan = spark.read.parquet(store).filter(F.col("b1").isin(probes1))
        plan = scan._jdf.queryExecution().executedPlan().toString()
        pushed = plan.split("PushedFilters: [", 1)[1]
        assert "b1" in pushed[:500]
        # stored-column probe: no sign arithmetic anywhere in the plan
        assert "embedding[0]" not in plan
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_write_rejects_overlong_projection(spark, emb, tmp_path):
    """write_lsh_store enforces the same n_tables*nbits <= dim guard as
    the scan forms (r10 ADVICE): out-of-range vec[i] is NULL in Catalyst
    and would silently write higher tables' bits as 0 — the degenerate
    store must fail at WRITE time, not at search time."""
    import pytest

    from gistdex_spark.sources.lsh_store import write_lsh_store

    with pytest.raises(ValueError, match="dims"):
        write_lsh_store(
            emb, str(tmp_path / "bad"), nbits=16, n_tables=8
        )


def test_append_rejects_geometry_mismatch(spark, emb, tmp_path):
    """An append with a different dim / nbits / n_tables must fail
    BEFORE any rows land — and must not overwrite the store's recorded
    geometry sidecar (r12 ADVICE: the old behavior rewrote _meta.json
    from the append batch, silently replacing the validation facts)."""
    import pytest

    from gistdex_spark.sources.lsh_store import write_lsh_store
    from gistdex_spark.sources.store_meta import read_store_meta

    path = str(tmp_path / "geo")
    write_lsh_store(emb, path, nbits=4, n_tables=3)
    before = read_store_meta(path)
    rows_before = spark.read.parquet(path).count()
    with pytest.raises(ValueError, match="geometry mismatch"):
        write_lsh_store(emb, path, nbits=3, n_tables=3, mode="append")
    # wrong-geometry batch left neither rows nor a rewritten sidecar
    assert read_store_meta(path) == before
    assert spark.read.parquet(path).count() == rows_before
    # a matching-geometry append still works
    write_lsh_store(emb, path, nbits=4, n_tables=3, mode="append")
    assert read_store_meta(path) == before
    assert spark.read.parquet(path).count() == 2 * rows_before


def test_stored_vote_matches_scan_form_exactly(spark, emb, store):
    """The at-rest vote search must be frame-equal to the scan-form
    ann_lsh_vote — graded (default) AND 0/1 indicator — closing the r10
    'at rest the vote expression reads the stored bucket columns' claim
    with exercised code instead of a docstring."""
    from gistdex_spark.operators.similarity import ann_lsh_vote
    from gistdex_spark.sources.lsh_store import search_stored_vote

    for weighted in (True, False):
        scan_form = ann_lsh_vote(
            emb, QV_MAIN, k=5, nbits=NBITS, n_tables=NT, radius=RADIUS,
            shortlist=20, weighted=weighted,
        ).collect()
        stored = search_stored_vote(
            spark, store, QV_MAIN, k=5, nbits=NBITS, n_tables=NT,
            radius=RADIUS, shortlist=20, weighted=weighted,
        ).collect()
        assert [(r["vec_id"], r["score"]) for r in scan_form] == [
            (r["vec_id"], r["score"]) for r in stored
        ], f"weighted={weighted}"


def test_stored_vote_never_reads_embedding_before_rerank(spark, store):
    """The vote pass must touch ONLY id + the L stored bucket ints: no
    scan in the plan reads embedding together with a bucket column, and
    the embedding-reading scan is the broadcast-semi-joined rerank of
    `shortlist` ids. This is the 100 TB cost story — a few int bytes
    per corpus row, full vectors only for the shortlist."""
    import re

    from gistdex_spark.sources.lsh_store import search_stored_vote

    df = search_stored_vote(
        spark, store, QV_MAIN, k=5, nbits=NBITS, n_tables=NT,
        radius=RADIUS, shortlist=20,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(schemas) >= 2, f"expected two store scans: {plan[:500]}"
    vote_scans = [s for s in schemas if "b1:" in s or "b9:" in s]
    emb_scans = [s for s in schemas if "embedding" in s]
    assert vote_scans, f"no bucket-column scan: {schemas}"
    assert emb_scans, f"no rerank scan: {schemas}"
    for s in vote_scans:
        assert "embedding" not in s, f"vote scan reads embedding: {s}"
    for s in emb_scans:
        assert "b1:" not in s and "b9:" not in s, (
            f"rerank scan reads bucket columns: {s}"
        )
    assert "BroadcastHashJoin" in plan
