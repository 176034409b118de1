"""Band store at rest: incremental near-dup against stored signatures
must equal the recompute-both-sides form exactly, the store scan must
carry the batch's band IN-lists as pushed filters, and the prefilter
cap must only ever disable an optimization, never change values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gistdex_spark.operators.dedup import simhash_pairs_between
from gistdex_spark.sources import band_store
from gistdex_spark.sources.band_store import (
    incremental_pairs_stored,
    write_band_store,
)
from gistdex_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def split(spark):
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    new = docs.filter(F.col("source") == "src19")
    old = docs.filter(F.col("source") != "src19")
    return new, old


@pytest.fixture(scope="module")
def store_path(spark, split, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bands") / "store")
    write_band_store(split[1], path)
    return path


def _frame(df):
    return sorted(map(tuple, df.collect()))


def test_stored_pairs_equal_recompute_form(spark, split, store_path):
    new, old = split
    want = _frame(simhash_pairs_between(new, old))
    got = _frame(incremental_pairs_stored(spark, store_path, new))
    assert got == want
    assert len(got) > 0  # non-vacuous on this corpus


def test_store_probe_prunes_per_band(spark, split, store_path):
    new, _ = split
    df = incremental_pairs_stored(spark, store_path, new)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The band0 branch's IN-list must be a PARTITION predicate
    # (directories pruned before IO) and each band1+ branch's IN-list a
    # pushed parquet filter (row-group skipping) — one single-column
    # filter per branch, never a mixed OR that pushes to neither.
    import re

    assert re.search(r"PartitionFilters: \[band0#\d+ INSET", plan)
    for b in (1, 2, 3):
        assert f"In(band{b}" in plan
    # Layout check: the store files carry only id + signature + bands.
    cols = set(spark.read.parquet(store_path).columns)
    assert cols == {"doc_id", "simhash", "band0", "band1", "band2", "band3"}


def test_prefilter_cap_disables_not_corrupts(spark, split, store_path, monkeypatch):
    new, old = split
    want = _frame(simhash_pairs_between(new, old))
    monkeypatch.setattr(band_store, "_PREFILTER_CAP", 0)
    got = _frame(incremental_pairs_stored(spark, store_path, new))
    assert got == want


def test_write_rejects_bad_geometry(spark, split, tmp_path):
    with pytest.raises(ValueError):
        write_band_store(split[0], str(tmp_path / "x"), bits=32, bands=5)
    with pytest.raises(ValueError):
        incremental_pairs_stored(
            spark, str(tmp_path / "x"), split[0], max_distance=4, bands=4
        )
