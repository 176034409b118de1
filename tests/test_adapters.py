"""Storage-adapter registry (UDF-2; `registry.ts:23-140`): provider ops,
format round-trips, conditional backends."""

from __future__ import annotations

import pytest

from gistdex_spark.sources.adapters import (
    StorageAdapter,
    create_registry,
)


@pytest.fixture()
def reg():
    return create_registry()


def test_builtin_providers(reg):
    provs = reg.list_providers()
    for p in ("parquet", "orc", "json", "csv", "memory"):
        assert p in provs
    assert reg.has_provider("parquet")
    assert not reg.has_provider("sqlite")


def test_duplicate_registration_rejected(reg):
    reg.list_providers()  # force init
    with pytest.raises(ValueError, match="already registered"):
        reg.register("parquet", lambda c: None)


def test_unregister_and_custom_register(reg):
    assert reg.unregister("csv")
    assert not reg.has_provider("csv")
    assert not reg.unregister("csv")  # second time: nothing to remove

    made = {}

    def factory(config):
        made.update(config)
        return StorageAdapter("custom", lambda df, p, m: None, lambda s, p: None)

    reg.register("custom", factory)
    a = reg.create({"provider": "custom", "options": {"x": 1}})
    assert a.provider == "custom"
    assert made["options"] == {"x": 1}


def test_unknown_provider_raises(reg):
    with pytest.raises(ValueError, match="No adapter registered"):
        reg.create({"provider": "nope"})


def test_clear_resets_then_reinitializes(reg):
    reg.clear()
    assert reg.has_provider("parquet")  # lazy re-init restores built-ins


@pytest.mark.parametrize("provider", ["parquet", "orc", "json"])
def test_format_roundtrip(reg, spark, tmp_path, provider):
    df = spark.createDataFrame(
        [("s1", 0, "hello", "file"), ("s2", 1, "world", "gist")],
        schema="source_id STRING, chunk_index INT, content STRING, source_type STRING",
    )
    a = reg.create({"provider": provider})
    path = str(tmp_path / provider)
    a.write(df, path, "append")
    back = a.read(spark, path)
    got = {(r.source_id, r.content) for r in back.collect()}
    assert got == {("s1", "hello"), ("s2", "world")}
    if provider in ("parquet", "orc"):
        # columnar adapters keep the source_type partitioning
        assert any("source_type=" in str(p) for p in (tmp_path / provider).iterdir())


def test_memory_adapter_appends(reg, spark):
    df1 = spark.createDataFrame([("a", 1)], schema="k STRING, v INT")
    df2 = spark.createDataFrame([("b", 2)], schema="k STRING, v INT")
    a = reg.create({"provider": "memory"})
    a.write(df1, "t1", "append")
    a.write(df2, "t1", "append")
    assert {r.k for r in a.read(spark, "t1").collect()} == {"a", "b"}
    a.write(df1, "t1", "overwrite")
    assert {r.k for r in a.read(spark, "t1").collect()} == {"a"}


def test_write_chunk_store_uses_adapter(spark, tmp_path):
    from gistdex_spark.sources.indexer import write_chunk_store

    df = spark.createDataFrame(
        [("s", 0, "c", "file")],
        schema="source_id STRING, chunk_index INT, content STRING, source_type STRING",
    )
    write_chunk_store(df, str(tmp_path / "store"), provider="json")
    back = spark.read.json(str(tmp_path / "store"))
    assert back.count() == 1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed by source_id on the same bucket count must join
    with ZERO exchanges — the co-location contract the 100 TB layout
    relies on."""
    import pyspark.sql.functions as F

    from gistdex_spark.plans.inspect import num_shuffles
    from gistdex_spark.sources.indexer import write_chunk_store_bucketed

    rows = [(f"s{i % 8}", i, f"text {i}", "file") for i in range(64)]
    df = spark.createDataFrame(
        rows,
        schema="source_id STRING, chunk_index INT, content STRING, source_type STRING",
    )
    spark.sql("DROP TABLE IF EXISTS bt_chunks")
    spark.sql("DROP TABLE IF EXISTS bt_meta")
    write_chunk_store_bucketed(df, "bt_chunks", buckets=4, mode="overwrite")
    meta = df.groupBy("source_id").agg(F.count("*").alias("n"))
    write_chunk_store_bucketed(
        meta.withColumn("chunk_index", F.lit(0)), "bt_meta", buckets=4, mode="overwrite"
    )
    try:
        a = spark.table("bt_chunks")
        b = spark.table("bt_meta").select("source_id", "n")
        joined = a.join(b.hint("merge"), "source_id")
        assert num_shuffles(joined) == 0, "bucketed join must not exchange"
        assert joined.count() == 64
        # per-source agg on the bucketed table also rides the bucketing
        agg = a.groupBy("source_id").agg(F.count("*").alias("c"))
        assert num_shuffles(agg) == 0, "bucketed groupBy must not exchange"
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_chunks")
        spark.sql("DROP TABLE IF EXISTS bt_meta")


def test_partitioned_store_prunes_partitions(spark, tmp_path):
    """A source_type-partitioned store must serve a source_type filter via
    PARTITION pruning (directory skip), not a data filter — at 100 TB the
    difference is scanning one partition vs listing every file."""
    from gistdex_spark.plans.inspect import scan_for
    from gistdex_spark.sources.indexer import write_chunk_store

    df = spark.createDataFrame(
        [(f"s{i}", f"text {i}", "code" if i % 2 else "docs") for i in range(20)],
        "source_id STRING, content STRING, source_type STRING",
    )
    path = str(tmp_path / "part_store")
    write_chunk_store(df, path, mode="overwrite")
    rd = spark.read.parquet(path).filter("source_type = 'code'")
    s = scan_for(rd, "part_store")
    assert "source_type" in s["partition_filters"]
    assert rd.count() == 10


def test_sorted_store_files_have_disjoint_ranges(spark, tmp_path):
    """write_sorted_store must yield parquet files whose min/max footer
    stats on the sort column are pairwise disjoint — the property file/
    row-group pruning needs."""
    import pyarrow.parquet as pq

    from gistdex_spark.sources.indexer import write_sorted_store
    from gistdex_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "value"
    )
    out = str(tmp_path / "sorted_events")
    write_sorted_store(ev, out, "event_id", n_files=4)

    import glob as g

    ranges = []
    for f in sorted(g.glob(f"{out}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "event_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2, "expected multiple sorted output files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"
