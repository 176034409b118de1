"""Z-order layout: Morton-code correctness against a bit-twiddling
reference, and the actual 2-dim file-skipping win measured from parquet
footer statistics (the point of the layout at 100 TB)."""

from __future__ import annotations

import glob as g

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_bit_reference(spark):
    from gistdex_spark.functions.zorder import morton2

    rows = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(rows, schema="xb INT, yb INT").withColumn(
        "z", morton2("xb", "yb", 8)
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["xb"], r["yb"]), (r["xb"], r["yb"])


def test_sql_morton_identical_in_duckdb(duck):
    """The SAME generated SQL string must evaluate identically in DuckDB
    (the oracle engine runs it verbatim)."""
    from gistdex_spark.functions.zorder import sql_morton2

    expr = sql_morton2("xb", "yb", 8)
    rows = duck.execute(
        f"SELECT xb, yb, {expr} AS z FROM "
        "(SELECT unnest(range(0, 256, 31)) AS xb), "
        "(SELECT unnest(range(0, 256, 29)) AS yb)"
    ).fetchall()
    assert rows
    for xb, yb, z in rows:
        assert z == _morton_ref(xb, yb), (xb, yb)


def _files_pruned_for_box(path: str, x_col: str, y_col: str, box) -> tuple[int, int]:
    """(total files, files whose footer min/max excludes the box)."""
    x_lo, x_hi, y_lo, y_hi = box
    total = pruned = 0
    for f in sorted(g.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        stats = {}
        for i in range(md.num_columns):
            col = md.row_group(0).column(i)
            name = col.path_in_schema
            mins = []
            maxs = []
            for rg in range(md.num_row_groups):
                c = md.row_group(rg).column(i)
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            stats[name] = (min(mins), max(maxs))
        total += 1
        fx_lo, fx_hi = stats[x_col]
        fy_lo, fy_hi = stats[y_col]
        if fx_hi < x_lo or fx_lo > x_hi or fy_hi < y_lo or fy_lo > y_hi:
            pruned += 1
    return total, pruned


def test_zorder_layout_prunes_2d_box(spark, tmp_path):
    """A Z-ordered write lets a 2-dim box predicate drop files from
    footer stats alone, where a 1-dim sorted write drops none: each
    z-file covers a compact square; each x-sorted file spans ALL of y."""
    from gistdex_spark.sources.zorder_store import write_zorder_store

    df = (
        spark.range(0, 1 << 14)
        .select(
            (F.col("id") % 128).cast("int").alias("xb"),
            ((F.col("id") / 128).cast("int") % 128).alias("yb"),
        )
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsorted")
    write_zorder_store(df, zpath, "xb", "yb", bits=7, n_files=16)
    df.repartitionByRange(16, "xb").sortWithinPartitions("xb").write.parquet(spath)

    # A y-only box: the x-sorted layout can prune NOTHING (every file
    # spans all of y), while z-files are compact squares so only the
    # block-row intersecting the y slice survives.
    box = (0, 127, 8, 23)
    z_total, z_pruned = _files_pruned_for_box(zpath, "xb", "yb", box)
    s_total, s_pruned = _files_pruned_for_box(spath, "xb", "yb", box)
    assert z_total >= 8 and s_total >= 8
    assert s_pruned == 0, s_pruned
    assert z_pruned >= z_total * 0.5, (z_pruned, z_total)

    # and for a small 2-d box, z-order prunes at least as well as the
    # 1-dim sort ever can
    box2 = (8, 23, 8, 23)
    _, z2 = _files_pruned_for_box(zpath, "xb", "yb", box2)
    _, s2 = _files_pruned_for_box(spath, "xb", "yb", box2)
    assert z2 >= s2, (z2, s2)

    # correctness: the pruned layout still returns every box row
    got = (
        spark.read.parquet(zpath)
        .filter(
            (F.col("xb").between(8, 23)) & (F.col("yb").between(8, 23))
        )
        .count()
    )
    assert got == 16 * 16


def test_zorder_cell_stats_nonvacuous_at_smoke(spark):
    from gistdex_spark.queries import REGISTRY

    assert REGISTRY["zorder_cell_stats"](spark, SF_SMOKE).count() > 0


def test_morton_property_random_coords(duck):
    """Property: the generated SQL equals the bit-twiddling reference for
    arbitrary in-range coordinates (hypothesis-driven, evaluated through
    DuckDB — the oracle engine that must agree with Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gistdex_spark.functions.zorder import sql_morton2

    expr = sql_morton2("xb", "yb", 8)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 255), st.integers(0, 255))
    def check(x, y):
        (z,) = duck.execute(
            f"SELECT {expr} FROM (SELECT {x} AS xb, {y} AS yb)"
        ).fetchone()
        assert z == _morton_ref(x, y)

    check()
