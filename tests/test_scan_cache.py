"""Scan-cache session hygiene (sources/tables.py).

The opt-in sweep cache persists hot corpora per (sf_dir, table). A cache
entry is only valid for the SparkSession that persisted it — after a
session restart in the same process, serving the old entry hands back
DataFrames bound to a stopped session. load_table must detect the
mismatch and re-scan.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

from gistdex_spark.sources import tables


def test_cache_hit_same_session(spark):
    tables.enable_scan_cache(spark, SF_SMOKE, tables=("region",))
    try:
        df1 = tables.load_table(spark, SF_SMOKE, "region")
        df2 = tables.load_table(spark, SF_SMOKE, "region")
        assert df1 is df2  # served from cache, not re-scanned
        assert df1.sparkSession is spark
    finally:
        tables.disable_scan_cache()


def test_stale_session_entry_dropped(spark):
    import os

    key = (os.path.abspath(SF_SMOKE), "region")

    class _StaleDF:
        # only the attribute load_table's guard inspects
        sparkSession = object()

        def unpersist(self):  # keep teardown safe if an assert fires
            return self

    tables._SCAN_CACHE[key] = _StaleDF()
    try:
        df = tables.load_table(spark, SF_SMOKE, "region")
        # the stale entry was evicted and a live scan returned instead
        assert df.sparkSession is spark
        assert key not in tables._SCAN_CACHE
        assert df.count() > 0
    finally:
        tables.disable_scan_cache()
