#!/usr/bin/env python
"""Spot-check one or more registry queries against their DuckDB oracles.

Usage: python check_query.py name1,name2 [sf_dir]
Env:   SPARK_GRAFT_CPUS (default 8).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import duckdb

    from gistdex_spark.parity import compare
    from gistdex_spark.queries import ORACLES, REGISTRY
    from gistdex_spark.session import get_spark

    spark = get_spark("check-query", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    rc = 0
    for name in names:
        t0 = time.time()
        spdf = REGISTRY[name](spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in ORACLES:
            print(f"{name}: NO ORACLE — spark rows={len(spdf)} "
                  f"({t1 - t0:.2f}s)")
            continue
        ddf = duck.execute(ORACLES[name]).fetchdf()
        t2 = time.time()
        res = compare(spdf, ddf)
        ok = res.get("rows_match") and res.get("schema_match") and res.get(
            "values_match"
        )
        print(f"{name}: {'OK' if ok else 'FAIL'} {res} "
              f"(spark {t1 - t0:.2f}s, duck {t2 - t1:.2f}s)")
        if not ok:
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
