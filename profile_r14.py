#!/usr/bin/env python
"""Round-14 optimization profiler: per-query phase split + job counts.

For each named registry query, measures (after one untimed warm-up):
  - build_sec: fn(spark, sf_dir) wall time (eager driver actions:
    _ckpt localCheckpoints, counts, audits, store writes)
  - exec_sec : the noop-sink write of the returned frame
  - jobs per phase (statusTracker job-id delta)
and writes the explain("formatted") of the returned frame to
plans/r14/<query>_<tag>.txt when --plans <tag> is given.

Usage: python profile_r14.py q1,q2,... [--runs 2] [--plans before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="write plans/r14/<q>_<tag>.txt explain output")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from gistdex_spark.session import get_spark

    spark = get_spark("gistdex-profile-r14", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from gistdex_spark.queries import REGISTRY

    # Warm up JVM + Python worker pool (mirrors bench.py).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from gistdex_spark.functions.embedder import embed_udf

    spark.range(256).repartition(int(cpus)).selectExpr(
        "cast(id as string) as t"
    ).select(embed_udf(dim=4)("t")).collect()

    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    names = [n for n in args.queries.split(",") if n]
    results: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            results[name] = {"error": str(exc).split("\n")[0][:200]}
            print(f"# {name}: FAILED {results[name]['error']}",
                  file=sys.stderr, flush=True)
            continue
        laps = []
        for _ in range(args.runs):
            j0 = n_jobs()
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            j1 = n_jobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = n_jobs()
            laps.append(
                {
                    "build_sec": round(t1 - t0, 3),
                    "exec_sec": round(t2 - t1, 3),
                    "build_jobs": j1 - j0,
                    "exec_jobs": j2 - j1,
                }
            )
        best = dict(min(laps, key=lambda r: r["build_sec"] + r["exec_sec"]))
        best["laps"] = laps
        results[name] = best
        print(
            f"# {name}: build {best['build_sec']:.2f}s"
            f" ({best['build_jobs']} jobs)"
            f" exec {best['exec_sec']:.2f}s ({best['exec_jobs']} jobs)",
            file=sys.stderr, flush=True,
        )
        if args.plans:
            try:
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                path = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "plans", "r14", f"{name}_{args.plans}.txt",
                )
                with open(path, "w") as f:
                    f.write(plan)
            except Exception as exc:  # plan capture must not kill profiling
                print(f"# {name}: plan capture failed: {exc}",
                      file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)

    out = json.dumps({"sf_dir": sf_dir, "queries": results})
    print(out, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
