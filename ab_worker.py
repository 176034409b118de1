#!/usr/bin/env python
"""A/B bench worker: one long-lived SparkSession over ONE code tree,
executing timed registry queries on request (line-oriented JSON over
stdin/stdout).

Launched by ``bench.py --ab``: two workers — one on HEAD, one on a
reference worktree — take turns running the SAME query in the SAME
minutes, so ambient box noise (the CPU-steal episodes that have cost a
hand-run adjudication session every round since r10) hits both sides
equally and the paired ratio is trustworthy where raw round-over-round
artifact deltas are not.

The worker is TREE-AGNOSTIC: ``argv[1]`` is the tree root to import
``gistdex_spark`` from (the script file itself may live in a different
tree — e.g. the r11 worktree has no ab_worker.py, so HEAD's copy runs
against the worktree's PYTHONPATH). The script's own directory is
scrubbed from sys.path so it can never shadow the requested tree.

Protocol (one JSON object per line):
  -> {"query": name, "sf_dir": dir}           run once, noop sink
  <- {"query": name, "sec": float}            (or {"error": ...})
  -> {"cmd": "quit"}                          stop spark, exit 0
On start the worker prints {"ready": true, "module": <gistdex path>}
so the driver can assert each side imported the intended tree.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path = [tree] + [
        p
        for p in sys.path
        if os.path.abspath(p or os.getcwd()) not in (here, os.getcwd())
    ]

    import gistdex_spark
    from gistdex_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"gistdex-ab-{os.path.basename(tree)}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from gistdex_spark.queries import REGISTRY

    # Same pre-warm as bench.main(): JVM/codegen + the Python/Arrow
    # worker pool, so neither side's first timed run pays startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from gistdex_spark.functions.embedder import embed_udf

    spark.range(256).repartition(int(cpus)).selectExpr(
        "cast(id as string) as t"
    ).select(embed_udf(dim=4)("t")).collect()

    print(
        json.dumps({"ready": True, "module": gistdex_spark.__file__}),
        flush=True,
    )

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        if req.get("cmd") == "quit":
            break
        name = req["query"]
        try:
            fn = REGISTRY[name]
            t0 = time.time()
            fn(spark, req["sf_dir"]).write.format("noop").mode(
                "overwrite"
            ).save()
            print(
                json.dumps({"query": name, "sec": time.time() - t0}),
                flush=True,
            )
        except Exception as exc:  # report, keep serving
            print(
                json.dumps(
                    {"query": name, "error": str(exc).split("\n")[0][:300]}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
