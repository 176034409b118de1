#!/usr/bin/env python
"""Time the graph store's reason to exist: daily incremental ingest
(update_graph_store on a batch) vs a full knn_graph_multitable rebuild
over the same final corpus — per batch fraction, with the crossover.

The store's correctness contract (merged frame == batch rebuild) has
been pinned since r12; this measures the CLAIM the module advertises —
that probing stored state beats rescoring the corpus — and records
where it stops being true (large batches re-pay most of the kernel
work through new×old probes + new×new, plus the store's fixed write
costs, so past some fraction a rebuild is simply cheaper).

Usage: python make_graph_store_timing.py [sf_dir] [out.json]
Defaults: the sf1 corpus (.sf1/multi — the repo's 10x-data signal),
GRAPH_STORE_TIMING_r13.json. Geometry = the store defaults
(k=5, nbits=6, n_tables=10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FRACTIONS = [0.05, 0.10, 0.20, 0.40]
K, NBITS, NT = 5, 6, 10


def main() -> int:
    base = os.path.dirname(os.path.abspath(__file__))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(base, ".sf1", "multi")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "GRAPH_STORE_TIMING_r13.json"

    from pyspark.sql import functions as F

    from gistdex_spark.operators.dedup import knn_graph_multitable
    from gistdex_spark.session import get_spark
    from gistdex_spark.sources.graph_store import (
        update_graph_store,
        write_graph_store,
    )
    from gistdex_spark.sources.tables import load_table

    spark = get_spark(
        "graph-store-timing", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    n_total = emb.count()

    # Full-rebuild reference on the complete corpus: warm once, then
    # min-of-3 (the bench discipline).
    def rebuild_sec() -> float:
        runs = []
        for _ in range(3):
            t0 = time.time()
            knn_graph_multitable(
                emb, k=K, nbits=NBITS, n_tables=NT
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        return min(runs)

    knn_graph_multitable(emb, k=K, nbits=NBITS, n_tables=NT).write.format(
        "noop"
    ).mode("overwrite").save()  # warm
    rb = rebuild_sec()
    print(f"# full rebuild ({n_total} rows): {rb:.2f}s", file=sys.stderr)

    results = []
    tmp = tempfile.mkdtemp(prefix="gstore_timing_")
    try:
        for frac in FRACTIONS:
            cut = int(n_total * (1 - frac))
            # deterministic split on vec_id rank: batch = top `frac`
            ids = emb.select("vec_id").orderBy("vec_id")
            pivot = ids.limit(cut).agg(F.max("vec_id")).first()[0]
            old = emb.filter(F.col("vec_id") <= pivot)
            new = emb.filter(F.col("vec_id") > pivot)
            n_new = new.count()
            path = os.path.join(tmp, f"store_{int(frac * 100)}")
            t0 = time.time()
            write_graph_store(old, path, k=K, nbits=NBITS, n_tables=NT)
            bootstrap = time.time() - t0
            t0 = time.time()
            update_graph_store(
                spark, path, new, k=K, nbits=NBITS, n_tables=NT
            )
            upd = time.time() - t0
            results.append(
                {
                    "batch_fraction": frac,
                    "batch_rows": n_new,
                    "store_rows": n_total - n_new,
                    "bootstrap_sec": round(bootstrap, 3),
                    "update_sec": round(upd, 3),
                    "rebuild_sec": round(rb, 3),
                    "speedup_vs_rebuild": round(rb / upd, 3),
                }
            )
            print(
                f"# frac {frac}: update {upd:.2f}s vs rebuild {rb:.2f}s "
                f"(x{rb / upd:.2f})",
                file=sys.stderr,
            )
            shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # Corpus-scaling section — the claim the store actually makes: a
    # DAILY batch is fixed-size while the corpus grows, so update cost
    # should track the batch and rebuild cost the corpus. Replicate the
    # corpus xS: ids re-keyed; embeddings per-dimension positively
    # scaled so replica VALUES (and sims) differ while sign buckets are
    # preserved — bucket populations grow proportionally with the
    # corpus, the realistic fixed-geometry growth (in production nbits
    # rises with corpus size). Both paths timed on a fixed 1000-row
    # batch.
    scaling = []
    for s in [1, 2, 4, 8]:
        rep = emb
        if s > 1:
            rep = emb.select(
                F.explode(
                    F.expr(f"sequence(0, {s - 1})")
                ).alias("r"),
                "vec_id",
                "embedding",
            ).select(
                (F.col("vec_id") * s + F.col("r")).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, i) -> double(x) * "
                    "(1.0 + 0.01 * r * (1 + i % 7)))"
                ).alias("embedding"),
            )
        rep = rep.localCheckpoint(eager=True)
        n_rep = rep.count()
        batch = rep.orderBy(F.desc("vec_id")).limit(1000)
        pivot2 = batch.agg(F.min("vec_id")).first()[0]
        store_side = rep.filter(F.col("vec_id") < pivot2)
        knn_graph_multitable(rep, k=K, nbits=NBITS, n_tables=NT).write.format(
            "noop"
        ).mode("overwrite").save()
        runs = []
        for _ in range(2):
            t0 = time.time()
            knn_graph_multitable(
                rep, k=K, nbits=NBITS, n_tables=NT
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        rb_s = min(runs)
        path = os.path.join(tmp, f"scale_{s}")
        write_graph_store(store_side, path, k=K, nbits=NBITS, n_tables=NT)
        t0 = time.time()
        update_graph_store(spark, path, batch, k=K, nbits=NBITS, n_tables=NT)
        upd_s = time.time() - t0
        scaling.append(
            {
                "corpus_rows": n_rep,
                "batch_rows": 1000,
                "rebuild_sec": round(rb_s, 3),
                "update_sec": round(upd_s, 3),
                "speedup_vs_rebuild": round(rb_s / upd_s, 3),
            }
        )
        print(
            f"# scale x{s} ({n_rep} rows): update {upd_s:.2f}s vs "
            f"rebuild {rb_s:.2f}s (x{rb_s / upd_s:.2f})",
            file=sys.stderr,
        )
        shutil.rmtree(path, ignore_errors=True)

    crossover = next(
        (r["batch_fraction"] for r in results if r["update_sec"] >= r["rebuild_sec"]),
        None,
    )
    payload = {
        "metric": "graph_store_update_vs_rebuild",
        "sf_dir": sf_dir,
        "n_rows": n_total,
        "geometry": {"k": K, "nbits": NBITS, "n_tables": NT},
        "rebuild_sec_min3": round(rb, 3),
        "fractions": results,
        "corpus_scaling_fixed_batch": scaling,
        "crossover_fraction": crossover,
        "unit": "sec",
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
