#!/usr/bin/env python
"""Time the graph store's reason to exist: daily incremental ingest
(update_graph_store on a batch) vs a full knn_graph_multitable rebuild
over the same final corpus — per batch fraction, with the crossover.

The store's correctness contract (merged frame == batch rebuild) has
been pinned since r12; this measures the CLAIM the module advertises —
that probing stored state beats rescoring the corpus — and records
where it stops being true.

Round 14 additions (verdict item 3):
- ``rebuild_persist_sec``: the rebuild alternative that actually
  replaces a daily update is rebuild-AND-PERSIST (write_graph_store on
  the full corpus), not rebuild-to-noop; both are reported.
- ``auto_geometry_scaling``: the corpus-scaling series re-run with the
  store written at :func:`auto_geometry` (nbits=None) — bucket
  populations bounded at ~256 rows, so the probe's work tracks the
  BATCH while rebuild cost tracks the corpus. This is the scaling law
  the fixed-geometry series (kept for comparability) lacks: there the
  per-bucket population is Θ(corpus) and update degrades with it.

Usage: python make_graph_store_timing.py [sf_dir] [out.json]
Defaults: the sf1 corpus (.sf1/multi — the repo's 10x-data signal),
GRAPH_STORE_TIMING_r14.json. Fixed geometry = the r13 harness values
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
# Fixed-geometry scaling stops at x4 (r13's artifact already documents
# its behavior to 320k: update degrades toward Theta(corpus)); the
# auto-geometry series — the r14 scaling law — runs to x16 (320k rows).
SCALES_FIXED = [1, 2, 4]
SCALES_AUTO = [1, 2, 4, 8, 16]


def main() -> int:
    base = os.path.dirname(os.path.abspath(__file__))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(base, ".sf1", "multi")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "GRAPH_STORE_TIMING_r14.json"

    from pyspark.sql import functions as F

    from gistdex_spark.operators.dedup import knn_graph_multitable
    from gistdex_spark.session import get_spark
    from gistdex_spark.sources.graph_store import (
        auto_geometry,
        update_graph_store,
        write_graph_store,
    )
    from gistdex_spark.sources.store_meta import read_store_meta
    from gistdex_spark.sources.tables import load_table

    spark = get_spark(
        "graph-store-timing", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).localCheckpoint(eager=True)
    n_total = emb.count()
    tmp = tempfile.mkdtemp(prefix="gstore_timing_")

    def rebuild_sec(df, nbits, nt, runs=3) -> float:
        out = []
        for _ in range(runs):
            t0 = time.time()
            knn_graph_multitable(
                df, k=K, nbits=nbits, n_tables=nt
            ).write.format("noop").mode("overwrite").save()
            out.append(time.time() - t0)
        return min(out)

    def rebuild_persist_sec(df, nbits, nt, runs=2) -> float:
        out = []
        for i in range(runs):
            p = os.path.join(tmp, f"persist_{time.monotonic_ns()}")
            t0 = time.time()
            write_graph_store(df, p, k=K, nbits=nbits, n_tables=nt)
            out.append(time.time() - t0)
            shutil.rmtree(p, ignore_errors=True)
        return min(out)

    # --- Fixed-geometry batch-fraction series (r13 harness, kept) ---
    knn_graph_multitable(emb, k=K, nbits=NBITS, n_tables=NT).write.format(
        "noop"
    ).mode("overwrite").save()  # warm
    rb = rebuild_sec(emb, NBITS, NT)
    rbp = rebuild_persist_sec(emb, NBITS, NT)
    print(
        f"# full rebuild ({n_total} rows): noop {rb:.2f}s persist {rbp:.2f}s",
        file=sys.stderr,
    )

    results = []
    try:
        for frac in FRACTIONS:
            cut = int(n_total * (1 - frac))
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
            update_graph_store(spark, path, new, k=K)
            upd = time.time() - t0
            results.append(
                {
                    "batch_fraction": frac,
                    "batch_rows": n_new,
                    "store_rows": n_total - n_new,
                    "bootstrap_sec": round(bootstrap, 3),
                    "update_sec": round(upd, 3),
                    "rebuild_sec": round(rb, 3),
                    "rebuild_persist_sec": round(rbp, 3),
                    "speedup_vs_rebuild": round(rb / upd, 3),
                    "speedup_vs_rebuild_persist": round(rbp / upd, 3),
                }
            )
            print(
                f"# frac {frac}: update {upd:.2f}s vs rebuild {rb:.2f}s "
                f"(persist {rbp:.2f}s)",
                file=sys.stderr,
            )
            shutil.rmtree(path, ignore_errors=True)

        # --- Corpus-scaling, FIXED geometry (kept for comparability) +
        # AUTO geometry (the r14 scaling law). Fixed 1000-row batch;
        # replicas re-keyed, values scaled so sims differ while sign
        # buckets are preserved. ---
        def replicate(s: int):
            rep = emb
            if s > 1:
                rep = emb.select(
                    F.explode(F.expr(f"sequence(0, {s - 1})")).alias("r"),
                    "vec_id",
                    "embedding",
                ).select(
                    (F.col("vec_id") * s + F.col("r")).alias("vec_id"),
                    F.expr(
                        "transform(embedding, (x, i) -> double(x) * "
                        "(1.0 + 0.01 * r * (1 + i % 7)))"
                    ).alias("embedding"),
                )
            return rep.localCheckpoint(eager=True)

        dim = len(emb.select("embedding").first()[0])
        scaling_fixed, scaling_auto = [], []
        for s in SCALES_AUTO:
            rep = replicate(s)
            n_rep = rep.count()
            batch = rep.orderBy(F.desc("vec_id")).limit(1000)
            pivot2 = batch.agg(F.min("vec_id")).first()[0]
            store_side = rep.filter(F.col("vec_id") < pivot2)

            series = [("auto", auto_geometry(n_rep, dim), scaling_auto)]
            if s in SCALES_FIXED:
                series.insert(0, ("fixed", (NBITS, NT), scaling_fixed))
            for label, (nb, nt), acc in series:
                knn_graph_multitable(
                    rep, k=K, nbits=nb, n_tables=nt
                ).write.format("noop").mode("overwrite").save()  # warm
                rb_s = rebuild_sec(rep, nb, nt, runs=2)
                rbp_s = rebuild_persist_sec(rep, nb, nt, runs=1)
                path = os.path.join(tmp, f"scale_{label}_{s}")
                if label == "auto":
                    write_graph_store(
                        store_side, path, k=K, nbits=None, n_tables=None
                    )
                    meta = read_store_meta(os.path.join(
                        os.path.join(path, open(os.path.join(path, "_current")).read().strip()),
                        "members",
                    ))
                    got_geom = (meta.get("nbits"), meta.get("n_tables"))
                else:
                    write_graph_store(
                        store_side, path, k=K, nbits=nb, n_tables=nt
                    )
                    got_geom = (nb, nt)
                t0 = time.time()
                update_graph_store(spark, path, batch, k=K)
                upd_s = time.time() - t0
                acc.append(
                    {
                        "corpus_rows": n_rep,
                        "batch_rows": 1000,
                        "nbits": got_geom[0],
                        "n_tables": got_geom[1],
                        "rebuild_sec": round(rb_s, 3),
                        "rebuild_persist_sec": round(rbp_s, 3),
                        "update_sec": round(upd_s, 3),
                        "speedup_vs_rebuild": round(rb_s / upd_s, 3),
                        "speedup_vs_rebuild_persist": round(rbp_s / upd_s, 3),
                    }
                )
                print(
                    f"# scale x{s} [{label} nbits={got_geom[0]} nt="
                    f"{got_geom[1]}] ({n_rep} rows): update {upd_s:.2f}s "
                    f"vs rebuild {rb_s:.2f}s / persist {rbp_s:.2f}s",
                    file=sys.stderr,
                )
                shutil.rmtree(path, ignore_errors=True)
            rep.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    crossover = next(
        (
            r["batch_fraction"]
            for r in results
            if r["update_sec"] >= r["rebuild_sec"]
        ),
        None,
    )
    payload = {
        "metric": "graph_store_update_vs_rebuild",
        "sf_dir": sf_dir,
        "n_rows": n_total,
        "geometry_fixed": {"k": K, "nbits": NBITS, "n_tables": NT},
        "rebuild_sec_min3": round(rb, 3),
        "rebuild_persist_sec_min2": round(rbp, 3),
        "fractions": results,
        "corpus_scaling_fixed_batch": scaling_fixed,
        "corpus_scaling_auto_geometry": scaling_auto,
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
