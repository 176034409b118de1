"""Round-6 experiment: do the compute-bound knobs (spread,
bucket_partitions, semdedup salt/pair_partitions) still matter when the
input carries REAL byte weight and natural splits?

SCALE.md asserts they are opt-in-only for byte-starved local scans —
that on a real lake AQE sizes the same stages correctly. This generates
a one-off sf1 (10x sf0.1, ~50k docs) under .sf1/ in two layouts:

- multi:  32-file parquet (real-lake shape, natural splits)
- single: 1-file parquet  (the byte-starved local shape)

and times three compute-bound stages with knobs ON vs OFF on each.
Results table goes to ROUND6_NOTES.md. Scratch script, not packaged.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gistdex_spark.operators import dedup as D
from gistdex_spark.operators import pipeline as P
from gistdex_spark.operators.ivf import first_c_centroids
from gistdex_spark.operators.semdedup import semdedup
from gistdex_spark.session import get_spark
from gistdex_spark.sources.tables import load_table, spread

BASE = "/root/repo/.sf1"
SF01 = "/root/testdata/sf0.1"
REPLICAS = 10


def generate(spark):
    docs = load_table(spark, SF01, "documents")
    emb = load_table(spark, SF01, "embeddings")
    doc_parts = []
    emb_parts = []
    for i in range(REPLICAS):
        # suffix every token so replicas are INDEPENDENT corpora for
        # simhash (same text would make every replica group a near-dup
        # cluster and blow the pair count 100x)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") * 10 + F.lit(i)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1x{i}").alias("text"),
                "lang",
                "source",
            )
        )
        # perturb one dimension per replica so vectors are distinct
        def _perturb(rep):
            return lambda x, idx: F.when(
                idx == rep % 8, x + F.lit(0.013 * (rep + 1))
            ).otherwise(x)

        emb_parts.append(
            emb.select(
                (F.col("vec_id") * 10 + F.lit(i)).alias("vec_id"),
                F.transform("embedding", _perturb(i)).alias("embedding"),
            )
        )
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionAll(p)
    all_emb = emb_parts[0]
    for p in emb_parts[1:]:
        all_emb = all_emb.unionAll(p)
    for name, df in (("documents", all_docs), ("embeddings", all_emb)):
        df.repartition(32).write.mode("overwrite").parquet(
            f"{BASE}/multi/{name}.parquet"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{BASE}/single/{name}.parquet"
        )
    print("generated", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs=2):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 2)


def main():
    spark = get_spark("exp-sf1", cpus="32")
    if not os.path.exists(f"{BASE}/multi/documents.parquet"):
        generate(spark)
    results = []
    for layout in ("multi", "single"):
        docs = spark.read.parquet(f"{BASE}/{layout}/documents.parquet")
        emb = spark.read.parquet(f"{BASE}/{layout}/embeddings.parquet")
        docs.count(), emb.count()  # warm the page cache
        nsplits = docs.rdd.getNumPartitions()

        gate_on = timed(lambda: noop(P.repetition_stats(spread(docs))))
        gate_off = timed(lambda: noop(P.repetition_stats(docs)))
        results.append((layout, nsplits, "gate(repetition_stats)",
                        gate_on, gate_off))
        print(results[-1], flush=True)

        sh_on = timed(
            lambda: noop(D.simhash_pairs(spread(docs), bucket_partitions=32))
        )
        sh_off = timed(lambda: noop(D.simhash_pairs(docs)))
        results.append((layout, nsplits, "simhash_pairs", sh_on, sh_off))
        print(results[-1], flush=True)

        cents = first_c_centroids(emb, 16)
        sd_on = timed(
            lambda: noop(
                semdedup(spread(emb), cents, salt=8, pair_partitions=64)
            )
        )
        sd_off = timed(
            lambda: noop(semdedup(emb, cents, salt=1, pair_partitions=None))
        )
        results.append((layout, nsplits, "semdedup", sd_on, sd_off))
        print(results[-1], flush=True)

    print("\n| layout | splits | stage | knobs ON (s) | knobs OFF (s) |")
    print("|---|---|---|---|---|")
    for layout, nsplits, stage, on, off in results:
        print(f"| {layout} | {nsplits} | {stage} | {on} | {off} |")


if __name__ == "__main__":
    main()
